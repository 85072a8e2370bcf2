package graft

import graft.queries.{AnalyticQueries, GraphQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave-3 queries (weighted label
  * propagation, language-ID margin, ECDF normalization) — independent
  * driver-side recomputations on sf0.001. */
class Wave3QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_label_propagation matches a driver-side 3-round weighted LPA") {
    val edges: Seq[(Long, Long, Long)] = GraphQueries.copurchaseEdges.run(spark, dir)
      .select(col("part_a").cast("long"), col("part_b").cast("long"), col("n_orders"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = Tables.part(spark, dir).select(col("p_partkey").cast("long"))
      .collect().map(_.getLong(0))
    val adj: Map[Long, Seq[(Long, Long)]] =
      (edges.map(e => (e._1, (e._2, e._3))) ++ edges.map(e => (e._2, (e._1, e._3))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      val prev = lbl
      lbl = nodes.map { n =>
        adj.get(n) match {
          case None => n -> prev(n)
          case Some(nbrs) =>
            val scores = nbrs.groupBy { case (u, _) => prev(u) }
              .map { case (l, ws) => l -> ws.map(_._2).sum }
            // max weight, tie → smallest label
            n -> scores.toSeq.maxBy { case (l, s) => (s, -l) }._1
        }
      }.toMap
    }
    val sizes = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = nodes.map(n => (n, lbl(n), sizes(lbl(n)))).toSet
    val got = GraphQueries.labelPropagation.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("community_size"))).toSet
    assert(got == want)
    assert(want.exists(t => t._2 != t._1), "no label moved — graph degenerate for LPA")
  }

  test("doc_lang_margin: margins consistent with lang_id and stopword recount") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), lower(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val got = TextQueries.docLangMargin.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, toks) =>
      val hits = graft.ops.TextOps.Stopwords
        .map { case (lang, ws) => lang -> toks.count(ws.contains).toLong }
      val sorted = hits.map(_._2).sorted(Ordering[Long].reverse)
      val r = got(id)
      assert(r.getAs[Long]("hits_best") == sorted.head, s"doc $id best")
      assert(r.getAs[Long]("hits_second") == sorted(1), s"doc $id second")
      assert(r.getAs[Long]("margin") == sorted.head - sorted(1), s"doc $id margin")
      val best = sorted.head
      val pred = if (best == 0) "und" else hits.find(_._2 == best).get._1
      assert(r.getAs[String]("pred_lang") == pred, s"doc $id pred")
      assert(r.getAs[Long]("is_confident") ==
        (if (sorted.head - sorted(1) > 0) 1L else 0L))
    }
  }

  test("q_ecdf_normalize: monotone per group, ends at 10000, counts recompute") {
    val rows = AnalyticQueries.qEcdfNormalize.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_rows"),
        r.getAs[Long]("cum"), r.getAs[Long]("ecdf_e4")))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val byFlag = li.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val sortedRs = rs.sortBy(_._2)
      // cum is a running sum of n_rows and the last cum equals group size
      assert(sortedRs.map(_._3).sum == byFlag(flag).length)
      assert(sortedRs.last._4 == byFlag(flag).length.toLong)
      assert(sortedRs.last._5 == 10000L, "ECDF must end at 10000")
      assert(sortedRs.map(_._5).toSeq == sortedRs.map(_._5).sorted.toSeq, "ECDF monotone")
      sortedRs.foreach { case (_, cents, nRows, cum, e4) =>
        assert(nRows == byFlag(flag).count(_ == cents).toLong)
        assert(cum == byFlag(flag).count(_ <= cents).toLong)
        assert(e4 == cum * 10000 / byFlag(flag).length)
      }
    }
  }
}
