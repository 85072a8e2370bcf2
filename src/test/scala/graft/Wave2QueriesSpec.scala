package graft

import graft.queries.{CurationQueries, DedupQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave-2 queries (prefix-filter dedup,
  * boilerplate detection, centroid similarity, hard-negative mining) —
  * each checked against an independent driver-side recomputation on
  * sf0.001, properties the DuckDB hash-compare can't express. */
class Wave2QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_prefix_filter is LOSSLESS: equals brute-force all-pairs Jaccard") {
    val got = DedupQueries.dedupPrefixFilter.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("inter"),
        r.getAs[Long]("uni"), r.getAs[Long]("jac_e4"))).toSet
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), lower(col("text")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty).toSet))
    val want = (for {
      (idL, sL) <- sets; (idR, sR) <- sets
      if idL < idR
      inter = (sL & sR).size.toLong
      uni = sL.size + sR.size - inter
      if inter * 10 >= uni * 9
    } yield (idL, idR, inter, uni, inter * 10000L / uni)).toSet
    assert(got == want, s"prefix filter lost or invented pairs: got ${got.size}, want ${want.size}")
    assert(want.nonEmpty, "fixture produced no near-dup pairs — threshold dead")
  }

  test("boilerplate_ngrams matches a driver-side per-source df recomputation") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("source"),
        graft.ops.TextOps.shingleHashes(col("text"), 3).as("hs"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2).toSet))
    val nDocs = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val df = docs.flatMap { case (_, src, hs) => hs.map(src -> _) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val expected = docs.map { case (id, src, hs) =>
      val nBp = hs.count(h => df((src, h)) * 100 >= nDocs(src) * 8).toLong
      val nSh = hs.size.toLong
      (id, src, nSh, nBp, if (nSh > 0) nBp * 10000L / nSh else 0L)
    }.toSet
    val got = CurationQueries.boilerplateNgrams.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("n_sh"),
        r.getAs[Long]("n_bp"), r.getAs[Long]("bp_e4"))).toSet
    assert(got == expected)
    assert(expected.exists(_._4 > 0), "no boilerplate flagged — threshold dead")
    assert(expected.exists(t => t._4 < t._3), "everything flagged — threshold degenerate")
  }

  test("label_centroid_sim matches an exact-integer driver-side recomputation") {
    val rows = Tables.embeddings(spark, dir)
      .select(col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = rows.head._2.length
    // quantize → exact integer sums per (label, pos) → double fold, the
    // same arithmetic path the query declares
    val sums = rows.groupBy(_._1).view.mapValues { vs =>
      Array.tabulate(dim)(i =>
        vs.map(v => math.round(v._2(i).toDouble * 1000000)).sum.toDouble)
    }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val labels = sums.keys.toSeq.sorted
    val want = (for {
      l <- labels; r <- labels if l < r
      cos = dot(sums(l), sums(r)) / (math.sqrt(dot(sums(l), sums(l))) * math.sqrt(dot(sums(r), sums(r))))
    } yield (l, r, math.round(cos * 10000))).toSet
    val got = VectorQueries.labelCentroidSim.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("cos_e4"))).toSet
    assert(got == want)
    assert(got.size == labels.size * (labels.size - 1) / 2, "one row per unordered label pair")
  }

  test("hard_negatives: positives share the label, negatives don't, margin arithmetic holds") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val byId = emb.map(t => t._1 -> t).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val rows = VectorQueries.hardNegatives.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qId, qLabel) = (r.getAs[Long]("q_id"), r.getAs[Long]("q_label"))
      val (posId, negId) = (r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))
      assert(byId(posId)._2 == qLabel, s"positive $posId label mismatch for query $qId")
      assert(byId(negId)._2 != qLabel, s"negative $negId shares the label of query $qId")
      // argmax check against a driver-side scan (same fold order)
      val q = byId(qId)
      val (bestPos, bestNeg) = {
        val others = emb.filter(_._1 != qId)
        def pick(p: ((Long, Long, Array[Float])) => Boolean) =
          others.filter(p).map(t => (cos(q._3, t._3), t._1)).maxBy { case (c, id) => (c, -id) }
        (pick(_._2 == qLabel), pick(_._2 != qLabel))
      }
      assert(bestPos._2 == posId && bestNeg._2 == negId,
        s"query $qId picked ($posId,$negId), brute force says (${bestPos._2},${bestNeg._2})")
      assert(r.getAs[Long]("margin_e6") == math.round((bestPos._1 - bestNeg._1) * 1000000))
      assert(r.getAs[Long]("is_hard") == (if (r.getAs[Long]("margin_e6") <= 0) 1L else 0L))
    }
  }
}
