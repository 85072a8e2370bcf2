package graft

import graft.queries.{DedupQueries, EvalQueries, VectorQueries}
import graft.ops.HashOps

/** From-scratch driver recomputes for the round-10 wave 22 queries
  * (MinHash estimator QA, smoothed target encoding, embedding drift,
  * LPA modularity gate) on sf0.001.
  */
class Wave22QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def hashP(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % HashOps.P
  }

  test("q_minhash_accuracy matches a from-scratch signature/Jaccard recompute") {
    import DedupQueries._
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        val shingles = toks.sliding(ShingleK).filter(_.length == ShingleK)
          .map(_.mkString(" ")).map(hashP).toArray.distinct
        (r.getLong(0), shingles)
      }.filter(_._2.nonEmpty)
    def sig(hs: Array[Long]): Array[Long] =
      (0 until NumPerms).map { i =>
        hs.map(h => ((2L * i + 1) * h + (i.toLong * 2654435761L) % HashOps.P)
          % HashOps.P).min
      }.toArray
    val sigs = docs.map { case (id, hs) => id -> sig(hs) }.toMap
    val sets = docs.map { case (id, hs) => id -> hs.toSet }.toMap
    def bandKeys(s: Array[Long]): Seq[String] =
      (0 until NumBands).map(b =>
        s"$b:" + s.slice(b * RowsPerBand, (b + 1) * RowsPerBand).mkString(","))
    val byBand = docs.flatMap { case (id, _) => bandKeys(sigs(id)).map(_ -> id) }
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val cand = byBand.flatMap(ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j)))
      .toSet
    val want = cand.toSeq.map { case (l, r) =>
      val inter = sets(l).intersect(sets(r)).size
      val jacE4 = math.round(inter.toDouble /
        (sets(l).size + sets(r).size - inter) * 10000)
      val agree = sigs(l).zip(sigs(r)).count { case (a, b) => a == b }.toLong
      val estE4 = agree * 10000 / NumPerms
      (jacE4 / 1000, math.abs(estE4 - jacE4))
    }.groupBy(_._1).map { case (b, errs) =>
      b -> (errs.length.toLong, errs.map(_._2).sum / errs.length, errs.map(_._2).max)
    }
    val got = qMinhashAccuracy.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want && want.nonEmpty)
    assert(want.keys.size >= 2, "all candidate pairs in one Jaccard bucket — profile vacuous")
  }

  test("q_target_encoding matches a driver recompute and shrinks low-n segments harder") {
    import EvalQueries._
    val rows = Tables.orders(spark, dir).select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val seg = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val joined = rows.flatMap { case (ck, c) => seg.get(ck).map(s => (s, c)) }
    val gSum = joined.map(_._2).sum; val gN = joined.length
    val muG = gSum / gN
    val want = joined.groupBy(_._1).map { case (s, xs) =>
      val n = xs.length.toLong; val sum = xs.map(_._2).sum
      s -> (n, sum, sum / n, (sum + TargetEncodeK * muG) / (n + TargetEncodeK),
        n * 10000 / (n + TargetEncodeK))
    }
    val got = qTargetEncoding.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == want && want.nonEmpty)
    // shrink factor is monotone in n: the emptiest segment trusts itself least
    val byN = want.values.toSeq.sortBy(_._1)
    assert(byN.head._5 <= byN.last._5)
  }

  test("q_embedding_drift matches a driver recompute of e6-exact per-dim means") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
    val dims = emb.head._2.length
    val want = (1 to dims).map { d =>
      val a = emb.filter(_._1 % 2 == 0).map(e => math.round(e._2(d - 1).toDouble * 1000000))
      val b = emb.filter(_._1 % 2 != 0).map(e => math.round(e._2(d - 1).toDouble * 1000000))
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      d.toLong -> (a.length.toLong, b.length.toLong, ma, mb, math.abs(ma - mb))
    }.toMap
    val got = VectorQueries.qEmbeddingDrift.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == want && want.size == dims)
  }

  test("q_graph_modularity is consistent with the LPA partition and the co-purchase edges") {
    val labels = SparkEntry.queries("q_label_propagation")(spark, dir).collect()
      .map(r => (r.getAs[Long]("part_key"), r.getAs[Long]("community"))).toMap
    val und = SparkEntry.queries("q_copurchase_edges")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // directed view: each undirected edge in both directions
    val dirEdges = und.flatMap(e => Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
    val w2Total = dirEdges.map(_._3).sum
    val intra = dirEdges.filter(e => labels(e._1) == labels(e._2))
      .groupBy(e => labels(e._1)).map { case (c, es) => c -> es.map(_._3).sum }
    val deg = dirEdges.groupBy(e => labels(e._1)).map { case (c, es) => c -> es.map(_._3).sum }
    val nNodes = labels.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val want = nNodes.map { case (c, n) =>
      val iw = intra.getOrElse(c, 0L); val dw = deg.getOrElse(c, 0L)
      val contrib = w2Total * iw - dw * dw
      c -> (n, iw, dw, w2Total, contrib,
        // Spark `div` truncates toward zero; mirror that for negatives
        contrib * 1000000 / (w2Total * w2Total))
    }
    val got = graft.queries.GraphQueries.qGraphModularity.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == want && want.nonEmpty)
    // a genuine community structure scores positive overall
    val q = want.values.map(_._5).sum.toDouble / (w2Total.toDouble * w2Total)
    assert(q > 0, s"LPA partition scored non-positive modularity $q")
  }
}
