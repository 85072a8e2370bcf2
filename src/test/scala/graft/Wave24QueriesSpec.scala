package graft

import graft.queries.VectorQueries

/** From-scratch driver recomputes for the round-10 wave 24 queries
  * (filtered vector search + its recall gate) on sf0.001.
  */
class Wave24QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val emb: Array[(Long, Array[Float], Long)] =
    Tables.embeddings(spark, dir).selectExpr("vec_id", "embedding",
        "CAST(label AS LONG) AS label")
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray,
        r.getAs[Long]("label")))
      .sortBy(_._1)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (k <- a.indices) { d += a(k).toDouble * b(k); na += a(k).toDouble * a(k); nb += b(k).toDouble * b(k) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("ann_filtered_topk matches a driver recompute of post-filter IVF search") {
    import VectorQueries._
    val cents = emb.filter(e => e._1 % IvfStride == 0 && e._1 < IvfCentCap)
    def ranking(v: Array[Float]): Seq[Long] =
      cents.map(c => (c._1, cos(v, c._2))).sortBy(t => (-t._2, t._1)).map(_._1).toSeq
    val assigned = emb.map(e => (e._1, ranking(e._2).head))
    val byCluster = assigned.groupBy(_._2)
    val vecs = emb.map(e => e._1 -> e._2).toMap
    val labels = emb.map(e => e._1 -> e._3).toMap
    val queries = emb.filter(e => e._1 % QueryStride == 0 && e._1 < QueryCap)
    val want = queries.flatMap { case (q, qv, ql) =>
      val probed = ranking(qv).take(NProbe).toSet
      probed.toSeq.flatMap(c => byCluster.getOrElse(c, Array.empty).map(_._1))
        .filter(cid => cid != q && labels(cid) == ql)
        .map(cid => (cid, cos(qv, vecs(cid))))
        .sortBy(t => (-t._2, t._1)).take(TopK).zipWithIndex
        .map { case ((cid, cs), i) =>
          (q, cid, (i + 1).toLong, math.round(cs * 1000000)) }
    }.toSeq
    val got = annFilteredTopk.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want && want.nonEmpty)
  }

  test("q_ann_filtered_recall is consistent with the filtered brute truth and the IVF result") {
    import VectorQueries._
    val vecs = emb.map(e => e._1 -> e._2).toMap
    val labels = emb.map(e => e._1 -> e._3).toMap
    val queries = emb.filter(e => e._1 % QueryStride == 0 && e._1 < QueryCap)
    val truth = queries.flatMap { case (q, qv, ql) =>
      emb.filter(e => e._1 != q && e._3 == ql)
        .map(e => (e._1, cos(qv, e._2)))
        .sortBy(t => (-t._2, t._1)).take(TopK).map(t => (q, t._1))
    }.toSet
    val ivf = annFilteredTopk.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = qAnnFilteredRecall.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((q, (nTruth, nHit, pct)) <- got) {
      val t = truth.filter(_._1 == q)
      assert(nTruth == t.size)
      assert(nHit == t.count(ivf.contains))
      assert(pct == nHit * 100 / nTruth)
    }
    assert(got.nonEmpty)
    // filtering must cost SOME recall somewhere on this fixture, and the
    // filtered result may never contain a cross-label candidate
    assert(got.values.exists(_._3 < 100))
    assert(ivf.forall { case (q, c) => labels(q) == labels(c) })
  }
}
