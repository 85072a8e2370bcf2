package graft.ops

import graft.SparkSpec

class KMeansOpsSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated 4-dim blobs, 10 points each
  private val blobs = {
    val rnd = new scala.util.Random(3)
    val centers = Seq(Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f), Seq(0f, 0f, 10f, 0f))
    (0 until 30).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(v => v + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  test("k-means separates well-separated blobs and inertia decreases") {
    val m0 = KMeansOps.fit(blobs, k = 3, iters = 0, dim = 4)
    val m3 = KMeansOps.fit(blobs, k = 3, iters = 3, dim = 4)
    assert(m3.inertia <= m0.inertia + 1e-6)
    val assigned = KMeansOps.transform(blobs, m3).as[(Long, Int)].collect()
    // every blob (vec_id % 3) maps to exactly one cluster, bijectively
    val byBlob = assigned.groupBy(_._1 % 3).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBlob.values.forall(_.size == 1))
    assert(byBlob.values.map(_.head).toSet.size === 3)
  }

  test("assignment is total and in range") {
    val m = KMeansOps.fit(blobs, k = 4, iters = 2, dim = 4)
    val cl = KMeansOps.transform(blobs, m).as[(Long, Int)].collect()
    assert(cl.length === 30)
    assert(cl.forall { case (_, c) => c >= 0 && c < 4 })
  }

  test("exact path separates the blobs and is bit-identical across runs") {
    val c1 = KMeansOps.fitExact(blobs, k = 3, iters = 3)
    val c2 = KMeansOps.fitExact(blobs, k = 3, iters = 3)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val assigned = KMeansOps.transformExact(blobs, c1).as[(Long, Long)].collect()
    val byBlob = assigned.groupBy(_._1 % 3).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBlob.values.forall(_.size == 1))
    assert(byBlob.values.map(_.head).toSet.size === 3)
  }

  test("exact centroid mean is round-half-up on negatives too") {
    // two 1-dim points at -1.25e-6·1e6 = {-1, -2} quantized; mean -1.5 → -1
    val pts = Seq((0L, Seq(-1.0e-6f)), (1L, Seq(-2.05e-6f))).toDF("vec_id", "embedding")
    val c = KMeansOps.fitExact(pts, k = 1, iters = 1)
    assert(c(0)(0) === -1L) // floor((2·(-3)+2)/4) = floor(-1) = -1
  }

  test("exact path: empty cluster keeps its previous centroid") {
    // k=3 over 2 identical points: clusters 1,2 start at the same point as
    // cluster 0 minus nothing — only cluster 0 (lowest index wins ties) gets
    // points; the rest must keep their init centroids, not crash or zero out.
    val pts = Seq((0L, Seq(1f, 1f)), (1L, Seq(1f, 1f)), (2L, Seq(5f, 5f))).toDF("vec_id", "embedding")
    val c = KMeansOps.fitExact(pts, k = 3, iters = 2)
    assert(c.length === 3)
    assert(c(1).toSeq === Seq(1000000L, 1000000L)) // kept init (point 1's vector)
  }
}
