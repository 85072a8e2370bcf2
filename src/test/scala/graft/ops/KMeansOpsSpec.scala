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
}
