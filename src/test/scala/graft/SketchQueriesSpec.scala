package graft

import graft.queries.SketchQueries

/** Estimator-quality checks for the KMV sketches (the oracle gate checks
  * engine parity; this spec checks the statistics behave like KMV). */
class SketchQueriesSpec extends SparkSpec {

  test("q_kmv_distinct: small groups are exact, large groups within 4 sigma") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val rows = SketchQueries.kmvDistinct.run(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val exact = r.getAs[Long]("n_exact")
        val est = r.getAs[Long]("kmv_estimate")
        if (exact < 64) assert(est === exact, s"small-set branch must be exact: $r")
        else {
          // KMV relative error sigma ~ 1/sqrt(k-2) ~ 12.7% at k=64
          val tol = (exact * 4) / 8 // 50% = ~4 sigma
          assert(math.abs(est - exact) <= tol, s"estimate off: $r")
        }
      }
    }
  }

  test("q_cms_heavy_hitters: estimates are one-sided (never below exact)") {
    val rows = SketchQueries.cmsHeavyHitters.run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("n_exact"),
        s"CMS under-estimated: $r")
    }
    val absent = rows.find(_.getAs[String]("term") == "zzz_absent").get
    assert(absent.getAs[Long]("n_exact") === 0L)
  }

  test("q_bottomk_sample: exactly k rows, ranked by hash, stable across runs") {
    val dir = "/root/testdata/sf0.01"
    val a = SketchQueries.bottomkSample.run(spark, dir).collect()
    val b = SketchQueries.bottomkSample.run(spark, dir).collect()
    assert(a.length === 100)
    assert(a.map(_.getAs[Long]("sample_rank")).toSeq === (1L to 100L))
    assert(a.map(_.getAs[Long]("o_orderkey")).toSeq ===
      b.map(_.getAs[Long]("o_orderkey")).toSeq, "sample membership unstable")
  }

  test("q_join_size_est: inclusion-exclusion estimate brackets the truth") {
    val r = SketchQueries.joinSizeEst.run(spark, "/root/testdata/sf0.01").collect().head
    val est = r.getAs[Long]("inter_est"); val exact = r.getAs[Long]("inter_exact")
    assert(exact > 0, "degenerate overlap on test data")
    // three stacked KMV errors: allow a wide but meaningful envelope
    assert(est >= exact / 2 && est <= exact * 2, s"overlap estimate off: $r")
  }

  test("q_kmv_union: merged estimate tracks the global distinct count") {
    val r = SketchQueries.kmvUnion.run(spark, "/root/testdata/sf0.01").collect().head
    val exact = r.getAs[Long]("n_exact")
    val est = r.getAs[Long]("kmv_union_estimate")
    assert(r.getAs[Long]("n_groups") === 5L)
    assert(math.abs(est - exact) <= exact / 2, s"union estimate off: $r")
  }
}
