package graft

import graft.queries.SketchQueries

/** Round-10 wave 29: the Bloom sizing curve — a from-scratch driver
  * recompute of the md5 hash family, bit sets, and probe verdicts on
  * sf0.001, plus the two properties that make the gate meaningful: the
  * Bloom guarantee (zero false negatives at every m) and monotone
  * improvement (FPR never rises as m grows, since the hash positions are
  * the same 60-bit value reduced mod a larger m... which is NOT a nested
  * filter — so this is asserted on the measured data, not assumed).
  */
class Wave29QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Ms = Seq(256L, 512L, 1024L, 2048L)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("q_bloom_fpr_sweep matches a from-scratch driver recompute") {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val ins = cust.filter(_._2 == 1L).map(_._1).toSeq
    val probe = cust.filter(_._2 == 2L).map(_._1).toSeq
    def positions(key: Long, m: Long): Seq[Long] =
      (0 until 4).map(j => hash60(s"bf$j:$key") % m)
    val want = Ms.map { m =>
      val bits = ins.flatMap(k => positions(k, m)).toSet
      val fps = probe.count(k => positions(k, m).forall(bits.contains))
      val insHit = ins.count(k => positions(k, m).forall(bits.contains))
      (m, 4L, ins.size.toLong, bits.size.toLong, probe.size.toLong, fps.toLong,
        if (probe.isEmpty) -1L else fps.toLong * 1000000L / probe.size,
        ins.size.toLong - insHit)
    }
    val got = SketchQueries.bloomFprSweep.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want && ins.nonEmpty && probe.nonEmpty)
  }

  test("the Bloom guarantee and the sizing story hold on the measured curve") {
    val got = SketchQueries.bloomFprSweep.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
      .sortBy(_._1)
    got.foreach { case (m, _, _, fn) =>
      assert(fn == 0L, s"m=$m: a false negative — the filter is broken")
    }
    // measured FPR is (weakly) monotone improving across the sweep
    got.sliding(2).foreach {
      case Seq((m1, _, f1, _), (m2, _, f2, _)) =>
        assert(f2 <= f1, s"FPR rose from m=$m1 ($f1 ppm) to m=$m2 ($f2 ppm)")
      case _ => ()
    }
  }
}
