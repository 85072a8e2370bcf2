package graft

import graft.queries.{CurationQueries, TextQueries}
import graft.ops.TextOps

/** Round-10 wave 34: the sampling-bias audit — driver recompute of the
  * half-min-budget sample's per-source quality/token means on sf0.001,
  * plus the properties the audit exists for: every source is genuinely
  * thinned (rate < 1e6, n_sampled < n_full somewhere) and the sampled
  * means stay inside the population's min/max envelope.
  */
class Wave34QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60ppm(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16) % 1000000L

  test("q_sample_representativeness matches a driver recompute") {
    val rows = Tables.documents(spark, dir)
      .where(TextOps.tokenCount(org.apache.spark.sql.functions.col("text")) > 0)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        CurationQueries.qualityE4(org.apache.spark.sql.functions.col("text")).as("q"),
        TextOps.tokenCount(org.apache.spark.sql.functions.col("text"))
          .cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val bySrc = rows.groupBy(_._2)
    val minDocs = bySrc.values.map(_.size.toLong).min
    val want = bySrc.toSeq.map { case (src, ds) =>
      val n = ds.size.toLong
      val rate = math.min(1000000L, minDocs * 500000L / n)
      val kept = ds.filter(d => hash60ppm(s"mix:${d._1}") < rate)
      val (qs, ts) = (ds.map(_._3), ds.map(_._4))
      val (qk, tk) = (kept.map(_._3), kept.map(_._4))
      (src, n, kept.size.toLong, rate,
        qs.sum / n,
        if (kept.isEmpty) -1L else qk.sum / kept.size,
        if (kept.isEmpty) -1L else math.abs(qs.sum / n - qk.sum / kept.size),
        ts.sum / n,
        if (kept.isEmpty) -1L else tk.sum / kept.size)
    }.sortBy(_._1)
    val got = CurationQueries.qSampleRepresentativeness.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == want && want.nonEmpty)
    // the audit path is real: every rate is sub-1e6 and thinning happened
    assert(got.forall(_._4 < 1000000L), "a source kept everything — budget not binding")
    assert(got.exists(g => g._3 < g._2), "no source actually thinned")
    // sampled means stay within the population envelope (a uniform sample
    // cannot exceed its population's extremes)
    got.filter(_._3 > 0).foreach { g =>
      val ds = bySrc(g._1)
      assert(g._6 >= ds.map(_._3).min && g._6 <= ds.map(_._3).max)
      assert(g._9 >= ds.map(_._4).min && g._9 <= ds.map(_._4).max)
    }
  }
}
