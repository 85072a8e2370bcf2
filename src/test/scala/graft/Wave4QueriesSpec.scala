package graft

import graft.queries.{EvalQueries, SketchQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave-4 queries (KMV intersection,
  * k-anonymity audit, decile lift) — independent driver-side
  * recomputations on sf0.001. */
class Wave4QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val P = 1000000007L

  /** Driver-side mirror of HashOps.hashP (md5 hex → first 15 digits → % P). */
  private def hashP(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % P
  }

  test("q_kmv_intersect matches a driver-side KMV recomputation") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def heavy(t: String): Set[Long] = ev.filter(_._2 == t).groupBy(_._1)
      .collect { case (u, es) if es.length >= 14 => u }.toSet
    val (a, b) = (heavy("click"), heavy("view"))
    assert(a.nonEmpty && b.nonEmpty, "heavy-user sets empty — threshold dead")
    assert((a & b) != a || (a & b) != b, "sets identical — overlap degenerate")
    val k = 64
    def sketch(s: Set[Long]): Seq[Long] =
      s.toSeq.map(u => hashP(s"$u:kmv")).sorted.take(k)
    def est(hs: Seq[Long]): Long =
      if (hs.length < k) hs.length.toLong else (k - 1) * P / hs(k - 1)
    val union = (sketch(a) ++ sketch(b)).distinct.sorted.take(k)
    val (ea, eb, eu) = (est(sketch(a)), est(sketch(b)), est(union))
    val r = SketchQueries.kmvIntersect.run(spark, dir).collect().head
    assert(r.getAs[Long]("est_a") == ea)
    assert(r.getAs[Long]("est_b") == eb)
    assert(r.getAs[Long]("est_union") == eu)
    assert(r.getAs[Long]("est_intersect") == math.max(ea + eb - eu, 0L))
    assert(r.getAs[Long]("n_exact_intersect") == (a & b).size.toLong)
  }

  test("q_k_anonymity matches a driver-side QI-group recomputation") {
    val natRegion = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val fine = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val coarse = cust.groupBy { case (n, s) => (natRegion(n), s) }
      .view.mapValues(_.length.toLong).toMap
    val want = fine.map { case ((n, s), cnt) =>
      val reg = natRegion(n)
      (n, s, cnt, if (cnt < 10) 1L else 0L, reg, coarse((reg, s)),
        if (coarse((reg, s)) >= 10) 1L else 0L)
    }.toSet
    val got = EvalQueries.qKAnonymity.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Long]("violates"), r.getAs[Long]("region_key"),
        r.getAs[Long]("n_region_segment"), r.getAs[Long]("ok_after_gen"))).toSet
    assert(got == want)
    assert(want.exists(_._4 == 1L), "no violating group — k threshold dead at this SF")
  }

  test("q_decile_lift: coverage, decile bounds, and lift arithmetic") {
    val rows = EvalQueries.qDecileLift.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("pos_rate_e4"), r.getAs[Long]("lift_e4")))
    val nDocs = Tables.documents(spark, dir)
      .where(regexp_count(col("text"), lit("\\S+")) > 0).count()
    val nPos = Tables.documents(spark, dir)
      .where(regexp_count(col("text"), lit("\\S+")) > 0 && col("lang") === "en").count()
    assert(rows.map(_._2).sum == nDocs, "deciles must cover every scored document")
    assert(rows.map(_._3).sum == nPos, "positives must be fully distributed")
    assert(rows.forall(t => t._1 >= 1 && t._1 <= 10), "decile out of range")
    rows.foreach { case (_, n, np, rate, lift) =>
      assert(rate == np * 10000 / n)
      assert(lift == np * nDocs * 10000 / (n * nPos))
    }
    assert(rows.map(_._1).distinct.length == rows.length, "one row per decile")
  }
}
