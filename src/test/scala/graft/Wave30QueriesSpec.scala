package graft

import graft.queries.SourceQueries

/** Round-10 wave 30: incremental view maintenance — the merge identity
  * (mart(base) ⊕ partials(delta) = mart(base ∪ delta)) recomputed in the
  * driver, plus the cases the oracle's direct aggregate cannot isolate:
  * keys that exist only in the base period, only in the delta period, and
  * in both; and the bootstrap's staged parquet actually being read back
  * (the refresh must not silently rescan the base facts).
  */
class Wave30QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val splitUs = java.sql.Timestamp.valueOf("2024-01-21 00:00:00").getTime * 1000L

  test("q_ivm_merge_mart matches a driver recompute and covers one-sided keys") {
    val ev = Tables.events(spark, dir)
      .selectExpr("event_type", "unix_micros(ts) AS ts_us",
        "CAST(round(value * 100) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = ev.groupBy(_._1).toSeq.map { case (t, rows) =>
      (t, rows.size.toLong, rows.map(_._3).sum, rows.map(_._3).min,
        rows.map(_._3).max, rows.map(_._2).max)
    }.sortBy(_._1)
    val got = SourceQueries.ivmMergeMart.run(spark, dir)
      .selectExpr("event_type", "n_events", "sum_cents", "min_cents",
        "max_cents", "unix_micros(last_ts)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want && want.nonEmpty)
    // the split must actually bisect the fixture — otherwise the merge
    // path (full-outer + partial fold) degenerates to a rename
    val nBase = ev.count(_._2 < splitUs)
    assert(nBase > 0 && nBase < ev.size,
      "split leaves one side empty — merge arms not exercised")
  }

  test("the partial-merge identity holds on crafted one-sided keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // base-only, delta-only, and straddling keys with extreme partials
    val rows = Seq(
      ("only_base", 10L, 5L), ("only_base", 11L, -7L),
      ("only_delta", 30L, 100L),
      ("both", 12L, 3L), ("both", 31L, -50L), ("both", 32L, 2L))
    val df = rows.toDF("k", "t", "v")
    def partials(d: org.apache.spark.sql.DataFrame) = d.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), min("v").as("mn"), max("v").as("mx"))
    val base = partials(df.where(col("t") < 20L))
      .select(col("k"), col("n").as("n_b"), col("s").as("s_b"),
        col("mn").as("mn_b"), col("mx").as("mx_b"))
    val delta = partials(df.where(col("t") >= 20L))
      .select(col("k"), col("n").as("n_d"), col("s").as("s_d"),
        col("mn").as("mn_d"), col("mx").as("mx_d"))
    val merged = base.join(delta, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L))).as("s"),
        least(coalesce(col("mn_b"), col("mn_d")), coalesce(col("mn_d"), col("mn_b"))).as("mn"),
        greatest(coalesce(col("mx_b"), col("mx_d")), coalesce(col("mx_d"), col("mx_b"))).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val direct = partials(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(merged.toSeq == direct.toSeq)
  }
}
