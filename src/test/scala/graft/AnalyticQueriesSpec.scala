package graft

import graft.queries.AnalyticQueries

/** Specs for the analytic-SQL queries that the DuckDB oracle can't fully
  * check (approx sketches are implementation-defined) plus side-effect
  * hygiene of the SQL-parser query. */
class AnalyticQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_distinct_users: HLL estimates within relative error bound of exact") {
    // the catalog query exports only exact + within-envelope flags (so the
    // DuckDB oracle can hash-check it); the raw estimates stay spec-checked
    // here against the same envelope, computed with the same aggregation
    import org.apache.spark.sql.functions._
    val raw = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("approx_users"),
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("hll_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
    assert(raw.nonEmpty)
    // approx_count_distinct default rsd = 0.05; hll_sketch_agg(lgK=12) has
    // ~1.04/sqrt(2^12) ≈ 1.6% std error. Allow 5 sigma on both.
    raw.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      val hll = r.getAs[Long]("hll_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.25,
        s"approx_count_distinct off by ${math.abs(approx - exact) / exact} for $r")
      assert(math.abs(hll - exact) / exact <= 0.10,
        s"hll_sketch estimate off by ${math.abs(hll - exact) / exact} for $r")
    }
    // and the exported flags must all be green (what the oracle pins)
    val flags = AnalyticQueries.approxDistinctUsers.run(spark, dir).collect()
    assert(flags.nonEmpty)
    flags.foreach { r =>
      assert(r.getAs[Long]("approx_ok") == 1L && r.getAs[Long]("hll_ok") == 1L,
        s"estimate outside its envelope: $r")
    }
  }

  test("q_scalar_subquery leaves no temp views behind (side-effect-free catalog)") {
    val df = AnalyticQueries.qScalarSubquery.run(spark, dir)
    assert(df.count() > 0)
    val views = spark.catalog.listTables().collect().map(_.name).toSet
    assert(!views.contains("graft_ssq_customer") && !views.contains("graft_ssq_orders"),
      s"temp views leaked: $views")
  }

  test("q_moving_avg: ROWS frame contains RANGE frame on the daily grid") {
    val rows = AnalyticQueries.qMovingAvg.run(spark, dir).collect()
    assert(rows.nonEmpty)
    // with ≤1 row per (status, day), every row within 6 day-numbers is also
    // within the last 7 rows: RANGE(-6,0) ⊆ ROWS(-6,0). With non-negative
    // revenues that containment becomes rng7 ≤ ma7 — a frame-boundary bug
    // that drops or double-counts gap days breaks it.
    assert(rows.forall(_.getAs[Long]("rev_cents") >= 0),
      "containment check assumes non-negative daily revenue")
    rows.foreach { r =>
      val n = r.getAs[Long]("ma7_n")
      assert(n >= 1 && n <= 7, s"ROWS frame count out of range: $r")
      assert(r.getAs[Long]("rng7_cents") <= r.getAs[Long]("ma7_cents"),
        s"RANGE frame sum exceeds containing ROWS frame sum: $r")
      assert(r.getAs[Long]("ma7_cents") >= r.getAs[Long]("rev_cents"))
    }
  }

  test("q_gapfill_daily_revenue: grid is dense (days x statuses) with zero-filled gaps") {
    val df = AnalyticQueries.qGapfill.run(spark, dir)
    val rows = df.collect()
    val days = rows.map(_.getAs[java.sql.Date]("day")).distinct.length
    val statuses = rows.map(_.getAs[String]("o_orderstatus")).distinct.length
    assert(rows.length === days * statuses, "gap-filled grid is not dense")
  }

  test("approx_percentile: rank error within the accuracy guarantee") {
    // Spark's approx_percentile(col, p, accuracy) guarantees rank error
    // ≤ n/accuracy. Not a catalog query: the GK-summary merge is not
    // provably order-insensitive, so it can't sign the catalog's
    // bit-determinism contract — the capability is pinned here instead.
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, dir)
    val accuracy = 100 // rank error ≤ 1% of n per group
    val approx = li.groupBy("l_returnflag")
      .agg(expr(s"approx_percentile(l_extendedprice, 0.5, $accuracy)").as("ap50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.nonEmpty)
    approx.foreach { case (flag, p50) =>
      val grp = li.where(col("l_returnflag") === flag)
      val n = grp.count().toDouble
      val below = grp.where(col("l_extendedprice") <= p50).count().toDouble
      val frac = below / n
      assert(math.abs(frac - 0.5) <= 0.01 + 1.0 / n,
        s"approx p50 for $flag at rank fraction $frac (n=$n)")
    }
  }

  test("rolling 7-day distinct: every window day >= its single-day distinct") {
    import org.apache.spark.sql.functions._
    val rolling = AnalyticQueries.qRollingDistinct.run(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(rolling.nonEmpty)
    val daily = graft.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy("day").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rolling.foreach { case (day, n7) =>
      daily.get(day).foreach(n1 => assert(n7 >= n1,
        s"$day: 7-day distinct $n7 < single-day $n1"))
    }
  }

  test("funnel stages are monotonically non-increasing") {
    val r = AnalyticQueries.qFunnel.run(spark, dir).collect().head
    val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(a >= b && b >= c, s"funnel not monotone: $a, $b, $c")
    assert(a > 0 && b > 0, "degenerate funnel on test data")
  }

  test("q_skew_stats matches a driver-side group-size distribution") {
    import org.apache.spark.sql.functions._
    val r = AnalyticQueries.qSkewStats.run(spark, dir).collect().head
    val counts = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").count().collect().map(_.getLong(1)).sorted
    assert(r.getAs[Long]("n_keys") === counts.length.toLong)
    assert(r.getAs[Long]("n_rows") === counts.sum)
    assert(r.getAs[Long]("max_cnt") === counts.max)
    def disc(p: Int): Long = counts((counts.length * p + 99) / 100 - 1)
    assert(r.getAs[Long]("p50_cnt") === disc(50))
    assert(r.getAs[Long]("p99_cnt") === disc(99))
    val mean = counts.sum / counts.length
    assert(r.getAs[Long]("skew_ratio_e2") === counts.max * 100 / mean)
  }

  test("q_seq_match reproduces a driver-side regex over ordered timelines") {
    import org.apache.spark.sql.functions._
    val r = AnalyticQueries.qSeqMatch.run(spark, dir).collect().head
    val seqs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("i"))
      .collect()
      .map(row => (row.getLong(0), row.getTimestamp(1).getTime,
        row.getLong(2), row.getString(3)))
      .groupBy(_._1)
      .map { case (_, evs) =>
        evs.sortBy(e => (e._2, e._3)).map(_._4).mkString
      }.toSeq
    assert(r.getAs[Long]("n_users") === seqs.length.toLong)
    def cnt(re: String): Long = seqs.count(_.matches(s".*$re.*")).toLong
    assert(r.getAs[Long]("n_view_click_purchase") === cnt("v.*c.*p"))
    assert(r.getAs[Long]("n_click_right_after_view") === cnt("vc"))
    assert(r.getAs[Long]("n_triple_error_run") === cnt("eee"))
  }

  test("q_quantiles_exact matches a driver-side sorted order statistic") {
    import org.apache.spark.sql.functions._
    val rows = AnalyticQueries.qQuantilesExact.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val byStatus = graft.Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        graft.queries.Q.cents(col("o_totalprice")).as("v"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).sorted }
    rows.foreach { r =>
      val vs = byStatus(r.getAs[String]("o_orderstatus"))
      assert(r.getAs[Long]("n_orders") === vs.length.toLong)
      def disc(p: Int): Long = vs((vs.length * p + 99) / 100 - 1)
      assert(r.getAs[Long]("p50_cents") === disc(50), s"p50 mismatch in $r")
      assert(r.getAs[Long]("p90_cents") === disc(90), s"p90 mismatch in $r")
      assert(r.getAs[Long]("p99_cents") === disc(99), s"p99 mismatch in $r")
    }
  }
}
