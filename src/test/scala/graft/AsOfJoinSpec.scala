package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.JoinOps
import graft.plans.AsOfJoin
import graft.queries.JoinQueries

/** Custom broadcast as-of join operator (LogicalPlan + Strategy +
  * BroadcastAsOfJoinExec): edge semantics on hand-built timelines,
  * cross-implementation parity with the union+window formulation on real
  * data, and the zero-shuffle physical property that motivates it. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def timeline = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-03 00:00:00"), 30.0),
      (2L, ts("2024-01-02 00:00:00"), 20.0)
    ).toDF("k", "rts", "price")
  }

  test("picks the latest entry at-or-before each probe; null before the first") {
    import spark.implicits._
    val probes = Seq(
      (100L, 1L, ts("2024-01-02 12:00:00")), // between entries → 10.0
      (101L, 1L, ts("2024-01-03 00:00:00")), // exact tie → 30.0 (<=)
      (102L, 1L, ts("2023-12-31 00:00:00")), // before first → null
      (103L, 2L, ts("2024-06-01 00:00:00")), // after last → 20.0
      (104L, 3L, ts("2024-01-05 00:00:00"))  // unknown key → null
    ).toDF("id", "k", "lts")
    val out = AsOfJoin(probes, timeline, Seq("k"), "lts", "rts", Seq("price"))
      .orderBy("id").collect()
    assert(out.map(r => if (r.isNullAt(3)) null else r.getDouble(3)).toSeq ==
      Seq(10.0, 30.0, null, 20.0, null))
    // left columns pass through untouched
    assert(out.map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L, 104L))
  }

  test("empty timeline yields all-null values, not an error or dropped rows") {
    import spark.implicits._
    val probes = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "lts")
    val out = AsOfJoin(probes, timeline.where(lit(false)),
      Seq("k"), "lts", "rts", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("null probe timestamp matches nothing") {
    import spark.implicits._
    val probes = Seq((1L, 1L, Option.empty[Timestamp])).toDF("id", "k", "lts")
    val out = AsOfJoin(probes, timeline, Seq("k"), "lts", "rts", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("unknown columns fail fast at construction with the side named") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(timeline, timeline, Seq("nope"), "rts", "rts", Seq("price"))
    }
    assert(e.getMessage.contains("left side"))
  }

  test("agrees with the union+window formulation on sf0.01 events") {
    val dir = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("value").as("click_value"))
    val custom = AsOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_value"))
      .select(col("event_id"), col("click_value"))
    // independent formulation: window as-of ts, then join the value back
    val viaWindow = JoinOps.asofLookup(purchases, clicks.select("user_id", "ts"),
        Seq("user_id"), "ts", "ts")
      .join(clicks.withColumnRenamed("ts", "asof_ts"), Seq("user_id", "asof_ts"), "left")
      .select(col("event_id"), col("click_value"))
    assert(custom.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(custom).isEmpty)
  }

  test("probe side is never shuffled: plan has the custom exec and no Exchange") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val df = AsOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"custom exec not planned:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("exec reports SQL metrics: output rows, matched rows, build rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import graft.plans.BroadcastAsOfJoinExec
    val probes = Seq(
      (100L, 1L, ts("2024-01-02 12:00:00")),
      (101L, 2L, ts("2024-06-01 00:00:00")),
      (102L, 1L, ts("2023-12-31 00:00:00")) // miss
    ).toDF("id", "k", "lts")
    val df = AsOfJoin(probes, timeline, Seq("k"), "lts", "rts", Seq("price"))
    df.collect()
    def find(p: SparkPlan): Option[BroadcastAsOfJoinExec] = p match {
      case b: BroadcastAsOfJoinExec => Some(b)
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: QueryStageExec => find(s.plan)
      case other => other.children.iterator.flatMap(find(_)).nextOption()
    }
    val exec = find(df.queryExecution.executedPlan)
      .getOrElse(fail("BroadcastAsOfJoinExec not found in executed plan"))
    assert(exec.metrics("numOutputRows").value === 3)
    assert(exec.metrics("numMatched").value === 2)
    assert(exec.metrics("buildRows").value === 3)
  }

  test("probe-side filters push through the join into the scan; value filters stay above") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val df = AsOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_value"))
      .where(col("user_id") < 50 && col("click_value") > 1.0)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("AsOfJoinPlan"), s"as-of node missing:\n$optimized")
    // ...and reached the probe scan's pushed filters in the physical plan
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LessThan(user_id,50)"),
      s"probe filter not pushed to scan:\n$physical")
    // the value conjunct still filters above the join (left-join null semantics)
    val aboveJoin = optimized.linesIterator.takeWhile(!_.contains("AsOfJoinPlan")).mkString("\n")
    assert(aboveJoin.contains("click_value"),
      s"value filter unexpectedly moved below the join:\n$optimized")
    // results agree with filtering an unpushed equivalent
    val unpushed = AsOfJoin(purchases.where(col("user_id") < 50), clicks,
      Seq("user_id"), "ts", "ts", Seq("click_value"))
      .where(col("click_value") > 1.0)
    assert(df.exceptAll(unpushed).isEmpty && unpushed.exceptAll(df).isEmpty)
  }

  test("unused probe columns prune below the join down to the scan") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir) // 6 columns incl. value + props
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val df = AsOfJoin(ev, clicks, Seq("user_id"), "ts", "ts", Seq("click_value"))
      .select("event_id", "click_value")
    val readSchemas = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("props"),
      s"probe scan still reads unneeded columns:\n$readSchemas")
    assert(df.collect().nonEmpty)
  }

  test("build-size guard refuses an oversized timeline with actionable advice") {
    import spark.implicits._
    import graft.plans.BroadcastAsOfJoinExec
    val probes = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "lts")
    spark.conf.set(BroadcastAsOfJoinExec.MaxBuildRowsKey, "2")
    try {
      val e = intercept[Exception] {
        AsOfJoin(probes, timeline, Seq("k"), "lts", "rts", Seq("price")).collect()
      }
      // root cause may be wrapped by the scheduler
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("\n")
      assert(msgs.contains("asofLookup"), s"guard message unhelpful: $msgs")
    } finally spark.conf.unset(BroadcastAsOfJoinExec.MaxBuildRowsKey)
  }

  test("asofAuto picks broadcast for a small timeline, shuffle above threshold") {
    import graft.ops.JoinOps
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("value").as("click_value"))
    val small = JoinOps.asofAuto(purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_value"))
    assert(small.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = JoinOps.asofAuto(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_value"))
      assert(!big.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
      // both formulations agree
      assert(small.exceptAll(big).isEmpty && big.exceptAll(small).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("asofAuto formulations agree on null keys and null timeline timestamps") {
    import spark.implicits._
    import graft.ops.JoinOps
    val tl = Seq(
      (Some(1L), Some(ts("2024-01-01 00:00:00")), 10.0),
      (None, Some(ts("2024-01-02 00:00:00")), 77.0), // null-key timeline entry
      (Some(2L), Option.empty[Timestamp], 99.0)      // null-ts: never a match
    ).toDF("k", "rts", "price")
    val probes = Seq(
      (100L, Some(1L), ts("2024-06-01 00:00:00")),
      (101L, Option.empty[Long], ts("2024-06-01 00:00:00")), // null-key probe
      (102L, Some(2L), ts("2024-06-01 00:00:00"))
    ).toDF("id", "k", "lts")
    def vals(df: org.apache.spark.sql.DataFrame) = df.orderBy("id").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3))).toSeq
    val broadcastPath = vals(JoinOps.asofAuto(probes, tl, Seq("k"), "lts", "rts", Seq("price")))
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shufflePath = vals(JoinOps.asofAuto(probes, tl, Seq("k"), "lts", "rts", Seq("price")))
      assert(broadcastPath == shufflePath,
        s"formulations disagree: broadcast=$broadcastPath shuffle=$shufflePath")
      // SQL `=` semantics: a null key never matches (null-key timeline rows
      // are filtered at the API boundary), so the null-key probe gets null —
      // matching what a DuckDB ASOF join on k would produce
      assert(broadcastPath == Seq(Some(10.0), None, None))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("floating-point join keys are rejected at construction") {
    import spark.implicits._
    val probes = Seq((1L, 1.5, ts("2024-01-01 00:00:00"))).toDF("id", "k", "lts")
    val tl = Seq((1.5, ts("2024-01-01 00:00:00"), 10.0)).toDF("k", "rts", "price")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(probes, tl, Seq("k"), "lts", "rts", Seq("price"))
    }
    assert(e.getMessage.contains("floating-point"), e.getMessage)
  }

  test("asofAuto refuses a values list containing the right timestamp column") {
    import spark.implicits._
    import graft.ops.JoinOps
    val probes = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "lts")
    val tl = Seq((1L, ts("2024-01-01 00:00:00"), 10.0)).toDF("k", "rts", "price")
    val e = intercept[IllegalArgumentException] {
      JoinOps.asofAuto(probes, tl, Seq("k"), "lts", "rts", Seq("rts", "price"))
    }
    assert(e.getMessage.contains("asof_ts"), e.getMessage)
  }

  test("cataloged q_asof_broadcast_value runs and covers matched + unmatched") {
    val rows = JoinQueries.qAsofBroadcastValue.run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.exists(!_.isNullAt(3)) && rows.exists(_.isNullAt(3)))
  }
}
