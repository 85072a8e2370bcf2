package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.JoinOps

/** Advanced join / grouping operator coverage: as-of (point-in-time)
  * lookup, time-radius join, semi/anti joins, rollup grouping sets,
  * distinct aggregation, and nested-struct access via from_json (the
  * reference's `event.X` projections — P1 in SURVEY.md §2.2 — re-created
  * from the JSON props column since the test tables are flat). */
object JoinQueries {

  /** As-of: for each purchase, the user's latest click at-or-before it
    * (union+window merge — one shuffle, no range explosion). */
  val qAsofClick: Q = new Q {
    val name = "q_asof_click_before_purchase"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val ev = Tables.events(spark, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click").select("user_id", "ts")
      JoinOps.asofLookup(purchases, clicks, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("last_click_ts"))
        .orderBy("event_id")
    }
    val oracle = Some(
      """SELECT p.event_id, p.user_id, p.ts,
        |  (SELECT max(c.ts) FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) AS last_click_ts
        |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin)
  }

  /** Time-radius join: errors within ±30 min of each signup, counted —
    * bucketed equi-join (the scale path), exact residual filter. */
  val qRangeErrors: Q = new Q {
    val name = "q_range_errors_near_signup"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val ev = Tables.events(spark, dir)
      val signups = ev.where(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("r_id"), col("ts").as("r_ts"))
      val joined = JoinOps.timeRadiusJoin(signups, errors, "ts", "r_ts", 1800000000L)
        .groupBy("event_id").agg(count(col("r_id")).as("n_errors"))
      signups.join(joined, Seq("event_id"), "left")
        .na.fill(0L, Seq("n_errors"))
        .select("event_id", "user_id", "n_errors")
        .orderBy("event_id")
    }
    val oracle = Some(
      """SELECT s.event_id, s.user_id, count(e.event_id) AS n_errors
        |FROM events s LEFT JOIN events e
        |  ON e.event_type = 'error'
        | AND abs(epoch_us(e.ts) - epoch_us(s.ts)) <= 1800000000
        |WHERE s.event_type = 'signup'
        |GROUP BY s.event_id, s.user_id ORDER BY s.event_id""".stripMargin)
  }

  /** Semi/anti join: per-customer order-existence flag (semi ∪ anti). */
  val qSemiAnti: Q = new Q {
    val name = "q_semi_anti_customers"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(spark, dir).select(col("o_custkey"))
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .withColumn("has_order", lit(1))
      val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .withColumn("has_order", lit(0))
      withO.unionByName(withoutO).orderBy("c_custkey")
    }
    val oracle = Some(
      """SELECT c_custkey, c_mktsegment,
        |  CAST(EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS INT) AS has_order
        |FROM customer ORDER BY c_custkey""".stripMargin)
  }

  /** ROLLUP grouping sets over order year/month with grouping_id. */
  val qRollup: Q = new Q {
    val name = "q_rollup_orders"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.orders(spark, dir)
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .withColumn("mo", month(col("o_orderdate")).cast("long"))
        .rollup("yr", "mo")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("yr"), lit(-1L)).as("yr"),
          coalesce(col("mo"), lit(-1L)).as("mo"), col("n"), col("total_cents"), col("gid"))
        .orderBy("gid", "yr", "mo")
    val oracle = Some(
      """SELECT coalesce(yr, -1) AS yr, coalesce(mo, -1) AS mo,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(GROUPING(yr, mo) AS BIGINT) AS gid
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |             CAST(month(o_orderdate) AS BIGINT) AS mo, o_totalprice
        |      FROM orders) t
        |GROUP BY ROLLUP(yr, mo)
        |ORDER BY gid, yr, mo""".stripMargin)
  }

  /** Hot-key-salted equi-join at the oracle gate: lineitem⋈orders with the
    * join key spread over 8 salts (SkewOps.saltedJoin — the right side is
    * replicated per salt, so one hot orderkey fans across 8 tasks instead
    * of one straggler). The oracle is the PLAIN join — proving the salted
    * plan changes distribution, never semantics. */
  val qSaltedJoin: Q = new Q {
    val name = "q_salted_join_revenue"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val l = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ops.SkewOps.saltedJoin(l, o, Seq("l_orderkey"),
          saltSource = col("l_extendedprice").cast("long"), nSalts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long")).as("revenue_cents"))
        .orderBy("o_orderpriority")
    }
    val oracle = Some(
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** CUBE grouping sets over order status × priority — all four grouping
    * combinations in one pass (rollup's lattice sibling). */
  val qCube: Q = new Q {
    val name = "q_cube_orders"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.orders(spark, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total_cents"), col("gid"))
        .orderBy("gid", "status", "priority")
    val oracle = Some(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin)
  }

  /** Exact distinct aggregation (count + sum of distinct values). */
  val qDistinctUsers: Q = new Q {
    val name = "q_distinct_users"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    val oracle = Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Nested-struct access: parse props to a struct, project through the
    * struct field (reference P1 `event.message_from` pattern). */
  val qNestedStruct: Q = new Q {
    val name = "q_nested_struct_props"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.events(spark, dir)
        .withColumn("p", from_json(col("props"), lit("k BIGINT")))
        .select(col("event_id"), col("p.k").as("k")) // struct-field projection
        .where(col("k") >= 90)
        .orderBy("event_id")
    val oracle = Some(
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
        |ORDER BY event_id""".stripMargin)
  }

  /** Set operations: INTERSECT / EXCEPT (distinct semantics) between the
    * high-balance and has-recent-order customer sets. */
  val qSetOps: Q = new Q {
    val name = "q_set_ops"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val rich = Tables.customer(spark, dir)
        .where(col("c_acctbal") > 5000).select("c_custkey")
      val active = Tables.orders(spark, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
        .select(col("o_custkey").as("c_custkey"))
      val both = rich.intersect(active).withColumn("set_kind", lit("rich_and_active"))
      val richOnly = rich.except(active).withColumn("set_kind", lit("rich_only"))
      both.unionByName(richOnly).orderBy("set_kind", "c_custkey")
    }
    val oracle = Some(
      """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |active AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |SELECT c_custkey, 'rich_and_active' AS set_kind
        |FROM (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM active) t
        |UNION ALL
        |SELECT c_custkey, 'rich_only' AS set_kind
        |FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM active) t
        |ORDER BY set_kind, c_custkey""".stripMargin)
  }

  /** Bloom-filter semi-join reduction (JoinOps.bloomPruneJoin): brand-
    * filtered parts build a broadcast Bloom filter that prunes lineitem
    * before the join shuffles. The join re-checks every survivor, so the
    * output is exactly the plain join — the oracle IS the plain join. */
  val qBloomPrune: Q = new Q {
    val name = "q_bloom_prune_join"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val dim = Tables.part(spark, dir)
        .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey", "p_brand")
      val fact = Tables.lineitem(spark, dir)
        .select(col("l_partkey"),
          round(col("l_extendedprice") * 100).cast("long").as("rev"))
      JoinOps.bloomPruneJoin(fact, dim, "l_partkey", "p_partkey",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), sum("rev").as("rev_cents"))
        .orderBy("p_brand")
    }
    val oracle = Some(
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
  }

  /** Custom-operator as-of join (graft.plans.AsOfJoin: LogicalPlan +
    * Strategy + BroadcastAsOfJoinExec via SparkSessionExtensions): each
    * purchase picks up the click value as of the latest click ≤ it. The
    * click timeline is deduped per (user, ts) so the as-of match is
    * unique; oracle is DuckDB's native ASOF LEFT JOIN. Unlike the
    * union+window formulation (q_asof_click_before_purchase), the probe
    * side is never shuffled — the timeline broadcasts. */
  val qAsofBroadcastValue: Q = new Q {
    val name = "q_asof_broadcast_value"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val ev = Tables.events(spark, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.plans.AsOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          Q.cents(col("click_value")).as("click_value_cents"))
        .orderBy("event_id")
    }
    val oracle = Some(
      """WITH clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |  CAST(round(c.click_value * 100) AS BIGINT) AS click_value_cents
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin)
  }

  /** The same broadcast as-of join, but entered through the SQL syntax
    * extension (`GRAFT ASOF JOIN … MATCH … TO … VALUES …`, injectParser +
    * resolution rule): proves the parsed statement and the Scala API are
    * one code path by checking it against the identical DuckDB ASOF
    * oracle as q_asof_broadcast_value. The timeline's timestamp keeps a
    * DIFFERENT name (click_ts) so the `MATCH ts TO click_ts` clause is
    * actually exercised. */
  val qAsofSqlSyntax: Q = new Q {
    val name = "q_asof_sql_syntax"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val ev = Tables.events(spark, dir)
      ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
        .createOrReplaceTempView("graft_asof_probes")
      ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
        .withColumnRenamed("ts", "click_ts")
        .createOrReplaceTempView("graft_asof_quotes")
      spark.sql(
        """GRAFT ASOF JOIN graft_asof_probes, graft_asof_quotes
          |ON user_id MATCH ts TO click_ts VALUES click_value""".stripMargin)
        .select(col("event_id"), col("user_id"), col("ts"),
          Q.cents(col("click_value")).as("click_value_cents"))
        .orderBy("event_id")
    }
    val oracle = Some(
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |  CAST(round(c.click_value * 100) AS BIGINT) AS click_value_cents
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin)
  }

  val all: Seq[Q] = Seq(qAsofClick, qRangeErrors, qSemiAnti, qRollup, qCube,
    qDistinctUsers, qNestedStruct, qSetOps, qSaltedJoin, qBloomPrune,
    qAsofBroadcastValue, qAsofSqlSyntax)
}
