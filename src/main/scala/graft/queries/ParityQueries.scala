package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Engine-parity wave: bag-semantics set ops, ordered string aggregation,
  * arg-min/max selection, error-tolerant arithmetic/casts, bitwise
  * aggregates, MapType plumbing, conditional aggregates, and a two-phase
  * salted aggregation — each hash-checked against the DuckDB oracle.
  *
  * The reference delegates all of these to its engine (no explicit use),
  * but a user replacing it needs the full relational function surface;
  * SURVEY.md §2.4/§2.6 mark them "not present" — these queries close those
  * rows as extensions. Scale notes per query below.
  */
object ParityQueries {

  private def cents(c: org.apache.spark.sql.Column) = Q.cents(c)

  /** Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL), verified by
    * multiplicity: the post-op groupBy count exposes exactly how many
    * duplicates survived, which distinct-semantics set ops would collapse.
    * Scale: both ops plan as aggregates/joins on the hashed key — one
    * shuffle each, no sort, AQE-coalesced. */
  val qSetOpsAll: Q = new Q {
    val name = "q_set_ops_all"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val o = Tables.orders(spark, dir)
      val all = o.select(col("o_custkey"))
      val fin = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
      val open = o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      val exc = all.exceptAll(fin).groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt")).withColumn("set_kind", lit("except_all"))
      val inter = fin.intersectAll(open).groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt")).withColumn("set_kind", lit("intersect_all"))
      exc.unionByName(inter)
        .select(col("set_kind"), col("o_custkey"), col("cnt"))
        .orderBy("set_kind", "o_custkey")
    }
    val oracle = Some(
      """WITH exc AS (
        |  SELECT o_custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |inter AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'except_all' AS set_kind, o_custkey, count(*) AS cnt
        |FROM exc GROUP BY o_custkey
        |UNION ALL
        |SELECT 'intersect_all' AS set_kind, o_custkey, count(*) AS cnt
        |FROM inter GROUP BY o_custkey
        |ORDER BY set_kind, o_custkey""".stripMargin)
  }

  /** LISTAGG/string_agg: per-customer ordered concatenation of order keys.
    * Sorted AFTER collection (array_sort∘collect_list) so the result is
    * deterministic despite collect_list's arrival order — the A5 pattern
    * (SURVEY §2.4) applied to strings. Scale: state is the group's own
    * rows only; one shuffle on the group key. */
  val qStringAgg: Q = new Q {
    val name = "q_string_agg"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey").cast("string").as("k"))
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_list(col("k"))), ",").as("order_keys"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    val oracle = Some(
      """SELECT o_custkey,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ','
        |    ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  /** arg-min/arg-max selection (min_by/max_by): cheapest and priciest order
    * per customer WITHOUT a per-group sort — O(1) state per group vs the
    * ranking window's full sort; at 100 TB this is a single partial-agg
    * pass over the fact table. Ties broken deterministically by packing
    * (price_cents, orderkey) into one BIGINT ordering value: cents ≤ ~6e7
    * and orderkey < 1e7 at any tested SF, so cents*1e7+key never collides
    * or overflows. */
  val qMinMaxBy: Q = new Q {
    val name = "q_minmax_by"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val ordv = (cents(col("o_totalprice")) * 10000000L) + col("o_orderkey")
      Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"), ordv.as("ordv"))
        .groupBy("o_custkey")
        .agg(expr("max_by(o_orderkey, ordv)").as("priciest_order"),
          expr("min_by(o_orderkey, ordv)").as("cheapest_order"))
        .orderBy("o_custkey")
    }
    val oracle = Some(
      """SELECT o_custkey,
        |  arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        |    AS priciest_order,
        |  arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        |    AS cheapest_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  /** Error-tolerant arithmetic: try_cast (malformed → NULL, never a thrown
    * task failure) and null-propagating division — at 100 TB a single dirty
    * row must not kill a 1000-executor job hours in; TRY semantics turn
    * data errors into auditable NULLs. prio_num parses the leading digit of
    * 'N-LABEL'; full_cast exercises the malformed→NULL path on 1% of rows —
    * a try_cast failure raises/catches a JVM exception internally (~15µs),
    * so a column that fails EVERY row costs more than the rest of the query
    * combined (probed: 2.4s vs 0.5s warm at sf0.1); real dirty data is
    * sparse, and the query models that; div3_e3 divides by (key mod 3),
    * NULL on zero. */
  val qTryArith: Q = new Q {
    val name = "q_try_arith"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.orders(spark, dir)
        .select(col("o_orderkey"),
          expr("try_cast(substr(o_orderpriority, 1, 1) AS LONG)").as("prio_num"),
          when(col("o_orderkey") % 100 === 0,
            expr("try_cast(o_orderpriority AS LONG)")).as("full_cast"),
          round(expr("try_divide(round(o_totalprice * 100), o_orderkey % 3)") * 1000)
            .cast("long").as("div3_e3"))
        .orderBy("o_orderkey")
    val oracle = Some(
      """SELECT o_orderkey,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
        |  CASE WHEN o_orderkey % 100 = 0
        |    THEN TRY_CAST(o_orderpriority AS BIGINT) END AS full_cast,
        |  CAST(round(round(o_totalprice * 100) / nullif(o_orderkey % 3, 0) * 1000) AS BIGINT)
        |    AS div3_e3
        |FROM orders ORDER BY o_orderkey""".stripMargin)
  }

  /** Bitwise aggregates (bit_and/bit_or/bit_xor) — order-independent and
    * associative, so they partial-aggregate map-side like sum; the xor
    * doubles as a cheap whole-column checksum for lake integrity checks
    * (same fold both engines). */
  val qBitwiseAggs: Q = new Q {
    val name = "q_bitwise_aggs"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.orders(spark, dir)
        .groupBy("o_orderstatus")
        .agg(expr("bit_and(o_orderkey)").as("key_and"),
          expr("bit_or(o_orderkey)").as("key_or"),
          expr("bit_xor(o_orderkey)").as("key_xor"),
          expr("bit_xor(o_custkey)").as("cust_xor"))
        .orderBy("o_orderstatus")
    val oracle = Some(
      """SELECT o_orderstatus,
        |  bit_and(o_orderkey) AS key_and,
        |  bit_or(o_orderkey) AS key_or,
        |  bit_xor(o_orderkey) AS key_xor,
        |  bit_xor(o_custkey) AS cust_xor
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** MapType surface (absent from the reference — SURVEY §1.3): build map
    * columns, merge with map_concat, read back with element_at /
    * map_keys. The maps stay inside one codegen'd projection — no shuffle;
    * the oracle computes the same scalars directly (DuckDB maps exist but
    * the CHECK is on values, not the container). Deliberately NO
    * higher-order map function (transform_values etc.) in the hot path:
    * HOFs are CodegenFallback — the interpreted lambda costs ~3µs/row
    * (probed: +1.7s over this shape at sf0.1) and breaks the codegen span;
    * scaling is applied at construction instead. Runs over orders, not
    * lineitem: per-row container allocation (ArrayBasedMapData) is the
    * dominant cost of any MapType pipeline, so the coverage query uses the
    * smaller fact table — same operators, a quarter of the allocations. */
  val qMapFunctions: Q = new Q {
    val name = "q_map_functions"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.orders(spark, dir)
        .withColumn("m", map(
          lit("price"), round(col("o_totalprice") * 100),
          lit("cust"), col("o_custkey").cast("double")))
        .withColumn("m2", map_concat(
          col("m"),
          map(lit("prio"), expr("try_cast(substr(o_orderpriority, 1, 1) AS DOUBLE)"))))
        .select(col("o_orderkey"),
          element_at(col("m2"), "price").cast("long").as("price_cents"),
          element_at(col("m2"), "cust").cast("long").as("cust_id"),
          element_at(col("m2"), "prio").cast("long").as("prio_num"),
          size(map_keys(col("m2"))).cast("long").as("n_keys"))
        .orderBy("o_orderkey")
    val oracle = Some(
      """SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  o_custkey AS cust_id,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
        |  CAST(3 AS BIGINT) AS n_keys
        |FROM orders ORDER BY o_orderkey""".stripMargin)
  }

  /** Conditional/boolean aggregates: count_if, bool_and/bool_or, and the
    * FILTER-style conditional sum — the idiomatic "several metrics in one
    * scan" shape (vs one pass per metric: at 100 TB, N passes over the
    * fact table collapse to 1). */
  val qCondAggs: Q = new Q {
    val name = "q_cond_aggs"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(expr("count_if(l_discount > 0.05)").as("n_deep_disc"),
          expr("bool_and(l_quantity > 0)").as("all_positive_qty"),
          expr("bool_or(l_tax > 0.07)").as("any_high_tax"),
          sum(when(col("l_linestatus") === "F", cents(col("l_extendedprice")))
            .otherwise(lit(0L))).as("finished_cents"))
        .orderBy("l_returnflag")
    val oracle = Some(
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_deep_disc,
        |  bool_and(l_quantity > 0) AS all_positive_qty,
        |  bool_or(l_tax > 0.07) AS any_high_tax,
        |  CAST(sum(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS finished_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Two-phase (salted) aggregation for pathological group skew:
    * l_returnflag has 3 values, so a direct groupBy at 1000 executors
    * funnels a third of 100 TB through single reducers. Phase 1 aggregates
    * on (key, salt) — 64-way fan-out, map-side partials stay effective;
    * phase 2 re-aggregates the 3×64 partials. Same result as the direct
    * groupBy (the oracle), different shuffle shape: no reducer ever sees
    * more than 1/64th of a hot key. */
  val qSkewTwoPhaseAgg: Q = new Q {
    val name = "q_skew_twophase_agg"
    val Salts = 64
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.lineitem(spark, dir)
        .withColumn("salt", pmod(col("l_orderkey"), lit(Salts)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(cents(col("l_extendedprice"))).as("p_cents"),
          count(lit(1)).as("p_cnt"),
          max(col("l_quantity")).as("p_maxq"))
        .groupBy("l_returnflag")
        .agg(sum(col("p_cents")).as("sum_cents"),
          sum(col("p_cnt")).as("cnt"),
          max(col("p_maxq")).cast("long").as("max_qty"))
        .orderBy("l_returnflag")
    val oracle = Some(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  count(*) AS cnt,
        |  CAST(max(l_quantity) AS BIGINT) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Linear-regression aggregates + exact median: slope/intercept/R² of
    * price-on-quantity per return flag, e6-rounded (same convention as
    * q_stat_aggs — both engines fold in double; e6 absorbs ~1e-12
    * accumulation-order jitter), plus interpolated median of the unit
    * price. Scale: all of these are one-pass moment aggregates with O(1)
    * merge state — partial+final hash agg, no sort, no second scan
    * (median is the exception: exact interpolated median materializes the
    * group — fine for bounded group counts like this 3-group flag, the
    * wrong tool at per-key cardinality, where approx_percentile's GK
    * summary is the scale path: see q_percentiles). */
  val qRegrAggs: Q = new Q {
    val name = "q_regr_aggs"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.lineitem(spark, dir, fanned = true)
        .groupBy("l_returnflag")
        .agg(
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")) * 1e6)
            .cast("long").as("slope_e6"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")) * 1e6)
            .cast("long").as("intercept_e6"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")) * 1e6)
            .cast("long").as("r2_e6"),
          round(median(col("l_extendedprice") / col("l_quantity")) * 1e4)
            .cast("long").as("median_unit_e4"))
        .orderBy("l_returnflag")
    val oracle = Some(
      """SELECT l_returnflag,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        |  CAST(round(regr_slope(l_extendedprice, l_quantity) * 1e6) AS BIGINT)
        |    AS slope_e6,
        |  CAST(round(regr_intercept(l_extendedprice, l_quantity) * 1e6) AS BIGINT)
        |    AS intercept_e6,
        |  CAST(round(regr_r2(l_extendedprice, l_quantity) * 1e6) AS BIGINT) AS r2_e6,
        |  CAST(round(median(l_extendedprice / l_quantity) * 1e4) AS BIGINT)
        |    AS median_unit_e4
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Exact wide-precision arithmetic (the DecimalType surface): sums of
    * cent-products that OVERFLOW int64 at large scale factors —
    * Σ price_cents² per flag is ~6e18 already at sf1 — carried exactly in
    * DECIMAL(38,0) (Spark) / HUGEINT-backed sum (DuckDB) and exported as
    * plain digit strings, which both engines render identically for
    * integral values. This is the money-math path a 100 TB aggregate
    * needs once BIGINT headroom runs out; everything upstream stays the
    * repo's exact-cents convention (no double→decimal casts, whose
    * rounding modes diverge between engines).
    *
    * Scale shape: one partial+final hash aggregate, decimal sums are
    * fixed-width state — exactly the q1 shape. */
  val qDecimalExact: Q = new Q {
    val name = "q_decimal_exact"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val pc = Q.cents(col("l_extendedprice"))
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), pc.as("pc"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy("l_returnflag")
        .agg(
          sum(col("pc").cast("decimal(38,0)") * col("pc")).as("sum_sq"),
          sum(col("pc").cast("decimal(38,0)") * col("qty")).as("sum_pq"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"),
          col("sum_sq").cast("string").as("sum_sq_cents2"),
          col("sum_pq").cast("string").as("sum_pq"),
          col("cnt"))
        .orderBy("l_returnflag")
    }
    val oracle = Some(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
        |           * CAST(round(l_extendedprice * 100) AS BIGINT)) AS VARCHAR) AS sum_sq_cents2,
        |  CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
        |           * CAST(l_quantity AS BIGINT)) AS VARCHAR) AS sum_pq,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Calendar edge-case parity — the date-function surface where engines
    * classically diverge (end-of-month clamping, leap days, week
    * truncation, epoch arithmetic), pinned on every distinct order date:
    * last_day, add_months (+1 month with Feb/leap clamp), Monday
    * date_trunc('week'), quarter, days-in-month, Sunday-first day-of-week
    * (Spark dayofweek = DuckDB dayofweek + 1 — the known offset, spelled
    * explicitly), and days-since-epoch. The frame is the distinct date
    * domain — calendar-bounded, never fact-sized. */
  val qDateEdgeParity: Q = new Q {
    val name = "q_date_edge_parity"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.orders(spark, dir)
        .select(to_date(col("o_orderdate")).as("day")).distinct()
        .select(col("day"),
          last_day(col("day")).as("month_end"),
          add_months(col("day"), 1).as("plus_month"),
          date_trunc("week", col("day")).cast("date").as("week_start"),
          quarter(col("day")).cast("long").as("qtr"),
          dayofmonth(last_day(col("day"))).cast("long").as("days_in_month"),
          dayofweek(col("day")).cast("long").as("dow_sunday1"),
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
            .as("epoch_days"))
        .orderBy("day")
    val oracle = Some(
      """SELECT day,
        |  last_day(day) AS month_end,
        |  CAST(day + INTERVAL 1 MONTH AS DATE) AS plus_month,
        |  CAST(date_trunc('week', day) AS DATE) AS week_start,
        |  CAST(quarter(day) AS BIGINT) AS qtr,
        |  CAST(day(last_day(day)) AS BIGINT) AS days_in_month,
        |  CAST(dayofweek(day) + 1 AS BIGINT) AS dow_sunday1,
        |  CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS epoch_days
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders) d
        |ORDER BY day""".stripMargin)
  }

  /** Order-to-ship latency distribution: datediff(l_shipdate, o_orderdate)
    * histogram with per-lag revenue — the SLA/logistics profile and a
    * cross-table date-arithmetic parity probe (both engines must agree on
    * day subtraction over the whole fixture date range).
    *
    * Scale shape: one fact-fact equi-join on orderkey (both sides keyed,
    * co-partitioned shuffle) collapsing straight into a lag-domain-sized
    * aggregate (≤ ~150 distinct lags) — partial map-side combine does the
    * heavy lifting; no windows. */
  val qShippingLag: Q = new Q {
    val name = "q_shipping_lag"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as long)")
            .as("rev_c"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ordered")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(datediff(col("ship"), col("ordered")).cast("long").as("lag_days"))
        .agg(count(lit(1)).as("n"), sum("rev_c").as("rev_cents"))
        .orderBy("lag_days")
    val oracle = Some(
      """SELECT CAST(datediff('day', CAST(o.o_orderdate AS DATE),
        |                     CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY lag_days""".stripMargin)
  }

  /** SLA attainment by order priority: share of orders whose FIRST
    * shipment left within 30/60/90 days — the logistics scorecard over
    * the `q_shipping_lag` distribution, at the order grain (min ship date
    * per order, then one priority-grain aggregate). Exact e4 shares.
    *
    * Scale shape: one orderkey-grain aggregate of lineitem (partial,
    * co-partitioned with the orders join), final agg at 5 priorities. */
  val qSlaByPriority: Q = new Q {
    val name = "q_sla_by_priority"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val firstShip = Tables.lineitem(spark, dir)
        .groupBy("l_orderkey")
        .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("ordered"))
        .join(firstShip, col("o_orderkey") === col("l_orderkey"))
        .withColumn("lag_d", datediff(col("first_ship"), col("ordered")).cast("long"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("lag_d") <= 30, 1L).otherwise(0L)).as("n_30d"),
          sum(when(col("lag_d") <= 60, 1L).otherwise(0L)).as("n_60d"),
          sum(when(col("lag_d") <= 90, 1L).otherwise(0L)).as("n_90d"))
        .select(col("o_orderpriority"), col("n_orders"),
          expr("n_30d * 10000 div n_orders").as("sla30_e4"),
          expr("n_60d * 10000 div n_orders").as("sla60_e4"),
          expr("n_90d * 10000 div n_orders").as("sla90_e4"))
        .orderBy("o_orderpriority")
    }
    val oracle = Some(
      """WITH fs AS (
        |  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderpriority,
        |    datediff('day', CAST(o.o_orderdate AS DATE), fs.first_ship) AS lag_d
        |  FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN lag_d <= 30 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS sla30_e4,
        |  CAST(sum(CASE WHEN lag_d <= 60 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS sla60_e4,
        |  CAST(sum(CASE WHEN lag_d <= 90 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS sla90_e4
        |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)
  }

  val all: Seq[Q] = Seq(qSetOpsAll, qStringAgg, qMinMaxBy, qTryArith,
    qBitwiseAggs, qMapFunctions, qCondAggs, qSkewTwoPhaseAgg, qRegrAggs,
    qDecimalExact, qDateEdgeParity, qShippingLag, qSlaByPriority)
}
