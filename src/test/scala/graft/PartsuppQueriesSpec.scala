package graft

import org.apache.spark.sql.functions._
import graft.queries.PartsuppQueries

/** Partsupp-wave specs: the derived dimension is referentially consistent
  * with lineitem, and the five TPC-H shapes keep their scale-critical plan
  * properties (broadcast dims, decorrelated aggregates, anti/semi joins,
  * TakeOrdered limits). Value-level parity is the DuckDB gate's job. */
class PartsuppQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("derived partsupp is referentially consistent and range-bounded") {
    val ps = PartsuppQueries.partsupp(spark, sf)
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
    assert(ps.count() === pairs.count(), "one partsupp row per traded pair")
    assert(ps.join(pairs, Seq("ps_partkey", "ps_suppkey"), "left_anti").isEmpty,
      "every partsupp pair must exist in lineitem")
    val bad = ps.where(col("ps_availqty") < 1 || col("ps_availqty") > 9999 ||
      col("ps_supplycost_cents") < 100 || col("ps_supplycost_cents") > 99999)
    assert(bad.isEmpty, "availqty/supplycost out of the TPC-H-style ranges")
  }

  test("q_tpch_q2 returns the Europe-wide minimum cost per part, as TakeOrdered") {
    val df = PartsuppQueries.qTpchQ2.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"limit not TakeOrdered:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // recompute the per-part Europe minimum independently and compare
    val euroMin = PartsuppQueries.partsupp(spark, sf)
      .join(Tables.supplier(spark, sf), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("ps_partkey").agg(min("ps_supplycost_cents").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(5) === euroMin(r.getLong(3)),
        s"part ${r.getLong(3)} not at its Europe-wide min cost")
    }
  }

  test("q_tpch_q9 star keeps dims broadcast and covers multiple nations and years") {
    val df = PartsuppQueries.qTpchQ9.run(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).distinct.length > 1, "one nation only")
    assert(rows.map(_.getLong(1)).distinct.length > 1, "one year only")
    // (nation, year) is a key of the output
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length === rows.length)
  }

  test("q_tpch_q11 keeps exactly the parts above 1/10000 of the national total") {
    val rows = PartsuppQueries.qTpchQ11.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val allParts = PartsuppQueries.partsupp(spark, sf)
      .join(Tables.supplier(spark, sf), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf).where(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = allParts.values.sum
    val expected = allParts.filter { case (_, v) => v * 10000 > total }
    assert(rows.length === expected.size, "row count differs from recompute")
    rows.foreach(r => assert(expected(r.getLong(0)) === r.getLong(1)))
  }

  test("q_tpch_q16 plans the NOT IN as a broadcast anti-join") {
    val df = PartsuppQueries.qTpchQ16.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT IN not an anti-join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nSupp = Tables.supplier(spark, sf).count()
    assert(rows.forall(r => r.getLong(3) > 0 && r.getLong(3) <= nSupp))
  }

  test("q_tpch_q20 plans the candidate probe as a semi-join over nation suppliers") {
    val df = PartsuppQueries.qTpchQ20.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"candidate probe not a semi-join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val natSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).where(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(natSupp))
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }
}
