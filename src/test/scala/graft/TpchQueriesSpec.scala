package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.queries.TpchQueries

/** TPC-H wave-3 specs: results are non-degenerate at sf0.001/sf0.01 and the
  * plans keep the shapes that matter at scale (top-20 as TakeOrdered, one
  * aggregation pass for Q14, broadcast dims for Q5). Value-level parity is
  * the DuckDB gate's job; these lock the physical properties. */
class TpchQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q_tpch_q4 plans the existence probe as a left-semi join") {
    val df = TpchQueries.qTpchQ4.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS not planned as semi join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
  }

  test("q_tpch_q8 share is consistent with its own numerator/denominator") {
    val rows = TpchQueries.qTpchQ8.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (share, n, t) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t > 0 && n >= 0 && n <= t)
      assert(share == math.round(n.toDouble * 1e4 / t.toDouble))
    }
  }

  test("q_tpch_q13 distribution sums back to the full customer count") {
    val rows = TpchQueries.qTpchQ13.run(spark, sf).collect()
    val nCustomers = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nCustomers)
  }

  test("q_tpch_q15 returns exactly the max-revenue supplier(s)") {
    val rows = TpchQueries.qTpchQ15.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(2)).distinct
    assert(revs.length === 1, "all returned suppliers must share the max revenue")
  }

  test("q_tpch_q17 small-quantity revenue is a strict subset of total") {
    val r = TpchQueries.qTpchQ17.run(spark, sf).collect().head
    assert(r.getLong(1) > 0)
    val total = Tables.lineitem(spark, sf).count()
    assert(r.getLong(1) < total, "threshold must actually filter")
  }

  test("q_tpch_q5 returns one row per in-region nation, revenue descending") {
    val rows = TpchQueries.qTpchQ5.run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5) // 5 nations in ASIA
    val revs = rows.map(_.getLong(1))
    assert(revs.sameElements(revs.sortBy(-_: Long)))
    assert(revs.forall(_ > 0))
  }

  test("q_tpch_q5 broadcasts nation/region/supplier dims") {
    val plan = TpchQueries.qTpchQ5.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q_tpch_q7 covers both directions and both years") {
    val rows = TpchQueries.qTpchQ7.run(spark, sf).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).distinct
    assert(pairs.toSet == Set(("NATION_2", "NATION_7"), ("NATION_7", "NATION_2")))
    val years = rows.map(_.getInt(2)).distinct.sorted
    assert(years.sameElements(Array(1996, 1997)))
  }

  test("q_tpch_q10 plans its top-20 as TakeOrdered, not a global sort") {
    val df = TpchQueries.qTpchQ10.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-20 not TakeOrdered:\n$plan")
    val rows = df.collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getLong(2))
    assert(revs.sameElements(revs.sortBy(-_: Long)))
  }

  test("q_tpch_q14 computes promo share in a single aggregation pass") {
    val df = TpchQueries.qTpchQ14.run(spark, sf)
    val nAggExchanges = {
      val p = df.queryExecution.executedPlan
      val s = p.toString
      // one partial+final pair → exactly one shuffle for the aggregate
      s.linesIterator.count(_.contains("Exchange"))
    }
    assert(nAggExchanges <= 2, "Q14 should be one aggregation pass (≤1 data exchange + AQE reads)")
    val r = df.collect().head
    val (ratio, promo, total) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(total > 0 && promo >= 0 && promo <= total)
    assert(ratio == math.round(promo.toDouble * 1e4 / total.toDouble))
  }

  test("q_tpch_q18 finds only orders above the quantity threshold") {
    val rows = TpchQueries.qTpchQ18.run(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(5) > 250))
  }

  test("q_tpch_q19 matches an independently-computed branch union") {
    val r = TpchQueries.qTpchQ19.run(spark, sf).collect().head
    assert(r.getLong(1) > 0 && r.getLong(0) > 0)
    // independent recomputation: sum of per-branch revenue minus overlaps
    // (branches are brand-disjoint, so the union is a plain sum)
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val prt = Tables.part(spark, sf)
    val joined = li.join(prt, col("l_partkey") === col("p_partkey"))
    def branch(b: String, sLo: Int, sHi: Int, qLo: Int, qHi: Int) =
      joined.where(col("p_brand") === b && col("p_size").between(sLo, sHi) &&
          col("l_quantity").between(qLo, qHi))
        .agg(coalesce(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")), lit(0L)))
        .collect().head.getLong(0)
    val expected = branch("Brand#1", 1, 15, 1, 20) +
      branch("Brand#13", 10, 30, 10, 35) + branch("Brand#20", 20, 50, 20, 50)
    assert(r.getLong(0) == expected)
  }
}
