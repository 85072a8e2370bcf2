package graft

import graft.queries.TpchFinalQueries

/** Plan-shape and invariant specs for the TPC-H closeout queries (value
  * parity is the DuckDB gate's job). */
class TpchFinalQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q_tpch_q1: single aggregation pass, averages consistent with sums") {
    val df = TpchFinalQueries.qTpchQ1.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // one partial+final pair, no join, no window
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"Q1 should be a pure aggregate:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("count_order")
      assert(n > 0)
      assert(r.getAs[Long]("avg_qty_e2") === r.getAs[Long]("sum_qty") * 100 / n)
      assert(r.getAs[Long]("avg_price_cents") === r.getAs[Long]("sum_base_price_cents") / n)
      // discounted price never exceeds base price
      assert(r.getAs[Long]("sum_disc_price_cents") <= r.getAs[Long]("sum_base_price_cents"))
      // charge (with tax) is at least the discounted price
      assert(r.getAs[Long]("sum_charge_cents") >= r.getAs[Long]("sum_disc_price_cents"))
    }
  }

  test("q_tpch_q12: high + low counts partition the late lineitems") {
    val rows = TpchFinalQueries.qTpchQ12.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("high_line_count") > 0 && r.getAs[Long]("low_line_count") > 0)
    }
  }

  test("q_tpch_q21 plans the EXISTS as left-semi and NOT EXISTS as left-anti, top-20 as TakeOrdered") {
    val df = TpchFinalQueries.qTpchQ21.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-20 is a global sort:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // ordered desc by numwait
    val waits = rows.map(_.getAs[Long]("numwait"))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b })
  }

  test("q_tpch_q22: candidates are above-average and order-less (anti join in plan)") {
    val df = TpchFinalQueries.qTpchQ22.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("numcust") > 0 &&
      r.getAs[Long]("totacctbal_cents") > 0))
  }
}
