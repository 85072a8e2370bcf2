package graft.ops

import graft.SparkSpec
import graft.queries.SourceQueries

/** Dynamic partition pruning over the month-partitioned lake layout: the
  * fact scan must carry a runtime pruning predicate on the partition
  * column (no static filter exists on the fact side), and the query's
  * values must match the unpartitioned original (the DuckDB gate's job;
  * here we check the result is non-degenerate and the plan shape). */
class DppSpec extends SparkSpec {

  test("q_dpp_month_revenue prunes fact partitions at runtime via DPP") {
    val df = SourceQueries.dppMonthRevenue.run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    val rows = df.collect()
    assert(rows.length == 6) // 1997-01 .. 1997-06
    assert(rows.map(_.getString(0)).toSeq == (1 to 6).map(m => f"1997-$m%02d"))
    assert(rows.forall(_.getLong(2) > 0))
  }
}
