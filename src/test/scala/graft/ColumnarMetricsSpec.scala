package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.plans.BatchStatsExec

/** The injectColumnarRule hook: BatchStatsExec wraps vectorized scans only
  * when asked, counts exactly the rows that flow, and stays out of every
  * plan when the flag is off (the production default). */
class ColumnarMetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def statsNodes(plan: SparkPlan): Seq[BatchStatsExec] = {
    val expanded = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    expanded.collect { case b: BatchStatsExec => b }
  }

  test("flag off (default): no BatchStatsExec in any plan") {
    val df = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    df.collect()
    assert(statsNodes(df.queryExecution.executedPlan).isEmpty)
  }

  test("flag on: scans are wrapped, batch/row metrics add up, results unchanged") {
    spark.conf.set("spark.graft.columnar.metrics", "true")
    try {
      val df = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
      val n = df.collect().length
      assert(n > 0)
      val nodes = statsNodes(df.queryExecution.executedPlan)
      assert(nodes.nonEmpty, "vectorized scan not wrapped by BatchStatsExec")
      val rows = nodes.map(_.metrics("numOutputRows").value).sum
      val batches = nodes.map(_.metrics("numBatches").value).sum
      assert(rows === n, s"columnar row count $rows != collected $n")
      assert(batches >= 1 && batches <= rows)
      // the wrapper must not change values: compare against the unwrapped run
      spark.conf.unset("spark.graft.columnar.metrics")
      val plain = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").collect()
      spark.conf.set("spark.graft.columnar.metrics", "true")
      val wrapped = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").collect()
      assert(plain.sameElements(wrapped))
    } finally spark.conf.unset("spark.graft.columnar.metrics")
  }
}
