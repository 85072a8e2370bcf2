package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew-join handling: a pathologically skewed sort-merge join
  * must execute with the skewed partition SPLIT (SMJ marked `skew=true`)
  * instead of one straggler task — the runtime complement to the manual
  * two-phase salting in SkewOps (which remains the tool when the skew is
  * known ahead of time, e.g. q_salted_join_revenue). */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime (SMJ skew=true)") {
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val pad = "x" * 100
      // 50k rows on key 0 (one hot shuffle partition), 5k spread over 50 keys
      val fact = spark.range(0, 55000)
        .select(when($"id" < 50000, lit(0L)).otherwise($"id" % 50).as("k"),
          concat(lit(pad), $"id".cast("string")).as("payload"))
      val dim = spark.range(0, 50).select($"id".as("k"), ($"id" * 7).as("v"))

      val joined = fact.join(dim, "k")
      // materialize THIS queryExecution (count() would build its own plan
      // and leave joined's adaptive plan un-finalized)
      assert(joined.collect().length === 55000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-split SMJ in final plan:\n$finalPlan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
