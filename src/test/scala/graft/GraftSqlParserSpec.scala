package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftSqlParser

/** Parser-extension specs: the GRAFT statement round-trips to the same
  * result as the Scala API and plans the custom exec; everything that is
  * not a GRAFT statement (including malformed GRAFT prefixes) delegates to
  * Spark's parser untouched. */
class GraftSqlParserSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def views(): Unit = {
    val ev = Tables.events(spark, sf)
    ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
      .createOrReplaceTempView("psp_probes")
    ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      .withColumnRenamed("ts", "click_ts")
      .createOrReplaceTempView("psp_quotes")
  }

  test("GRAFT ASOF JOIN parses, plans BroadcastAsOfJoin, equals the Scala API") {
    views()
    val viaSql = spark.sql(
      "GRAFT ASOF JOIN psp_probes, psp_quotes ON user_id " +
        "MATCH ts TO click_ts VALUES click_value")
    assert(viaSql.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"),
      viaSql.queryExecution.executedPlan.toString)
    val viaApi = graft.plans.AsOfJoin(
      spark.table("psp_probes"), spark.table("psp_quotes"),
      Seq("user_id"), "ts", "click_ts", Seq("click_value"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    assert(viaSql.count() === spark.table("psp_probes").count(),
      "as-of join must preserve every probe row")
  }

  test("statement is case-insensitive and tolerates whitespace/semicolon") {
    views()
    val df = spark.sql(
      "  graft asof join psp_probes , psp_quotes on user_id\n" +
        "match ts to click_ts values click_value ; ")
    assert(df.columns.toSeq === Seq("event_id", "user_id", "ts", "click_value"))
  }

  test("non-GRAFT SQL delegates verbatim; malformed GRAFT fails in the delegate") {
    assert(spark.sql("SELECT 1 AS x").collect().map(_.getInt(0)).toSeq === Seq(1))
    // missing MATCH clause → not our statement → Spark's parser rejects it
    intercept[Exception] {
      spark.sql("GRAFT ASOF JOIN a, b ON k VALUES v")
    }
  }

  test("parseGraftStatement extracts multi-key, multi-value lists") {
    val plan = GraftSqlParser.parseGraftStatement(
      "GRAFT ASOF JOIN l, r ON k1, k2 MATCH lts TO rts VALUES v1, v2, v3")
    val u = plan.get.asInstanceOf[graft.plans.UnresolvedAsOfJoin]
    assert(u.keys === Seq("k1", "k2"))
    assert(u.leftTs === "lts" && u.rightTs === "rts")
    assert(u.values === Seq("v1", "v2", "v3"))
    assert(GraftSqlParser.parseGraftStatement("SELECT 1").isEmpty)
  }

  test("unknown relation in a GRAFT statement fails analysis like plain SQL") {
    intercept[Exception] {
      spark.sql("GRAFT ASOF JOIN no_such_view_xyz, psp_quotes ON user_id " +
        "MATCH ts TO click_ts VALUES click_value").collect()
    }
  }
}
