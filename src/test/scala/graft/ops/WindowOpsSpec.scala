package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "a"),
    (1L, ts("2024-01-03 09:00:00"), "b"),
    (1L, ts("2024-01-03 09:00:00"), "c"), // ts tie → id-ordered
    (2L, ts("2024-01-02 00:00:00"), "d"))
    .zipWithIndex.map { case ((u, t, v), i) => (u, t, v, i.toLong) }
    .toDF("user_id", "ts", "v", "event_id")

  test("latestPerKey picks newest row, ties broken by event_id desc") {
    val got = WindowOps.latestPerKey(events, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "c", 2L -> "d"))
  }

  test("firstPerKey picks oldest row") {
    val got = WindowOps.firstPerKey(events, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "d"))
  }

  test("topKPerKey returns k rows in rank order") {
    val got = WindowOps.topKPerKey(events, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc), 2)
      .where(col("user_id") === 1L).orderBy("__rn")
      .select("v").as[String].collect().toSeq
    assert(got === Seq("c", "b"))
  }

  test("gapDaysToNext computes day gaps, null on last visit") {
    val visits = Seq((1L, "2024-01-01"), (1L, "2024-01-04"), (1L, "2024-01-05"))
      .toDF("user_id", "d").withColumn("d", col("d").cast("date"))
    val got = WindowOps.gapDaysToNext(visits, Seq("user_id"), "d")
      .orderBy("d").select("gap_days").collect().map(r => Option(r.get(0))).toSeq
    assert(got === Seq(Some(3), Some(1), None))
  }

  test("sessionize splits on gaps above the threshold") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0L),
      (1L, ts("2024-01-01 10:10:00"), 1L), // same session
      (1L, ts("2024-01-01 11:30:00"), 2L), // > 30 min → new session
      (2L, ts("2024-01-01 00:00:00"), 3L))
      .toDF("user_id", "ts", "event_id")
    val got = WindowOps.sessionize(df, Seq("user_id"), "ts",
      Seq(col("ts"), col("event_id")), 1800L * 1000000)
      .orderBy("event_id").select("session_idx").as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, 1L, 0L))
  }
}
