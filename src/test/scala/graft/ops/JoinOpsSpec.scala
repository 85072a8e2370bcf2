package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLookup: latest right ts at-or-before each left row; null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00")), // exactly at left#1 → visible
      (1L, ts("2024-01-01 11:30:00")),
      (3L, ts("2024-01-01 08:00:00"))) // other key
      .toDF("user_id", "ts")
    val got = JoinOps.asofLookup(left, right, Seq("user_id"), "ts", "ts")
      .orderBy("user_id", "ts")
      .select("user_id", "asof_ts")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.toString))).toSeq
    assert(got === Seq(
      (1L, Some("2024-01-01 10:00:00.0")),
      (1L, Some("2024-01-01 11:30:00.0")),
      (2L, None)))
  }

  test("asofLookup preserves all left rows and columns") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "payload")).toDF("user_id", "ts", "extra")
    val right = Seq((9L, ts("2024-01-01 09:00:00"))).toDF("user_id", "ts")
    val got = JoinOps.asofLookup(left, right, Seq("user_id"), "ts", "ts")
    assert(got.columns.toSeq === Seq("user_id", "ts", "extra", "asof_ts"))
    val row = got.head()
    assert(row.getAs[String]("extra") === "payload")
    assert(row.isNullAt(3))
  }

  test("timeRadiusJoin: inclusive radius, bucket boundaries covered") {
    val radius = 60L * 1000000 // 60 s
    val left = Seq((1L, ts("2024-01-01 10:01:00"))).toDF("lid", "lts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00")), // exactly radius before → included
      (11L, ts("2024-01-01 10:02:00")), // exactly radius after → included
      (12L, ts("2024-01-01 10:02:01")), // 61 s → excluded
      (13L, ts("2024-01-01 09:59:59"))) // 61 s → excluded
      .toDF("rid", "rts")
    val got = JoinOps.timeRadiusJoin(left, right, "lts", "rts", radius)
      .select("rid").as[Long].collect().toSet
    assert(got === Set(10L, 11L))
  }

  test("timeRadiusJoin matches brute-force theta join on random data") {
    val rnd = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    val l = (1 to 60).map(i => (i.toLong, new Timestamp(base + rnd.nextInt(7200) * 1000L)))
      .toDF("lid", "lts")
    val r = (1 to 60).map(i => (i.toLong, new Timestamp(base + rnd.nextInt(7200) * 1000L)))
      .toDF("rid", "rts")
    val radius = 300L * 1000000
    val fast = JoinOps.timeRadiusJoin(l, r, "lts", "rts", radius)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = l.crossJoin(r)
      .where(abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= radius)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast === brute)
  }

  test("bloomPruneJoin: exactly the plain join (false positives re-verified, nulls dropped)") {
    val fact = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (null, "e"))
      .toDF("fk", "payload")
    val dim = Seq((1L, "x"), (3L, "y"), (9L, "z")).toDF("dk", "tag")
    val fast = JoinOps.bloomPruneJoin(fact, dim, "fk", "dk", 100L, 0.03)
      .select("fk", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(fast === plain)
    assert(fast === Set((1L, "a", "x"), (3L, "c", "y")))
  }
}
