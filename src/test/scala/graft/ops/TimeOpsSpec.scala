package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("offsetHours: longitude bands round to nearest 15°") {
    val got = Seq(0.0, 7.4, 7.5, -7.5, 179.5, -179.5, 14.9)
      .toDF("lon").select(TimeOps.offsetHours($"lon")).as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, 1L, -1L, 12L, -12L, 1L))
  }

  test("localTimeByOffset shifts whole hours, preserving sub-second precision") {
    val t = Timestamp.valueOf("2024-01-15 12:30:45.123456")
    val got = Seq((t, 31.0)).toDF("ts", "lon") // 31° → +2h
      .select(TimeOps.localTimeByOffset($"ts", $"lon")).as[Timestamp].head()
    assert(got === Timestamp.valueOf("2024-01-15 14:30:45.123456"))
  }

  test("IANA broadcast lookup agrees with fixed-offset arithmetic (Etc/GMT zones)") {
    val zones = Seq((0L, "Z0", 0.0, 31.0), (1L, "Z1", 0.0, -100.0))
      .toDF("zone_id", "zone_name", "lat_z", "lon_z")
    val withTz = TimeOps.withIanaZone(spark, zones)
    val tzMap = withTz.select("zone_id", "iana_tz").as[(Long, String)].collect().toMap
    assert(tzMap === Map(0L -> "Etc/GMT-2", 1L -> "Etc/GMT+7"))
    val t = Timestamp.valueOf("2024-06-01 00:00:00")
    val viaIana = withTz.where($"zone_id" === 0)
      .select(TimeOps.localTimeIana(lit(t), $"iana_tz")).as[Timestamp].head()
    val viaOffset = Seq(31.0).toDF("lon")
      .select(TimeOps.localTimeByOffset(lit(t), $"lon")).as[Timestamp].head()
    assert(viaIana === viaOffset)
  }
}
