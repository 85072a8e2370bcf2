package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class FormatSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "alpha", 12.34, Timestamp.valueOf("2023-05-01 10:20:30")),
    (2L, "beta,with comma", -0.009999999999, Timestamp.valueOf("1999-12-31 23:59:59")),
    (3L, null.asInstanceOf[String], 1.7976931348623157e10, Timestamp.valueOf("2023-05-01 00:00:00")))
  private def src = rows.toDF("id", "name", "amount", "ts")

  private def roundTrip(format: String): Seq[(Long, String, Double, Timestamp)] = {
    val path = s"/tmp/graft_fmt_spec/$format"
    Sinks.writeAs(src, path, format)
    Sinks.readAs(spark, path, format, src.schema)
      .as[(Long, String, Double, Timestamp)].collect().sortBy(_._1).toSeq
  }

  for (format <- Seq("orc", "csv", "json", "parquet")) {
    test(s"$format round-trips longs, strings, doubles, timestamps losslessly") {
      assert(roundTrip(format) === rows)
    }
  }
}
