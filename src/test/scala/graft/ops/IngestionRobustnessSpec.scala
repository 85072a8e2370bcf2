package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Ingestion robustness — the lake-edge behaviors a 100 TB pipeline hits
  * weekly: malformed text records, corrupt files mixed into a directory,
  * and schema drift across file generations. Each has a deliberate,
  * spec-pinned handling mode (never a silent wrong answer). */
class IngestionRobustnessSpec extends SparkSpec {

  test("JSON PERMISSIVE mode quarantines malformed records in _corrupt_record") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    Files.write(Paths.get(s"$dir/data.json"), java.util.Arrays.asList(
      """{"id": 1, "v": 10}""",
      """{"id": 2 "v": BROKEN""", // malformed
      """{"id": 3, "v": 30}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema).json(dir).cache()
    try {
      assert(df.where(col("_corrupt_record").isNull).count() === 2)
      val bad = df.where(col("_corrupt_record").isNotNull).collect()
      assert(bad.length === 1 && bad.head.getString(2).contains("BROKEN"))
    } finally df.unpersist()
  }

  test("JSON FAILFAST mode surfaces malformed records as a loud error") {
    val dir = Files.createTempDirectory("graft-ingest-ff").toString
    Files.write(Paths.get(s"$dir/data.json"),
      java.util.Arrays.asList("""{"id": 1}""", """not json"""))
    val schema = StructType(Seq(StructField("id", LongType)))
    val e = intercept[Exception] {
      spark.read.schema(schema).option("mode", "FAILFAST").json(dir).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.toLowerCase.contains("malformed"), s"unexpected error: $msgs")
  }

  test("ignoreCorruptFiles skips a garbage file mixed into a parquet dir") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-corrupt").toString
    Seq(1L, 2L, 3L).toDF("id").write.mode("overwrite").parquet(dir)
    Files.write(Paths.get(s"$dir/part-junk.parquet"),
      "this is not parquet".getBytes)
    val prior = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      assert(spark.read.parquet(dir).count() === 3)
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("mergeSchema unifies file generations; missing columns read as null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/gen=1")
    Seq((2L, "b", 20L)).toDF("id", "v1", "v2").write.parquet(s"$dir/gen=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
      .orderBy("id").collect()
    assert(df.length === 2)
    assert(df.head.isNullAt(df.head.fieldIndex("v2"))) // gen-1 row: v2 null
    assert(df.last.getLong(df.last.fieldIndex("v2")) === 20L)
  }
}
