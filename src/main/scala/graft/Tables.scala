package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md) plus the
  * synthetic `zones` dimension derived deterministically from `nation`
  * (FIXTURES.md §3 — the reference's `geo` city dimension, re-expressed so
  * the DuckDB oracle can derive the identical table with pure SQL).
  *
  * Reference data model: tables are directories of parquet read with
  * `spark.read.parquet` (/root/reference/src/scripts/save_mes_geo.py:30-31).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for — read it as raw nanos (legacy flag) and floor-truncate to
    * microseconds, exactly what DuckDB's reader does, so oracle timestamps
    * agree. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Synthetic city/zone dimension (reference `geo` table:
    * /root/reference/src/scripts/save_mes_geo.py:30 — `id, city, lat_c, lon_c`).
    * Centroids are exact integer-derived doubles so Spark and DuckDB agree
    * bit-for-bit. SQL equivalent (oracle):
    * {{{
    * SELECT n_nationkey AS zone_id, n_name AS zone_name,
    *        CAST((n_nationkey*37) % 120 AS DOUBLE) - 59.5 AS lat_z,
    *        CAST((n_nationkey*73) % 360 AS DOUBLE) - 179.5 AS lon_z
    * FROM nation
    * }}}
    */
  def zones(spark: SparkSession, dir: String): DataFrame =
    nation(spark, dir).select(
      col("n_nationkey").as("zone_id"),
      col("n_name").as("zone_name"),
      ((col("n_nationkey") * 37) % 120).cast("double").minus(lit(59.5)).as("lat_z"),
      ((col("n_nationkey") * 73) % 360).cast("double").minus(lit(179.5)).as("lon_z"))

  /** Events with deterministic synthetic coordinates (FIXTURES.md §3 maps the
    * reference's per-event `lat`/`lon` — save_mes_geo.py:39 — onto testdata by
    * deriving degrees from `event_id`; exact in IEEE double on both engines).
    * SQL: `((event_id*13) % 1200) / 10.0 - 60.0`, `((event_id*29) % 3600) / 10.0 - 180.0`.
    */
  def eventsGeo(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("lat_e", ((col("event_id") * 13) % 1200) / lit(10.0) - lit(60.0))
      .withColumn("lon_e", ((col("event_id") * 29) % 3600) / lit(10.0) - lit(180.0))

  /** Shared oracle-SQL CTE snippets so every query's DuckDB SQL derives the
    * identical synthetic dimensions. */
  object Sql {
    val zones: String =
      """zones AS (
        |  SELECT n_nationkey AS zone_id, n_name AS zone_name,
        |         CAST((n_nationkey*37) % 120 AS DOUBLE) - 59.5 AS lat_z,
        |         CAST((n_nationkey*73) % 360 AS DOUBLE) - 179.5 AS lon_z
        |  FROM nation)""".stripMargin

    val eventsGeo: String =
      """ev AS (
        |  SELECT *,
        |         ((event_id*13) % 1200) / 10.0 - 60.0  AS lat_e,
        |         ((event_id*29) % 3600) / 10.0 - 180.0 AS lon_e
        |  FROM events)""".stripMargin

    /** Haversine km (corrected semantics — SURVEY.md §2.8(a): the reference
      * omits radians(); we define distance WITH the conversion). */
    def haversine(lat1: String, lon1: String, lat2: String, lon2: String): String =
      s"2 * 6371.0 * asin(sqrt(" +
        s"pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
        s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2)))"
  }
}
