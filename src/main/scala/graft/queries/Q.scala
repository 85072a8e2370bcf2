package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A cataloged query: a Spark-native implementation plus (where ANSI-SQL
  * expressible) an equivalent DuckDB oracle over the same parquet tables.
  * Contract rules (driver): column names must match between the two; every
  * output must be deterministic (total ordering, no raw floats — doubles
  * are exported as scaled BIGINTs, money as cents). */
trait Q {
  def name: String
  def run(spark: SparkSession, dir: String): DataFrame
  /** DuckDB SQL over views named after the parquet tables; None → driver
    * records a weaker rows-only check. */
  def oracle: Option[String]
}

object Q {
  /** THE money-to-integer convention for every oracle-checked double:
    * scale-0 round to cents, then BIGINT (Spark HALF_UP on the decimal
    * string and DuckDB binary round agree only at scale 0 — see the verify
    * notes). One definition so the convention can't drift per-file. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.round(c * 100).cast("long")
}
