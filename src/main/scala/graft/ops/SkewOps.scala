package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation. AQE's skew-join handling (on by default) covers most
  * runtime skew; explicit salting remains the tool when one join key
  * dominates so heavily that even split partitions overwhelm single tasks
  * — the classic hot-key problem at 100 TB. */
object SkewOps {

  /** Salted inner equi-join: the (large, skewed) left side gets a
    * deterministic salt derived from `saltSource` (any left column with
    * per-row variety — an id, not the hot key); the (smaller) right side is
    * replicated once per salt. The join key becomes (keys, salt), spreading
    * each hot key over `nSalts` tasks. Result equals the plain inner join
    * (a NULL saltSource lands in salt 0 rather than dropping the row).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltSource: Column, nSalts: Int): DataFrame = {
    require(nSalts >= 1)
    val l = left.withColumn("__salt",
      coalesce(pmod(saltSource, lit(nSalts)), lit(0)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (keys, salt), then final-aggregate on keys. For algebraic aggregates
    * Spark's partial aggregation already does this map-side; the explicit
    * form helps when the per-key state is large (e.g. collect-based). */
  def saltedCount(df: DataFrame, keys: Seq[String], saltSource: Column,
                  nSalts: Int): DataFrame = {
    val partial = df.withColumn("__salt", pmod(saltSource, lit(nSalts)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
    partial.groupBy(keys.map(col): _*).agg(sum("__partial").as("cnt"))
  }
}
