package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators — the reference's W1–W4 patterns
  * (SURVEY.md §2.5): top-1/argmin, latest-per-key, first-per-key, lag gaps.
  *
  * Every helper takes explicit tie-break columns: the reference's windows
  * order by a single non-unique column (e.g. calculate_user_city.py:42),
  * which is nondeterministic under ties; we require a total order so the
  * DuckDB oracle hash-compare is stable (SURVEY.md §5.1).
  */
object WindowOps {

  /** Latest row per key (reference W2 — most recent event per user → act_city,
    * calculate_user_city.py:42-50). orderCols should form a total order desc.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame =
    topKPerKey(df, keys, orderCols.map(_.desc), 1).drop("__rn")

  /** First row per key (reference W3 — first event per user = registration,
    * calculate_zone_report.py:28-35). */
  def firstPerKey(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame =
    topKPerKey(df, keys, orderCols.map(_.asc), 1).drop("__rn")

  /** Top-K rows per key by the given explicit ordering; keeps `__rn` (1-based)
    * unless k == 1 callers drop it. Generalizes the reference's rn==1 filters. */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
  }

  /** Gap in whole days to the NEXT row per key, ordered ascending by `ts` —
    * corrected reference W4 semantics (SURVEY.md §2.8(d): the reference's
    * interval cast is wrong by 1e6 on modern Spark; we define the gap as
    * date_diff on the day grain). Adds `gap_days` (null on the last row). */
  def gapDaysToNext(df: DataFrame, keys: Seq[String], dateCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol).asc)
    df.withColumn("gap_days", datediff(lead(col(dateCol), 1).over(w), col(dateCol)))
  }

  /** Sessionize: consecutive rows per key belong to one session while the
    * gap to the previous row ≤ maxGapMicros. Adds `session_idx` (0-based).
    * Cumulative-sum-over-flags pattern; one shuffle on the key. Gap math in
    * integer microseconds (`unix_micros` ≡ DuckDB `epoch_us`) so the oracle
    * reproduces it exactly. `orderCols` must be a per-key total order. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 orderCols: Seq[Column], maxGapMicros: Long): DataFrame = {
    val wo = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.asc): _*)
    val newSession = when(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(wo)) > maxGapMicros, 1L
    ).otherwise(lit(0L))
    df.withColumn("__new", newSession)
      .withColumn("session_idx",
        sum(col("__new")).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
