package graft.ops

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Collection / pivot operators — reference A3 (pivot counts,
  * calculate_zone_report.py:23-25) and A5–A7 (ordered collect → array,
  * calculate_user_city.py:63-69).
  */
object CollectOps {

  /** Deterministic ordered collect: sort_array ∘ collect_list ∘ struct.
    * `collect_list` input order is nondeterministic; sorting the collected
    * structs (by their fields, in declaration order) restores determinism —
    * callers must put a per-key-unique sort key as the FIRST struct field.
    * Extracts `field` across the sorted array (reference A5+A6 pattern). */
  def orderedCollect(sortKey: Column, value: Column, asc: Boolean = true): Column = {
    val arr = sort_array(collect_list(struct(sortKey.as("k"), value.as("v"))), asc = asc)
    arr.getField("v")
  }

  /** Pivot with an EXPLICIT value list (avoids the distinct pre-scan —
    * reference declares its pivot values: calculate_zone_report.py:15,24)
    * and a column-name prefix so wide marts can join several grains. */
  def pivotCounts(grouped: RelationalGroupedDataset, pivotCol: String,
                  values: Seq[String], prefix: String): DataFrame = {
    val piv = grouped.pivot(pivotCol, values).count()
    values.foldLeft(piv) { (df, v) =>
      df.withColumnRenamed(v, s"$prefix$v")
    }.na.fill(0L, values.map(v => s"$prefix$v"))
  }
}
