package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.PlanBridge

/** Public builder for the custom broadcast as-of join operator.
  *
  * `AsOfJoin(purchases, quotes, keys = Seq("user_id"), leftTs = "ts",
  * rightTs = "ts", values = Seq("price"))` returns the left rows plus the
  * right `values` columns as of the latest right timestamp ≤ the left
  * timestamp (nulls when the timeline has no earlier entry).
  *
  * Requirements checked here, at construction: all names resolve on their
  * side; both timestamp columns are TIMESTAMP or BIGINT (the physical
  * operator compares epoch longs); the right side should be unique per
  * (keys, rightTs) — ties would be resolved arbitrarily, like DuckDB ASOF.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTs: String, rightTs: String, values: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    def require(df: DataFrame, names: Seq[String], side: String): Unit =
      names.foreach { n =>
        if (!df.columns.contains(n)) throw new IllegalArgumentException(
          s"asof-join: column `$n` not found on the $side side " +
          s"(available: ${df.columns.mkString(", ")})")
      }
    require(left, keys :+ leftTs, "left")
    require(right, (keys :+ rightTs) ++ values, "right")
    // Re-alias the right side's needed columns: (1) fresh expr-ids, so a
    // self-join shape (both sides derived from one scan) can't leave the
    // node's attribute fields pointing at rewritten-away ids when the
    // analyzer deduplicates subtrees; (2) explicit column pruning of the
    // broadcast side — only keys+ts+values are ever collected.
    val rNeeded = (keys ++ Seq(rightTs) ++ values).distinct
    // Drop null-KEY timeline rows: the exec matches keys by raw UnsafeRow
    // bytes, where null == null — unlike SQL `=` (and the DuckDB ASOF
    // oracle), where null never matches. Filtering the broadcast side only
    // preserves every left row (a null-keyed left row simply finds no
    // match and gets null values), which IS the SQL semantics.
    val rNonNullKeys =
      if (keys.isEmpty) right
      else right.where(keys.map(col(_).isNotNull).reduce(_ && _))
    val rAliased = rNonNullKeys.select(rNeeded.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rAliased.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof-join: column `$name` not found on the $side side " +
          s"(available: ${plan.output.map(_.name).mkString(", ")})"))
    def tsAttr(plan: LogicalPlan, name: String, side: String): Attribute = {
      val a = attr(plan, name, side)
      a.dataType.typeName match {
        case "timestamp" | "long" => a
        case other => throw new IllegalArgumentException(
          s"asof-join: `$name` ($side) must be TIMESTAMP or BIGINT, got $other")
      }
    }
    val lKeys = keys.map(attr(lPlan, _, "left"))
    val rKeys = keys.map(attr(rPlan, _, "right"))
    val lTs = tsAttr(lPlan, leftTs, "left")
    val rTs = tsAttr(rPlan, rightTs, "right")
    // cross-side compatibility: the exec compares epoch longs and binary
    // UnsafeRow keys — a unit or type mismatch would be silently wrong,
    // not an error, so refuse it here
    if (lTs.dataType != rTs.dataType) throw new IllegalArgumentException(
      s"asof-join: timestamp types differ — `$leftTs` (left) is ${lTs.dataType.typeName}, " +
      s"`$rightTs` (right) is ${rTs.dataType.typeName}; cast one side first")
    lKeys.zip(rKeys).foreach { case (l, r) =>
      if (l.dataType != r.dataType) throw new IllegalArgumentException(
        s"asof-join: key `${l.name}` types differ — ${l.dataType.typeName} (left) vs " +
        s"${r.dataType.typeName} (right); cast one side first")
    }
    // Floating-point keys are matched by raw bytes too: -0.0 vs 0.0 and
    // differing NaN bit patterns compare unequal (NormalizeFloatingNumbers
    // does not cover this custom node), silently diverging from SQL `=`.
    // Refuse them rather than be subtly wrong.
    (lKeys ++ rKeys).foreach { a =>
      a.dataType.typeName match {
        case "float" | "double" => throw new IllegalArgumentException(
          s"asof-join: key `${a.name}` is ${a.dataType.typeName}; " +
          "floating-point join keys are not supported (raw-byte key matching " +
          "diverges from SQL `=` on -0.0/NaN) — cast to integer or decimal first")
        case _ =>
      }
    }
    PlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys, lTs, rTs,
        values.map(attr(rPlan, _, "right"))))
  }
}
