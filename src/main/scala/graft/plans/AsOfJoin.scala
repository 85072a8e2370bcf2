package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator custom Catalyst pipeline for the as-of (point-in-time)
  * join — the operator preference-order case (c) from SURVEY.md §7.3: a
  * logical node, a planner strategy, and a physical exec, registered
  * through `SparkSessionExtensions` (GraftExtensions).
  *
  * Semantics: for every left row, find the right row with equal keys and
  * the greatest `rightTs` ≤ `leftTs`, and append that row's value columns
  * (nulls when no such row). The right side must be unique per
  * (keys, rightTs) — same contract as DuckDB's ASOF LEFT JOIN
  * (`l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts`), which is the
  * oracle used to cross-check it. The builder (AsOfJoinApi) filters
  * null-key timeline rows and rejects floating-point keys, so key
  * matching behaves like SQL `=` for everything that reaches the exec.
  *
  * Scale shape: the right side (a bounded dimension timeline — price
  * quotes, config versions, slowly-changing attributes) is collected and
  * broadcast ONCE as per-key sorted timestamp arrays; every probe is then
  * a local binary search. The probe side keeps its partitioning and
  * ordering — ZERO shuffle of the fact table, versus one full shuffle for
  * the union+window formulation (JoinOps.asofLookup, which remains the
  * right plan when BOTH sides are fact-sized).
  *
  * Reference behavior anchor: the reference joins each event to the
  * latest-known dimension state (geo snapshot at event time —
  * /root/reference/src/scripts/save_mes_geo.py:47-52, nearest-state
  * lookup); this operator is that lookup generalized to any keyed
  * timeline.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[BroadcastAsOfJoinExec]]. Injected via
  * `ext.injectPlannerStrategy` in [[graft.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      BroadcastAsOfJoinExec(
        planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.leftTs, j.rightTs, j.rightValues,
        j.output) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast as-of join.
  *
  * Build (driver): collect the right side, group by key, sort each group
  * by timestamp into a primitive `Array[Long]` + parallel value-row array,
  * broadcast the map. Probe (executors): per left row, one hash lookup +
  * one binary search. `outputPartitioning`/`outputOrdering` delegate to
  * the probe child — downstream operators see the fact side's physical
  * properties untouched (no Exchange is ever required by this node).
  */
object BroadcastAsOfJoinExec {
  /** Hard ceiling on driver-collected timeline rows (OOM guard). */
  val MaxBuildRowsKey = "spark.graft.asof.maxBuildRows"
}

case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    override val output: Seq[Attribute])
  extends SparkPlan {

  override def children: Seq[SparkPlan] = Seq(left, right)
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering = left.outputOrdering

  // surfaced in the Spark UI / metrics sinks like any built-in join's
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "probe rows with an as-of match"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "timeline rows collected"))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): BroadcastAsOfJoinExec =
    copy(left = newChildren(0), right = newChildren(1))

  /** key → (ascending timestamps, value rows at those timestamps). */
  private def buildIndex(): Map[UnsafeRow, (Array[Long], Array[UnsafeRow])] = {
    val maxBuildRows = conf.getConfString(
      BroadcastAsOfJoinExec.MaxBuildRowsKey, "10000000").toLong
    val keyProj = UnsafeProjection.create(rightKeys, right.output)
    val valProj = UnsafeProjection.create(rightValues, right.output)
    val tsBound = BindReferences.bindReference(rightTs, right.output)
    val collected = right.executeCollect()
    if (collected.length > maxBuildRows) throw new IllegalStateException(
      s"broadcast as-of join: timeline has ${collected.length} rows, above " +
      s"${BroadcastAsOfJoinExec.MaxBuildRowsKey}=$maxBuildRows. A timeline this " +
      "large should not be broadcast — use the shuffle formulation " +
      "(JoinOps.asofLookup) or JoinOps.asofAuto, which picks by size.")
    val grouped = collected.iterator.flatMap { row =>
      val ts = tsBound.eval(row)
      if (ts == null) None // null-timestamp right rows can never be as-of matches
      else Some((keyProj(row).copy(), ts.asInstanceOf[Long], valProj(row).copy()))
    }.toArray.groupBy(_._1)
    grouped.map { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      (k, (sorted.map(_._2), sorted.map(_._3)))
    }
  }

  /** Greatest index with ts(i) <= t, or -1. */
  private def floorIndex(ts: Array[Long], t: Long): Int = {
    var lo = 0; var hi = ts.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ts(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val built = buildIndex()
    longMetric("buildRows").add(built.valuesIterator.map(_._1.length.toLong).sum)
    // driver-side metric updates don't flow through task-end events — post
    // them explicitly or the SQL UI shows buildRows as blank
    val executionId = sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.SQLExecution.EXECUTION_ID_KEY)
    org.apache.spark.sql.execution.metric.SQLMetrics.postDriverMetricUpdates(
      sparkContext, executionId, Seq(metrics("buildRows")))
    val index: Broadcast[Map[UnsafeRow, (Array[Long], Array[UnsafeRow])]] =
      sparkContext.broadcast(built)
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val leftOutput = left.output
    val lKeys = leftKeys
    val lTs = leftTs
    val nVals = rightValues.size
    val outAttrs = output
    // bind the result projection against NULLABLE right-value attrs — the
    // miss row is all-null regardless of the timeline's declared nullability
    val joinInputAttrs = leftOutput ++ rightValues.map(_.withNullability(true))
    left.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(lKeys, leftOutput)
      val tsBound = BindReferences.bindReference(lTs, leftOutput)
      val resultProj = UnsafeProjection.create(outAttrs, joinInputAttrs)
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(nVals)
      val idx = index.value
      iter.map { row =>
        val ts = tsBound.eval(row)
        val hit =
          if (ts == null) null
          else idx.get(keyProj(row)) match {
            case Some((tsArr, valArr)) =>
              val i = floorIndex(tsArr, ts.asInstanceOf[Long])
              if (i >= 0) valArr(i) else null
            case None => null
          }
        outRows.add(1)
        if (hit != null) matched.add(1)
        resultProj(joined(row, if (hit == null) nullVals else hit))
      }
    }, preservesPartitioning = true)
  }
}
