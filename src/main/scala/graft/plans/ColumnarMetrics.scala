package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, ColumnarToRowExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** The `injectColumnarRule` extension point (the last of the five
  * SparkSessionExtensions hook families this engine exercises): a
  * zero-copy columnar instrumentation node.
  *
  * [[BatchStatsExec]] wraps any columnar-producing node (in practice the
  * vectorized parquet scans) and counts the ColumnarBatches and rows that
  * flow through it WITHOUT leaving the columnar domain — the batches pass
  * by reference, so the only per-batch cost is two accumulator adds. The
  * batch-size distribution (rows ÷ batches vs
  * `spark.sql.parquet.columnarReaderBatchSize`) is exactly what you tune
  * `spark.sql.files.maxPartitionBytes` / batch size against at 100 TB,
  * and it isn't visible from row-level metrics once whole-stage codegen
  * fuses the scan.
  *
  * Opt-in via `spark.graft.columnar.metrics=true` (session conf, read per
  * plan): the production plans stay byte-identical unless instrumentation
  * is requested. */
case class BatchStatsExec(child: SparkPlan) extends UnaryExecNode {
  override def supportsColumnar: Boolean = true
  override def vectorTypes: Option[Seq[String]] = child.vectorTypes
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numBatches" -> SQLMetrics.createMetric(sparkContext, "columnar batches"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] =
    throw new UnsupportedOperationException(
      "BatchStatsExec is columnar-only; the rule places it under a ColumnarToRowExec")
  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val nBatches = longMetric("numBatches")
    val nRows = longMetric("numOutputRows")
    child.executeColumnar().mapPartitions { it =>
      it.map { batch => nBatches += 1; nRows += batch.numRows(); batch }
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): BatchStatsExec =
    copy(child = newChild)
}

/** Runs AFTER the row/columnar transitions are inserted, so every
  * columnar→row boundary is explicit: wrap the columnar side of each
  * transition. Idempotent (skips already-wrapped children) — AQE re-runs
  * columnar rules per query stage. */
case class BatchStatsRule(session: SparkSession) extends Rule[SparkPlan] {
  override def apply(plan: SparkPlan): SparkPlan = {
    val enabled = session.conf
      .getOption("spark.graft.columnar.metrics").exists(_.toBoolean)
    if (!enabled) plan
    else plan.transformUp {
      case ColumnarToRowExec(child)
          if child.supportsColumnar && !child.isInstanceOf[BatchStatsExec] =>
        ColumnarToRowExec(BatchStatsExec(child))
    }
  }
}

class GraftColumnarRule(session: SparkSession) extends ColumnarRule {
  override def postColumnarTransitions: Rule[SparkPlan] = BatchStatsRule(session)
}
