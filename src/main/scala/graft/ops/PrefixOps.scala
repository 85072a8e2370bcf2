package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.queries.PackDoc

/** Distributed prefix sum (the classic two-pass scan) over a keyed,
  * totally ordered fact stream — the primitive that turns "running total"
  * from a one-reducer-per-key window into a fully parallel plan.
  *
  * `Window.partitionBy(key).orderBy(ord)` funnels EVERY row of a key
  * through a single reducer — at 100 TB a corpus dominated by one giant
  * key serializes on one task. This operator instead:
  *
  *   pass 0  range-partition by (key, ord) and sort within partitions —
  *           partitions now hold contiguous slices of the total order;
  *   pass 1  per-partition, per-key SUBTOTALS (one tiny row per
  *           (partition, key-run) — bounded by #partitions + #keys, NOT
  *           by fact cardinality) collected to the driver;
  *   pass 2  exclusive offsets per (partition, key) from earlier
  *           partitions' subtotals, shipped back in the task closure; each
  *           partition streams its slice with an O(1) running counter.
  *
  * The result (exclusive prefix sum per key in `ord` order) is
  * partition-layout-independent — range boundaries may move between runs,
  * the prefix sums cannot. The input is persisted so both passes see the
  * SAME layout within a run (offsets keyed by partition id must match).
  *
  * Driver state: #partitions × (keys touching that partition boundary)
  * longs — at 100k partitions a few MB; grain documented, never
  * fact-sized.
  */
object PrefixOps {

  /** Exclusive running token total per source in doc_id order.
    * Returns (doc, cum_before) tuples. */
  def cumBefore(docs: Dataset[PackDoc], numParts: Int): Dataset[(PackDoc, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .repartitionByRange(numParts, col("source"), col("doc_id"))
      .sortWithinPartitions("source", "doc_id")
      .persist()
    // pass 1: per-(partition, source) subtotals — tiny by construction.
    // The collect also materializes the persisted layout pass 2 reuses.
    val subtotals: Array[(Int, String, Long)] = sorted
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach(d => sums.update(d.source, sums.getOrElse(d.source, 0L) + d.n_tokens))
        sums.iterator.map { case (s, t) => (pid, s, t) }
      }
      .collect()
    // exclusive offset per (partition, source)
    val offsets: Map[(Int, String), Long] =
      subtotals.groupBy(_._2).flatMap { case (src, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, t) =>
          val o = ((pid, src), acc); acc += t; o
        }
      }
    // pass 2: each partition streams its contiguous slice with O(1) state
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var src: String = null
      var run = 0L
      it.map { d =>
        if (d.source != src) { src = d.source; run = offsets.getOrElse((pid, src), 0L) }
        val out = (d, run)
        run += d.n_tokens
        out
      }
    }
  }
}
