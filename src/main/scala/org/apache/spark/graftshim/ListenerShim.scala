package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the profiling tools. The bus is
  * async, so counters sampled by a SparkListener are only settled once the
  * queued events have been delivered; `waitUntilEmpty` is `private[spark]`,
  * hence this one-line shim (same pattern as sql/graftshim — no Spark
  * internals modified). Tool-only: no query path calls this. */
object ListenerShim {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
