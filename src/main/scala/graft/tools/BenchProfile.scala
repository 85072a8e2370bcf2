package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query execution-shape profiler (guide §1/§7, headless stand-in for
  * the Spark UI): runs catalog queries exactly like graft.Bench (noop sink,
  * clearCache between) with a SparkListener recording, per query,
  *   jobs / stages / tasks launched,
  *   summed executor run time (the "real work"),
  *   shuffle bytes written,
  * so wall − maxTaskTime-ish gaps expose scheduling/planning overhead and
  * task counts expose over-partitioned stages. Output: one TSV line per
  * query on stdout (grep for ^[profile]).
  *
  * Usage: runMain graft.tools.BenchProfile <sfDir> [query...]
  *        (no names = whole catalog)
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shuffleWrite = new AtomicLong
    val inputBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(): Unit
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inputBytes.addAndGet(m.inputMetrics.bytesRead): Unit
        }
      }
    })

    val qs = graft.SparkEntry.queries
    val names = if (args.length > 1) args.tail.toSeq
                else qs.keys.toSeq.sorted
    // one warmup like Bench
    try { graft.SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    println("[profile]\tquery\twall_s\tjobs\tstages\ttasks\ttask_time_s\tshuffle_mb\tinput_mb")
    for (name <- names) {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0); shuffleWrite.set(0); inputBytes.set(0)
      val t0 = System.nanoTime()
      try qs(name)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[profile] $name FAILED: ${String.valueOf(e.getMessage).take(160)}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener bus is async; drain it deterministically so no event
      // lands after the read or bleeds into the next query's counters
      // (ADVICE r18 low — the old fixed sleep(60) raced the bus under load)
      org.apache.spark.graftshim.ListenerShim
        .waitUntilListenerBusEmpty(spark.sparkContext)
      println(f"[profile]\t$name\t$wall%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${taskTimeMs.get / 1000.0}%.2f\t${shuffleWrite.get / 1e6}%.2f\t${inputBytes.get / 1e6}%.2f")
    }
    spark.stop()
  }
}
