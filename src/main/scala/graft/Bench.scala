package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture smoke gate, WARN-only here (Bench must still emit its JSON
    // line for the driver): one aggregated diagnostic beats N per-query
    // failure lines when the driver regenerates testdata incompatibly
    val fixtureProblems = Tables.fixtureProblems(spark, sfDir)
    if (fixtureProblems.nonEmpty)
      System.err.println("[bench] FIXTURE INCOMPATIBLE — timings below are " +
        "failure times:\n  " + fixtureProblems.mkString("\n  "))
    // one small end-to-end run first: absorbs one-time JVM/codegen/parquet
    // reader initialization so per-query numbers measure the queries
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    // noop sink: materializes every output row/column of the plan AS
    // DECLARED (a count() would let the optimizer prune aggregates and
    // sorts, under-measuring the queries)
    // min over two FULL passes of the catalog: steady-state throughput
    // (the 100 TB-relevant number) rather than one sample of JVM warmup +
    // host noise. Whole-catalog passes (not back-to-back reruns) keep a
    // query's two samples minutes apart, so a transient host-contention
    // storm cannot poison both. Cache cleared between queries so each run
    // replans and rescans.
    // r7 lesson: swallowing per-query failures silently let 30 broken
    // queries masquerade as 0.05s "speedups" in the bench tail. The JSON
    // contract stays unchanged; failures go loudly to stderr.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED (timing is failure time, " +
          s"not query time): ${String.valueOf(e.getMessage).take(200)}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      // keep runs independent: drops persisted frames (localCheckpoint
      // blocks are disk-backed and freed by the ContextCleaner on GC)
      spark.catalog.clearCache()
      name -> t
    }
    val p1 = pass()
    val p2 = pass()
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries failed: " +
        failed.mkString(", "))
    val results = p1.map { case (name, t) => name -> math.min(t, p2(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Full per-query artifact on disk (VERDICT r8 item 6): the driver's
    // BENCH_r*.json keeps only the tail of stdout, so only ~23% of
    // per-query timings survived into the round record — the committed
    // file carries ALL of them so every query is regression-diffable
    // across rounds. Failure names included: a failed query's "timing"
    // must never be mistaken for a fast run (the r7 lesson).
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full_latest.json")
      val failedJson = failed.map(Verify.jsonString).mkString("[", ",", "]")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        s"""{"metric":"total","value":$total,"unit":"sec","sf":"${sfDir}","n_queries":${results.size},"failed":$failedJson,"queries":$qs}""")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write full artifact: ${e.getMessage}")
    }
    spark.stop()
  }
}
