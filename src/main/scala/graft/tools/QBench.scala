package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: time named catalog queries (args = sfDir, names...) the
  * same way graft.Bench does (noop sink, cache cleared between runs) but
  * printing each pass separately — change the recipe together with
  * Bench.pass / ScaleProbe.warm so numbers stay comparable. */
object QBench {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    for (pass <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      qs(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[qbench] pass=$pass $name%-28s ${t}%.3fs")
    }
    spark.stop()
  }
}
