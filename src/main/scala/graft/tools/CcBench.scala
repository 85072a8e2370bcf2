package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness: time connectedComponents on the sf0.1 minhash pair
  * graph under different shuffle-partition settings. */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nodes = graft.Tables.documents(spark, dir).select(col("doc_id").as("id"))
    val pairs = graft.queries.DedupQueries.minhashPairs(spark, dir)
      .select("id_l", "id_r").persist()
    println(s"[cc] pairs=${pairs.count()}")
    for ((limit, tag) <- Seq((1000000L, "driver"), (0L, "loop"),
      (1000000L, "driver"), (0L, "loop"))) {
      val t0 = System.nanoTime()
      val n = graft.ops.DedupOps
        .connectedComponents(nodes, pairs, driverEdgeLimit = limit).count()
      println(f"[cc] path=$tag rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
