package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profile for q_hits_bipartite (r9 verdict item 3): times
  * the edge build (fact join + distinct + localCheckpoint) separately
  * from the three half-step rounds, warm, so the 100 TB bottleneck is
  * attributed by measurement instead of guessed.
  */
object HitsProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val e = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
        .localCheckpoint()
      val t1 = System.nanoTime()
      val E6 = 1000000L
      val a1 = e.groupBy("part").agg((count(lit(1)) * E6).as("a1"))
      val a1n = a1.crossJoin(broadcast(a1.agg(max("a1").as("mx"))))
        .select(col("part"), expr(s"a1 * $E6 div mx").as("a1n"))
      a1n.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val h1 = e.join(a1n, Seq("part")).groupBy("cust").agg(sum("a1n").as("h1"))
      val h1n = h1.crossJoin(broadcast(h1.agg(max("h1").as("mx"))))
        .select(col("cust"), expr(s"h1 * $E6 div mx").as("h1n"))
      h1n.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      val a2 = e.join(h1n, Seq("cust")).groupBy("part").agg(sum("h1n").as("a2"))
      val a2n = a2.crossJoin(broadcast(a2.agg(max("a2").as("mx"))))
        .select(col("part"), expr(s"a2 * $E6 div mx").as("auth_e6"))
      a2n.write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
      println(s"[hitsprofile] pass=$pass edges=${s(t0, t1)} a1=${s(t1, t2)} " +
        s"h1=${s(t2, t3)} a2=${s(t3, t4)} edge_rows=${e.count()}")
    }
    spark.stop()
  }
}
