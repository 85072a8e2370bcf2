package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness: time individual expression variants to localize a hot
  * column in a slow catalog query (same noop-sink recipe as QBench). */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(df: => DataFrame): Unit = {
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $tag%-28s pass=$p ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }
    val c = graft.Tables.customer(spark, dir)
      .select(col("c_nationkey").as("nation"), col("c_custkey"), col("c_name"))
    val l = c.select(col("nation"), col("c_custkey").as("cust_l"), col("c_name").as("name_l"))
    val r = c.select(col("nation"), col("c_custkey").as("cust_r"), col("c_name").as("name_r"))
    val pairs = l.join(r, Seq("nation")).where(col("cust_l") < col("cust_r"))
    val _ = pairs
    time("real_rr32") {
      l.repartition(32).join(r, Seq("nation"))
        .where(col("cust_l") < col("cust_r"))
        .withColumn("lev", levenshtein(col("name_l"), col("name_r"), 2).cast("long"))
        .where(col("lev") >= 0)
        .select(col("nation").cast("long").as("nation"), col("cust_l"), col("cust_r"), col("lev"))
        .orderBy("cust_l", "cust_r")
    }
    time("real_hash32") {
      l.repartition(32, col("cust_l")).join(r, Seq("nation"))
        .where(col("cust_l") < col("cust_r"))
        .withColumn("lev", levenshtein(col("name_l"), col("name_r"), 2).cast("long"))
        .where(col("lev") >= 0)
        .select(col("nation").cast("long").as("nation"), col("cust_l"), col("cust_r"), col("lev"))
        .orderBy("cust_l", "cust_r")
    }
    time("real_hash32_noorder") {
      l.repartition(32, col("cust_l")).join(r, Seq("nation"))
        .where(col("cust_l") < col("cust_r"))
        .withColumn("lev", levenshtein(col("name_l"), col("name_r"), 2).cast("long"))
        .where(col("lev") >= 0)
        .select(col("nation").cast("long").as("nation"), col("cust_l"), col("cust_r"), col("lev"))
    }
    spark.stop()
  }
}
