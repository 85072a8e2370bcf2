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
    val o = graft.Tables.orders(spark, dir)
    val l = graft.Tables.lineitem(spark, dir)
    def time(tag: String)(df: => DataFrame): Unit = {
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $tag%-28s pass=$p ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }
    time("orders_sorted_plain") {
      o.select(col("o_orderkey"), col("o_totalprice")).orderBy("o_orderkey")
    }
    time("try_cast_only") {
      o.select(col("o_orderkey"),
        expr("try_cast(substr(o_orderpriority, 1, 1) AS LONG)").as("p"),
        expr("try_cast(o_orderpriority AS LONG)").as("f")).orderBy("o_orderkey")
    }
    time("try_divide_only") {
      o.select(col("o_orderkey"),
        round(expr("try_divide(round(o_totalprice * 100), o_orderkey % 3)") * 1000)
          .cast("long").as("d")).orderBy("o_orderkey")
    }
    time("li_sorted_plain") {
      l.select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
        col("l_quantity")).orderBy("l_orderkey", "ln")
    }
    time("map_no_hof") {
      l.withColumn("m", map(lit("qty"), col("l_quantity"), lit("price"), col("l_extendedprice")))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          element_at(col("m"), "qty").as("q"))
        .orderBy("l_orderkey", "ln")
    }
    time("map_with_hof") {
      l.withColumn("m", map(lit("qty"), col("l_quantity"), lit("price"), col("l_extendedprice")))
        .withColumn("m2", map_concat(
          expr("transform_values(m, (k, v) -> round(v * 100))"),
          map(lit("disc"), round(col("l_discount") * 10000))))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          element_at(col("m2"), "qty").as("q"))
        .orderBy("l_orderkey", "ln")
    }
    time("map_concat_3x") {
      l.withColumn("m", map(lit("qty"), round(col("l_quantity") * 100),
          lit("price"), round(col("l_extendedprice") * 100)))
        .withColumn("m2", map_concat(col("m"), map(lit("disc"), round(col("l_discount") * 10000))))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          element_at(col("m2"), "qty").cast("long").as("q"),
          element_at(col("m2"), "price").cast("long").as("p"),
          element_at(col("m2"), "disc").cast("long").as("d"),
          size(map_keys(col("m2"))).cast("long").as("nk"))
        .orderBy("l_orderkey", "ln")
    }
    time("map_single_3") {
      l.withColumn("m2", map(lit("qty"), round(col("l_quantity") * 100),
          lit("price"), round(col("l_extendedprice") * 100),
          lit("disc"), round(col("l_discount") * 10000)))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          element_at(col("m2"), "qty").cast("long").as("q"),
          element_at(col("m2"), "price").cast("long").as("p"),
          element_at(col("m2"), "disc").cast("long").as("d"),
          size(map_keys(col("m2"))).cast("long").as("nk"))
        .orderBy("l_orderkey", "ln")
    }
    time("no_map_direct") {
      l.select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
        round(col("l_quantity") * 100).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"),
        round(col("l_discount") * 10000).cast("long").as("d"),
        lit(3L).as("nk"))
        .orderBy("l_orderkey", "ln")
    }
    spark.stop()
  }
}
