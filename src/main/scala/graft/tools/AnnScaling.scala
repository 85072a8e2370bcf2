package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.VectorOps
import graft.queries.VectorQueries.{Dim, IvfStride, IvfCentCap, TopK}

/** Measured evidence for ann_delta_topk's I/O claim: the cell-partitioned
  * postings probe reads only the batch's probed cells' files, so per-batch
  * I/O tracks (probed cells / nlist) of the corpus, not the corpus.
  *
  * Protocol: embeddings replicated 1×/4×/16× with shifted ids (the shift
  * keeps every replica id above [[IvfCentCap]], so the centroid set is the
  * base corpus's at every size — cell COUNT constant, cell SIZE growing
  * with the corpus, which is the axis under test). Postings written once
  * per corpus, partitioned by centroid id. Probes of 1 and 10 fixed query
  * vectors measured as min-of-3 cache-cleared (seconds, /proc/self/io
  * read bytes — see DeltaScaling for why task metrics can't be used), vs
  * a FLAT baseline that ranks the same queries against a single-table
  * copy of the postings (what a non-partitioned layout must read).
  *
  * Usage: runMain graft.tools.AnnScaling [outJson]. */
object AnnScaling {
  private val IdStride = 100000000L

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("ann_probe_scaling.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rchar(): Long = {
      val io = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/io")), "UTF-8")
      io.linesIterator.find(_.startsWith("rchar:"))
        .map(_.split(" ")(1).trim.toLong).getOrElse(0L)
    }
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    // replicas are PERTURBED per-dimension (x + i·0.001) so the scaled
    // corpus is not bit-identical copies — verbatim replication would let
    // parquet dictionary-encode the whole embedding column away and the
    // byte counts would measure compression, not I/O shape
    def replica(i: Int): DataFrame =
      if (i == 0) base
      else base.select((col("vec_id") + lit(i * IdStride)).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit(i * 0.001f)).cast("float")).as("embedding"))
    val queries = base.orderBy("vec_id").limit(10)
      .select((col("vec_id") + lit(9000000000L)).as("q_id"), col("embedding").as("q_vec"))
      .persist()
    queries.count()

    def probe(postings: DataFrame, cents: DataFrame, nQ: Int,
              pruneCells: Boolean): Long = {
      val wQ = Window.partitionBy("q_id").orderBy(col("cs").desc, col("c_id").asc)
      val probes = queries.limit(nQ)
        .crossJoin(broadcast(cents))
        .withColumn("cs", VectorOps.cosine(col("q_vec"), col("c_vec"), Dim))
        .withColumn("rn", row_number().over(wQ)).where(col("rn") <= 2)
        .select(col("q_id"), col("q_vec"), col("c_id").as("centroid_id"))
        .persist()
      val cells = probes.select("centroid_id").distinct()
        .collect().map(_.getLong(0)).toSeq
      val src = if (pruneCells) postings.where(col("centroid_id").isin(cells: _*))
                else postings
      val wR = Window.partitionBy("q_id").orderBy(col("cosine_sim").desc, col("vec_id").asc)
      val n = src.join(broadcast(probes), Seq("centroid_id"))
        .withColumn("cosine_sim", VectorOps.cosine(col("q_vec"), col("embedding"), Dim))
        .withColumn("rank", row_number().over(wR)).where(col("rank") <= TopK)
        .count()
      probes.unpersist()
      n
    }

    val out = new StringBuilder
    out.append("{\n  \"runs\": [\n")
    val rows = for (replicas <- Seq(1, 4, 16)) yield {
      val corpus = (0 until replicas).map(replica).reduce(_ unionByName _)
      val cents = base
        .where(col("vec_id") % IvfStride === 0 && col("vec_id") < IvfCentCap)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .persist()
      val nCells = cents.count()
      val root = graft.ops.Staging.dir(
        "/tmp/graft_ann_scaling", "/root/testdata/sf0.1", s"x$replicas")
      val wA = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("c_id").asc)
      val assigned = corpus.crossJoin(broadcast(cents))
        .withColumn("cs", VectorOps.cosine(col("embedding"), col("c_vec"), Dim))
        .withColumn("rn", row_number().over(wA)).where(col("rn") === 1)
        .select(col("c_id").as("centroid_id"), col("vec_id"), col("embedding"))
      assigned.repartition(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$root/part")
      assigned.write.mode("overwrite").parquet(s"$root/flat")
      val partBytes = dirBytes(s"$root/part")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, embedding ARRAY<FLOAT>, centroid_id BIGINT")
      val flatSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "centroid_id BIGINT, vec_id BIGINT, embedding ARRAY<FLOAT>")
      def best(nQ: Int, pruned: Boolean): (Double, Double) = {
        val reps = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          cents.persist().count(); queries.persist().count()
          val b0 = rchar(); val t0 = System.nanoTime()
          val src = if (pruned) spark.read.schema(schema).parquet(s"$root/part")
                    else spark.read.schema(flatSchema).parquet(s"$root/flat")
          val n = probe(src, cents, nQ, pruneCells = pruned)
          require(n > 0, "probe found nothing")
          ((System.nanoTime() - t0) / 1e9, (rchar() - b0) / 1e6)
        }
        (reps.map(_._1).min, reps.map(_._2).min)
      }
      val (p1s, p1b) = best(1, pruned = true)
      val (p10s, p10b) = best(10, pruned = true)
      val (f10s, f10b) = best(10, pruned = false)
      println(f"[annscale] x$replicas%-3d cells=$nCells part=${partBytes / 1e6}%.1fMB " +
        f"| pruned q1 ${p1s}%.2fs ${p1b}%.1fMB | pruned q10 ${p10s}%.2fs ${p10b}%.1fMB " +
        f"| flat q10 ${f10s}%.2fs ${f10b}%.1fMB")
      f"""    {"replicas": $replicas, "n_cells": $nCells, "postings_mb": ${partBytes / 1e6}%.1f, "pruned_q1_sec": $p1s%.3f, "pruned_q1_read_mb": $p1b%.2f, "pruned_q10_sec": $p10s%.3f, "pruned_q10_read_mb": $p10b%.2f, "flat_q10_sec": $f10s%.3f, "flat_q10_read_mb": $f10b%.2f}"""
    }
    out.append(rows.mkString(",\n")).append("\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      out.toString.getBytes("UTF-8"))
    println(s"[annscale] wrote $outPath")
    spark.stop()
  }

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }
}
