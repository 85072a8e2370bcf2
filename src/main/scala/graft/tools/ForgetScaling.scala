package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DedupOps
import graft.queries.DedupQueries.{NumBands, NumPerms, RowsPerBand, ShingleK}

/** Measured evidence for the forget-path scale claim (round 14): a
  * [[DedupOps.removeFromSignatureIndex]] retraction reads and rewrites
  * ONLY the shards the forget set hits — never the whole index — so
  * right-to-be-forgotten stays affordable as the corpus grows.
  *
  * Protocol (the DeltaScaling replica idiom): replicate the sf0.1
  * documents corpus 1×/4×/16× with shifted ids and per-replica word
  * salting, bootstrap the partitioned index (nParts=256) once per corpus
  * OUTSIDE the measured region, then measure a FIXED 5-doc forget
  * (replica-0 ids — present at every corpus size):
  *
  *  - bytes read (/proc/self/io rchar — see the DeltaScaling note on why
  *    task/FS metrics underreport local parquet) and bytes written
  *    (wchar) during the remove, vs the on-disk index size;
  *  - the expected touched fraction: 5/nParts of the sigs table plus
  *    1-(1-1/nParts)^(5·nBands) of the bands table (band keys fan out
  *    nBands× per doc, so the bands arm dominates — and shrinks as
  *    nParts scales with the corpus).
  *
  * Second axis: FIXED largest corpus, growing forget set (1/5/25 docs) —
  * cost grows with shards hit, saturating at the whole index only when
  * the forget set itself is index-scale.
  *
  * Usage: runMain graft.tools.ForgetScaling [outJson]
  * (default forget_scaling.json; a fresh index is bootstrapped per
  * measurement because forget MUTATES its target).
  */
object ForgetScaling {
  private val IdStride = 100000000L
  private val NParts = 256

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("forget_scaling.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ioStat(key: String): Long = {
      val io = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/io")), "UTF-8")
      io.linesIterator.find(_.startsWith(key + ":"))
        .map(_.split(" ")(1).trim.toLong).getOrElse(0L)
    }
    def measured[A](f: => A): (A, Long, Long, Double) = {
      val (r0, w0) = (ioStat("rchar"), ioStat("wchar"))
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      (r, ioStat("rchar") - r0, ioStat("wchar") - w0, sec)
    }
    def dirBytes(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(path))
    }

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i * IdStride)).as("doc_id"),
      regexp_replace(col("text"), "(\\S+)", "$1§" + i).as("text"))

    // forget sets: lowest replica-0 ids — present at every corpus size
    val forgetIds = base.orderBy("doc_id").limit(25)
      .select("doc_id").collect().map(_.getLong(0)).toSeq

    def bootstrap(replicas: Int, leaf: String): (String, Long) = {
      val corpus = (0 until replicas).map(replica).reduce(_ unionByName _)
      val path = graft.ops.Staging.dir(
        "/tmp/graft_forget_scaling", "/root/testdata/sf0.1", leaf)
      DedupOps.writeSignatureIndex(DedupOps.signatureIndex(
        corpus, ShingleK, NumPerms, NumBands, RowsPerBand),
        path, NumPerms, NumBands, RowsPerBand, nParts = NParts)
      spark.catalog.clearCache()
      (path, dirBytes(path))
    }
    def expectedBandFrac(nDocs: Int): Double =
      1.0 - math.pow(1.0 - 1.0 / NParts, nDocs.toDouble * NumBands)

    import spark.implicits._
    val out = new StringBuilder
    out.append(s"""{\n  "n_parts": $NParts, "n_bands": $NumBands,\n""")
    out.append("  \"corpus_axis_forget5\": [\n")
    val rows = for (replicas <- Seq(1, 4, 16)) yield {
      val (path, idxBytes) = bootstrap(replicas, s"x$replicas")
      val (_, rB, wB, sec) = measured {
        DedupOps.removeFromSignatureIndex(forgetIds.take(5).toDF("doc_id"),
          path, NumPerms, NumBands, RowsPerBand, nParts = NParts)
      }
      println(f"[forget] x$replicas%-3d idx ${idxBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.1fMB write ${wB / 1e6}%7.1fMB ${sec}%.2fs " +
        f"(expected touched frac ≈ ${5.0 / NParts + expectedBandFrac(5)}%.3f)")
      f"""    {"replicas": $replicas, "index_mb": ${idxBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.2f, "write_mb": ${wB / 1e6}%.2f, "sec": $sec%.3f, "read_over_index": ${rB.toDouble / idxBytes}%.3f, "expected_touched_frac": ${5.0 / NParts + expectedBandFrac(5)}%.3f}"""
    }
    out.append(rows.mkString(",\n")).append("\n  ],\n")
    out.append("  \"forget_size_axis_x16\": [\n")
    val rows2 = for (k <- Seq(1, 5, 25)) yield {
      val (path, idxBytes) = bootstrap(16, s"k$k")
      val (_, rB, wB, sec) = measured {
        DedupOps.removeFromSignatureIndex(forgetIds.take(k).toDF("doc_id"),
          path, NumPerms, NumBands, RowsPerBand, nParts = NParts)
      }
      println(f"[forget] k=$k%-3d idx ${idxBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.1fMB write ${wB / 1e6}%7.1fMB ${sec}%.2fs")
      f"""    {"forget_docs": $k, "index_mb": ${idxBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.2f, "write_mb": ${wB / 1e6}%.2f, "sec": $sec%.3f, "read_over_index": ${rB.toDouble / idxBytes}%.3f, "expected_touched_frac": ${k.toDouble / NParts + expectedBandFrac(k)}%.3f}"""
    }
    out.append(rows2.mkString(",\n")).append("\n  ],\n")
    // LOGICAL forget (tombstone append): write I/O is O(|F|) and
    // corpus-independent — the deletion-vector path for retraction
    // traffic that can tolerate purge-at-next-compaction retention
    out.append("  \"logical_forget5\": [\n")
    var purgeTarget: String = null
    val rows3 = for (replicas <- Seq(1, 4, 16)) yield {
      val (path, idxBytes) = bootstrap(replicas, s"l$replicas")
      if (replicas == 16) purgeTarget = path
      val (_, rB, wB, sec) = measured {
        DedupOps.tombstoneInSignatureIndex(forgetIds.take(5).toDF("doc_id"), path)
      }
      println(f"[forget] logical x$replicas%-3d idx ${idxBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.2fMB write ${wB / 1e6}%7.2fMB ${sec}%.2fs")
      f"""    {"replicas": $replicas, "index_mb": ${idxBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.3f, "write_mb": ${wB / 1e6}%.3f, "sec": $sec%.3f, "write_over_index": ${wB.toDouble / idxBytes}%.5f}"""
    }
    out.append(rows3.mkString(",\n")).append("\n  ],\n")
    // the purge at maintenance time settles the physical debt — its cost
    // is the physical forget's, paid once per compaction instead of per
    // retraction batch
    val (_, rP, wP, secP) = measured {
      DedupOps.compactSignatureIndex(spark, purgeTarget)
    }
    println(f"[forget] purge  x16  read ${rP / 1e6}%7.1fMB write ${wP / 1e6}%7.1fMB ${secP}%.2fs")
    out.append(f"""  "purge_x16": {"read_mb": ${rP / 1e6}%.2f, "write_mb": ${wP / 1e6}%.2f, "sec": $secP%.3f}\n}\n""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), out.toString)
    println(s"[forget] wrote $outPath")
    spark.stop()
  }
}
