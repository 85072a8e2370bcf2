package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured evidence for the VECTOR-forget scale claim (round 17, verdict
  * ask #3): the one rows-proportional step in any retraction path was
  * [[graft.streaming.StreamingOps.forgetVectorsBatch]]'s presence audit —
  * a column-pruned vec_id scan of the generation's whole postings. The
  * audit now pushes the forget batch's id list into the parquet scan,
  * where per-file bloom filters on vec_id skip non-matching row groups;
  * this tool measures what that actually reads as the corpus grows.
  *
  * Protocol (the ForgetScaling idiom): synthesize deterministic unit
  * vectors at 64k/256k/1M rows (16× span — the embeddings fixture is only
  * 500 rows, far too small to show a scan's growth), bootstrap a fresh
  * IVF index per corpus via the REAL streaming op (one bootstrap batch +
  * one insert batch), then measure a FIXED 5-id forget:
  *
  *  - bytes read/written during forgetVectorsBatch (/proc/self/io
  *    rchar/wchar — task metrics underreport local parquet);
  *  - the same corpus axis for the PRE-r17 audit shape (a broadcast
  *    semi-join over the column-pruned vec_id scan — still the fallback
  *    past PresencePushdownLimit), so the before/after is measured, not
  *    asserted.
  *
  * Usage: runMain graft.tools.VectorForgetScaling [outJson]
  * (default vector_forget_scaling.json; fresh index per measurement —
  * forget MUTATES its target).
  */
object VectorForgetScaling {
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("vector_forget_scaling.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.StreamingOps

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

    // deterministic unit vectors: hash-seeded gaussians, any corpus size
    def corpus(n: Long): DataFrame = {
      val comps = (0 until Dim).map(j =>
        sin((col("vec_id") * (j * 2654435761L % 1000003L + 1L) + j)
          .cast("double")))
      val raw = array(comps: _*)
      val nrm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
      spark.range(n).select(col("id").as("vec_id"),
        transform(raw, x => (x / nrm).cast("float")).as("embedding"))
    }

    // bootstrap carries the bulk (batch 0 searches an empty index — free);
    // batch 1 stays small, or its search stage would be batch × cell-sized
    // (the measurement wants big POSTINGS, not a big probe)
    def bootstrap(n: Long, leaf: String): (String, Long) = {
      val path = graft.ops.Staging.dir(
        "/tmp/graft_vforget_scaling", "/root/testdata/sf0.1", leaf)
      val c = corpus(n).localCheckpoint(true)
      StreamingOps.ivfSearchInsertBatch(
        c.where(col("vec_id") < n - 128), path, batchId = 0L)
      StreamingOps.ivfSearchInsertBatch(
        c.where(col("vec_id") >= n - 128), path, batchId = 1L)
      spark.catalog.clearCache()
      (path, dirBytes(path))
    }

    import spark.implicits._
    // fixed forget set, present at every corpus size, never centroid seeds
    val forgetIds = Seq(3L, 5L, 7L, 9L, 11L)
    val out = new StringBuilder
    out.append("{\n  \"forget_vecs\": 5, \"dim\": 64,\n")
    out.append("  \"corpus_axis_pushdown_audit\": [\n")
    val rows = for (n <- Seq(65536L, 262144L, 1048576L)) yield {
      val (path, idxBytes) = bootstrap(n, s"n$n")
      val (_, rB, wB, sec) = measured {
        StreamingOps.forgetVectorsBatch(forgetIds.toDF("vec_id"), path).count()
      }
      println(f"[vforget] n=$n%-7d idx ${idxBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.2fMB write ${wB / 1e6}%7.3fMB ${sec}%.2fs")
      f"""    {"corpus_vecs": $n, "index_mb": ${idxBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.3f, "write_mb": ${wB / 1e6}%.4f, "sec": $sec%.3f, "read_over_index": ${rB.toDouble / idxBytes}%.4f}"""
    }
    out.append(rows.mkString(",\n")).append("\n  ],\n")
    // the pre-r17 shape (and the fallback past PresencePushdownLimit):
    // broadcast semi-join over the column-pruned vec_id scan — measured
    // by probing the SAME postings the way the old audit did
    out.append("  \"corpus_axis_semi_scan_fallback\": [\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, centroid_id BIGINT, batch_id BIGINT")
    val rows2 = for (n <- Seq(65536L, 262144L, 1048576L)) yield {
      val (path, idxBytes) = bootstrap(n, s"s$n")
      val gd = StreamingOps.resolveIndex(spark, path)
      val (_, rB, _, sec) = measured {
        spark.read.schema(schema).parquet(s"$gd/postings").select("vec_id")
          .join(broadcast(forgetIds.toDF("vec_id")), Seq("vec_id"), "left_semi")
          .count()
      }
      println(f"[vforget] semi n=$n%-7d idx ${idxBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.2fMB ${sec}%.2fs")
      f"""    {"corpus_vecs": $n, "index_mb": ${idxBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.3f, "sec": $sec%.3f, "read_over_index": ${rB.toDouble / idxBytes}%.4f}"""
    }
    out.append(rows2.mkString(",\n")).append("\n  ]\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), out.toString)
    println(s"[vforget] wrote $outPath")
    spark.stop()
  }
}
