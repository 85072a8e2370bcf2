package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DedupOps
import graft.queries.DedupQueries.{ShingleK, NumPerms, NumBands, RowsPerBand}

/** Measured evidence for the r17-verdict lead "sig-index presence probe
  * lacks the bloom idiom" (round-18 ask #5): does
  * [[DedupOps.appendNewToSignatureIndex]]'s probe — doc_pt prune +
  * broadcast semi over `sigs` — leave enough intra-shard row-group I/O
  * on the table that per-file doc_id BLOOM FILTERS (the
  * vector_forget_scaling idiom that closed the IVF audit) would pay for
  * their write tax?
  *
  * Three probe shapes over the SAME partitioned sigs table, 1×/4×/16×
  * corpus, fixed 10-id probe set of PRESENT ids interleaved across the
  * corpus (scattered ids are the honest case: fresh-id batches sit
  * outside every row group's [min,max] and are pruned by stats alone,
  * which would flatter the no-bloom arms):
  *
  *  - `semi`:  doc_pt prune + broadcast left-semi (today's probe);
  *    column pruning means it reads only the doc_id chunks of touched
  *    shards — the question is how much of THAT blooms can remove.
  *  - `push`:  doc_pt prune + doc_id isin pushdown, NO blooms — what
  *    row-group [min,max] stats alone skip for scattered ids.
  *  - `push_bloom`: the same pushdown over a bloom-written copy of the
  *    table — footer + bloom metadata + matched row groups only.
  *
  * Also measured: the bloom WRITE tax (seconds and on-disk bytes, plain
  * vs bloom write of the same sigs rows) — the cost side of adoption.
  * Protocol follows [[DeltaScaling]]: /proc/self/io rchar deltas,
  * min-of-3 cache-cleared reps, verdict equality across shapes.
  *
  * Usage: runMain graft.tools.SigProbeScaling [outJson]
  * (default sig_probe_scaling.json). */
object SigProbeScaling {
  private val IdStride = 100000000L
  private val NParts = 256

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("sig_probe_scaling.json")
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
    def measured[A](f: => A): (A, Long, Double) = {
      val b0 = rchar()
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      (r, rchar() - b0, sec)
    }

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val baseIds = base.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))

    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i * IdStride)).as("doc_id"),
      regexp_replace(col("text"), "(\\S+)", "$1§" + i).as("text"))

    val out = new StringBuilder
    out.append("{\n  \"probe_ids\": 10, \"n_parts\": " + NParts + ",\n")
    out.append("  \"runs\": [\n")
    val rows = for (replicas <- Seq(1, 4, 16)) yield {
      val corpus = (0 until replicas).map(replica).reduce(_ unionByName _)
      val sigs = DedupOps.signatureIndex(
        corpus, ShingleK, NumPerms, NumBands, RowsPerBand).persist()
      val nDocs = sigs.count()
      val root = graft.ops.Staging.dir(
        "/tmp/graft_sig_probe", "/root/testdata/sf0.1", s"x$replicas")
      // plain write (today's layout) vs bloom write of the SAME rows —
      // both timed for the write-tax side of the adjudication
      val sigRows = sigs.select(col("doc_id"), col("hs"))
        .withColumn("doc_pt", pmod(col("doc_id"), lit(NParts.toLong)).cast("int"))
        .repartition(NParts, col("doc_pt"))
        .localCheckpoint(true)
      sigs.unpersist()
      val (_, _, plainWriteSec) = measured {
        sigRows.write.mode("overwrite").partitionBy("doc_pt")
          .parquet(s"$root/sigs_plain")
      }
      val (_, _, bloomWriteSec) = measured {
        sigRows.write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#doc_id", "true")
          .option("parquet.bloom.filter.adaptive.enabled", "true")
          .option("parquet.bloom.filter.expected.ndv#doc_id", "200000")
          .partitionBy("doc_pt").parquet(s"$root/sigs_bloom")
      }
      // control: right-sized blooms (ndv matched to per-shard row counts)
      // — rules out "the blooms only lost because they were oversized"
      val (_, _, bloom4kWriteSec) = measured {
        sigRows.write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#doc_id", "true")
          .option("parquet.bloom.filter.adaptive.enabled", "true")
          .option("parquet.bloom.filter.expected.ndv#doc_id", "4096")
          .partitionBy("doc_pt").parquet(s"$root/sigs_bloom4k")
      }
      val plainMb = dirBytes(s"$root/sigs_plain") / 1e6
      val bloomMb = dirBytes(s"$root/sigs_bloom") / 1e6
      val bloom4kMb = dirBytes(s"$root/sigs_bloom4k") / 1e6

      // 10 PRESENT ids, interleaved across the whole corpus (stride over
      // base ids × replica offsets) — scattered, so [min,max] cannot
      // prune them; exactly the append-probe shape for re-ingested or
      // hash-assigned doc ids
      val probeIds = (0 until 10).map { k =>
        baseIds((k * baseIds.length) / 10) + (k % replicas) * IdStride
      }.toSeq
      val dpts = probeIds.map(i => (((i % NParts) + NParts) % NParts).toInt).distinct
      import spark.implicits._

      def probeSemi(table: String): Seq[Long] =
        spark.read.parquet(s"$root/$table")
          .where(col("doc_pt").isin(dpts: _*))
          .join(broadcast(probeIds.toDF("doc_id")), Seq("doc_id"), "left_semi")
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      def probePush(table: String): Seq[Long] =
        spark.read.parquet(s"$root/$table")
          .where(col("doc_pt").isin(dpts: _*) &&
            col("doc_id").isin(probeIds: _*))
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

      def best(f: () => Seq[Long]): (Seq[Long], Long, Double) = {
        val reps = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          measured(f())
        }
        (reps.head._1, reps.map(_._2).min, reps.map(_._3).min)
      }
      val (semiRes, semiB, semiS) = best(() => probeSemi("sigs_plain"))
      val (pushRes, pushB, pushS) = best(() => probePush("sigs_plain"))
      val (bloomRes, bloomB, bloomS) = best(() => probePush("sigs_bloom"))
      val (bloom4kRes, bloom4kB, bloom4kS) = best(() => probePush("sigs_bloom4k"))
      require(semiRes == pushRes && pushRes == bloomRes &&
        bloomRes == bloom4kRes && semiRes.size == probeIds.size,
        s"probe verdicts diverged at x$replicas: semi=$semiRes push=$pushRes bloom=$bloomRes")
      println(f"[sigprobe] x$replicas%-3d docs=$nDocs%7d | semi ${semiS}%.2fs ${semiB / 1e6}%7.2fMB | " +
        f"push ${pushS}%.2fs ${pushB / 1e6}%7.2fMB | push+bloom ${bloomS}%.2fs ${bloomB / 1e6}%7.2fMB | " +
        f"push+bloom4k ${bloom4kS}%.2fs ${bloom4kB / 1e6}%7.2fMB | " +
        f"write ${plainWriteSec}%.1fs/${bloomWriteSec}%.1fs/${bloom4kWriteSec}%.1fs " +
        f"${plainMb}%.1f/${bloomMb}%.1f/${bloom4kMb}%.1fMB")
      f"""    {"replicas": $replicas, "corpus_docs": $nDocs, "sigs_plain_mb": $plainMb%.1f, "sigs_bloom_mb": $bloomMb%.1f, "sigs_bloom4k_mb": $bloom4kMb%.1f, "plain_write_sec": $plainWriteSec%.2f, "bloom_write_sec": $bloomWriteSec%.2f, "bloom4k_write_sec": $bloom4kWriteSec%.2f, "semi_sec": $semiS%.3f, "semi_read_mb": ${semiB / 1e6}%.2f, "push_sec": $pushS%.3f, "push_read_mb": ${pushB / 1e6}%.2f, "push_bloom_sec": $bloomS%.3f, "push_bloom_read_mb": ${bloomB / 1e6}%.2f, "push_bloom4k_sec": $bloom4kS%.3f, "push_bloom4k_read_mb": ${bloom4kB / 1e6}%.2f}"""
    }
    out.append(rows.mkString(",\n")).append("\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      out.toString.getBytes("UTF-8"))
    println(s"[sigprobe] wrote $outPath")
    spark.stop()
  }

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }
}
