package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Measured evidence for the cluster-store FORGET scale claim (round 16):
  * a [[DedupOps.forgetFromClusterStore]] retraction reads and rewrites
  * ONLY the shards its affected components hit — member lookups, edge
  * reads, and the three-table staged rewrite are all pruned to the
  * forgotten docs' clusters — so right-to-be-forgotten stays affordable
  * as the labeled corpus grows.
  *
  * Protocol (the ClusterScaling axes): build stores of 200k/800k/3.2M
  * labeled docs (nParts=256; bootstrap + one seeding merge OUTSIDE the
  * measured region, so the forget hits real multi-doc clusters with
  * stored edge evidence), then measure a FIXED forget batch — 10 docs
  * drawn from 10 distinct seeded clusters (each a chain member, so the
  * recompute must consult edges) — via /proc/self/io rchar/wchar.
  * Expectation: read/store and write/store FALL as the store grows
  * (touched-shard count is forget-sized); absolute bytes track shard
  * size, never store row count.
  *
  * Second axis: fixed largest store, growing forget set (2/10/50 docs)
  * — cost grows with shards hit, not store size.
  *
  * Usage: runMain graft.tools.ClusterForgetScaling [outJson]
  * (a fresh store per measurement — forgets MUTATE their target).
  */
object ClusterForgetScaling {
  private val NParts = 256
  private val BaseDocs = 200000L

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("cluster_forget_scaling.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

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

    /** Store of n docs: singleton bootstrap, then ONE seeding merge
      * chains docs k*1000..k*1000+4 into 5-member clusters for the first
      * 200 k-blocks (edge evidence: the 4 chain pairs per cluster). Both
      * steps outside the measured region. */
    def build(n: Long, leaf: String): (String, Long) = {
      val p = graft.ops.Staging.dir("/tmp/graft_cluster_fscaling", "/root/repo", leaf)
      val nodes = spark.range(n).select(col("id"))
      DedupOps.mergeClustersBatch(nodes, Seq.empty[(Long, Long)].toDF("id_l", "id_r"),
        p, nParts = NParts)
      val seedPairs = spark.range(200).select(col("id").as("k"))
        .withColumn("j", explode(sequence(lit(1L), lit(4L))))
        .select((col("k") * 1000L + col("j") - 1L).as("id_l"),
          (col("k") * 1000L + col("j")).as("id_r"))
      DedupOps.mergeClustersBatch(spark.range(0).select(col("id")), seedPairs,
        p, nParts = NParts)
      spark.catalog.clearCache()
      (p, dirBytes(p))
    }
    /** The measured forget batch: the MIDDLE member (k*1000+2) of the
      * first `k` seeded chains — a bridge doc, so each affected cluster
      * SPLITS and the recompute must consult the stored edges. */
    def forgetSet(k: Int) = (0 until k).map(i => i * 1000L + 2L).toDF("doc_id")

    val out = new StringBuilder
    out.append(s"""{\n  "n_parts": $NParts,\n  "store_axis_forget10": [\n""")
    val rows = for (replicas <- Seq(1, 4, 16)) yield {
      val (p, storeBytes) = build(BaseDocs * replicas, s"x$replicas")
      val (_, rB, wB, sec) = measured {
        DedupOps.forgetFromClusterStore(forgetSet(10), p, nParts = NParts)
          .count(): Unit
      }
      println(f"[cforget] x$replicas%-3d store ${storeBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.2fMB write ${wB / 1e6}%7.2fMB ${sec}%.2fs")
      f"""    {"docs": ${BaseDocs * replicas}, "store_mb": ${storeBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.2f, "write_mb": ${wB / 1e6}%.2f, "sec": $sec%.3f, "read_over_store": ${rB.toDouble / storeBytes}%.3f, "write_over_store": ${wB.toDouble / storeBytes}%.3f}"""
    }
    out.append(rows.mkString(",\n")).append("\n  ],\n")
    out.append("  \"batch_axis_x16\": [\n")
    val rows2 = for (k <- Seq(2, 10, 50)) yield {
      val (p, storeBytes) = build(BaseDocs * 16, s"k$k")
      val (_, rB, wB, sec) = measured {
        DedupOps.forgetFromClusterStore(forgetSet(k), p, nParts = NParts)
          .count(): Unit
      }
      println(f"[cforget] k=$k%-3d store ${storeBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.2fMB write ${wB / 1e6}%7.2fMB ${sec}%.2fs")
      f"""    {"forget_docs": $k, "store_mb": ${storeBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.2f, "write_mb": ${wB / 1e6}%.2f, "sec": $sec%.3f, "read_over_store": ${rB.toDouble / storeBytes}%.3f}"""
    }
    out.append(rows2.mkString(",\n")).append("\n  ]\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), out.toString)
    println(s"[cforget] wrote $outPath")
    spark.stop()
  }
}
