package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Measured evidence for the cluster-store scale claim (round 15): a
  * [[DedupOps.mergeClustersBatch]] merge reads and rewrites ONLY the
  * shards its affected clusters and docs hit — never the whole store —
  * so incremental cluster maintenance stays affordable as the labeled
  * corpus grows.
  *
  * Protocol (the ForgetScaling axes): build stores of 200k/800k/3.2M
  * labeled docs (nParts=256; bootstrap + one seeding merge OUTSIDE the
  * measured region, so the measured merge has real multi-doc clusters to
  * merge into), then measure a FIXED merge batch — 10 pairs chaining 20
  * existing clusters plus 5 new docs — via /proc/self/io rchar/wchar.
  * Expectation: touched-shard COUNT is batch-sized (≤ affected doc_pts +
  * cluster_pts), so read/store and write/store fall as the store grows;
  * absolute bytes grow only with shard size (store/nParts), never with
  * store row count at fixed shard count.
  *
  * Second axis: fixed largest store, growing batch (2/10/50 pairs) —
  * cost grows with shards hit, not store size.
  *
  * Usage: runMain graft.tools.ClusterScaling [outJson]
  * (a fresh store per measurement — merges MUTATE their target).
  */
object ClusterScaling {
  private val NParts = 256
  private val BaseDocs = 200000L

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("cluster_merge_scaling.json")
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

    /** Store of n docs: bootstrap all docs as singletons (empty pair set —
      * cheap at any n), then ONE seeding merge groups docs into clusters
      * of 5 (ids k*1000..k*1000+4 for the first 200 k-blocks) so the
      * measured merge has real clusters to chain. Both steps are outside
      * the measured region. */
    def build(n: Long, leaf: String): (String, Long) = {
      val p = graft.ops.Staging.dir("/tmp/graft_cluster_scaling", "/root/repo", leaf)
      val nodes = spark.range(n).select(col("id"))
      DedupOps.mergeClustersBatch(nodes, Seq.empty[(Long, Long)].toDF("id_l", "id_r"),
        p, nParts = NParts)
      val seedPairs = spark.range(200).select(col("id").as("k"))
        .withColumn("j", explode(sequence(lit(1L), lit(4L))))
        .select((col("k") * 1000L).as("id_l"), (col("k") * 1000L + col("j")).as("id_r"))
      DedupOps.mergeClustersBatch(spark.range(0).select(col("id")), seedPairs,
        p, nParts = NParts)
      spark.catalog.clearCache()
      (p, dirBytes(p))
    }
    /** The fixed measured batch: `pairs` chain pairs linking consecutive
      * seeded clusters (k*1000 -> (k+1)*1000 for k < pairs) plus 5 new
      * docs joining the first cluster. */
    def batch(pairs: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val ps = (0 until pairs).map(k => (k * 1000L, (k + 1) * 1000L)) ++
        (1L to 5L).map(i => (900000000L + i, 0L))
      (Seq.empty[Long].toDF("id"), ps.toDF("id_l", "id_r"))
    }

    val out = new StringBuilder
    out.append(s"""{\n  "n_parts": $NParts,\n  "store_axis_merge10": [\n""")
    val rows = for (replicas <- Seq(1, 4, 16)) yield {
      val (p, storeBytes) = build(BaseDocs * replicas, s"x$replicas")
      val (ns, ps) = batch(10)
      val (_, rB, wB, sec) = measured {
        DedupOps.mergeClustersBatch(ns, ps, p, nParts = NParts).count(): Unit
      }
      println(f"[cluster] x$replicas%-3d store ${storeBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.2fMB write ${wB / 1e6}%7.2fMB ${sec}%.2fs")
      f"""    {"docs": ${BaseDocs * replicas}, "store_mb": ${storeBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.2f, "write_mb": ${wB / 1e6}%.2f, "sec": $sec%.3f, "read_over_store": ${rB.toDouble / storeBytes}%.3f, "write_over_store": ${wB.toDouble / storeBytes}%.3f}"""
    }
    out.append(rows.mkString(",\n")).append("\n  ],\n")
    out.append("  \"batch_axis_x16\": [\n")
    val rows2 = for (k <- Seq(2, 10, 50)) yield {
      val (p, storeBytes) = build(BaseDocs * 16, s"k$k")
      val (ns, ps) = batch(k)
      val (_, rB, wB, sec) = measured {
        DedupOps.mergeClustersBatch(ns, ps, p, nParts = NParts).count(): Unit
      }
      println(f"[cluster] k=$k%-3d store ${storeBytes / 1e6}%8.1fMB " +
        f"read ${rB / 1e6}%7.2fMB write ${wB / 1e6}%7.2fMB ${sec}%.2fs")
      f"""    {"merge_pairs": $k, "store_mb": ${storeBytes / 1e6}%.1f, "read_mb": ${rB / 1e6}%.2f, "write_mb": ${wB / 1e6}%.2f, "sec": $sec%.3f, "read_over_store": ${rB.toDouble / storeBytes}%.3f}"""
    }
    out.append(rows2.mkString(",\n")).append("\n  ]\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), out.toString)
    println(s"[cluster] wrote $outPath")
    spark.stop()
  }
}
