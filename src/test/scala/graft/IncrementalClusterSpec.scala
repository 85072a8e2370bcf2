package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** Pins the incremental cluster store
  * ([[DedupOps.mergeClustersBatch]]): folding batches of pairs into the
  * persisted labels must reproduce [[DedupOps.connectedComponents]]'s
  * min-reachable-id labeling of the FULL edge history, merges must
  * relabel every member of every losing cluster (including chains across
  * batches and a new id smaller than an existing label), replays must
  * write nothing, and the two store tables must stay consistent. */
class IncrementalClusterSpec extends SparkSpec {
  import spark.implicits._

  private def store(leaf: String): String =
    graft.ops.Staging.dir("/tmp/graft_cluster_spec", "/root/testdata/sf0.001", leaf)

  private def byDoc(p: String): Map[Long, Long] = spark.read
    .schema(org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, cluster_id BIGINT, doc_pt INT"))
    .parquet(s"$p/by_doc")
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def byCluster(p: String): Set[(Long, Long)] = spark.read
    .schema(org.apache.spark.sql.types.StructType.fromDDL(
      "cluster_id BIGINT, doc_id BIGINT, cluster_pt INT"))
    .parquet(s"$p/by_cluster")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def dfPairs(ps: Seq[(Long, Long)]) = ps.toDF("id_l", "id_r")
  private def dfNodes(ns: Seq[Long]) = ns.toDF("id")

  test("three-epoch incremental merge equals the from-scratch labeling on the real fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val pairs = graft.queries.DedupQueries.minhashPairs(spark, "/root/testdata/sf0.001")
      .select("id_l", "id_r").persist()
    val p = store("fixture")
    for (m <- 0 to 2)
      DedupOps.mergeClustersBatch(
        docs.where(col("doc_id") % 3 === m).select(col("doc_id").as("id")),
        pairs.where(greatest(col("id_l") % 3, col("id_r") % 3) === m), p)
    val want = DedupOps.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = byDoc(p)
    assert(got == want, "incremental labels diverge from the full recompute")
    // both tables hold the same relation
    assert(byCluster(p).map(_.swap) == got.toSet)
    // the fixture must exercise a real merge or the test is weak
    assert(want.values.toSet.size < want.size, "no multi-doc cluster in fixture")
    pairs.unpersist(): Unit
  }

  test("chain merges across batches and a smaller NEW id relabel whole clusters") {
    val p = store("chain")
    // bootstrap: clusters {10,11}=10, {20,21}=20, {30,31}=30, singleton 40
    DedupOps.mergeClustersBatch(
      dfNodes(Seq(10L, 11L, 20L, 21L, 30L, 31L, 40L)),
      dfPairs(Seq((10L, 11L), (20L, 21L), (30L, 31L))), p)
    assert(byDoc(p) == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 40L -> 40L))
    // batch 1: chain 21—31 and 31—40 merges three components into root 20
    val r1 = DedupOps.mergeClustersBatch(
      dfNodes(Seq.empty), dfPairs(Seq((21L, 31L), (31L, 40L))), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map.empty) // receipt covers NODES only; none passed
    assert(byDoc(p) == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 20L, 31L -> 20L, 40L -> 20L),
      "chain merge did not relabel all members of the losing clusters")
    // batch 2: NEW id 5 pairs with 10 — the existing cluster's label is
    // LARGER, so cluster 10 itself loses and every member relabels to 5
    val r2 = DedupOps.mergeClustersBatch(
      dfNodes(Seq(5L)), dfPairs(Seq((5L, 10L))), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(5L -> 5L))
    assert(byDoc(p)(10L) == 5L && byDoc(p)(11L) == 5L && byDoc(p)(5L) == 5L,
      "smaller new id did not take over the existing cluster")
    assert(byCluster(p).map(_.swap) == byDoc(p).toSet)
  }

  test("replayed merge writes nothing: store files byte-dated, receipt stable") {
    val p = store("replay")
    DedupOps.mergeClustersBatch(dfNodes(Seq(1L, 2L, 3L)),
      dfPairs(Seq((1L, 2L))), p)
    val r1 = DedupOps.mergeClustersBatch(dfNodes(Seq(4L)),
      dfPairs(Seq((2L, 4L))), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(4L -> 1L))
    def stamps(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f.getPath -> f.lastModified)
      walk(new java.io.File(p)).toMap
    }
    val before = stamps()
    val content = byDoc(p)
    val r2 = DedupOps.mergeClustersBatch(dfNodes(Seq(4L)),
      dfPairs(Seq((2L, 4L))), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == r1, "replay receipt diverged")
    assert(byDoc(p) == content)
    assert(stamps() == before, "replayed merge rewrote store files")
  }

  test("manifest: mismatched nParts is rejected before any mutation") {
    val p = store("manifest")
    DedupOps.mergeClustersBatch(dfNodes(Seq(1L, 2L)), dfPairs(Seq((1L, 2L))), p)
    val before = byDoc(p)
    intercept[IllegalArgumentException] {
      DedupOps.mergeClustersBatch(dfNodes(Seq(3L)), dfPairs(Seq((2L, 3L))), p,
        nParts = DedupOps.IndexParts * 2)
    }
    assert(byDoc(p) == before)
  }

  test("crash recovery: a completed staging on the store rolls forward at open") {
    val p = store("crash")
    DedupOps.mergeClustersBatch(dfNodes(Seq(1L, 2L, 3L, 4L)),
      dfPairs(Seq((1L, 2L), (3L, 4L))), p)
    // stage a self-rewrite of by_doc, crash before the swap; the next
    // merge (which recovers at open) must roll it forward and keep content
    val pts = new java.io.File(s"$p/by_doc").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("doc_pt="))
      .map(_.getName.stripPrefix("doc_pt=").toInt).toSeq
    val rows = spark.read.parquet(s"$p/by_doc").where(col("doc_pt").isin(pts: _*))
    DedupOps.stageShards(rows, s"$p/by_doc", "doc_pt", pts.size, pts)
    val content = byDoc(p)
    val r = DedupOps.mergeClustersBatch(dfNodes(Seq(5L)),
      dfPairs(Seq((2L, 5L))), p)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(5L -> 1L))
    assert(byDoc(p) == content + (5L -> 1L))
    val litter = new java.io.File(s"$p/by_doc").listFiles().map(_.getName)
      .filter(n => n == ".staging" || n.startsWith(".old."))
    assert(litter.isEmpty, s"open did not heal: ${litter.mkString(",")}")
  }
}
