package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Round-16 wave 38: retraction closes the incremental-dedup loop —
  * beyond the DuckDB hash checks, pin the CLAIMS the two new entries
  * exist to make (a hash check alone stays green on a vacuous fixture).
  *
  *  - dedup_clusters_forget: the forget batch genuinely reshapes the
  *    store (forgotten docs sat in multi-doc clusters pre-forget), the
  *    forgotten docs are GONE from the output, and survivors still form
  *    multi-doc clusters.
  *  - q_dedup_recall_forget: the lifecycle (append → forget → purge →
  *    append) arm is row-identical to the never-inserted baseline, the
  *    truth set is non-empty, and the stressed banding leaves the gate
  *    room to move (recall < 1).
  */
class Wave38QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_clusters_forget: forgotten docs gone, forget non-vacuous, survivors still cluster") {
    val out = DedupQueries.dedupClustersForget.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val forgotten = out.filter(t => t._1 % 7 == 1 && t._1 % 3 < 2)
    assert(forgotten.isEmpty, s"forgotten docs still labeled: ${forgotten.take(3).toSeq}")
    assert(out.exists(_._3 > 1), "no multi-doc cluster among survivors — weak fixture")
    // the forget must have had something to retract: pre-forget labeling
    // (the delta entry's world) put at least one forgotten doc in a
    // multi-doc cluster, so the retraction genuinely reshaped components
    val pre = DedupQueries.dedupClustersDelta.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(pre.exists(t => t._1 % 7 == 1 && t._1 % 3 < 2 && t._2 > 1),
      "no forgotten doc was in a multi-doc cluster — forget vacuous on this fixture")
    // survivors count = pre-forget docs minus the forget set
    val nForget = pre.count(t => t._1 % 7 == 1 && t._1 % 3 < 2)
    assert(out.length == pre.length - nForget)
  }

  test("q_dedup_recall_forget: lifecycle row-identical to the never-inserted baseline, gate non-vacuous") {
    val rows = DedupQueries.dedupRecallForget.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(rows.keySet == Set("baseline", "lifecycle"))
    assert(rows("lifecycle") == rows("baseline"),
      s"post-purge state diverged from the never-inserted baseline: $rows")
    val (nIdx, nTrue, found, recallE4, nCand, _) = rows("lifecycle")
    assert(nIdx > 0 && nTrue > 0, s"no indexed docs or no truth pairs — vacuous: $rows")
    // (the "gate can move" property of the 4x16 banding — found < nTrue —
    // holds at the driver's sf0.01 gate scale (17/18 measured) but can
    // saturate on the 7-pair sf0.001 smoke sample; the spec pins the
    // invariants that hold at every scale)
    assert(found <= nTrue && recallE4 > 0 && recallE4 <= 10000)
    assert(nCand >= found, s"candidate set smaller than its true hits: $rows")
  }

  test("dedup_clusters_stable_ids: label churn and late allocation both occur on the fixture") {
    val out = DedupQueries.dedupClustersStableIds.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // the entry's point: at least one component's current min-member
    // label differs from its stable ext id (a smaller id joined after
    // allocation and the ext id survived the churn)
    assert(out.exists(t => t._2 != t._3),
      "no component churned its label — stability claim vacuous on this fixture")
    assert(out.exists(_._4 > 0), "every allocation at epoch 0 — no evolution")
    // ext ids are unique per component and the partition matches labels
    val byCluster = out.groupBy(_._2)
    assert(byCluster.forall { case (_, rows) => rows.map(_._3).distinct.length == 1 },
      "a component carries two ext ids")
    val extOwners = byCluster.map { case (c, rows) => rows.head._3 -> c }
    assert(extOwners.size == byCluster.size, "an ext id is shared by two components")
  }

  test("ann_delta_forget: retraction displaced real partners and no forgotten vector surfaces") {
    import graft.queries.VectorQueries
    val noForget = VectorQueries.annDeltaEvolve.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val withForget = VectorQueries.annDeltaForget.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(noForget.nonEmpty && withForget.nonEmpty, "empty probes — vacuous")
    def isForgot(id: Long) = id % 9 == 1 && !(id % 41 == 0 && id < 1312)
    assert(noForget.exists(h => isForgot(h._2)),
      "no forgotten id was ever a partner — the forget had nothing to displace")
    assert(!withForget.exists(h => isForgot(h._2)),
      "a forgotten vector surfaced as a partner after the forget")
    assert(noForget.toSet != withForget.toSet,
      "forget changed nothing — vacuous")
  }

  test("q_dedup_recall_forget: the purge left no forgotten trace in either index table") {
    // the entry's staged lifecycle index is shared per-JVM; drive it once
    DedupQueries.dedupRecallForget.run(spark, dir).count()
    val p = graft.ops.Staging.dir("/tmp/graft_dedup_index", dir,
      "sig_index_recall_fgt_life")
    for (t <- Seq("sigs", "bands")) {
      val leaked = spark.read.parquet(s"$p/$t")
        .where(col("doc_id") % 7 === 1 && col("doc_id") % 3 < 2).count()
      assert(leaked == 0, s"$t still holds $leaked forgotten rows post-purge")
    }
    assert(!new java.io.File(s"$p/tombstones").exists,
      "purge left the tombstone table behind")
  }
}
