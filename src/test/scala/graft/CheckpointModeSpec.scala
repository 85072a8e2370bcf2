package graft

import graft.ops.Checkpoints

/** Pins that the iterative graph/dedup family is CHECKPOINT-MODE-AGNOSTIC
  * (r9 verdict item 5): every `cutLineage()` site produces identical
  * results whether it runs as executor-local `localCheckpoint` (the dev
  * default — fast, not replicated) or as a reliable `checkpoint(dir)`
  * (the production mode at 100 TB, where an executor loss mid-iteration
  * must not kill a multi-hour job). The switch is data-independent by
  * construction — `cutLineage` only changes WHERE the materialized blocks
  * live — and this spec proves it empirically on the queries with the
  * deepest iterative lineage.
  */
class CheckpointModeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Deepest cutLineage users: Pregel-via-joins rounds (LPA, HITS,
  // k-core), union-find doubling (dedup_clusters), and a greedy sketch
  // loop (doc_salient_term).
  private val names = Seq("q_label_propagation", "q_hits_bipartite",
    "q_kcore", "dedup_clusters", "doc_salient_term")

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq

  test("iterative queries produce identical results in local and reliable checkpoint modes") {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec").toString
    for (name <- names) {
      spark.conf.unset(Checkpoints.ModeKey)
      val local = rows(name)
      try {
        spark.conf.set(Checkpoints.ModeKey, "reliable")
        spark.conf.set(Checkpoints.DirKey, ckptDir)
        val reliable = rows(name)
        assert(reliable == local,
          s"$name diverged between checkpoint modes")
        assert(local.nonEmpty, s"$name returned no rows — vacuous parity")
      } finally {
        spark.conf.unset(Checkpoints.ModeKey)
        spark.conf.unset(Checkpoints.DirKey)
      }
    }
    // reliable mode actually wrote checkpoint data (the switch engaged)
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .count() > 1
    assert(wrote, "reliable mode never wrote to the checkpoint dir")
  }
}
