package graft

import graft.queries.VectorQueries

/** Round-15 wave 37: the centroid-refresh recall promotion
  * (q_ann_refresh_recall) — beyond the DuckDB hash check, pin the CLAIM
  * the entry exists to make: on the synthesized structured-drift corpus,
  * the refreshed generation's recall strictly beats the frozen bootstrap
  * on the drifted cohort and never regresses the in-distribution one.
  * (A hash check alone would stay green even if a fixture change made
  * the comparison vacuous — e.g. both arms at 10000.)
  */
class Wave37QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_ann_refresh_recall: refresh strictly recovers drifted recall, corpus unregressed, decay non-vacuous") {
    val rows = VectorQueries.annRefreshRecall.run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val (frozenDrift, frozenDriftMin) = rows(("frozen", "drifted"))
    val (refrDrift, refrDriftMin) = rows(("refreshed", "drifted"))
    val (frozenCorpus, _) = rows(("frozen", "corpus"))
    val (refrCorpus, _) = rows(("refreshed", "corpus"))
    // the fixture must exhibit the decay the refresh fixes (non-vacuous)
    assert(frozenDrift <= 9000,
      s"frozen drifted recall $frozenDrift not degraded — fixture vacuous")
    assert(refrDrift > frozenDrift,
      s"refresh did not improve drifted recall: $frozenDrift -> $refrDrift")
    assert(refrDriftMin > frozenDriftMin,
      s"refresh did not lift the worst drifted query: $frozenDriftMin -> $refrDriftMin")
    assert(refrCorpus >= frozenCorpus,
      s"refresh regressed corpus recall: $frozenCorpus -> $refrCorpus")
  }

  test("q_dedup_recall_evolution: every epoch has truth pairs and the gate can move (recall < 1 somewhere)") {
    val rows = graft.queries.DedupQueries.dedupRecallEvolution.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.forall(_._2 > 0), s"an epoch has no true pairs — gate vacuous: ${rows.toSeq}")
    // the epochs must be a real evolution (truth set grows with appends)
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
    assert(rows.last._2 > rows.head._2, "appends added no true pairs — no evolution measured")
    // non-vacuous banding: at least one epoch misses at least one true
    // pair (the stressed 4x16 banding is chosen so the S-curve bites in
    // the fixture's planted-similarity range)
    assert(rows.exists(r => r._3 < r._2),
      s"banded recall saturated at every epoch — stressed banding lost its point: ${rows.toSeq}")
    assert(rows.forall(r => r._4 == -1L || (r._4 > 0L && r._4 <= 10000L)))
  }
}
