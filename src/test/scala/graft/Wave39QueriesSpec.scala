package graft

import graft.queries.DedupQueries

/** Round-17 wave 39: the production banding's recall waterline — pin the
  * claims the entry exists to make (a hash check alone stays green on a
  * fixture the S-curve cannot bite).
  *
  * q_dedup_recall_waterline measures the OPERATING 16×4 banding on
  * synthesized exact-Jaccard pairs. Its whole point (r16 verdict ask #6)
  * is that the gate can MOVE: the mid-similarity levels must show real
  * hits AND real misses, and the curve must rise with similarity —
  * otherwise the entry is another gate pinned at p ≈ 1.
  */
class Wave39QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_dedup_recall_waterline: the 16x4 S-curve bites — hits AND " +
      "misses in the active range, monotone ends, full pair counts") {
    val rows = DedupQueries.dedupRecallWaterline.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set(2000L, 3000L, 4000L, 5000L, 6000L, 8000L))
    assert(rows.values.forall(_._1 == 40L), s"pair counts wrong: $rows")
    // the ACTIVE range: theory puts 16x4 collision at ~.34/.63 for jac
    // .4/.5 — both levels must have at least one hit and one miss
    for (lvl <- Seq(4000L, 5000L)) {
      val (n, found, _) = rows(lvl)
      assert(found > 0L && found < n,
        s"level $lvl saturated ($found/$n) — the gate cannot move there")
    }
    // the curve must separate its ends decisively (theory ~.03 vs ~.999)
    assert(rows(2000L)._3 < 2500L,
      s"jac .2 recall ${rows(2000L)._3} — the low end should mostly miss")
    assert(rows(8000L)._3 > 7500L,
      s"jac .8 recall ${rows(8000L)._3} — the high end should mostly hit")
    assert(rows(2000L)._2 < rows(5000L)._2 && rows(5000L)._2 < rows(8000L)._2,
      s"S-curve not rising: $rows")
  }
}
