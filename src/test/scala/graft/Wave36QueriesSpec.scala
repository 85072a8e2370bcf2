package graft

import graft.queries.BehaviorQueries

/** Round-10 wave 36: funnel window-length sensitivity — a sequential
  * driver recompute of the uncapped chain + per-arm thresholds, the
  * min-structure equivalence argument checked empirically (capped chain
  * per window == thresholded uncapped triple), and the cross-query pin:
  * the 7-day arm must equal q_window_funnel exactly.
  */
class Wave36QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Windows = Seq(3600000000L, 86400000000L, 604800000000L)

  private def events: Seq[(Long, String, Long)] =
    Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("q_funnel_window_sweep matches a per-window capped-chain driver recompute") {
    val byUser = events.groupBy(_._1)
    // independent recompute: run the CAPPED chain per window from scratch
    // (not the thresholded-triple shortcut the query uses) — this is what
    // proves the min-structure equivalence rather than assuming it
    val want = Windows.map { w =>
      var (nView, nClick, nPurchase) = (0L, 0L, 0L)
      byUser.foreach { case (_, evs) =>
        val views = evs.filter(_._2 == "view").map(_._3)
        if (views.nonEmpty) {
          nView += 1
          val t1 = views.min
          val clicks = evs.filter(e => e._2 == "click" && e._3 > t1 && e._3 <= t1 + w)
          if (clicks.nonEmpty) {
            nClick += 1
            val t2 = clicks.map(_._3).min
            val ps = evs.filter(e => e._2 == "purchase" && e._3 > t2 && e._3 <= t1 + w)
            if (ps.nonEmpty) nPurchase += 1
          }
        }
      }
      (w, nView, nClick, nPurchase, nPurchase * 10000L / nView)
    }
    val got = BehaviorQueries.qFunnelWindowSweep.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && want.head._2 > 0)
    // monotone: a wider window can only convert more
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.map(_._4) == got.map(_._4).sorted)
  }

  test("the 7-day arm equals q_window_funnel exactly (cross-query consistency)") {
    val arm = BehaviorQueries.qFunnelWindowSweep.run(spark, dir)
      .where("window_us = 604800000000").collect().head
    val wf = SparkEntry.queries("q_window_funnel")(spark, dir).collect().head
    assert(arm.getAs[Long]("n_view") == wf.getAs[Long]("n_view"))
    assert(arm.getAs[Long]("n_then_click") == wf.getAs[Long]("n_then_click"))
    assert(arm.getAs[Long]("n_then_purchase") == wf.getAs[Long]("n_then_purchase"))
  }
}
