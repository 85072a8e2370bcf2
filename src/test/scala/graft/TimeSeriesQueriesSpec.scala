package graft

import graft.queries.TimeSeriesQueries

/** Cross-checks the binary-decay EWMA/decay queries against a driver-side
  * recomputation of the same integer recurrence (the oracle gate checks
  * engine parity; this spec checks the math is the math we claim). */
class TimeSeriesQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_ewma_revenue matches a driver-side recomputation of the weighted lag ladder") {
    val rows = TimeSeriesQueries.qEwmaRevenue.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_.getAs[String]("o_orderstatus"))
    byStatus.foreach { case (_, rs) =>
      // rows arrive ordered by (status, day); recompute each row's ladder
      val revs = rs.map(_.getAs[Long]("rev_cents"))
      rs.zipWithIndex.foreach { case (r, i) =>
        var num = 0L; var wsum = 0L
        (0 to 7).foreach { k =>
          if (i - k >= 0) { val w = 1L << (7 - k); num += revs(i - k) * w; wsum += w }
        }
        assert(r.getAs[Long]("ewma_num") === num, s"num mismatch at $r")
        assert(r.getAs[Long]("ewma_wsum") === wsum, s"wsum mismatch at $r")
        assert(r.getAs[Long]("ewma_cents") === num / wsum, s"div mismatch at $r")
      }
      // steady state: once 8 lags exist the weight mass is exactly 255
      rs.drop(7).foreach(r => assert(r.getAs[Long]("ewma_wsum") === 255L))
      // the smoother stays inside the trailing-window envelope
      rs.zipWithIndex.drop(7).foreach { case (r, i) =>
        val window = revs.slice(i - 7, i + 1)
        assert(r.getAs[Long]("ewma_cents") >= window.min &&
          r.getAs[Long]("ewma_cents") <= window.max)
      }
    }
  }

  test("q_interpolate_daily: anchors exact, segments inside the knot envelope") {
    val rows = TimeSeriesQueries.qInterpolateDaily.run(spark, dir).collect()
    assert(rows.nonEmpty)
    var lastAnchorIdx = -1
    rows.zipWithIndex.foreach { case (r, i) =>
      val rev = r.getAs[Long]("rev_cents"); val interp = r.getAs[Long]("interp_cents")
      if (r.getAs[Long]("is_anchor") == 1L) { assert(interp === rev); lastAnchorIdx = i }
    }
    // every interpolated value lies between its surrounding anchor values
    val anchors = rows.zipWithIndex.filter(_._1.getAs[Long]("is_anchor") == 1L)
    anchors.sliding(2).foreach {
      case Array((a0, i0), (a1, i1)) =>
        val lo = math.min(a0.getAs[Long]("rev_cents"), a1.getAs[Long]("rev_cents"))
        val hi = math.max(a0.getAs[Long]("rev_cents"), a1.getAs[Long]("rev_cents"))
        ((i0 + 1) until i1).foreach { i =>
          val v = rows(i).getAs[Long]("interp_cents")
          assert(v >= lo - 1 && v <= hi + 1, s"interp $v outside [$lo,$hi] at $i")
        }
      case _ => ()
    }
    // LOCF tail: rows past the last anchor repeat its value
    val tailV = rows(lastAnchorIdx).getAs[Long]("rev_cents")
    rows.drop(lastAnchorIdx + 1).foreach(r =>
      assert(r.getAs[Long]("interp_cents") === tailV, "tail is not LOCF"))
  }

  test("q_decay_revenue: truncated horizon and weight envelope hold") {
    val rows = TimeSeriesQueries.qDecayRevenue.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDays = r.getAs[Long]("n_days")
      val win = r.getAs[Long]("window_cents")
      val num = r.getAs[Long]("decayed_num")
      assert(nDays >= 1 && nDays <= 21, s"horizon violated: $r")
      // every contributing weight is in [1, 2^20]
      assert(num >= win, s"below min-weight envelope: $r")
      assert(num <= win * (1L << 20), s"above max-weight envelope: $r")
    }
  }
}
