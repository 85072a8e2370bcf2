package graft

import graft.queries.EvalQueries

/** From-scratch driver recomputes for the round-10 wave 23 queries
  * (weekly KS drift series, t-closeness audit) on sf0.001.
  */
class Wave23QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_drift_series matches a driver KS recompute over consecutive weeks") {
    val ev = Tables.events(spark, dir)
      .selectExpr("CAST(date_trunc('week', ts) AS DATE) AS wk",
        "CAST(round(value * 10000) AS LONG) AS v4")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val weeks = ev.map(_._1).distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    def dist(w: java.time.LocalDate): Seq[Long] = ev.filter(_._1 == w).map(_._2)
    val want = weeks.sliding(2).collect {
      case Array(prev, cur) if cur.toEpochDay - prev.toEpochDay == 7 =>
        val (a, b) = (dist(prev), dist(cur))
        val dom = (a ++ b).distinct.sorted
        val dnum = dom.map { v =>
          val cuma = a.count(_ <= v).toLong; val cumb = b.count(_ <= v).toLong
          math.abs(cuma * b.length - cumb * a.length)
        }.max
        (cur, (a.length.toLong, b.length.toLong,
          dnum * 1000000 / (a.length.toLong * b.length)))
    }.toMap
    val got = EvalQueries.qDriftSeries.run(spark, dir).collect()
      .map(r => (r.getDate(0).toLocalDate,
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want && want.nonEmpty)
    // the monitor must see some movement on real data, but KS is in [0,1]
    assert(got.values.forall(v => v._3 >= 0 && v._3 <= 1000000))
  }

  test("q_t_closeness matches a driver EMD recompute and the trio semantics hold") {
    val rows = Tables.orders(spark, dir).select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100) / 2000000))
    val nat = Tables.customer(spark, dir).select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getAs[Number]("c_nationkey").longValue())).toMap
    val joined = rows.flatMap { case (ck, b) => nat.get(ck).map(n => (n, b)) }
    val bands = joined.map(_._2).distinct.sorted
    val m = bands.length
    val bigN = joined.length.toLong
    val globCum = bands.map(b => b -> joined.count(_._2 <= b).toLong).toMap
    val want = joined.groupBy(_._1).map { case (nk, xs) =>
      val nG = xs.length.toLong
      val emdNum = bands.map { b =>
        val cumG = xs.count(_._2 <= b).toLong
        math.abs(cumG * bigN - globCum(b) * nG)
      }.sum
      val emdE4 = emdNum * 10000 / ((m - 1) * nG * bigN)
      nk -> (nG, emdE4, if (emdE4 > 2500) 1L else 0L)
    }
    val got = EvalQueries.qTCloseness.run(spark, dir).collect()
      .map(r => r.getAs[Number]("c_nationkey").longValue() ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want && want.nonEmpty)
    // EMD against the global mix is bounded by 1 (e4) and the flag is its threshold
    assert(got.values.forall(v => v._2 >= 0 && v._2 <= 10000))
    assert(got.values.forall(v => (v._3 == 1L) == (v._2 > 2500)))
  }
}
