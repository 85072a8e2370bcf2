package graft

import graft.queries.{BehaviorQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 19 queries — independent
  * driver-side recomputations on sf0.001.
  */
class Wave19QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_top_movers matches a WoW delta recompute over the latest week pair") {
    val pw = Tables.lineitem(spark, dir)
      .select(col("l_partkey").cast("long"),
        date_trunc("week", to_date(col("l_shipdate"))).cast("date").as("week"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as long)"))
      .collect().map(r => ((r.getLong(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w1 = pw.keys.map(_._2).max
    val w0 = w1.minusDays(7)
    val parts = pw.keys.filter(k => k._2 == w1 || k._2 == w0).map(_._1).toSet
    val want = parts.toSeq.map { p =>
      val cur = pw.getOrElse((p, w1), 0L)
      val prev = pw.getOrElse((p, w0), 0L)
      (p, prev, cur, cur - prev)
    }.sortBy(t => (-math.abs(t._4), t._1)).take(10).zipWithIndex
      .map { case ((p, pr, c, d), i) => (i + 1L, p, pr, c, d) }.toSet
    val got = TimeSeriesQueries.qTopMovers.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("l_partkey"),
        r.getAs[Long]("rev_prev"), r.getAs[Long]("rev_cur"),
        r.getAs[Long]("delta"))).toSet
    assert(got == want)
    assert(got.size == 10)
  }

  test("q_seasonal_residual matches a dow-model recompute; top-5 are the largest deviations") {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as long)) div 100").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getAs[Long]("x")))
    def dow(d: java.time.LocalDate): Long = (d.getDayOfWeek.getValue % 7) + 1
    val model = daily.groupBy(t => dow(t._1)).view
      .mapValues(rs => (rs.size.toLong, rs.map(_._2).sum)).toMap
    val devs = daily.map { case (d, x) =>
      val (n, s) = model(dow(d))
      (d, dow(d), x, x * n * 10000L / s - 10000L)
    }
    val want = devs.sortBy(t => (-math.abs(t._4), t._1.toString)).take(5).zipWithIndex
      .map { case ((d, dw, x, dev), i) => (i + 1L, d.toString, dw, x, dev) }.toSet
    val got = TimeSeriesQueries.qSeasonalResidual.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("dow"), r.getAs[Long]("x"), r.getAs[Long]("dev_e4"))).toSet
    assert(got == want)
    // everything NOT in the top-5 deviates no more than the cut
    val cut = devs.sortBy(t => -math.abs(t._4)).take(5).map(t => math.abs(t._4)).min
    assert(devs.sortBy(t => -math.abs(t._4)).drop(5)
      .forall(t => math.abs(t._4) <= cut))
  }

  test("q_user_lifecycle matches a state-machine recompute; matrix rows are legal transitions") {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
      .collect().map(r => (r.getAs[Long]("user_id"), r.getDate(1).toLocalDate))
    val hi = uw.map(_._2).max
    val byUser = uw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val transitions = byUser.toSeq.flatMap { case (_, weeks) =>
      val first = weeks.min
      val grid = Iterator.iterate(first)(_.plusDays(7))
        .takeWhile(!_.isAfter(hi)).toSeq
      var lastActive = first
      val states = grid.map { w =>
        if (weeks(w)) lastActive = w
        val idle = java.time.temporal.ChronoUnit.DAYS.between(lastActive, w) / 7
        if (idle == 0 && weeks(w)) { if (w == first) "new" else "active" }
        else if (idle <= 2) "at_risk" else "churned"
      }
      states.zip(states.drop(1))
    }
    val want = transitions.groupBy(identity).view.mapValues(_.size.toLong)
      .map { case ((a, b), n) => (a, b, n) }.toSet
    val got = BehaviorQueries.qUserLifecycle.run(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_state"), r.getAs[String]("state"),
        r.getAs[Long]("n"))).toSet
    assert(got == want)
    // no transition may originate FROM 'new' twice or INTO 'new'
    assert(got.forall(_._2 != "new"))
    // at_risk only follows an active-ish or at_risk state, never churned
    assert(!got.exists(t => t._1 == "churned" && t._2 == "at_risk"))
  }
}
