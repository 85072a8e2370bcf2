package graft

import graft.queries.BehaviorQueries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 16 queries — independent
  * driver-side recomputations on sf0.001.
  */
class Wave16QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_retention_curve matches a recompute; censoring bounds every denominator") {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getAs[Long]("user_id"), r.getDate(1).toLocalDate))
    val first = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val active = ud.map(t => (t._1, t._2)).toSet
    val hi = ud.map(_._2).max
    val want = Seq(1, 7, 14, 28).map { k =>
      val eligible = first.filter { case (_, f) => !f.plusDays(k).isAfter(hi) }
      val retained = eligible.count { case (u, f) => active((u, f.plusDays(k))) }
      (k.toLong, eligible.size.toLong, retained.toLong,
        retained.toLong * 10000L / eligible.size)
    }.toSet
    val got = BehaviorQueries.qRetentionCurve.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_eligible"),
        r.getAs[Long]("n_retained"), r.getAs[Long]("retention_e4"))).toSet
    assert(got == want)
    // denominators shrink as k grows (censoring strictly tightens)
    val byK = got.toSeq.sortBy(_._1)
    byK.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 >= b._2); case _ =>
    }
  }

  test("q_conversion_hazard matches a recompute; at-risk telescopes and KM survival is consistent") {
    val deltas = {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("us")))
      val win = 7L * 86400000000L
      ev.groupBy(_._1).values.toSeq.flatMap { rows =>
        for {
          v <- rows.filter(_._2 == "view").map(_._3).minOption
          c <- rows.filter(r => r._2 == "click" && r._3 > v && r._3 <= v + win)
            .map(_._3).minOption
          p <- rows.filter(r => r._2 == "purchase" && r._3 > c && r._3 <= v + win)
            .map(_._3).minOption
        } yield (p - v) / 86400000000L
      }
    }
    val nView = {
      val ev = Tables.events(spark, dir)
        .where(col("event_type") === "view")
        .select(col("user_id")).distinct().count()
      ev
    }
    val byDay = deltas.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var prior = 0L
    val want = byDay.map { case (d, n) =>
      val atRisk = nView - prior
      prior += n
      (d, atRisk, n, n * 1000000L / atRisk)
    }.toSet
    val got = BehaviorQueries.qConversionHazard.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_conv"), r.getAs[Long]("hazard_e6"))).toSet
    assert(got == want)
    // telescoping: at_risk(d) − conv(d) = at_risk(next d)
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 - a._3 >= b._2); case _ =>
    }
    assert(sorted.forall(_._4 <= 1000000L))
  }
}
