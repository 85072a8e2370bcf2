package graft

import graft.queries.{AnalyticQueries, BehaviorQueries, GraphQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 14 queries — independent
  * driver-side recomputations on sf0.001.
  */
class Wave14QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_graph_assortativity matches an edge-endpoint recompute; r is a correlation") {
    val edges = GraphQueries.copurchaseEdges.run(spark, dir)
      .select(col("part_a").cast("long"), col("part_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val xy = edges.flatMap { case (a, b) => Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sx2 = xy.map(p => p._1 * p._1).sum
    val r = GraphQueries.graphAssortativity.run(spark, dir).collect().head
    assert((r.getAs[Long]("n"), r.getAs[Long]("num"), r.getAs[Long]("var_n")) ==
      ((n, n * sxy - sx * sx, n * sx2 - sx * sx)))
    val varN = r.getAs[Long]("var_n")
    assert(varN >= 0)
    if (varN > 0) {
      val rho = r.getAs[Long]("num").toDouble / varN
      assert(rho >= -1.0 && rho <= 1.0)
    }
  }

  test("q_interarrival_profile matches a per-user gap recompute and accounts for every gap") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id")))
    val gaps = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._2)
      s.tail.zip(s.dropRight(1)).map { case (b, a) => (b - a) / 1000000L }
    }
    val want = gaps.groupBy(g => java.lang.Long.toBinaryString(g + 1).length.toLong)
      .map { case (b, gs) => (b, gs.size.toLong, gs.min, gs.max, gs.sum) }.toSet
    val got = BehaviorQueries.qInterarrivalProfile.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("gap_bin"), r.getAs[Long]("n"),
        r.getAs[Long]("min_gap_s"), r.getAs[Long]("max_gap_s"),
        r.getAs[Long]("sum_gap_s"))).toSet
    assert(got == want)
    assert(got.toSeq.map(_._2).sum == gaps.size.toLong)
    assert(got.size >= 3, "gap distribution collapsed into <3 bins")
  }

  test("q_gini_concentration matches a sorted-cumulative recompute; 0 <= G < 1") {
    val spend = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum / 100).toSeq
    val sorted = spend.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.length.toLong
    val sx = sorted.sum
    val six = sorted.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val wantGini = (2 * six - (n + 1) * sx) * 1000000L / (n * sx)
    val r = AnalyticQueries.qGiniConcentration.run(spark, dir).collect().head
    assert((r.getAs[Long]("n"), r.getAs[Long]("total_dollars"),
      r.getAs[Long]("gini_e6")) == ((n, sx, wantGini)))
    assert(wantGini >= 0 && wantGini < 1000000L)
  }

  test("q_mix_drift_weekly matches a TVD recompute; every week's TVD is in [0, 1]") {
    val rows = Tables.events(spark, dir)
      .select(date_trunc("week", col("ts")).cast("date").as("w"), col("event_type"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1)))
    val nTot = rows.length.toLong
    val typeTot = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = rows.groupBy(_._1).map { case (w, rs) =>
      val nW = rs.size.toLong
      val inWeek = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // every GLOBAL type contributes — a vanished type adds n_t·N_w
      val absdiff = typeTot.map { case (t, nT) =>
        math.abs(inWeek.getOrElse(t, 0L) * nTot - nT * nW)
      }.sum
      (w, nW, absdiff * 500000L / (nW * nTot))
    }.toSet
    val got = AnalyticQueries.qMixDriftWeekly.run(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("week").toString, r.getAs[Long]("n_w"),
        r.getAs[Long]("tvd_e6"))).toSet
    assert(got == want)
    assert(got.forall(t => t._3 >= 0 && t._3 <= 1000000L))
  }
}
