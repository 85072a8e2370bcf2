package graft

import graft.queries.{BehaviorQueries, GraphQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 13 queries — independent
  * driver-side recomputations on sf0.001.
  */
class Wave13QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_time_to_convert matches the chain-walk recompute and respects the 7-day cap") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("us")))
    val win = 7L * 86400L * 1000000L
    val deltas = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      for {
        v <- rows.filter(_._2 == "view").map(_._3).minOption
        c <- rows.filter(r => r._2 == "click" && r._3 > v && r._3 <= v + win)
          .map(_._3).minOption
        p <- rows.filter(r => r._2 == "purchase" && r._3 > c && r._3 <= v + win)
          .map(_._3).minOption
      } yield (p - v) / 86400000000L
    }
    val want = deltas.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = BehaviorQueries.qTimeToConvert.run(spark, dir).collect()
      .map(r => r.getAs[Long]("days_to_convert") -> r.getAs[Long]("n_users")).toMap
    assert(got == want)
    assert(got.keys.forall(d => d >= 0 && d <= 7))
    assert(got.values.sum > 0, "no conversions — funnel fixture degenerate")
  }

  test("q_cold_start_recs: top-3 unpurchased popular parts per subject") {
    val bought = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ordCust = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = bought.map { case (o, p) => (ordCust(o), p) }.distinct
    val pop = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      .sortBy(t => (-t._2, t._1)).take(20).zipWithIndex
      .map { case ((p, n), i) => (p, n, i + 1L) }
    val owned = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val subjects = Tables.customer(spark, dir)
      .where(col("c_custkey") % 100 === 0)
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val want = subjects.flatMap { c =>
      pop.filterNot(t => owned.getOrElse(c, Set.empty)(t._1))
        .take(3).zipWithIndex
        .map { case ((p, n, pr), i) => (c, p, n, pr, i + 1L) }
    }.toSet
    val got = BehaviorQueries.qColdStartRecs.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("p_partkey"),
        r.getAs[Long]("n_buyers"), r.getAs[Long]("pop_rank"),
        r.getAs[Long]("rec_rank"))).toSet
    assert(got == want)
    // no recommendation may be a part the subject already bought
    assert(got.forall { case (c, p, _, _, _) => !owned.getOrElse(c, Set.empty)(p) })
  }

  test("q_degree_histogram matches a bit-length binning of exact degrees") {
    val edges = GraphQueries.copurchaseEdges.run(spark, dir)
      .select(col("part_a").cast("long"), col("part_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = deg.values.groupBy(d => java.lang.Long.toBinaryString(d).length.toLong)
      .map { case (b, ds) => (b, ds.size.toLong, ds.min, ds.max, ds.sum) }.toSet
    val got = GraphQueries.degreeHistogram.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("deg_bin"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("min_deg"), r.getAs[Long]("max_deg"),
        r.getAs[Long]("sum_deg"))).toSet
    assert(got == want)
    // bin bounds are consistent with the bit-length definition
    got.foreach { case (b, _, lo, hi, _) =>
      assert(lo >= (1L << (b - 1)) && hi < (1L << b))
    }
  }

  test("q_iqr_outliers matches an exact-quartile fence recompute") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (et, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      def q(p: Long): Long = sorted(((n * p + 99) / 100 - 1).toInt)
      val (q1, q3) = (q(25), q(75))
      val iqr = q3 - q1
      val nLo = sorted.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong
      val nHi = sorted.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong
      (et, n, q1, q3, nLo, nHi)
    }.toSet
    val got = TimeSeriesQueries.qIqrOutliers.run(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("q1_cents"), r.getAs[Long]("q3_cents"),
        r.getAs[Long]("n_lo"), r.getAs[Long]("n_hi"))).toSet
    assert(got == want)
    got.foreach { case (_, n, q1, q3, lo, hi) =>
      assert(q1 <= q3 && lo + hi < n, "fences ate the whole distribution")
    }
  }
}
