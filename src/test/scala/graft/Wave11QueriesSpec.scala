package graft

import graft.queries.{AnalyticQueries, BehaviorQueries, EvalQueries, ParityQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 11 queries — independent
  * driver-side recomputations on sf0.001 (the DuckDB gate at sf0.01 is the
  * cross-engine check; these prove the SEMANTICS against a from-scratch
  * Scala model).
  */
class Wave11QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def baskets: Map[Long, Set[Long]] =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (o, ps) => o -> ps.map(_._2).toSet }

  test("q_item_cf matches a driver-side cosine² top-5 recompute") {
    val bs = baskets.values.toSeq
    val supp = bs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val co = bs.flatMap(ps => ps.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toMap // GraphQueries.CoSupport (private[queries])
    val directed = co.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val want = directed
      .map { case (i, j, n) => (i, j, n, n * n * 1000000L / (supp(i) * supp(j))) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._4, t._2)).take(5).zipWithIndex
          .map { case ((i, j, n, s), r) => (i, j, n, s, r + 1L) }
      }.toSet
    val got = BehaviorQueries.qItemCf.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("neighbor"),
        r.getAs[Long]("co"), r.getAs[Long]("cos2_e6"), r.getAs[Long]("rank"))).toSet
    assert(got == want)
    assert(want.nonEmpty, "no co-purchase pairs above support — fixture degenerate")
  }

  test("q_user_path_topk matches a driver-side sessionize+path recompute") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ListBuffer.empty[List[String]]
      var cur = List.empty[(Long, String)]
      sorted.foreach { case (_, us, _, et) =>
        if (cur.nonEmpty && us - cur.last._1 > 1800000000L) {
          sessions += cur.map(_._2); cur = Nil
        }
        cur = cur :+ ((us, et))
      }
      if (cur.nonEmpty) sessions += cur.map(_._2)
      sessions.map(_.take(5).mkString(">"))
    }
    val want = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(t => (-t._2, t._1)).take(20).zipWithIndex
      .map { case ((p, n), i) => (i + 1L, p, n) }.toSet
    val got = BehaviorQueries.qUserPathTopk.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("path"),
        r.getAs[Long]("n_sessions"))).toSet
    assert(got == want)
    assert(want.exists(_._2.contains(">")), "no multi-event path — gap degenerate")
  }

  test("q_inventory_abc matches a cumulative recompute and shows the Pareto shape") {
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_partkey").cast("long"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as long)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val total = rev.map(_._2).sum
    var cum = 0L
    val want = rev.sortBy(t => (-t._2, t._1)).map { case (p, rc) =>
      cum += rc
      val share = cum * 10000 / total
      (p, rc, share, if (share <= 8000) "A" else if (share <= 9500) "B" else "C")
    }.toSet
    val got = AnalyticQueries.qInventoryAbc.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("rev_cents"),
        r.getAs[Long]("cum_share_e4"), r.getAs[String]("abc"))).toSet
    assert(got == want)
    // class boundaries are consistent: every A part out-earns every C part
    // (the synthetic fixture's near-uniform part revenue gives no 80/20
    // concentration, so only the ordering invariant is assertable)
    val nA = got.count(_._4 == "A")
    assert(nA > 0 && nA < got.size)
    val minA = got.filter(_._4 == "A").map(_._2).min
    val maxC = got.filter(_._4 == "C").map(_._2).max
    assert(minA >= maxC, "an A part earns less than a C part")
  }

  test("q_seasonal_index covers all 7 dows and is mean-centered") {
    val rows = TimeSeriesQueries.qSeasonalIndex.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("n_days"),
        r.getAs[Long]("sum_x"), r.getAs[Long]("index_e4")))
    assert(rows.map(_._1).toSet == (1L to 7L).toSet)
    // weighted mean of the index over days is 1e4 by construction (± int-div slack)
    val nTot = rows.map(_._2).sum
    val weighted = rows.map(t => t._4 * t._2).sum / nTot
    assert(math.abs(weighted - 10000L) <= 10, s"index not centered: $weighted")
    // recompute one dow exactly
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as long)) div 100").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getAs[Long]("x")))
    val sumTot = daily.map(_._2).sum
    rows.foreach { case (dow, nDays, sumX, idx) =>
      val mine = daily.filter(d => (d._1.getDayOfWeek.getValue % 7) + 1 == dow)
      assert(mine.size.toLong == nDays && mine.map(_._2).sum == sumX)
      assert(idx == sumX * daily.length * 10000L / (nDays * sumTot))
    }
  }

  test("q_gdpr_export matches a recompute and zero-fills subjects without data") {
    val subjects = Tables.customer(spark, dir)
      .where(col("c_custkey") % 100 === 0)
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
        to_date(col("o_orderdate")), round(col("o_totalprice") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate, r.getLong(3)))
      .filter(o => subjects(o._1))
    val liCount = {
      val keys = orders.map(_._2).toSet
      Tables.lineitem(spark, dir).select(col("l_orderkey").cast("long"))
        .collect().map(_.getLong(0)).filter(keys)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val byCust = orders.groupBy(_._1)
    val want = subjects.toSeq.sorted.map { c =>
      byCust.get(c) match {
        case Some(os) =>
          (c, os.size.toLong, os.map(o => liCount.getOrElse(o._2, 0L)).sum,
            os.map(_._4).sum, Some(os.map(_._3).min.toString),
            Some(os.map(_._3).max.toString))
        case None => (c, 0L, 0L, 0L, None, None)
      }
    }.toSet
    val got = EvalQueries.qGdprExport.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("n_items"), r.getAs[Long]("spend_cents"),
        Option(r.getAs[java.sql.Date]("first_day")).map(_.toString),
        Option(r.getAs[java.sql.Date]("last_day")).map(_.toString))).toSet
    assert(got == want)
    assert(got.size == subjects.size, "a subject row went missing")
  }

  test("q_shipping_lag matches a recompute over the full lag domain") {
    val ordDate = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("long"), to_date(col("o_orderdate")))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    val want = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long"), to_date(col("l_shipdate")),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as long)"))
      .collect()
      .map { r =>
        val lag = java.time.temporal.ChronoUnit.DAYS
          .between(ordDate(r.getLong(0)), r.getDate(1).toLocalDate)
        (lag, r.getLong(2))
      }
      .groupBy(_._1).map { case (lag, rs) =>
        (lag, rs.size.toLong, rs.map(_._2).sum)
      }.toSet
    val got = ParityQueries.qShippingLag.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("lag_days"), r.getAs[Long]("n"),
        r.getAs[Long]("rev_cents"))).toSet
    assert(got == want)
    // the synthetic fixture draws ship dates independently of order dates,
    // so lags span negative and positive — assert a non-degenerate domain
    // and that the histogram accounts for every line item
    assert(got.size > 1)
    assert(got.toSeq.map(_._2).sum == Tables.lineitem(spark, dir).count())
  }
}
