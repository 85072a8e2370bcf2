package graft

import graft.queries.{AnalyticQueries, BehaviorQueries, SourceQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 12 queries — independent
  * driver-side recomputations on sf0.001 (the DuckDB gate at sf0.01 is the
  * cross-engine check; these prove the SEMANTICS against a from-scratch
  * Scala model).
  */
class Wave12QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sessions: Seq[(Long, Long)] = { // (start_us, end_us)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id")))
    ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      var start = sorted.head; var last = sorted.head
      sorted.tail.foreach { us =>
        if (us - last > 1800000000L) { out += ((start, last)); start = us }
        last = us
      }
      out += ((start, last))
      out.toSeq
    }
  }

  test("q_concurrency_peak matches a single-machine sweep-line recompute") {
    val ss = sessions
    // global sweep: each boundary in (us, +starts-before-ends) order
    val bounds = (ss.map(s => (s._1, 1L)) ++ ss.map(s => (s._2, -1L)))
      .sortBy(b => (b._1, -b._2))
    var run = 0L
    val perDay = scala.collection.mutable.Map.empty[String, Long]
    bounds.foreach { case (us, d) =>
      run += d
      val day = java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      perDay(day) = math.max(perDay.getOrElse(day, Long.MinValue), run)
    }
    val got = BehaviorQueries.qConcurrencyPeak.run(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("peak")).toMap
    assert(got == perDay.toMap)
    assert(got.values.max > 1, "never more than one concurrent session — degenerate")
  }

  test("q_window_funnel matches a sequential chain-walk recompute and never exceeds the presence funnel") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("us")))
    val win = 7L * 86400L * 1000000L
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    ev.groupBy(_._1).values.foreach { rows =>
      val t1 = rows.filter(_._2 == "view").map(_._3).minOption
      t1.foreach { v =>
        n1 += 1
        val t2 = rows.filter(r => r._2 == "click" && r._3 > v && r._3 <= v + win)
          .map(_._3).minOption
        t2.foreach { c =>
          n2 += 1
          if (rows.exists(r => r._2 == "purchase" && r._3 > c && r._3 <= v + win))
            n3 += 1
        }
      }
    }
    val r = BehaviorQueries.qWindowFunnel.run(spark, dir).collect().head
    assert((r.getAs[Long]("n_view"), r.getAs[Long]("n_then_click"),
      r.getAs[Long]("n_then_purchase")) == ((n1, n2, n3)))
    assert(n1 >= n2 && n2 >= n3 && n2 > 0, "funnel not monotone or empty")
  }

  test("q_mom_growth matches a recompute incl. truncating division on negative growth") {
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_trunc("month", to_date(col("o_orderdate"))).cast("date").as("m"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as long))").as("rev"))
      .orderBy("m")
      .collect().map(r => (r.getDate(0).toString, r.getAs[Long]("rev")))
    def tdiv(a: Long, b: Long): Long = a / b // JVM / truncates toward zero
    val want = monthly.zipWithIndex.map { case ((m, rev), i) =>
      val pm = if (i >= 1) Some(monthly(i - 1)._2) else None
      val py = if (i >= 12) Some(monthly(i - 12)._2) else None
      (m, rev, pm.map(p => tdiv((rev - p) * 10000, p)), py.map(p => tdiv((rev - p) * 10000, p)))
    }.toSet
    val got = TimeSeriesQueries.qMomGrowth.run(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("month").toString, r.getAs[Long]("rev_cents"),
        Option(r.getAs[java.lang.Long]("mom_e4")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("yoy_e4")).map(_.toLong))).toSet
    assert(got == want)
    // the truncation-vs-floor distinction must actually be exercised
    assert(got.exists(_._3.exists(_ < 0)), "no negative growth month in fixture")
  }

  test("q_equi_depth_histogram: buckets partition the value domain at near-equal depth") {
    val vals = Tables.lineitem(spark, dir)
      .select(round(col("l_extendedprice") * 100).cast("long")).collect().map(_.getLong(0))
    val n = vals.length.toLong
    val byV = vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var cum = 0L
    val assigned = byV.map { case (v, nv) =>
      cum += nv; (v, nv, (cum * 10 + n - 1) / n)
    }
    val want = assigned.groupBy(_._3).map { case (b, vs) =>
      (b, vs.map(_._1).min, vs.map(_._1).max, vs.map(_._2).sum, vs.size.toLong)
    }.toSet
    val got = AnalyticQueries.qEquiDepthHistogram.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo_cents"),
        r.getAs[Long]("hi_cents"), r.getAs[Long]("n_rows"), r.getAs[Long]("ndv"))).toSet
    assert(got == want)
    val sorted = got.toSeq.sortBy(_._1)
    assert(sorted.map(_._1) == (1L to 10L))
    // contiguous, non-overlapping bounds; total rows accounted for
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 < b._2); case _ =>
    }
    assert(sorted.map(_._4).sum == n)
    // near-equal depth: no bucket more than 2× the ideal depth
    assert(sorted.map(_._4).max <= 2 * ((n + 9) / 10))
  }

  test("q_dq_freshness matches a trailing-window recompute with correct statuses") {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getAs[Long]("n")))
    val want = daily.zipWithIndex.map { case ((day, n), i) =>
      val winVals = daily.slice(math.max(0, i - 7), i).map(_._2)
      val ratio =
        if (winVals.isEmpty) None
        else Some(n * 10000 * winVals.length / winVals.sum)
      val status = ratio match {
        case None => "warmup"
        case Some(x) if x < 5000 => "drop"
        case Some(x) if x > 20000 => "spike"
        case _ => "ok"
      }
      (day, n, winVals.sum, winVals.length.toLong, ratio, status)
    }.toSet
    val got = SourceQueries.dqFreshness.run(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n"),
        r.getAs[Long]("sum_win"), r.getAs[Long]("n_win"),
        Option(r.getAs[java.lang.Long]("ratio_e4")).map(_.toLong),
        r.getAs[String]("status"))).toSet
    assert(got == want)
    assert(got.exists(_._6 == "warmup") && got.exists(_._6 == "ok"))
  }
}
