package graft

import graft.queries.{BehaviorQueries, EvalQueries, GraphQueries, TextQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 8 queries — independent
  * driver-side recomputations on sf0.001 (the DuckDB gate at sf0.01 is the
  * cross-engine check; these prove the SEMANTICS against a from-scratch
  * Scala model).
  */
class Wave8QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_kcore matches a driver-side peeling recompute and reaches its fixpoint") {
    val edges = GraphQueries.copurchaseEdges.run(spark, dir)
      .select(col("part_a").cast("long"), col("part_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var adj: Map[Long, Set[Long]] = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var prev = adj
    var rounds = 0
    for (_ <- 1 to 4) {
      prev = adj
      val keep = adj.filter(_._2.size >= 3).keySet
      adj = adj.collect { case (k, vs) if keep(k) =>
        k -> vs.intersect(keep)
      }.filter(_._2.nonEmpty)
      if (adj != prev) rounds += 1
    }
    val want = adj.map { case (k, vs) => k -> vs.size.toLong }
    val got = GraphQueries.kcore.run(spark, dir).collect()
      .map(r => r.getAs[Long]("part_key") -> r.getAs[Long]("degree")).toMap
    assert(got == want)
    // the fixed 4-round unroll must have CONVERGED on the fixture —
    // otherwise the query's "k-core" label overstates what it computes
    val keep = adj.filter(_._2.size >= 3).keySet
    val next = adj.collect { case (k, vs) if keep(k) => k -> vs.intersect(keep) }
      .filter(_._2.nonEmpty)
    assert(next == adj, "4 peel rounds did not reach the 3-core fixpoint on sf0.001")
    assert(want.nonEmpty, "3-core empty — fixture graph degenerate")
  }

  test("q_session_window_sql matches a driver-side gaps-and-islands recompute") {
    val gapUs = 1800L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val sessions = scala.collection.mutable.ListBuffer.empty[List[(Long, Long)]]
      var cur = List.empty[(Long, Long)]
      sorted.foreach { case (us, c) =>
        // built-in session_window semantics: NEW session at gap >= 30 min
        if (cur.nonEmpty && us - cur.last._1 >= gapUs) { sessions += cur; cur = Nil }
        cur = cur :+ ((us, c))
      }
      if (cur.nonEmpty) sessions += cur
      sessions.map { s =>
        (uid, s.head._1, s.last._1 + gapUs, s.size.toLong, s.map(_._2).sum)
      }
    }.toSet
    val got = BehaviorQueries.qSessionWindowSql.run(spark, dir)
      .select(col("user_id"), expr("unix_micros(session_start)").as("s"),
        expr("unix_micros(session_end)").as("e"), col("n_events"), col("sum_cents"))
      .collect().map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("s"), r.getAs[Long]("e"),
          r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))
      }.toSet
    assert(got == want)
    assert(want.exists(_._4 > 1), "no multi-event session — gap degenerate")
  }

  test("q_cohen_kappa matches a driver-side contingency recompute") {
    val base = Tables.documents(spark, dir)
      .where(graft.ops.TextOps.tokenCount(col("text")) > 0)
      .select((col("lang") === "en").cast("long").as("a"),
        (graft.queries.CurationQueries.qualityE4(col("text")) >=
          graft.queries.CurationQueries.QualityKeep).cast("long").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = base.length.toLong
    val a1 = base.count(_._1 == 1L).toLong
    val b1 = base.count(_._2 == 1L).toLong
    val agree = base.count(p => p._1 == p._2).toLong
    val marg = a1 * b1 + (n - a1) * (n - b1)
    val r = EvalQueries.qCohenKappa.run(spark, dir).collect().head
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("agree") == agree)
    // truncating division: Spark `div` and DuckDB `//` both round toward
    // zero on negatives (kappa < 0 on this fixture — the raters disagree
    // more than chance, which is itself the signal being checked)
    assert(r.getAs[Long]("kappa_e6") == (n * agree - marg) * 1000000L / (n * n - marg))
    assert(a1 > 0 && a1 < n, "degenerate rater A — kappa check vacuous")
  }

  test("q_pr_curve matches a driver-side confusion recompute at every threshold") {
    val base = Tables.documents(spark, dir)
      .where(graft.ops.TextOps.tokenCount(col("text")) > 0)
      .select(graft.queries.CurationQueries.qualityE4(col("text")).as("score"),
        (col("lang") === "en").cast("long").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = EvalQueries.qPrCurve.run(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("thr")).toSeq == Seq(2500L, 5000L, 7500L))
    rows.foreach { r =>
      val t = r.getAs[Long]("thr")
      val tp = base.count(p => p._1 >= t && p._2 == 1L).toLong
      val fp = base.count(p => p._1 >= t && p._2 == 0L).toLong
      val fn = base.count(p => p._1 < t && p._2 == 1L).toLong
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp &&
        r.getAs[Long]("fn") == fn, s"thr=$t counts")
      val prec = if (tp + fp == 0) -1L else tp * 10000 / (tp + fp)
      val rec = if (tp + fn == 0) -1L else tp * 10000 / (tp + fn)
      val f1 = if (2 * tp + fp + fn == 0) -1L else 2 * tp * 10000 / (2 * tp + fp + fn)
      assert(r.getAs[Long]("precision_e4") == prec &&
        r.getAs[Long]("recall_e4") == rec && r.getAs[Long]("f1_e4") == f1, s"thr=$t metrics")
    }
  }

  test("q_cusum_changepoint matches a driver-side scaled-CUSUM recompute") {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      .orderBy("day")
      .collect().map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Long]("rev")))
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var cum = 0L
    val devs = daily.zipWithIndex.map { case ((_, rev), i) =>
      cum += rev; n * cum - (i + 1) * total
    }
    val maxAbs = devs.map(math.abs).max
    val got = EvalQueriesSpecHelpers.rowsOf(
      TimeSeriesQueries.qCusumChangepoint.run(spark, dir))
    assert(got.length == daily.length)
    got.zip(devs).foreach { case (r, dev) =>
      assert(r.getAs[Long]("dev") == dev)
      assert(r.getAs[Long]("is_cp") == (if (math.abs(dev) == maxAbs) 1L else 0L))
    }
    assert(got.map(_.getAs[Long]("is_cp")).sum >= 1L)
  }

  test("q_vocab_overlap matches a driver-side set recompute") {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab: Map[String, Set[String]] = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty)).toSet
    }
    val want = (for {
      (sa, va) <- vocab; (sb, vb) <- vocab if sa < sb
      inter = va.intersect(vb).size.toLong if inter > 0
    } yield (sa, sb, va.size.toLong, vb.size.toLong, inter,
      inter * 10000 / (va.size + vb.size - inter))).toSet
    val got = TextQueries.vocabOverlap.run(spark, dir).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("vocab_a"), r.getAs[Long]("vocab_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("jac_e4"))
    }.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}

/** Tiny shared helper (kept out of the spec class so other wave specs can
  * reuse it). */
object EvalQueriesSpecHelpers {
  def rowsOf(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] =
    df.collect()
}
