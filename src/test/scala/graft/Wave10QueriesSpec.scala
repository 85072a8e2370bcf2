package graft

import graft.queries.{AnalyticQueries, BehaviorQueries, CurationQueries, EvalQueries, GraphQueries, TimeSeriesQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 10 queries — independent
  * driver-side recomputations on sf0.001 (the DuckDB gate at sf0.01 is the
  * cross-engine check; these prove the SEMANTICS against a from-scratch
  * Scala model).
  */
class Wave10QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_pareto_frontier matches the brute-force O(n²) dominance check") {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey").cast("long"),
        round(col("p_retailprice") * 100).cast("long"), col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // dominated iff ∃ other strictly better in one dim, ≥ in the other
    val want = parts.filter { case (_, p, s) =>
      !parts.exists { case (_, p2, s2) =>
        (p2 < p && s2 >= s) || (p2 == p && s2 > s)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = AnalyticQueries.qParetoFrontier.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("price_c"),
        r.getAs[Long]("size"))).toSet
    assert(got == want)
    assert(want.size > 1 && want.size < parts.length,
      "frontier degenerate — fixture gives no tradeoff")
    // every frontier part strictly improves price as size drops along the sweep
    val sweep = got.toSeq.sortBy(_._2)
    sweep.sliding(2).foreach {
      case Seq((_, p1, s1), (_, p2, s2)) =>
        assert(p1 < p2 || (p1 == p2 && s1 == s2))
        if (p1 < p2) assert(s2 > s1, "non-frontier survivor: pricier but not bigger")
      case _ =>
    }
  }

  test("q_acf_daily matches a driver-side sufficient-stats recompute; lag-7 weekly structure is sane") {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as long)) div 100000").as("x"))
      .orderBy("day")
      .collect().map(_.getAs[Long]("x"))
    val want = (1 to 7).map { k =>
      val pairs = daily.drop(k).zip(daily.dropRight(k)) // (x_t, x_{t-k})
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sx2 = pairs.map(p => p._1 * p._1).sum
      val sy2 = pairs.map(p => p._2 * p._2).sum
      (k.toLong, n, n * sxy - sx * sy, n * sx2 - sx * sx, n * sy2 - sy * sy)
    }
    val got = TimeSeriesQueries.qAcfDaily.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n"), r.getAs[Long]("num"),
        r.getAs[Long]("varx_n"), r.getAs[Long]("vary_n"))).toSeq
    assert(got == want)
    // Pearson from the exported stats is a valid correlation
    got.foreach { case (_, _, num, vx, vy) =>
      assert(vx >= 0 && vy >= 0)
      val rho = num.toDouble / math.sqrt(vx.toDouble * vy.toDouble)
      assert(rho >= -1.0 && rho <= 1.0)
    }
  }

  test("q_rfm_segments matches a driver-side ECDF-quintile recompute") {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long"), to_date(col("o_orderdate")),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val anchor = orders.map(_._2).max
    val rfm = orders.groupBy(_._1).map { case (c, os) =>
      val r = java.time.temporal.ChronoUnit.DAYS.between(os.map(_._2).max, anchor)
      (c, r, os.size.toLong, os.map(_._3).sum)
    }.toSeq
    def quintile(values: Seq[Long], descending: Boolean): Map[Long, Long] = {
      val byV = values.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val sorted = if (descending) byV.sortBy(-_._1) else byV.sortBy(_._1)
      val n = values.size.toLong
      var cum = 0L
      sorted.map { case (v, c) =>
        cum += c; v -> ((cum * 5 + n - 1) / n)
      }.toMap
    }
    val rq = quintile(rfm.map(_._2), descending = true)
    val fq = quintile(rfm.map(_._3), descending = false)
    val mq = quintile(rfm.map(_._4 / 10000), descending = false)
    val want = rfm.map { case (c, r, f, m) =>
      (c, r, f, m, rq(r), fq(f), mq(m / 10000),
        rq(r) * 100 + fq(f) * 10 + mq(m / 10000))
    }.toSet
    val got = BehaviorQueries.qRfmSegments.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("r_days"),
        r.getAs[Long]("f"), r.getAs[Long]("m_cents"), r.getAs[Long]("r_q"),
        r.getAs[Long]("f_q"), r.getAs[Long]("m_q"), r.getAs[Long]("rfm_code"))).toSet
    assert(got == want)
    // quintile codes span the range (fixture non-degenerate)
    assert(got.map(_._5).size >= 3 && got.map(_._7).size >= 3)
  }

  test("q_calibration_bins matches a driver-side binning of the in-row score") {
    val rows = Tables.documents(spark, dir)
      .where(graft.ops.TextOps.tokenCount(col("text")) > 0)
      .select(CurationQueries.qualityE4(col("text")).as("p"),
        (col("lang") === "en").cast("long").as("pos"))
      .collect().map(r => (r.getAs[Long]("p"), r.getAs[Long]("pos")))
    val want = rows.groupBy { case (p, _) => math.min(p / 1000, 9L) }
      .map { case (bin, rs) =>
        (bin, rs.size.toLong, rs.map(_._2).sum, rs.map(_._1).sum,
          rs.map { case (p, y) => val d = p - y * 10000; d * d }.sum)
      }.toSet
    val got = EvalQueries.qCalibrationBins.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("sum_p_e4"), r.getAs[Long]("brier_e8"))).toSet
    assert(got == want)
    assert(want.size >= 3, "score mass collapsed into <3 bins")
    // Brier sum is bounded by its worst case n·1e8
    got.foreach { case (_, n, _, _, b) => assert(b >= 0 && b <= n * 100000000L) }
  }

  test("q_ndcg_mrr matches a double-precision brute-force eval recompute") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("embedding"), col("label").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getLong(2)))
    val w = Seq(1000000000L, 630929753L, 500000000L, 430676558L, 386852807L,
      356207187L, 333333333L, 315464876L, 301029995L, 289064826L)
    val cum = w.scanLeft(0L)(_ + _).tail
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val labelN = emb.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val want = emb.filter(e => e._1 % 50 == 0 && e._1 < 1000).map { q =>
      val ranked = emb.filter(_._1 != q._1)
        .map(c => (c._1, c._3, cos(q._2, c._2)))
        .sortBy(t => (-t._3, t._1)).take(10)
      val rel = ranked.zipWithIndex.collect { case ((_, l, _), i) if l == q._3 => i + 1 }
      val dcg = rel.map(r => w(r - 1)).sum
      val nRel = math.min(labelN(q._3) - 1, 10L)
      val idcg = if (nRel >= 1) cum(nRel.toInt - 1) else 0L
      val ndcg = if (idcg > 0) dcg * 1000000L / idcg else 0L
      val mrr = rel.headOption.map(r => 1000000L / r).getOrElse(0L)
      (q._1, q._3, nRel, dcg, idcg, ndcg, mrr)
    }.toSet
    val got = VectorQueries.qNdcgMrr.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("q_label"),
        r.getAs[Long]("n_rel"), r.getAs[Long]("dcg_e9"), r.getAs[Long]("idcg_e9"),
        r.getAs[Long]("ndcg_e6"), r.getAs[Long]("mrr_e6"))).toSet
    assert(got == want)
    // ndcg_e6 ∈ [0, 1e6]; a perfect-prefix ranking yields exactly 1e6
    got.foreach { case (_, _, _, _, _, n, m) =>
      assert(n >= 0 && n <= 1000000L); assert(m >= 0 && m <= 1000000L)
    }
  }

  test("q_hits_bipartite matches a driver-side two-round HITS recompute") {
    val e = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey").cast("long"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey").cast("long")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
      .collect().map(r => (r.getAs[Long]("cust"), r.getAs[Long]("part")))
    val e6 = 1000000L
    val a1 = e.groupBy(_._2).view.mapValues(_.size.toLong * e6).toMap
    val a1mx = a1.values.max
    val a1n = a1.view.mapValues(v => v * e6 / a1mx).toMap
    val h1 = e.groupBy(_._1).view.mapValues(_.map(p => a1n(p._2)).sum).toMap
    val h1mx = h1.values.max
    val h1n = h1.view.mapValues(v => v * e6 / h1mx).toMap
    val a2 = e.groupBy(_._2).view.mapValues(_.map(p => h1n(p._1)).sum).toMap
    val a2mx = a2.values.max
    val a2n = a2.view.mapValues(v => v * e6 / a2mx).toMap
    val want = a2n.toSeq.sortBy(t => (-t._2, t._1)).take(100).zipWithIndex
      .map { case ((p, a), i) => (p, a, i + 1L) }.toSet
    val got = GraphQueries.hitsBipartite.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("auth_e6"),
        r.getAs[Long]("rank"))).toSet
    assert(got == want)
    // the top authority saturates the L∞ normalizer exactly
    assert(got.exists(_._2 == e6))
  }
}
