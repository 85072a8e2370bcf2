package graft

import graft.queries.{BehaviorQueries, DedupQueries, TextQueries}

/** Invariant specs for the behavior-analytics marts (cohort retention,
  * association rules) and the round-8 text/dedup additions (novelty,
  * Levenshtein verification) — properties the DuckDB hash-compare can't
  * express, checked against driver-side recomputations on sf0.001. */
class BehaviorQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_cohort_retention: offset-0 retention is 100% and retention never exceeds cohort size") {
    val rows = BehaviorQueries.qCohortRetention.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_week"))
    byCohort.foreach { case (cw, rs) =>
      val zero = rs.filter(_.getAs[Long]("week_offset") == 0L)
      assert(zero.length == 1, s"cohort $cw missing offset-0 row")
      // every user is by construction active in their first-event week
      assert(zero.head.getAs[Long]("n_active") == zero.head.getAs[Long]("cohort_size"),
        s"cohort $cw offset-0 not full")
      assert(zero.head.getAs[Long]("retention_e4") == 10000L)
      rs.foreach { r =>
        assert(r.getAs[Long]("week_offset") >= 0L, s"negative offset in $r")
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"),
          s"retention above 100%: $r")
      }
    }
    // cohort sizes partition the user universe
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    val sumSizes = byCohort.values.map(_.head.getAs[Long]("cohort_size")).sum
    assert(sumSizes == users, s"cohort sizes $sumSizes != distinct users $users")
  }

  test("q_assoc_rules: directional symmetry, support bounds, confidence/lift consistency") {
    val rows = BehaviorQueries.qAssocRules.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val key = rows.map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))).toSet
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      assert(key.contains((b, a)), s"missing reverse rule for ($a,$b)")
      val (sAb, sA, sB) = (r.getAs[Long]("supp_ab"), r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"))
      assert(sAb <= math.min(sA, sB), s"pair support exceeds item support: $r")
      assert(r.getAs[Long]("conf_e4") == sAb * 10000L / sA, s"confidence mismatch: $r")
      assert(r.getAs[Long]("conf_e4") <= 10000L)
      assert(r.getAs[Long]("lift_e6") >= 0L)
    }
    // reverse rule has mirrored supports
    val byKey = rows.map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent")) -> r).toMap
    rows.take(50).foreach { r =>
      val rev = byKey((r.getAs[Long]("consequent"), r.getAs[Long]("antecedent")))
      assert(rev.getAs[Long]("supp_ab") == r.getAs[Long]("supp_ab"))
      assert(rev.getAs[Long]("supp_a") == r.getAs[Long]("supp_b"))
      assert(rev.getAs[Long]("lift_e6") == r.getAs[Long]("lift_e6") ||
        // lift uses integer div; direction changes only the denominator order
        math.abs(rev.getAs[Long]("lift_e6") - r.getAs[Long]("lift_e6")) <= 1L,
        s"lift not symmetric: $r vs $rev")
    }
  }

  test("doc_novelty: position accounting and bounds hold against token counts") {
    val rows = TextQueries.docNovelty.run(spark, dir).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val tokCounts = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.ops.TextOps.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("n_trigrams")
      val u = r.getAs[Long]("n_unique")
      assert(n == tokCounts(r.getAs[Long]("doc_id")) - 2L,
        s"trigram positions != tokens-2: $r")
      assert(u >= 0L && u <= n)
      assert(r.getAs[Long]("novelty_e4") == u * 10000L / n)
    }
    // exact duplicate docs (the fixture has them) can never hold corpus-unique
    // trigrams: every novelty_e4 of a dup-ranked doc must be 0
    val dups = DedupQueries.dedupExact.run(spark, dir).collect()
      .filter(_.getAs[Int]("is_dup") == 1).map(_.getAs[Long]("doc_id")).toSet
    if (dups.nonEmpty) {
      val novelDups = rows.filter(r => dups.contains(r.getAs[Long]("doc_id")))
      novelDups.foreach(r =>
        assert(r.getAs[Long]("n_unique") == 0L, s"exact dup with unique trigrams: $r"))
    }
  }

  test("dedup_lev_verify: distances metric-sane against a driver-side DP recomputation") {
    val rows = DedupQueries.dedupLevVerify.run(spark, dir).collect()
    assert(rows.nonEmpty, "LSH candidate set is empty at sf0.001 — fixture drift?")
    val texts = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      var cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, b.length + 1)
      }
      prev(b.length)
    }
    rows.foreach { r =>
      val (a, b) = (texts(r.getAs[Long]("id_l")), texts(r.getAs[Long]("id_r")))
      val d = r.getAs[Long]("lev")
      assert(d == lev(a, b), s"levenshtein mismatch for $r")
      assert(d <= math.max(a.length, b.length))
      assert(d >= math.abs(a.length - b.length))
      val maxLen = math.max(a.length, b.length).toLong
      assert(r.getAs[Long]("lev_sim_e4") == (maxLen - d) * 10000L / maxLen)
    }
  }

  test("q_attribution_first_touch: session accounting ties out with q_sessionize") {
    val rows = BehaviorQueries.qAttributionFirstTouch.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converted"))
      assert(c >= 0L && c <= n, s"converted out of bounds: $r")
      assert(r.getAs[Long]("conv_e4") == c * 10000L / n)
      assert(graft.queries.GeoPipeline.EventTypes.contains(r.getAs[String]("first_type")),
        s"unknown channel: $r")
    }
    // total sessions across channels == total sessions from the sessionize query
    val totalSessions = graft.queries.Relational.qSessionize.run(spark, dir)
      .collect().map(_.getAs[Long]("n_sessions")).sum
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == totalSessions,
      "attribution does not partition the session universe")
  }

  test("q_freq_triples: support monotone under the pair miner and triple keys strictly ordered") {
    val triples = BehaviorQueries.qFreqTriples.run(spark, dir).collect()
    // pair supports via the rules mart (antecedent < consequent rows are the
    // canonical pair orientation; supp_ab is the pair's order co-occurrence)
    val pairSupport = BehaviorQueries.qAssocRules.run(spark, dir).collect()
      .filter(r => r.getAs[Long]("antecedent") < r.getAs[Long]("consequent"))
      .map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent")) ->
        r.getAs[Long]("supp_ab")).toMap
    triples.foreach { r =>
      val (a, b, c) = (r.getAs[Long]("pa"), r.getAs[Long]("pb"), r.getAs[Long]("pc"))
      val n = r.getAs[Long]("n_orders")
      assert(a < b && b < c, s"triple not strictly ordered: $r")
      // Apriori monotonicity: every sub-pair of a frequent triple is frequent
      // with at least the triple's support
      Seq((a, b), (a, c), (b, c)).foreach { p =>
        assert(pairSupport.getOrElse(p, 0L) >= n,
          s"pair $p support < triple support $n")
      }
    }
  }

  test("mix_temperature: rates normalize, order by squared counts, budget within total") {
    val rows = graft.queries.MixQueries.mixTemperature.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    val sumRate = rows.map(_.getAs[Long]("rate_e6")).sum
    // integer floors: sum of rates within #sources of 1e6, never above
    assert(sumRate <= 1000000L && sumRate > 1000000L - rows.length,
      s"rates don't normalize: $sumRate")
    assert(rows.map(_.getAs[Long]("target_n")).sum <= nTotal)
    // T=1/2 sharpens: rate order == n_docs order (squares are monotone)
    val sorted = rows.sortBy(_.getAs[Long]("n_docs"))
    assert(sorted.map(_.getAs[Long]("rate_e6")).toSeq.sorted ==
      sorted.map(_.getAs[Long]("rate_e6")).toSeq,
      "rate not monotone in source size")
  }

  test("q_markov_transitions: rows normalize and transition count ties out with sessions") {
    val rows = BehaviorQueries.qMarkovTransitions.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getAs[String]("prev_type"))
    byPrev.foreach { case (p, rs) =>
      val tot = rs.map(_.getAs[Long]("n_trans")).sum
      rs.foreach(r => assert(r.getAs[Long]("p_e4") == r.getAs[Long]("n_trans") * 10000L / tot,
        s"row-normalization broken for $p: $r"))
      val sumP = rs.map(_.getAs[Long]("p_e4")).sum
      assert(sumP <= 10000L && sumP > 10000L - rs.length, s"p_e4 of $p sums to $sumP")
    }
    // a session of k events contributes k-1 transitions:
    // total transitions == total events - total sessions
    val sess = graft.queries.Relational.qSessionize.run(spark, dir).collect()
    val expected = sess.map(_.getAs[Long]("n_events")).sum - sess.map(_.getAs[Long]("n_sessions")).sum
    assert(rows.map(_.getAs[Long]("n_trans")).sum == expected,
      "transition total != events - sessions")
  }

  test("q_session_duration: partitions the session universe, stats internally consistent") {
    val rows = BehaviorQueries.qSessionDuration.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, mx) = (r.getAs[Long]("n_sessions"), r.getAs[Long]("sum_dur_s"), r.getAs[Long]("max_dur_s"))
      assert(r.getAs[Long]("mean_dur_s") == s / n)
      assert(mx * n >= s, s"max below mean: $r")
      assert(s >= 0L && mx >= 0L)
    }
    val att = BehaviorQueries.qAttributionFirstTouch.run(spark, dir).collect()
      .map(r => r.getAs[String]("first_type") -> r.getAs[Long]("n_sessions")).toMap
    rows.foreach(r => assert(att(r.getAs[String]("first_type")) == r.getAs[Long]("n_sessions"),
      "channel session counts disagree with attribution mart"))
  }

  test("q_activity_heatmap: grid bounded, totals tie out with the event count") {
    val rows = BehaviorQueries.qActivityHeatmap.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dow") >= 1L && r.getAs[Long]("dow") <= 7L)
      assert(r.getAs[Long]("hod") >= 0L && r.getAs[Long]("hod") <= 23L)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n"))
    }
    val total = Tables.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
  }

  test("q_user_ltv: totals tie out with raw purchase cents, decay bounded by horizon weight") {
    val rows = BehaviorQueries.qUserLtv.run(spark, dir).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val totalCents = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .agg(sum(graft.queries.Q.cents(col("value")))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("ltv_cents")).sum == totalCents,
      "per-user LTV does not partition total purchase revenue")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_purchases") >= 1L)
      // decayed score is the cents sum re-weighted by at most 2^20
      assert(math.abs(r.getAs[Long]("decayed_num")) <=
        math.abs(r.getAs[Long]("ltv_cents")) * (1L << 20),
        s"decay weight envelope broken: $r")
    }
  }

  test("q_winsorized_mean: clamp bounds ordered and the mean lands inside them") {
    val rows = graft.queries.TimeSeriesQueries.qWinsorizedMean.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, wm) = (r.getAs[Long]("v_lo"), r.getAs[Long]("v_hi"), r.getAs[Long]("wins_mean"))
      assert(lo <= hi, s"bounds inverted: $r")
      assert(wm >= lo && wm <= hi, s"winsorized mean outside clamp bounds: $r")
      assert(r.getAs[Long]("n_days") >= 1L)
    }
  }

  test("doc_clean: cleaning is idempotent-shaped (shorter, md5 consistent with changed flag)") {
    val rows = graft.queries.TextQueries.docClean.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clean") <= r.getAs[Long]("n_raw"), s"cleaning grew text: $r")
      val cleaned = texts(r.getAs[Long]("doc_id"))
        .replaceAll("[\\x00-\\x1F\\x7F]", " ").replaceAll("\\s+", " ").trim
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(cleaned.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5 == r.getAs[String]("clean_md5"), s"clean_md5 mismatch for $r")
      assert((r.getAs[Long]("changed") == 0L) == (cleaned == texts(r.getAs[Long]("doc_id"))))
      assert(!cleaned.contains("  "), "whitespace not collapsed")
    }
  }

  test("dedup_rate_by_source: partitions the corpus, dup totals tie out with dedup_exact") {
    val rows = graft.queries.CurationQueries.dedupRateBySource.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val globalDups = DedupQueries.dedupExact.run(spark, dir).collect()
      .count(_.getAs[Int]("is_dup") == 1).toLong
    assert(rows.map(_.getAs[Long]("n_dups")).sum == globalDups,
      "per-source dup counts don't sum to the global dup count")
    rows.foreach(r => assert(r.getAs[Long]("dup_e4") ==
      r.getAs[Long]("n_dups") * 10000L / r.getAs[Long]("n_docs")))
  }

  test("q_term_lift: supports bounded by dfs, canonical orientation, lift formula exact") {
    val rows = TextQueries.qTermLift.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, dir)
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.trim(
          org.apache.spark.sql.functions.col("text"))) > 0).count()
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("term_a"), r.getAs[String]("term_b"))
      assert(a < b, s"pair not canonically ordered: $r")
      val (co, da, db) = (r.getAs[Long]("co_df"), r.getAs[Long]("df_a"), r.getAs[Long]("df_b"))
      assert(co <= math.min(da, db), s"co-df exceeds marginal df: $r")
      assert(co >= 3L)
      assert(r.getAs[Long]("lift_e6") == co * nDocs * 1000000L / (da * db),
        s"lift formula mismatch (nDocs=$nDocs): $r")
    }
  }

  test("q_decimal_exact: digit strings match a BigInt driver-side recomputation") {
    val rows = graft.queries.ParityQueries.qDecimalExact.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
    val expected = li.groupBy(_.getAs[String]("l_returnflag")).map { case (f, rs) =>
      val sums = rs.foldLeft((BigInt(0), BigInt(0))) { case ((sq, pq), r) =>
        val pc = BigInt(math.round(r.getAs[Double]("l_extendedprice") * 100))
        val q = BigInt(r.getAs[Double]("l_quantity").toLong)
        (sq + pc * pc, pq + pc * q)
      }
      f -> sums
    }
    rows.foreach { r =>
      val (sq, pq) = expected(r.getAs[String]("l_returnflag"))
      assert(r.getAs[String]("sum_sq_cents2") == sq.toString, s"sum_sq mismatch: $r")
      assert(r.getAs[String]("sum_pq") == pq.toString, s"sum_pq mismatch: $r")
      assert(r.getAs[String]("sum_sq_cents2").forall(_.isDigit), "not a plain digit string")
    }
  }

  test("q_hopping_counts: every event lands in exactly 4 hops; tumbling totals contained") {
    val rows = BehaviorQueries.qHoppingCounts.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalEvents = Tables.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == totalEvents * 4,
      "hop fan-out is not exactly window/hop = 4 per event")
    // window starts are 15-minute aligned
    rows.foreach { r =>
      val ms = r.getAs[java.sql.Timestamp]("window_start").getTime
      assert(ms % (15L * 60 * 1000) == 0L, s"unaligned window start: $r")
    }
  }

  test("q_nullsafe_join: the null bucket joins (plain = would drop it)") {
    val rows = BehaviorQueries.qNullsafeJoin.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val nullBucket = rows.filter(_.getAs[Long]("key_or_null") == -1L)
    assert(nullBucket.length == 1, "null-key bucket missing from null-safe join")
    assert(nullBucket.head.getAs[Long]("n_pairs") ==
      nullBucket.head.getAs[Long]("n_cust") * nullBucket.head.getAs[Long]("n_supp"),
      "null bucket must be the full cross of null-keyed rows")
    rows.foreach(r => assert(r.getAs[Long]("n_pairs") >=
      math.max(r.getAs[Long]("n_cust"), r.getAs[Long]("n_supp"))))
  }

  test("q_anomaly_mad: flag matches the integer Hampel rule recomputed from the output") {
    val rows = graft.queries.TimeSeriesQueries.qAnomalyMad.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val anoms = rows.count(_.getAs[Long]("is_anom") == 1L)
    rows.foreach { r =>
      val dev4 = r.getAs[Long]("dev4")
      val mad8 = r.getAs[Long]("mad8")
      assert(dev4 == math.abs(r.getAs[Long]("rev_cents") * 4 - r.getAs[Long]("med2") * 2))
      assert(mad8 >= 0L)
      assert((r.getAs[Long]("is_anom") == 1L) == (dev4 * 20000L > mad8 * 44478L),
        s"flag inconsistent: $r")
    }
    // the rule should flag a minority of days, never everything
    assert(anoms < rows.length, "every day flagged anomalous — rule degenerate")
  }
}
