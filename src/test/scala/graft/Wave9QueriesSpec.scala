package graft

import graft.queries.{CurationQueries, DedupQueries, ParityQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 9 queries — independent
  * driver-side recomputations on sf0.001 (the DuckDB gate at sf0.01 is the
  * cross-engine check; these prove the SEMANTICS against a from-scratch
  * Scala model).
  */
class Wave9QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val P = 1000000007L

  private def hashP(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % P
  }

  private def docsRaw: Array[(Long, String, String, String)] =
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  test("q_token_fertility matches a driver-side recompute") {
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val want = docsRaw.groupBy(d => (d._4, d._3)).map { case ((src, lang), ds) =>
      val ws = ds.map(d => toks(d._2).length.toLong).sum
      val bp = ds.map(d => bpe.findAllIn(d._2).length.toLong).sum
      val ch = ds.map(_._2.length.toLong).sum
      (src, lang) -> (ds.length.toLong, ws, bp, ch,
        ws * 1000000L / ch, bp * 1000000L / ch)
    }
    val got = TextQueries.tokenFertility.run(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val (n, ws, bp, ch, wf, bf) = want(k)
      assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("ws_tokens") == ws &&
        r.getAs[Long]("bpe_tokens") == bp && r.getAs[Long]("n_chars") == ch &&
        r.getAs[Long]("ws_fert_e6") == wf && r.getAs[Long]("bpe_fert_e6") == bf, s"$k")
    }
  }

  test("q_length_histogram matches a driver-side bit-length binning") {
    val want = docsRaw.groupBy { d =>
      val n = toks(d._2).length.toLong
      (d._4, if (n == 0) 0L else java.lang.Long.toBinaryString(n).length.toLong)
    }.map { case (k, ds) =>
      val ns = ds.map(d => toks(d._2).length.toLong)
      k -> (ds.length.toLong, ns.sum, ns.min, ns.max)
    }
    val got = TextQueries.lengthHistogram.run(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("p2_bin"))
      val (n, s, mn, mx) = want(k)
      assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("sum_toks") == s &&
        r.getAs[Long]("min_toks") == mn && r.getAs[Long]("max_toks") == mx, s"$k")
      // bin invariant: every count in [2^(bin-1), 2^bin)
      if (k._2 > 0) assert(mn >= (1L << (k._2 - 1).toInt) && mx < (1L << k._2.toInt))
    }
  }

  test("q_lsh_recall: truth matches brute force; LSH pairs are a subset") {
    val shingles: Map[Long, Set[Long]] = docsRaw.map { d =>
      val t = toks(d._2)
      d._1 -> t.sliding(3).filter(_.length == 3)
        .map(w => hashP(w.mkString(" "))).toSet
    }.toMap.filter(_._2.nonEmpty)
    val ids = shingles.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      a = shingles(ids(i)); b = shingles(ids(j))
      inter = a.intersect(b).size
      uni = a.size + b.size - inter
      if inter.toDouble / uni >= DedupQueries.JaccardThreshold
    } yield (ids(i), ids(j))).toSet
    val r = DedupQueries.qLshRecall.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_truth") == truth.size.toLong)
    // exact-verified LSH pairs are structurally a subset of truth
    assert(r.getAs[Long]("n_hit") == r.getAs[Long]("n_lsh"))
    assert(r.getAs[Long]("n_missed") == truth.size - r.getAs[Long]("n_hit"))
    val recall = if (truth.isEmpty) -1L
      else r.getAs[Long]("n_hit") * 10000L / truth.size
    assert(r.getAs[Long]("recall_e4") == recall)
    assert(truth.nonEmpty, "no true near-dup pairs — recall gate vacuous")
  }

  test("q_date_edge_parity matches java.time recomputes on every date") {
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit
    val got = ParityQueries.qDateEdgeParity.run(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      assert(r.getAs[java.sql.Date]("month_end").toLocalDate ==
        d.withDayOfMonth(d.lengthOfMonth), s"$d month_end")
      assert(r.getAs[java.sql.Date]("plus_month").toLocalDate == d.plusMonths(1),
        s"$d plus_month")
      val monday = d.minusDays((d.getDayOfWeek.getValue - 1).toLong)
      assert(r.getAs[java.sql.Date]("week_start").toLocalDate == monday, s"$d week")
      assert(r.getAs[Long]("qtr") == (d.getMonthValue + 2) / 3, s"$d qtr")
      assert(r.getAs[Long]("days_in_month") == d.lengthOfMonth.toLong, s"$d dim")
      assert(r.getAs[Long]("dow_sunday1") == d.getDayOfWeek.getValue % 7 + 1, s"$d dow")
      assert(r.getAs[Long]("epoch_days") ==
        ChronoUnit.DAYS.between(LocalDate.ofEpochDay(0), d), s"$d epoch")
    }
  }

  test("q_dataset_datasheet matches a driver-side recompute") {
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val n = docsRaw.length.toLong
    val nEn = docsRaw.count(_._3 == "en").toLong
    val ws = docsRaw.map(d => toks(d._2).length.toLong).sum
    val bp = docsRaw.map(d => bpe.findAllIn(d._2).length.toLong).sum
    val dups = docsRaw.groupBy(_._2).values.map(_.length - 1L).sum
    val r = CurationQueries.datasetDatasheet.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_sources") == docsRaw.map(_._4).distinct.length.toLong)
    assert(r.getAs[Long]("n_langs") == docsRaw.map(_._3).distinct.length.toLong)
    assert(r.getAs[Long]("ws_tokens") == ws)
    assert(r.getAs[Long]("bpe_tokens") == bp)
    assert(r.getAs[Long]("pct_en_e4") == nEn * 10000L / n)
    assert(r.getAs[Long]("n_exact_dups") == dups)
    assert(r.getAs[Long]("dup_rate_e4") == dups * 10000L / n)
    // mean quality rides the oracle-checked qualityE4; just pin its range
    val mq = r.getAs[Long]("mean_quality_e4")
    assert(mq > 0 && mq <= 10000, s"mean quality out of range: $mq")
  }
}
