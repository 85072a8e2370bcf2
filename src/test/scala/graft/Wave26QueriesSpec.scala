package graft

import graft.queries.CurationQueries
import graft.ops.TextOps

/** Round-10 wave 26: the LLM-curation quartet (Gopher rule battery,
  * greedy token packing, deterministic mixture sampling, soft-dedup
  * downweighting) — each checked against an independent from-scratch
  * driver recompute on sf0.001, plus invariants the oracle compare
  * cannot see (pack budget discipline, hash-threshold keep semantics).
  */
class Wave26QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String, String)] =
    Tables.documents(spark, dir).select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def toks(t: String): IndexedSeq[String] =
    "\\S+".r.findAllIn(t.toLowerCase).toIndexedSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60ppm(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16) % 1000000L

  test("q_gopher_rules matches a per-rule driver recompute") {
    val stop = TextOps.Stopwords.head._2.toSet
    val want = docs.filter(d => toks(d._2).nonEmpty).map { case (id, text, _) =>
      val tk = toks(text)
      val n = tk.length.toLong
      val tokChars = tk.map(_.length.toLong).sum
      val alpha = tk.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val stops = tk.count(stop.contains).toLong
      val syms = "#|\\.\\.\\.".r.findAllIn(text).length.toLong
      val biTotal = math.max(n - 1, 0L)
      val biDistinct =
        if (n < 2) 0L else tk.sliding(2).map(_.mkString(" ")).toSet.size.toLong
      val rules = Seq(
        n >= 10L && n <= 100000L,
        tokChars >= 3 * n && tokChars <= 10 * n,
        alpha * 5 >= n * 4,
        stops >= 2,
        syms * 10 <= n,
        (biTotal - biDistinct) * 5 <= biTotal).map(b => if (b) 1 else 0)
      (id, n, rules(0), rules(1), rules(2), rules(3), rules(4), rules(5),
        rules.sum.toLong, if (rules.sum == 6) 1 else 0)
    }.sortBy(_._1)
    val got = CurationQueries.qGopherRules.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7), r.getLong(8),
        r.getInt(9))).toSeq
    assert(got == want && want.nonEmpty)
    // the battery must actually discriminate on this fixture
    assert(got.map(_._10).distinct.size == 2,
      "all docs pass (or all fail) every rule — thresholds not exercised")
  }

  test("q_token_packing matches a sequential driver fold and respects the budget") {
    val b = CurationQueries.PackBudget
    val want = docs.map { case (id, text, src) => (src, id, toks(text).length.toLong) }
      .groupBy(_._1).toSeq.flatMap { case (src, ds) =>
        var pack = 0L; var used = 0L; var pos = 0L
        ds.sortBy(_._2).map { case (_, id, n) =>
          if (pos == 0L) { used = n; pos = 1L }
          else if (used + n > b) { pack += 1; used = n; pos = 1L }
          else { used += n; pos += 1L }
          (src, id, n, pack, pos, used)
        }
      }.sortBy(t => (t._1, t._2))
    val got = CurationQueries.qTokenPacking.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want && want.nonEmpty)
    // budget discipline: a pack exceeds the budget only as a single
    // oversized doc (pack_pos == 1)
    got.foreach { case (_, id, n, _, pos, used) =>
      assert(used <= b || (pos == 1L && n == used), s"doc $id breaks budget")
    }
    assert(got.map(_._4).max >= 1L, "every source fits one pack — budget never binds")
  }

  test("q_corpus_mixture matches a driver recompute of the hash-threshold sample") {
    val bySrc = docs.groupBy(_._3)
    val minDocs = bySrc.values.map(_.size.toLong).min
    val want = bySrc.toSeq.map { case (src, ds) =>
      val nDocs = ds.size.toLong
      val rate = math.min(1000000L, minDocs * 1000000L / nDocs)
      val kept = ds.filter(d => hash60ppm(s"mix:${d._1}") < rate)
      (src, nDocs, rate, kept.size.toLong,
        kept.map(d => toks(d._2).length.toLong).sum)
    }.sortBy(_._1)
    val got = CurationQueries.qCorpusMixture.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && want.nonEmpty)
    // the smallest source keeps everything; others are genuinely thinned
    // (hash-uniformity makes keeping everything at rate<1e6 astronomically
    // unlikely at fixture sizes)
    assert(got.exists(_._3 == 1000000L), "no source at rate 1e6")
  }

  test("q_soft_dedup_weights matches a driver recompute and bounds effective mass") {
    val gSize = docs.groupBy(d => md5hex(d._2)).map { case (k, ds) => k -> ds.size.toLong }
    val want = docs.groupBy(_._3).toSeq.map { case (src, ds) =>
      val masses = ds.map { d =>
        val n = toks(d._2).length.toLong
        val g = gSize(md5hex(d._2))
        (n, n * (1000000L / g), g)
      }
      (src, ds.size.toLong, masses.map(_._1).sum, masses.map(_._2).sum,
        masses.count(_._3 > 1L).toLong)
    }.sortBy(_._1)
    val got = CurationQueries.qSoftDedupWeights.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && want.nonEmpty)
    got.foreach { case (src, _, nTok, eff, _) =>
      assert(eff <= nTok * 1000000L, s"$src: effective mass exceeds raw mass")
    }
  }
}
