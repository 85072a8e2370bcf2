package graft

import graft.queries.{EvalQueries, MixQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave-5 queries (stratified folds,
  * Benford audit, exact AUC) — independent driver-side recomputations on
  * sf0.001. */
class Wave5QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Driver-side mirror of the quality_e4 formula (CurationQueries). */
  private def qualityE4(text: String): Option[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) None
    else {
      val stops = toks.count(graft.ops.TextOps.Stopwords.head._2.contains)
      val alpha = text.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
      Some(halfUp(10000.0 * (
        0.5 * math.min(stops * 5.0 / toks.length, 1.0) +
          0.3 * math.min(toks.length / 200.0, 1.0) +
          0.2 * (alpha.toDouble / text.length))))
    }
  }

  test("q_stratified_folds: exact per-label balance, coverage, assignment recompute") {
    val rows = MixQueries.stratifiedFolds.run(spark, dir).collect()
      .map(r => (r.getAs[Int]("fold"), r.getAs[Long]("label"),
        r.getAs[Long]("n"), r.getAs[Long]("member_checksum")))
    val total = Tables.embeddings(spark, dir).count()
    assert(rows.map(_._3).sum == total, "folds must cover every vector")
    // exact stratification: within each label, fold sizes differ by <= 1
    rows.groupBy(_._2).foreach { case (label, rs) =>
      val sizes = rs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"label $label folds unbalanced: ${sizes.toSeq}")
    }
    // membership recompute: same salted-hash ordering, driver-side
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("label").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = vecs.groupBy(_._2).toSeq.flatMap { case (label, vs) =>
      vs.map(v => (v._1, h60(s"${v._1}:fold"))).sortBy { case (id, h) => (h, id) }
        .zipWithIndex
        .map { case ((id, _), i) => ((i % 5, label), h60(id.toString) % 1000000000L) }
    }.groupBy(_._1).map { case (k, ms) => (k._1, k._2, ms.size.toLong, ms.map(_._2).sum) }
      .toSet
    assert(rows.map(t => (t._1, t._2, t._3, t._4)).toSet == want)
  }

  test("q_benford: coverage, integer shares, and pinned expected constants") {
    val rows = EvalQueries.qBenford.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n"), r.getAs[Long]("obs_e6"),
        r.getAs[Long]("exp_e6"), r.getAs[Long]("dev_e6")))
    val total = Tables.orders(spark, dir).count()
    assert(rows.map(_._2).sum == total, "every order must land in a digit bucket")
    assert(rows.forall(t => t._1 >= 1 && t._1 <= 9))
    rows.foreach { case (d, n, obs, exp, dev) =>
      assert(obs == n * 1000000L / total)
      assert(exp == math.round(math.log10(1.0 + 1.0 / d) * 1e6))
      assert(dev == math.abs(obs - exp))
    }
    assert(rows.map(_._4).sum >= 999998L && rows.map(_._4).sum <= 1000002L,
      "expected Benford masses must sum to ~1e6")
  }

  test("q_auc_score equals a brute-force pairwise AUC recompute") {
    val r = EvalQueries.qAucScore.run(spark, dir).collect().head
    val docs = Tables.documents(spark, dir)
      .select(col("text"), col("lang")).collect()
      .flatMap(row => qualityE4(row.getString(0)).map(_ -> (row.getString(1) == "en")))
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    // doubled U: 2 per strict win, 1 per tie
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(r.getAs[Long]("np") == pos.length.toLong)
    assert(r.getAs[Long]("nn") == neg.length.toLong)
    val aucE6 = u2 * 1000000L / (2L * pos.length * neg.length)
    assert(r.getAs[Long]("auc_e6") == aucE6,
      s"auc mismatch: got ${r.getAs[Long]("auc_e6")}, brute force $aucE6")
  }
}
