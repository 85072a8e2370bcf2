package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, TextQueries}

/** Semantic pins for the round-8 additions: exact duplicated-substring
  * detection (dedup_ngram_span) and hashing-trick linear quality scoring
  * (quality_linear_score) — both oracle-gated in the catalog; these tests
  * pin the SEMANTICS on constructed corpora where the expected answer is
  * known by hand, independent of the fixture corpus. */
class DedupSpanSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-span").toString
    rows.map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_ngram_span finds the exact shared span with correct length and starts") {
    val span = (1 to 10).map(i => s"a$i").mkString(" ") // 10-token verbatim span
    val dir = writeDocs(Seq(
      1L -> s"x1 x2 x3 $span y1 y2",  // span starts at token 4
      2L -> s"z1 $span w1 w2 w3",     // span starts at token 2
      3L -> "unrelated text with no overlap at all here ok fine"))
    val got = DedupQueries.dedupNgramSpan.run(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("id_l") == 1L && r.getAs[Long]("id_r") == 2L)
    // 10-token span = 3 consecutive 8-grams: span_tokens = 3 + 7 = 10
    assert(r.getAs[Long]("span_tokens") == 10L, r.toString)
    assert(r.getAs[Long]("span_start_l") == 4L, r.toString)
    assert(r.getAs[Long]("span_start_r") == 2L, r.toString)
    assert(r.getAs[Long]("shared_grams") == 3L, r.toString)
  }

  test("dedup_ngram_span: hub n-grams above the df cap never generate pairs") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ") // exactly one 8-gram
    // 9 docs share it → df=9 > SpanMaxDf=8 → pruned, no pairs at all
    val dir = writeDocs((1L to 9L).map(i => i -> s"u${i}a u${i}b $boiler u${i}c"))
    assert(DedupQueries.dedupNgramSpan.run(spark, dir).isEmpty)
  }

  test("dedup_ngram_span: docs under 8 tokens produce no grams and no crash") {
    val dir = writeDocs(Seq(1L -> "too short", 2L -> "too short"))
    assert(DedupQueries.dedupNgramSpan.run(spark, dir).isEmpty)
  }

  test("ShingleHashSeq kernel equals the interpreted transform∘slice∘hashP form") {
    import graft.ops.{HashOps, TextOps}
    val texts = Seq(
      "one two three four five six seven eight nine ten",
      "a b c d e f g h",          // exactly k tokens → one gram
      "short doc",                 // < k tokens → empty
      "x x x x x x x x x x x x")   // repeated tokens → duplicate grams kept
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val toks = TextOps.tokens(col("text"))
    val interpreted = when(size(toks) >= 8,
      transform(sequence(lit(0), size(toks) - 8),
        i => HashOps.hashP(concat_ws(" ", slice(toks, i + 1, lit(8))))))
      .otherwise(array().cast("array<bigint>"))
    val rows = df.select(
      graft.expressions.F.shingleHashSeq(toks, 8).as("kernel"),
      interpreted.as("interp")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("decontaminate_span reports the longest contaminated run per corpus doc") {
    import graft.queries.MixQueries
    val dir = Files.createTempDirectory("graft-dspan").toString
    Seq(
      // benchmark slice (source 'src0'): 6 tokens → two 5-grams
      (100L, "p1 p2 p3 p4 p5 p6", "en", "src0", 17L),
      // full phrase embedded at token 3: both grams match consecutively
      (1L, "c1 c2 p1 p2 p3 p4 p5 p6 c3", "en", "src1", 26L),
      // only the first 5 benchmark tokens: a single matched gram
      (2L, "x1 p1 p2 p3 p4 p5 x2 x3", "en", "src1", 23L),
      // no overlap at all: absent from the output
      (3L, "clean doc with none of the phrase", "en", "src1", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MixQueries.decontaminateSpan.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("matched_grams"), r.getAs[Long]("span_tokens"),
          r.getAs[Long]("span_start"))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((2L, 6L, 3L)), got.toString) // run of 2 grams = 6 tokens at pos 3
    assert(got(2L) == ((1L, 5L, 2L)), got.toString) // single gram = 5 tokens at pos 2
  }

  test("quality_linear_score: score is the sum of per-token bucket weights") {
    val dir = writeDocs(Seq(1L -> "alpha beta alpha", 2L -> ""))
    val rows = TextQueries.qualityLinearScore.run(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // recompute expected weight driver-side from the same md5 derivation
    def weightOf(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = (java.lang.Long.parseLong(h.take(15), 16) % 1000000007L) % 1024L
      val wh = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w$bucket".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(wh.take(15), 16) % 2001L - 1000L
    }
    val expected = 2 * weightOf("alpha") + weightOf("beta")
    assert(rows(1L).getAs[Long]("score") == expected)
    assert(rows(1L).getAs[Int]("keep") == (if (expected > 0) 1 else 0))
    assert(rows(2L).getAs[Long]("score") == 0L && rows(2L).getAs[Int]("keep") == 0)
  }
}
