package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // case-dup of 1
    (3L, "ab"), // fewer than 3 tokens
    (4L, "der hund und die katze und das haus ist nicht da"))
    .toDF("doc_id", "text")

  test("tokens lowercases and splits on whitespace runs") {
    val got = docs.where($"doc_id" === 1)
      .select(TextOps.tokens($"text")).as[Seq[String]].head()
    assert(got === Seq("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog"))
  }

  test("tokenCount matches size of token array; empty-ish strings safe") {
    val df = Seq("  a  b ", "", "x").toDF("text")
      .select(TextOps.tokenCount($"text").as("n"), size(TextOps.tokens($"text")).as("m"))
    df.collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("shingles: k-grams in order; short docs yield empty array") {
    val sh = docs.select($"doc_id", TextOps.shingles(TextOps.tokens($"text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).head === "the quick brown")
    assert(sh(1L).length === 7)
    assert(sh(3L) === Seq.empty)
  }

  test("ShingleHashSet kernel equals compositional distinct-hash formulation") {
    val kernel = docs.select($"doc_id", TextOps.shingleHashes($"text", 3).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
    val compositional = docs.select($"doc_id",
      array_distinct(transform(TextOps.shingles(TextOps.tokens($"text"), 3),
        s => HashOps.hashP(s))).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
    assert(kernel === compositional)
    // and the kernel's arrays are sorted (contract for IntersectSizeSorted)
    docs.select(TextOps.shingleHashes($"text", 3)).as[Seq[Long]].collect()
      .foreach(a => assert(a === a.sorted))
  }

  test("hash60/hashP matches the conv(md5) column formulation") {
    val df = Seq("hello", "world", "", "ünïcødé").toDF("s")
    val viaKernel = df.select(graft.ops.HashOps.hash60($"s")).as[Long].collect().toSeq
    val viaJvm = Seq("hello", "world", "", "ünïcødé").map(s =>
      graft.expressions.TextHashExprs.hash60(s.getBytes("UTF-8")))
    assert(viaKernel === viaJvm)
  }

  test("langId: stopword-profile argmax with 'und' fallback") {
    val got = docs.select($"doc_id", TextOps.langId(TextOps.tokens($"text")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(4L) === "de")
    assert(got(3L) === "und")
  }

  test("fingerprint: equals manual polynomial fold; case-insensitive dup detection") {
    val fps = docs.select($"doc_id", TextOps.fingerprint(TextOps.tokens($"text")))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(2L)) // same lowercased tokens
    val toks = Seq("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog")
    val manual = toks.foldLeft(0L)((h, t) =>
      (h * 31 + graft.expressions.TextHashExprs.hashP(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))) % 1000000007L)
    assert(fps(1L) === manual)
  }

  test("bpeTokenCount counts letter runs, digit runs, punctuation marks") {
    val got = Seq("ab12 cd, e!").toDF("text")
      .select(TextOps.bpeTokenCount($"text")).as[Int].head()
    // ab | 12 | cd | , | e | !
    assert(got === 6)
  }
}
