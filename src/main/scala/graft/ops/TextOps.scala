package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, language-ID, quality stats, fingerprinting.
  * All pure column expressions (whole-stage codegen, no UDFs) with exact
  * DuckDB-SQL mirrors so every result is oracle-checkable.
  *
  * Extension surface beyond the reference (which has no text ops) — built
  * over the driver's `documents` table (FIXTURES.md §2).
  */
object TextOps {
  import HashOps.P

  /** Non-whitespace token runs, lowercased.
    * DuckDB: regexp_extract_all(lower(text), '\S+') */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** Count of tokens without materializing the array.
    * DuckDB: len(regexp_extract_all(text, '\S+')) */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish pre-tokenizer count: letter runs | digit runs | single
    * punctuation. Mirrors GPT-2-style pre-tokenization coarsely; the pattern
    * is dialect-neutral (works in Java regex and RE2). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** k-word shingles joined by single spaces (input to MinHash / Jaccard).
    * DuckDB: list_transform(range(1, len(toks)-k+2),
    *                        i -> array_to_string(list_slice(toks, i, i+k-1), ' ')) */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle hashes in the 1e9+7 field — the doc's shingle set.
    * Codegen'd kernel (fuses shingle join + md5 + distinct into one loop);
    * result identical to array_distinct ∘ hashP ∘ shingles. */
  def shingleHashes(text: Column, k: Int): Column =
    graft.expressions.F.shingleHashes(tokens(text), k)

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: deterministic and SQL-mirrorable. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est"))

  /** Count of tokens that appear in `words` — codegen'd set-probe loop
    * (the higher-order size∘filter form evaluates interpreted and
    * allocates the filtered array; this is the same count in one pass).
    * DuckDB: len(list_filter(toks, t -> t IN (...))) */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    graft.expressions.F.stopwordCount(toks, words)

  /** Language-ID: argmax of per-language stopword hit counts, ties broken by
    * the declaration order above, 'und' (undetermined) when all scores are 0.
    * Pure CASE/greatest chain — reproducible in SQL. */
  def langId(toks: Column): Column = {
    val scores = Stopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, sc), rest) =>
      when(sc === best && best > 0, lit(lang)).otherwise(rest)
    }
    pick
  }

  /** Rolling polynomial document fingerprint over token hashes:
    * fold h ← (h*31 + hashP(token)) mod P, seed 0. Sequential left fold in
    * both engines (Spark `aggregate`, DuckDB `list_reduce` with a prepended
    * seed), so results are bit-identical.
    * DuckDB: list_reduce(list_prepend(0, list_transform(toks, t -> hashP t)),
    *                     (a, b) -> (a*31 + b) % P) */
  def fingerprint(toks: Column): Column =
    graft.expressions.F.polyFold(graft.expressions.F.hashPArray(toks))

  /** Punctuation character count. DuckDB: len(regexp_extract_all(..)). */
  def punctCount(text: Column): Column = regexp_count(text, lit("[^A-Za-z0-9\\s]"))
}
