package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{DedupOps, TextOps}

/** The end-to-end training-data curation flow — the composition the whole
  * extension surface exists for: score quality, identify language,
  * near-dup-cluster, and emit per-document keep/drop decisions plus
  * dataset-mixing statistics. Everything derives from operators that are
  * individually oracle-checked; the composed queries are oracle-checked
  * again as a whole.
  */
object CurationQueries {

  val QualityKeep = 5000L // quality_e4 threshold for the keep flag
  val KeepLang = "en"

  /** quality_e4 (same formula as text_stats). */
  private[graft] def qualityE4(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val nToks = TextOps.tokenCount(text)
    val nChars = length(text)
    val alpha = regexp_count(text, lit("[A-Za-z]"))
    val stops = TextOps.stopwordHits(toks, TextOps.Stopwords.head._2)
    round(lit(10000.0) * (
      lit(0.5) * least(stops * 5.0 / nToks, lit(1.0)) +
        lit(0.3) * least(nToks / 200.0, lit(1.0)) +
        lit(0.2) * (alpha * 1.0 / nChars))).cast("long")
  }

  private[queries] val SqlQuality: String = {
    val stopList = TextOps.Stopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""q AS (
       |  SELECT doc_id,
       |    CAST(round(10000.0 * (
       |      0.5 * least(len(list_filter(regexp_extract_all(lower(text), '\\S+'),
       |                    t -> t IN ($stopList))) * 5.0
       |            / len(regexp_extract_all(text, '\\S+')), 1.0)
       |      + 0.3 * least(len(regexp_extract_all(text, '\\S+')) / 200.0, 1.0)
       |      + 0.2 * (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / length(text))))
       |      AS BIGINT) AS quality_e4
       |  FROM documents WHERE len(regexp_extract_all(text, '\\S+')) > 0)""".stripMargin
  }

  private val SqlLang: String = {
    val scores = TextOps.Stopwords.map { case (lang, words) =>
      val l = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(regexp_extract_all(lower(text), '\\S+'), t -> t IN ($l))) AS BIGINT) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TextOps.Stopwords.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
    s"""lg AS (
       |  SELECT doc_id, CASE $cases ELSE 'und' END AS pred_lang
       |  FROM (SELECT doc_id, $scores FROM documents) t)""".stripMargin
  }

  /** Per-document curation decision: quality, language, near-dup cluster,
    * canonical flag, and the final keep flag. */
  val corpusCuration: Q = new Q {
    val name = "corpus_curation"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val docs = Tables.documents(spark, dir)
      val scored = docs
        .where(TextOps.tokenCount(col("text")) > 0)
        .select(col("doc_id"), qualityE4(col("text")).as("quality_e4"),
          TextOps.langId(TextOps.tokens(col("text"))).as("pred_lang"))
      val cc = DedupOps.connectedComponents(
        docs.select(col("doc_id").as("id")),
        DedupQueries.minhashPairs(spark, dir).select("id_l", "id_r"))
      scored.join(cc, scored("doc_id") === cc("node"))
        .withColumn("is_canonical", (col("doc_id") === col("cluster_id")).cast("int"))
        .withColumn("keep",
          (col("is_canonical") === 1 && col("quality_e4") >= QualityKeep &&
            col("pred_lang") === KeepLang).cast("int"))
        .select("doc_id", "quality_e4", "pred_lang", "cluster_id", "is_canonical", "keep")
        .orderBy("doc_id")
    }
    val oracle = Some(
      s"""WITH RECURSIVE ${DedupQueries.SqlMinhashPairCtes},
         |pairs AS (SELECT id_l, id_r FROM j WHERE jac >= ${DedupQueries.JaccardThreshold}),
         |base AS (
         |  SELECT id_l AS a, id_r AS b FROM pairs
         |  UNION SELECT id_r, id_l FROM pairs
         |  UNION SELECT doc_id, doc_id FROM documents),
         |reach(a, b) AS (
         |  SELECT a, b FROM base
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN base e ON r.b = e.a),
         |cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
         |$SqlQuality,
         |$SqlLang
         |SELECT q.doc_id, q.quality_e4, lg.pred_lang, cc.cluster_id,
         |  CAST(q.doc_id = cc.cluster_id AS INT) AS is_canonical,
         |  CAST(q.doc_id = cc.cluster_id AND q.quality_e4 >= $QualityKeep
         |       AND lg.pred_lang = '$KeepLang' AS INT) AS keep
         |FROM q JOIN lg ON q.doc_id = lg.doc_id JOIN cc ON q.doc_id = cc.doc_id
         |ORDER BY q.doc_id""".stripMargin)
  }

  /** Dataset-mixing statistics per source over the curated corpus. */
  val corpusStatsBySource: Q = new Q {
    val name = "corpus_stats_by_source"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.documents(spark, dir)
        .where(TextOps.tokenCount(col("text")) > 0)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("total_tokens"),
          round(avg(qualityE4(col("text")))).cast("long").as("avg_quality_e4"))
        .orderBy("source")
    val oracle = Some(
      s"""WITH $SqlQuality,
         |t AS (
         |  SELECT d.source, q.quality_e4,
         |    CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_toks
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         |  CAST(round(avg(quality_e4)) AS BIGINT) AS avg_quality_e4
         |FROM t GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Per-source exact-duplication rate — the data-quality dashboard mart
    * (which ingestion source ships how much verbatim-duplicate content):
    * docs are globally dup-ranked by content hash (keep-lowest-id), then
    * rolled up to source grain with the e4 duplicate share.
    *
    * Scale shape: one window by content hash (the dedup shuffle the
    * pipeline runs anyway), one aggregate at source grain. */
  val dedupRateBySource: Q = new Q {
    val name = "dedup_rate_by_source"
    def run(spark: SparkSession, dir: String): DataFrame =
      DedupOps.exactDupRank(Tables.documents(spark, dir), md5(col("text")), col("doc_id"))
        .withColumn("is_dup", (col("dup_rank") > 1).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("is_dup").as("n_dups"))
        .withColumn("dup_e4", expr("n_dups * 10000 div n_docs"))
        .orderBy("source")
    val oracle = Some(
      """WITH r AS (
        |  SELECT source,
        |    CASE WHEN row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1
        |         THEN 1 ELSE 0 END AS is_dup
        |  FROM documents)
        |SELECT source, count(*) AS n_docs, CAST(sum(is_dup) AS BIGINT) AS n_dups,
        |  CAST(sum(is_dup) * 10000 // count(*) AS BIGINT) AS dup_e4
        |FROM r GROUP BY source ORDER BY source""".stripMargin)
  }

  /** C4/RefinedWeb-style BOILERPLATE detection: a 3-gram shingle that
    * recurs across ≥ 8% of a source's documents is template text (nav
    * bars, footers, license blurbs), and each document is scored by the
    * fraction of its distinct shingles that are boilerplate — the signal
    * a curation pass uses to strip or down-weight templated pages.
    *
    * Scale shape: shingle hashes are computed in-row (codegen kernel);
    * per-(source, shingle) df is ONE groupBy over the exploded shingles
    * (map-side combine; output bounded by per-source vocab, not corpus
    * rows); the per-source doc counts are a tiny dim joined broadcast;
    * the boilerplate probe back into the exploded frame is a left-semi
    * equi-join on (source, shingle). No stage is pairwise. */
  val boilerplateNgrams: Q = new Q {
    val name = "boilerplate_ngrams"
    val DfPct = 8L // shingle is boilerplate if present in ≥ 8% of source docs
    def run(spark: SparkSession, dir: String): DataFrame = {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          TextOps.shingleHashes(col("text"), 3).as("hs"))
        .persist()
      val nDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      // shingleHashes is distinct-per-doc, so count(*) per (source, h) = df
      val ex = docs.select(col("doc_id"), col("source"), explode(col("hs")).as("h"))
      val bp = ex.groupBy("source", "h").agg(count(lit(1)).as("h_df"))
        .join(broadcast(nDocs), Seq("source"))
        .where(col("h_df") * 100 >= col("n_docs") * DfPct)
        .select("source", "h")
      val perDoc = ex.join(bp, Seq("source", "h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_bp"))
      docs.select(col("doc_id"), col("source"), size(col("hs")).cast("long").as("n_sh"))
        .join(perDoc, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_bp"))
        .withColumn("bp_e4",
          when(col("n_sh") > 0, expr("n_bp * 10000 div n_sh")).otherwise(lit(0L)))
        .orderBy("doc_id")
    }
    val oracle = {
      val toks = "regexp_extract_all(lower(text), '\\S+')"
      val shs = "list_distinct(list_transform(" +
        s"list_transform(range(1, greatest(len($toks) - 2, 0) + 1), " +
        s"i -> array_to_string(list_slice($toks, i, i + 2), ' ')), " +
        s"s -> ${graft.ops.HashOps.sqlHashP("s")}))"
      Some(
        s"""WITH sh AS (SELECT doc_id, source, $shs AS hs FROM documents),
           |ex AS (SELECT doc_id, source, unnest(hs) AS h FROM sh),
           |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
           |bp AS (
           |  SELECT ex.source, h FROM ex JOIN nd USING (source)
           |  GROUP BY ex.source, h, n_docs HAVING count(*) * 100 >= n_docs * 8),
           |pd AS (
           |  SELECT doc_id, count(*) AS n_bp FROM ex
           |  WHERE (source, h) IN (SELECT (source, h) FROM bp) GROUP BY doc_id)
           |SELECT sh.doc_id, sh.source, CAST(len(hs) AS BIGINT) AS n_sh,
           |  CAST(coalesce(n_bp, 0) AS BIGINT) AS n_bp,
           |  CASE WHEN len(hs) > 0
           |       THEN CAST(coalesce(n_bp, 0) * 10000 // len(hs) AS BIGINT)
           |       ELSE 0 END AS bp_e4
           |FROM sh LEFT JOIN pd ON sh.doc_id = pd.doc_id
           |ORDER BY sh.doc_id""".stripMargin)
    }
  }

  /** One-row dataset DATASHEET ("Datasheets for Datasets", Gebru et al.
    * 2021) — the summary card published alongside a training-data release:
    * corpus size, composition, token budget, exact-dup rate, English
    * share, and mean quality, every figure integer-exact and derived in
    * ONE pass over the corpus plus one md5-grain aggregate (no joins, no
    * windows — partial aggregation end to end). */
  val datasetDatasheet: Q = new Q {
    val name = "q_dataset_datasheet"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val d = Tables.documents(spark, dir)
      val base = d.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("ws_tokens"),
        sum(TextOps.bpeTokenCount(col("text")).cast("long")).as("bpe_tokens"),
        sum((col("lang") === KeepLang).cast("long")).as("n_en"),
        sum(when(TextOps.tokenCount(col("text")) > 0, qualityE4(col("text")))
          .otherwise(0L)).as("q_sum"),
        sum((TextOps.tokenCount(col("text")) > 0).cast("long")).as("n_scored"))
      val dups = d.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") - 1).as("n_exact_dups"))
      base.crossJoin(dups)
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("ws_tokens"), col("bpe_tokens"),
          expr("n_en * 10000 div n_docs").as("pct_en_e4"),
          expr("q_sum div n_scored").as("mean_quality_e4"),
          col("n_exact_dups"),
          expr("n_exact_dups * 10000 div n_docs").as("dup_rate_e4"))
    }
    val oracle = Some(
      s"""WITH $SqlQuality,
         |base AS (
         |  SELECT count(*) AS n_docs,
         |    count(DISTINCT source) AS n_sources,
         |    count(DISTINCT lang) AS n_langs,
         |    sum(len(regexp_extract_all(text, '\\S+'))) AS ws_tokens,
         |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS bpe_tokens,
         |    sum(CASE WHEN lang = '$KeepLang' THEN 1 ELSE 0 END) AS n_en,
         |    sum(CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0 THEN 1 ELSE 0 END) AS n_scored
         |  FROM documents),
         |qs AS (SELECT sum(quality_e4) AS q_sum FROM q),
         |dup AS (
         |  SELECT sum(c - 1) AS n_exact_dups
         |  FROM (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1) g)
         |SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_sources AS BIGINT) AS n_sources,
         |  CAST(n_langs AS BIGINT) AS n_langs,
         |  CAST(ws_tokens AS BIGINT) AS ws_tokens,
         |  CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
         |  CAST(n_en * 10000 // n_docs AS BIGINT) AS pct_en_e4,
         |  CAST(q_sum // n_scored AS BIGINT) AS mean_quality_e4,
         |  CAST(n_exact_dups AS BIGINT) AS n_exact_dups,
         |  CAST(n_exact_dups * 10000 // n_docs AS BIGINT) AS dup_rate_e4
         |FROM base CROSS JOIN qs CROSS JOIN dup""".stripMargin)
  }

  val all: Seq[Q] = Seq(corpusCuration, corpusStatsBySource, dedupRateBySource,
    boilerplateNgrams, datasetDatasheet)
}
