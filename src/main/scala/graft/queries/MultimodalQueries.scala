package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload metadata, stub-decoded image
  * features, and frame sampling, over a media table derived from
  * `documents` (payload = utf-8 bytes — the Spark-side plumbing is what is
  * under test; see graft.multimodal.Multimodal for the stub-decode
  * rationale). */
object MultimodalQueries {

  /** Binary metadata extraction — byte length, fake decode dims (mirrors
    * FakeCodec arithmetic), content checksum. Fully oracle-checked. */
  val mmMeta: Q = new Q {
    val name = "mm_meta"
    def run(spark: SparkSession, dir: String): DataFrame =
      Tables.documents(spark, dir)
        .select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (octet_length(col("text")) % 64 + 1).cast("long").as("fake_w"),
          ((octet_length(col("text")) / 64).cast("long") % 64 + 1).as("fake_h"),
          md5(col("text")).as("checksum"))
        .orderBy("media_id")
    val oracle = Some(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(strlen(text) % 64 + 1 AS BIGINT) AS fake_w,
        |  CAST((strlen(text) // 64) % 64 + 1 AS BIGINT) AS fake_h,
        |  md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  /** Full Dataset-API decode pipeline (mapPartitions batch stage). The
    * float feature array itself is not driver-comparable (array columns
    * defeat the harness's sort/hash, and floats aren't oracle-stable), so
    * the query exports exact INTEGER projections of it: the histogram bin
    * counts are recovered from the L1-normalized floats by round(f·len) —
    * exact because counts ≤ len ≪ 2^24 — giving a fully DuckDB-checkable
    * fingerprint of every feature value. The raw array round-trips in the
    * MultimodalSpec suite. */
  val mmFeatures: Q = new Q {
    val name = "mm_features"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val feats = Multimodal.decodeImages(
        Multimodal.mediaFromDocuments(Tables.documents(spark, dir))).toDF()
      val total = greatest(col("n_bytes"), lit(1L)).cast("double")
      val cnts = (0 until Multimodal.FeatureDim).map(j =>
        round(element_at(col("features"), j + 1) * total).cast("long"))
      val maxC = cnts.reduce((a, b) => greatest(a, b))
      val argmax = cnts.zipWithIndex.foldRight(lit(-1L)) {
        case ((c, j), rest) => when(c === maxC, lit(j.toLong)).otherwise(rest)
      }
      feats.select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_bytes"),
          cnts.map(c => when(c > 0L, 1L).otherwise(0L)).reduce(_ + _).as("n_nonzero_bins"),
          argmax.as("argmax_bin"),
          cnts.zipWithIndex.map { case (c, j) => c * (j + 1) }.reduce(_ + _).as("hist_fp"))
        .orderBy("media_id")
    }
    // documents.text is pure ASCII in the test corpus (verified all SFs), so
    // DuckDB character codes == the codec's byte values.
    val oracle = Some(
      """WITH ch AS (
        |  SELECT doc_id, ascii(substr(text, CAST(i + 1 AS INT), 1)) // 16 AS bin
        |  FROM (SELECT doc_id, text, unnest(range(strlen(text))) AS i FROM documents)),
        |h AS (SELECT doc_id, bin, count(*) AS c FROM ch GROUP BY doc_id, bin),
        |amax AS (
        |  SELECT doc_id, bin AS argmax_bin FROM (
        |    SELECT doc_id, bin,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bin ASC) AS rn
        |    FROM h) WHERE rn = 1),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_nonzero_bins, sum((bin + 1) * c) AS hist_fp
        |  FROM h GROUP BY doc_id)
        |SELECT d.doc_id AS media_id,
        |  CAST(strlen(d.text) % 64 + 1 AS BIGINT) AS width,
        |  CAST((strlen(d.text) // 64) % 64 + 1 AS BIGINT) AS height,
        |  CAST(strlen(d.text) AS BIGINT) AS n_bytes,
        |  CAST(a.n_nonzero_bins AS BIGINT) AS n_nonzero_bins,
        |  CAST(m.argmax_bin AS BIGINT) AS argmax_bin,
        |  CAST(a.hist_fp AS BIGINT) AS hist_fp
        |FROM documents d JOIN agg a ON d.doc_id = a.doc_id
        |  JOIN amax m ON d.doc_id = m.doc_id
        |ORDER BY media_id""".stripMargin)
  }

  /** Frame sampling of "video" payloads: 4 evenly-spaced byte slices; the
    * slice lengths are pure arithmetic, so the oracle can verify the whole
    * 1→n flatMap without decoding. */
  val mmFrames: Q = new Q {
    val name = "mm_frames"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val frames = Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables.documents(spark, dir)), 4)
      frames.toDF()
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          octet_length(col("frame_bytes")).cast("long").as("frame_len"))
        .orderBy("media_id", "frame_idx")
    }
    val oracle = Some(
      """SELECT doc_id AS media_id, CAST(k AS BIGINT) AS frame_idx,
        |  CAST((strlen(text) * (k + 1)) // 4 - (strlen(text) * k) // 4 AS BIGINT) AS frame_len
        |FROM documents CROSS JOIN range(4) r(k)
        |WHERE doc_id % 3 = 2 AND strlen(text) > 0
        |ORDER BY media_id, frame_idx""".stripMargin)
  }

  val all: Seq[Q] = Seq(mmMeta, mmFeatures, mmFrames)
}
