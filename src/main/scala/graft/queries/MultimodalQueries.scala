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

  /** Full Dataset-API decode pipeline (mapPartitions batch stage) — the
    * features array is produced by the stub codec, so this is a rows-only
    * check; the metadata portion is cross-checked by mm_meta. */
  val mmFeatures: Q = new Q {
    val name = "mm_features"
    def run(spark: SparkSession, dir: String): DataFrame =
      Multimodal.decodeImages(
        Multimodal.mediaFromDocuments(Tables.documents(spark, dir)))
        .toDF()
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_bytes"), col("features"))
        .orderBy("media_id")
    val oracle = None
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
