package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / resize / frame-sampling run as BATCHED
  * per-partition transforms (`Dataset.mapPartitions` — the JVM analogue of
  * a Pandas-batched UDF: one decoder instance per partition, streaming
  * batches, no per-row setup cost).
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked DETERMINISTIC STUB (`FakeCodec`): it
  * derives plausible dimensions/frames/features purely from the bytes. The
  * Spark-side plumbing — schema, encoders, partitioning, batch shape,
  * column pruning — is real and tested; swapping `FakeCodec` for a real
  * JNI/ffmpeg/ImageIO decoder changes no plan shape.
  */
object Multimodal {

  /** A media row: opaque payload + minimal typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      source: String)

  /** Decoded-image features (stubbed decode). */
  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long,
      features: Array[Float]) // byte-histogram embedding (FeatureDim)

  /** One sampled frame of a "video" payload. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  val FeatureDim = 16

  /** DETERMINISTIC STUB for the image decoder: dimensions from simple byte
    * arithmetic; "embedding" = L1-normalized 16-bin byte histogram. A real
    * implementation would decode `content` with an image library here —
    * everything around it (batching, schema, partition shape) is identical. */
  object FakeCodec {
    def dims(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (n % 64 + 1, (n / 64) % 64 + 1, 3)
    }

    def histogramFeatures(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) / (256 / FeatureDim)) += 1f; i += 1 }
      val total = math.max(1, bytes.length).toFloat
      var j = 0
      while (j < FeatureDim) { h(j) /= total; j += 1 }
      h
    }
  }

  /** Wrap a text/doc table into a media table (payload = utf-8 bytes) — the
    * test-data stand-in for real binary columns. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("media_type"),
      col("text").cast("binary").as("content"),
      col("source"))
      .as[MediaRecord]
  }

  /** Batched "decode" + feature extraction: one codec per partition,
    * streaming rows — the plan is a single narrow mapPartitions stage that
    * preserves the input partitioning (no shuffle). */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would happen here (one instance, reused)
      val codec = FakeCodec
      it.map { m =>
        val (w, h, c) = codec.dims(m.content)
        ImageFeatures(m.media_id, w, h, c, m.content.length.toLong,
          codec.histogramFeatures(m.content))
      }
    }
  }

  /** Deterministic frame sampling for "video" payloads: `n` evenly-spaced
    * byte slices (a real impl samples decoded frames; the flatMap shape —
    * 1 row → n rows, no shuffle — is the same). */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      val len = m.content.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { k =>
        val from = (len.toLong * k / n).toInt
        val until = (len.toLong * (k + 1) / n).toInt
        Frame(m.media_id, k, java.util.Arrays.copyOfRange(m.content, from, until))
      }
    }
  }

  /** "Resize": re-bin features to a coarser grid (deterministic, keeps the
    * map-only plan shape of a real resize). */
  def resizeFeatures(feats: Dataset[ImageFeatures], dim: Int): DataFrame = {
    require(FeatureDim % dim == 0)
    val spark = feats.sparkSession
    import spark.implicits._
    val k = FeatureDim / dim
    feats.map { f =>
      val out = new Array[Float](dim)
      var i = 0
      while (i < FeatureDim) { out(i / k) += f.features(i); i += 1 }
      (f.media_id, f.width / 2 + 1, f.height / 2 + 1, out)
    }.toDF("media_id", "width", "height", "features")
  }
}
