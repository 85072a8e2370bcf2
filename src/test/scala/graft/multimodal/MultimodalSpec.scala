package graft.multimodal

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = mediaFromDocuments(
    Seq((0L, "hello world", "s0"), (1L, "abc", "s1"), (2L, "a longer video payload here", "s2"))
      .toDF("doc_id", "text", "source"))

  test("mediaFromDocuments assigns types cyclically and carries utf-8 payloads") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.map(_.media_type).toSeq === Seq("image", "audio", "video"))
    assert(new String(rows(0).content, "UTF-8") === "hello world")
  }

  test("decodeImages: deterministic stub dims/features, one row per input, no shuffle") {
    val feats = decodeImages(media)
    assert(feats.rdd.getNumPartitions === media.rdd.getNumPartitions)
    val f = feats.collect().sortBy(_.media_id)
    assert(f.length === 3)
    assert(f(0).n_bytes === 11 && f(0).width === 12 && f(0).height === 1 && f(0).channels === 3)
    // histogram is L1-normalized
    assert(math.abs(f(0).features.sum - 1.0f) < 1e-5)
    // determinism: re-running yields identical features
    val again = decodeImages(media).collect().sortBy(_.media_id)
    assert(f.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("sampleFrames slices video payloads into n contiguous frames") {
    val frames = sampleFrames(media, 4).collect().sortBy(_.frame_idx)
    assert(frames.forall(_.media_id === 2L))
    assert(frames.length === 4)
    val payload = "a longer video payload here".getBytes("UTF-8")
    assert(frames.map(_.frame_bytes.length).sum === payload.length)
    assert(frames.flatMap(_.frame_bytes).toSeq === payload.toSeq)
  }

  test("resizeFeatures re-bins to the target dimension") {
    val out = resizeFeatures(decodeImages(media), 4)
    val row = out.where($"media_id" === 0).head()
    val feats = row.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length === 4)
    assert(math.abs(feats.sum - 1.0f) < 1e-5)
  }
}
