package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "x" * 100), // 2 frames (64 + 36 bytes)
    (2L, "y" * 64),  // exactly 1 frame
    (3L, "short")
  ).toDF("doc_id", "text")

  test("media table carries payload bytes plus typed metadata") {
    val m = Multimodal.toMediaTable(docs, "doc_id", "text")
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val r = m.filter($"media_id" === 1L).select($"meta.byte_len", $"meta.format").head
    assert(r.getInt(0) == 100)
    assert(r.getString(1) == "utf8-stub")
  }

  test("feature extraction is deterministic with fixed width") {
    val m = Multimodal.toMediaTable(docs, "doc_id", "text")
    val a = Multimodal.extractFeatures(m, featDim = 8).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(m, featDim = 8).collect().sortBy(_.media_id)
    assert(a.map(_.feature.toSeq).toSeq == b.map(_.feature.toSeq).toSeq)
    assert(a.forall(_.feature.length == 8))
    // stub semantics pinned: 64 'y' bytes (121) round-robin 8 slots -> 121*8 each
    assert(a.find(_.media_id == 2L).get.feature.toSeq == Seq.fill(8)(121L * 8))
    assert(a.find(_.media_id == 1L).get.n_frames == 2)
    assert(a.find(_.media_id == 3L).get.n_frames == 1)
  }

  test("frame sampling emits every stride-th 64-byte block") {
    val m = Multimodal.toMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, stride = 2)
      .select("media_id", "frame_idx", "frame_bytes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).length))
    // doc 1: frames 0 (64B); stride 2 skips frame 1
    assert(frames.filter(_._1 == 1L).toSeq == Seq((1L, 0, 64)))
    assert(frames.filter(_._1 == 3L).toSeq == Seq((3L, 0, 5)))
  }
}
