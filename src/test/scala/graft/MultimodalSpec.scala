package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ext.Multimodal

/** Multimodal binary-column plumbing: decode, resize, frame-sample —
  * stub kernels, real schema/batching/fan-out behavior. */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, sf))

  test("decodeFeatures: fixed-width feature vector, metadata derived from bytes") {
    val f = Multimodal.decodeFeatures(spark, media).head()
    assert(f.features.length == Multimodal.StubDecoder.featureDim)
    assert(f.byte_len > 0 && f.width >= 64 && f.height >= 48 && f.n_frames >= 1)
  }

  test("resize: every output payload capped at w*h bytes with dims attached") {
    val rows = Multimodal.resize(spark, media, w = 8, h = 4).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.media.length <= 32 && r.width == 8 && r.height == 4))
  }

  test("frame-sample: fan-out rows follow length/frameBytes and stride") {
    val one = media.orderBy(col("doc_id")).limit(1)
    val payloadLen = one.select(octet_length(col("media"))).collect()(0).getInt(0)
    val frames = Multimodal.sampleFrames(spark, one, frameBytes = 16, stride = 2).collect()
    val expected = ((payloadLen / 16) + 1) / 2
    assert(frames.length == expected, s"len=$payloadLen got=${frames.length}")
    assert(frames.forall(_.frame.length == 16))
    assert(frames.map(_.frame_idx).toSeq == (0 until payloadLen / 16 by 2).toSeq)
  }
}
