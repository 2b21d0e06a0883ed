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

  /** Minimal 24-bit BI_RGB BMP encoder for the real-decode tests:
    * `pixels(r)(c)` = (red, green, blue) in TOP-DOWN row order;
    * `bottomUp = true` writes the classic positive-height layout
    * (rows stored last-first), false the top-down negative-height one. */
  private def encodeBmp(pixels: Array[Array[(Int, Int, Int)]], bottomUp: Boolean): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val stride = (w * 3 + 3) & ~3
    val out = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)                  // reserved, data offset
    out.putInt(40).putInt(w).putInt(if (bottomUp) h else -h)
      .putShort(1).putShort(24).putInt(0)                  // planes, bpp, BI_RGB
      .putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val rows = if (bottomUp) pixels.reverse else pixels
    rows.foreach { row =>
      row.foreach { case (r, g, b) =>                      // stored B,G,R
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (w * 3 until stride).foreach(_ => out.put(0.toByte)) // row padding
    }
    out.array()
  }

  test("real BMP decode: header truth, padding stripped, row order normalized") {
    import spark.implicits._
    // 3x2 image: distinct channel values per pixel so any padding byte
    // or row-order slip changes the stripe features
    val img = Array(
      Array((255, 0, 0), (0, 255, 0), (0, 0, 255)),
      Array((10, 20, 30), (40, 50, 60), (70, 80, 90)))
    val bu = encodeBmp(img, bottomUp = true)
    val td = encodeBmp(img, bottomUp = false)
    val media = Seq(1L -> bu, 2L -> td).toDF("doc_id", "media")
    val got = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    // header truth, not the stub's length arithmetic
    assert(got(1L).width == 3 && got(1L).height == 2 && got(1L).n_frames == 1)
    assert(got(1L).byte_len == bu.length)
    // both encodings of the SAME image produce identical features:
    // padding stripped, rows normalized to top-down before the fold
    assert(got(1L).features.toSeq == got(2L).features.toSeq,
      "bottom-up and top-down encodings must decode identically")
    // features are the decoded-pixel stripe fold, not the raw payload's:
    // recompute from the known top-down B,G,R byte stream
    val pixelBytes = img.flatMap(_.flatMap { case (r, g, b) => Seq(b, g, r) })
      .map(_.toByte)
    val want = Multimodal.StubDecoder.stripeFeatures(pixelBytes)
    assert(got(1L).features.toSeq == want.toSeq,
      s"features must fold the decoded pixels: ${got(1L).features.toSeq} vs ${want.toSeq}")
    // non-BMP payloads (q50/q51's text corpus) still route to the stub
    val textBytes = "BMx not actually a bitmap at all".getBytes("UTF-8")
    val stubbed = Multimodal.decodeFeatures(spark,
      Seq(3L -> textBytes).toDF("doc_id", "media")).head()
    val stubWant = Multimodal.StubDecoder.decode(3L, textBytes)
    assert(stubbed == stubWant.copy(features = stubbed.features)
      && stubbed.features.toSeq == stubWant.features.toSeq,
      "invalid BMP must fall back to the deterministic stub")
    // truncated pixel array = invalid -> stub, never a partial decode
    val truncated = bu.take(bu.length - 4)
    val tf = Multimodal.decodeFeatures(spark,
      Seq(4L -> truncated).toDF("doc_id", "media")).head()
    assert(tf.width == Multimodal.StubDecoder.decode(4L, truncated).width)
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
