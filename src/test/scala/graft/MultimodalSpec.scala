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

  /** (red, green, blue) pixel rows (top-down) -> the stored B,G,R byte
    * array [[Multimodal.encodeBmp]] takes. */
  private def bgrBytes(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] =
    pixels.flatMap(_.flatMap { case (r, g, b) => Seq(b.toByte, g.toByte, r.toByte) })

  private def encodeBmp(pixels: Array[Array[(Int, Int, Int)]], bottomUp: Boolean): Array[Byte] =
    Multimodal.encodeBmp(bgrBytes(pixels), pixels(0).length, pixels.length, bottomUp)

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

  test("encode/decode round trip: both row orders recover exact pixels") {
    // 3x2 with a padded stride (3*3=9 -> 12): padding must vanish
    val px = Array.tabulate(18)(i => (i * 37 + 11).toByte)
    for (bottomUp <- Seq(true, false)) {
      val bmp = Multimodal.encodeBmp(px, 3, 2, bottomUp)
      assert(Multimodal.BmpDecoder.tryDecodePixels(bmp).exists {
        case (w, h, p) => w == 3 && h == 2 && p.toSeq == px.toSeq
      }, s"round trip failed for bottomUp=$bottomUp")
    }
  }

  test("resizePixels: 2x downscale picks the exact floor-mapped source pixels") {
    // 4x4 source, every byte unique; 2x2 target must pick source pixels
    // (0,0), (2,0), (0,2), (2,2) — the floor mapping sx=2tx, sy=2ty
    val src = Array.tabulate(48)(i => i.toByte)
    val out = Multimodal.resizePixels(src, 4, 4, 2, 2)
    def pixel(x: Int, y: Int) = (0 until 3).map(c => src((y * 4 + x) * 3 + c))
    assert(out.toSeq == Seq((0, 0), (2, 0), (0, 2), (2, 2)).flatMap {
      case (x, y) => pixel(x, y) })
    // upscale: every target pixel replicates its floor-mapped source
    val up = Multimodal.resizePixels(src, 4, 4, 8, 4)
    assert(up.length == 3 * 8 * 4)
    assert((0 until 8).forall { tx =>
      (0 until 3).forall(c => up(tx * 3 + c) == src((tx / 2) * 3 + c)) })
  }

  test("resizeDecoded: real resample for BMPs, re-encoded decodable; stub otherwise") {
    import spark.implicits._
    val img = Array(
      Array((255, 0, 0), (0, 255, 0), (10, 20, 30), (40, 50, 60)),
      Array((1, 2, 3), (4, 5, 6), (7, 8, 9), (11, 12, 13)),
      Array((90, 91, 92), (93, 94, 95), (96, 97, 98), (99, 100, 101)),
      Array((200, 0, 50), (60, 70, 80), (110, 120, 130), (140, 150, 160)))
    val bmp = encodeBmp(img, bottomUp = true)
    val text = "plainly not a bitmap".getBytes("UTF-8")
    val in = Seq(1L -> bmp, 2L -> text).toDF("doc_id", "media")
    val got = Multimodal.resizeDecoded(spark, in, w = 2, h = 2).collect()
      .map(r => r.doc_id -> r).toMap
    // the BMP output is itself a valid top-down 2x2 BMP whose pixels are
    // the floor-mapped source pixels (0,0),(2,0),(0,2),(2,2)
    val decoded = Multimodal.BmpDecoder.tryDecodePixels(got(1L).media)
    assert(decoded.isDefined, "resized BMP must re-decode")
    val (w, h, px) = decoded.get
    assert(w == 2 && h == 2)
    val want = Seq((0, 0), (2, 0), (0, 2), (2, 2)).flatMap { case (x, y) =>
      val (r, g, b) = img(y)(x); Seq(b.toByte, g.toByte, r.toByte) }
    assert(px.toSeq == want)
    // non-BMP payloads take the byte-slice stub path (q81's contract)
    assert(got(2L).media.toSeq == text.take(4).toSeq)
  }

  test("dHash: gradient bits set exactly where the 9x8 grid brightens leftward") {
    // 9x8 source (identity resample): per row, gray ramps UP with tx
    // (tx*60 summed over channels) except one engineered zero at
    // tx = D(ty) = (ty % 7) + 2 — so per row exactly ONE comparison
    // gray(tx) > gray(tx+1) holds, at tx = D-1 (the cell before the
    // drop; D >= 2 keeps its gray strictly positive)
    val px = new Array[Byte](3 * 9 * 8)
    for (ty <- 0 until 8; tx <- 0 until 9; c <- 0 until 3)
      px((ty * 9 + tx) * 3 + c) = (if (tx == (ty % 7) + 2) 0 else tx * 20).toByte
    val h = Multimodal.dHash(px, 9, 8)
    val want = (0 until 8).map(ty => 1L << (ty * 8 + (ty % 7) + 1)).sum
    assert(h == want,
      s"expected one bit per row at the engineered drop: got ${h.toBinaryString} want ${want.toBinaryString}")
    // a one-pixel change moves one bit (the perceptual property the
    // Hamming banding exploits): row 3's drop is at D=5, so raising
    // tx=2 (gray 120 -> 210) flips only the tx=2 vs tx=3 (gray 180)
    // comparison; an identical image hashes identically
    val px2 = px.clone()
    px2((3 * 9 + 2) * 3) = (((px2((3 * 9 + 2) * 3) & 0xff) + 90) & 0xff).toByte
    val d = java.lang.Long.bitCount(h ^ Multimodal.dHash(px2, 9, 8))
    assert(d == 1, s"one-pixel perturbation must move exactly one bit here, moved $d")
    assert(Multimodal.dHash(px.clone(), 9, 8) == h)
  }

  test("audioFingerprint: sign-of-energy-delta bits at the engineered drops, 1-D dHash laws") {
    // 65 mono frames (identity resample: position j reads frame j):
    // energy ramps UP with f except one engineered zero at f = 13 — so
    // exactly ONE comparison e(k) > e(k+1) holds, at k = 12
    val up = Array.tabulate(65)(f => if (f == 13) 0 else (f + 1) * 10)
    val fp = Multimodal.audioFingerprint(up.map(_.toShort), 1)
    assert(fp == (1L << 12),
      s"expected the single engineered-drop bit: got ${fp.toBinaryString}")
    // one-frame perturbation moves few bits (each frame joins <= 2
    // positions x 2 sides = <= 4 comparisons at nf = 65) — the
    // perceptual property the Hamming banding exploits
    val up2 = up.clone(); up2(40) = 0
    val d = java.lang.Long.bitCount(
      fp ^ Multimodal.audioFingerprint(up2.map(_.toShort), 1))
    assert(d >= 1 && d <= 4, s"one-frame perturbation moved $d bits")
    // determinism + amplitude-scale invariance (ordering-preserving
    // gain leaves every sign-of-delta bit unchanged)
    assert(Multimodal.audioFingerprint(up.map(_.toShort), 1) == fp)
    assert(Multimodal.audioFingerprint(up.map(v => (v * 3).toShort), 1) == fp)
    // stereo mixdown: per-frame CHANNEL SUM is the energy — a stereo
    // stream whose frames sum to the mono stream fingerprints equally
    val stereo = up.flatMap(v => Array((v - 3).toShort, 3.toShort))
    assert(Multimodal.audioFingerprint(stereo, 2) == fp)
    // energy is |sum|: a negated stream fingerprints identically
    assert(Multimodal.audioFingerprint(up.map(v => (-v).toShort), 1) == fp)
  }

  test("audioHashes: real WAV decodes get a fingerprint, stubs and empty WAVs get null") {
    import spark.implicits._
    val samples = Array.tabulate(24)(i => ((i * 37) % 100 - 50).toShort)
    val wav = Multimodal.encodeWav(samples, 2, 8000)
    val empty = Multimodal.encodeWav(Array.empty[Short], 1, 8000)
    val text = "not audio".getBytes("UTF-8")
    val got = Multimodal.audioHashes(spark,
        Seq(1L -> wav, 2L -> text, 3L -> empty).toDF("doc_id", "media"))
      .collect().map(r => r.doc_id -> r.afp).toMap
    assert(got(1L).contains(Multimodal.audioFingerprint(samples, 2)))
    assert(got(2L).isEmpty, "non-decodable payloads must carry a null fingerprint")
    assert(got(3L).isEmpty, "a zero-frame WAV has no energy sequence to fingerprint")
  }

  test("mediaHashes: one pass routes each payload to its modality's fingerprint") {
    import spark.implicits._
    val img = Array.tabulate(2, 3)((r, c) => (r * 40 + c * 10, 0, 0))
    val bmp = encodeBmp(img.map(_.toArray), bottomUp = true)
    val fpx = Array.tabulate(12)(i => (i * 17).toByte)
    val ico = Multimodal.encodeIco(Seq((fpx, 2, 2)))
    val samples = Array.tabulate(30)(i => ((i * 31) % 200 - 100).toShort)
    val wav = Multimodal.encodeWav(samples, 1, 8000)
    val text = "none of the above".getBytes("UTF-8")
    val got = Multimodal.mediaHashes(spark,
        Seq(1L -> bmp, 2L -> ico, 3L -> wav, 4L -> text).toDF("doc_id", "media"))
      .collect().map(r => r.doc_id -> ((r.kind, r.fp))).toMap
    assert(got(1L) == (("bmp", Some(Multimodal.dHash(bgrBytes(img.map(_.toArray)), 3, 2)))))
    assert(got(2L) == (("ico", Some(Multimodal.dHash(fpx, 2, 2)))),
      "a container fingerprints by its FIRST decoded frame")
    assert(got(3L) == (("wav", Some(Multimodal.audioFingerprint(samples, 1)))))
    assert(got(4L) == (("stub", None)), "undecodable payloads carry kind=stub, null fp")
  }

  test("imageHashes: real decodes get a perceptual hash, stubs get null") {
    import spark.implicits._
    val img = Array.tabulate(2, 3)((r, c) => (r * 40 + c * 10, 0, 0))
    val bmp = encodeBmp(img.map(_.toArray), bottomUp = true)
    val text = "not an image".getBytes("UTF-8")
    val got = Multimodal.imageHashes(spark,
        Seq(1L -> bmp, 2L -> text).toDF("doc_id", "media"))
      .collect().map(r => r.doc_id -> r.dhash).toMap
    assert(got(1L).contains(Multimodal.dHash(bgrBytes(img.map(_.toArray)), 3, 2)))
    assert(got(2L).isEmpty, "non-decodable payloads must carry a null hash")
  }

  test("resize: every output payload capped at w*h bytes with dims attached") {
    val rows = Multimodal.resize(spark, media, w = 8, h = 4).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.media.length <= 32 && r.width == 8 && r.height == 4))
  }

  test("ICO encode/decode round trip: every frame's dims and pixels recovered") {
    // three frames at distinct dims, including padded XOR strides
    // (4x1: 12->12, 1x4: 3->4) and sub-word mask rows
    val f0 = Array.tabulate(12)(i => (i * 7 + 3).toByte)   // 2x2
    val f1 = Array.tabulate(12)(i => (i * 11 + 5).toByte)  // 4x1
    val f2 = Array.tabulate(12)(i => (i * 13 + 1).toByte)  // 1x4
    val ico = Multimodal.encodeIco(Seq((f0, 2, 2), (f1, 4, 1), (f2, 1, 4)))
    val got = Multimodal.IcoDecoder.tryDecodeFrames(ico)
    assert(got.isDefined, "strict ICO must decode")
    val fs = got.get
    assert(fs.map(f => (f._1, f._2)) == Seq((2, 2), (4, 1), (1, 4)))
    assert(fs(0)._3.toSeq == f0.toSeq && fs(1)._3.toSeq == f1.toSeq
      && fs(2)._3.toSeq == f2.toSeq, "XOR rows must un-reverse and strip padding")
    // truncation anywhere = invalid, never a partial decode
    assert(Multimodal.IcoDecoder.tryDecodeFrames(ico.take(ico.length - 3)).isEmpty)
    assert(Multimodal.IcoDecoder.tryDecodeFrames("random text".getBytes("UTF-8")).isEmpty)
  }

  test("sampleFramesDecoded: real per-frame decode for ICOs, raw slices otherwise") {
    import spark.implicits._
    val frames = (0 until 5).map(k => (Array.tabulate(12)(i => (k * 50 + i).toByte), 2, 2))
    val ico = Multimodal.encodeIco(frames)
    val text = "0123456789abcdef0123456789abcdef0123456789abcdefXYZ".getBytes("UTF-8")
    val in = Seq(1L -> ico, 2L -> text).toDF("doc_id", "media")
    val got = Multimodal.sampleFramesDecoded(spark, in, stride = 2).collect()
      .groupBy(_.doc_id)
    // ICO: frames 0, 2, 4 with decoded pixels
    val icoRows = got(1L).sortBy(_.frame_idx)
    assert(icoRows.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(icoRows.forall(r => r.width == 2 && r.height == 2))
    assert(icoRows.map(_.frame.toSeq).toSeq ==
      Seq(0, 2, 4).map(k => frames(k)._1.toSeq))
    // non-container: q80's fixed-width slices, dims (frameBytes, 1)
    val stubRows = got(2L).sortBy(_.frame_idx)
    assert(stubRows.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(stubRows.forall(r => r.width == 16 && r.height == 1))
    assert(stubRows(0).frame.toSeq == text.slice(0, 16).toSeq)
    assert(stubRows(1).frame.toSeq == text.slice(32, 48).toSeq)
  }

  test("WAV encode/decode round trip: channels, rate, and signed samples exact") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1000, -999, 12345)
    val wav = Multimodal.encodeWav(samples, channels = 2, sampleRate = 44100)
    val got = Multimodal.WavDecoder.tryDecode(wav)
    assert(got.isDefined)
    val (ch, rate, s) = got.get
    assert(ch == 2 && rate == 44100 && s.toSeq == samples.toSeq,
      "sign, endianness, and interleave must survive the round trip")
    // truncation / corruption = invalid, never a partial decode
    assert(Multimodal.WavDecoder.tryDecode(wav.take(wav.length - 1)).isEmpty)
    val bad = wav.clone(); bad(20) = 3 // audioFormat != PCM
    assert(Multimodal.WavDecoder.tryDecode(bad).isEmpty)
    assert(Multimodal.WavDecoder.tryDecode("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("decodeAudio: per-channel stats over signed samples; stub rows carry no stats") {
    import spark.implicits._
    // stereo: ch0 = {100, -300, 5}, ch1 = {-200, 400, -6}
    val samples = Array[Short](100, -200, -300, 400, 5, -6)
    val wav = Multimodal.encodeWav(samples, channels = 2, sampleRate = 8000)
    val text = "definitely not audio data".getBytes("UTF-8")
    val got = Multimodal.decodeAudio(spark,
        Seq(1L -> wav, 2L -> text).toDF("doc_id", "media"))
      .collect().map(f => f.doc_id -> f).toMap
    val a = got(1L)
    assert(a.n_channels == 2 && a.sample_rate == 8000 && a.n_frames == 3)
    assert(a.ch_sums.toSeq == Seq(-195L, 194L))
    assert(a.ch_mins.toSeq == Seq(-300, -200) && a.ch_maxs.toSeq == Seq(100, 400))
    val b = got(2L)
    assert(b.ch_sums.isEmpty && b.n_frames == text.length / 2,
      "undecodable payloads take the length-arithmetic stub with no stats")
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

  test("mediaMeta: header-truth kind dispatch without decode; stub fallback") {
    import spark.implicits._
    val px = Array.tabulate(24)(i => (i * 7 + 3).toByte)
    val bmp = Multimodal.encodeBmp(px, 2, 4, bottomUp = true)
    val ico = Multimodal.encodeIco(Seq(
      (px.take(12), 2, 2), (px.slice(12, 24), 4, 1), (px.take(12), 1, 4)))
    val wav = Multimodal.encodeWav(Array.tabulate[Short](12)(i => (i * 321 - 900).toShort),
      channels = 2, sampleRate = 8000)
    val junk = "not media at all, just text".getBytes("UTF-8")
    val got = Multimodal.mediaMeta(spark,
        Seq(1L -> bmp, 2L -> ico, 3L -> wav, 4L -> junk).toDF("doc_id", "media"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L) == Multimodal.MediaMeta(1L, "bmp", bmp.length.toLong, 2, 4, 1))
    assert(got(2L) == Multimodal.MediaMeta(2L, "ico", ico.length.toLong, 2, 2, 3))
    assert(got(3L) == Multimodal.MediaMeta(3L, "wav", wav.length.toLong, 2, 16, 6))
    // stub fallback carries the deterministic length arithmetic
    val len = junk.length.toLong
    assert(got(4L) == Multimodal.MediaMeta(4L, "stub", len,
      (len % 640 + 64).toInt, ((len * 7) % 480 + 48).toInt, (len % 16 + 1).toInt))
    // meta dims equal full-decode truth on every real kind (shared headers)
    assert(Multimodal.BmpDecoder.tryMeta(bmp).contains((2, 4)))
    assert(Multimodal.IcoDecoder.tryMeta(ico).contains(Seq((2, 2), (4, 1), (1, 4))))
    assert(Multimodal.WavDecoder.tryMeta(wav).contains((2, 8000, 6)))
    assert(Multimodal.BmpDecoder.tryMeta(junk).isEmpty
      && Multimodal.IcoDecoder.tryMeta(junk).isEmpty
      && Multimodal.WavDecoder.tryMeta(junk).isEmpty)
  }

  test("decodeFeatures: ICO and WAV branches fold the decoded payload stripes") {
    import spark.implicits._
    val px = Array.tabulate(36)(i => (i * 11 + 5).toByte)
    val ico = Multimodal.encodeIco(Seq(
      (px.take(12), 2, 2), (px.slice(12, 24), 4, 1), (px.slice(24, 36), 1, 4)))
    val samples = Array.tabulate[Short](12)(i => (i * 1234 - 6000).toShort)
    val wav = Multimodal.encodeWav(samples, channels = 1, sampleRate = 8000)
    val got = Multimodal.decodeFeatures(spark,
        Seq(1L -> ico, 2L -> wav).toDF("doc_id", "media"))
      .collect().map(m => m.doc_id -> m).toMap
    // ICO: first-frame dims, directory count, stripe fold over the
    // frames' decoded pixels concatenated in directory order
    assert(got(1L).width == 2 && got(1L).height == 2 && got(1L).n_frames == 3)
    assert(got(1L).byte_len == ico.length.toLong)
    assert(got(1L).features.toSeq ==
      Multimodal.StubDecoder.stripeFeatures(px).toSeq,
      "ICO features must fold the concatenated decoded frame pixels")
    // WAV: channels/bits/frames, stripe fold over the samples
    // re-serialized little-endian (= the data chunk's byte sequence)
    val le = samples.flatMap(s0 => Array(s0.toByte, (s0 >> 8).toByte))
    assert(got(2L).width == 1 && got(2L).height == 16 && got(2L).n_frames == 12)
    assert(got(2L).features.toSeq ==
      Multimodal.StubDecoder.stripeFeatures(le).toSeq,
      "WAV features must fold the little-endian sample bytes")
  }
}
