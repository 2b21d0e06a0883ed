package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata alongside, and per-batch
  * decode/feature-extract runs inside `mapPartitions` — the Scala
  * equivalent of a vectorized mapInPandas stage: one iterator per
  * partition, so a real decoder would amortize codec/model init across
  * the whole batch instead of paying it per row.
  *
  * Three formats decode for REAL: 24-bit uncompressed BMP
  * ([[BmpDecoder]], with [[encodeBmp]] as its inverse and
  * [[resizePixels]] the nearest-neighbor resample over its pixels),
  * the multi-frame ICO container ([[IcoDecoder]]/[[encodeIco]]), and
  * canonical 16-bit PCM WAV ([[WavDecoder]]/[[encodeWav]]); both
  * [[decodeFeatures]] and the header-only [[mediaMeta]] dispatch
  * across all three by magic bytes. Every other payload routes to
  * [[StubDecoder]], a deterministic stand-in for the codecs this
  * container lacks — so decode, meta, resize, and frame-sample stay
  * TOTAL over arbitrary binary columns. The Spark-side plumbing —
  * schema, binary transport, partition-batch shape, feature vector
  * output — is real and tested either way.
  */
object Multimodal {

  /** Raw media row as shipped between stages. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Decoded features: fixed-width embedding plus parsed metadata. */
  final case class MediaFeatures(doc_id: Long, byte_len: Long,
    width: Int, height: Int, n_frames: Int, features: Array[Double])

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * metadata is derived arithmetically from the payload length, and the
    * "embedding" is per-stripe byte averages. The stripe sums fold in
    * DECIMAL(27,12) (a 256-entry unscaled-long lookup — exact and
    * order-independent), so the features are engine- and
    * partitioning-independent and q51 carries a full DuckDB oracle.
    * Replace `decode` with a real codec call to productionize;
    * everything around it stays. */
  object StubDecoder {
    val featureDim = 8

    /** Unscaled DECIMAL(27,12) of b/255.0 per byte value — the same
      * double->decimal rounding every parity-sensitive fold uses. */
    private val lut: Array[Long] = Array.tabulate(256)(b =>
      java.math.BigDecimal.valueOf(b / 255.0)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact())

    /** Stripe-average embedding over a byte payload: per-stripe exact
      * decimal means of b/255.0. Shared by the stub (raw payload bytes)
      * and [[BmpDecoder]] (DECODED pixel bytes). */
    private[graft] def stripeFeatures(bytes: Array[Byte]): Array[Double] = {
      val sums = new Array[Long](featureDim) // unscaled at scale 12
      val counts = new Array[Long](featureDim)
      var i = 0
      while (i < bytes.length) {
        val k = i % featureDim
        sums(k) += lut(bytes(i) & 0xff)
        counts(k) += 1
        i += 1
      }
      Array.tabulate(featureDim)(k =>
        if (counts(k) == 0) 0.0
        else java.math.BigDecimal.valueOf(sums(k), 12).doubleValue() / counts(k))
    }

    def decode(doc_id: Long, bytes: Array[Byte]): MediaFeatures = {
      val len = bytes.length.toLong
      MediaFeatures(doc_id, len,
        width = (len % 640 + 64).toInt,
        height = ((len * 7) % 480 + 48).toInt,
        n_frames = (len % 16 + 1).toInt,
        features = stripeFeatures(bytes))
    }
  }

  /** REAL decoder for one format — 24-bit uncompressed (BI_RGB) BMP,
    * parsed pure-JVM from the classic BITMAPFILEHEADER +
    * BITMAPINFOHEADER layout: 'BM' magic, little-endian pixel-data
    * offset at byte 10, signed width/height at 18/22 (negative height =
    * top-down row order), 4-byte-padded pixel rows. Produces the same
    * [[MediaFeatures]] contract as the stub, with header TRUTH instead
    * of arithmetic stand-ins: width/height from the DIB header,
    * n_frames = 1 (a still image), features = the stripe-average
    * embedding over the DECODED pixel bytes — padding stripped and rows
    * normalized to top-down order, so a bottom-up and a top-down
    * encoding of the same image decode to identical features.
    *
    * Strictly validated (magic, DIB size, planes, 24 bpp, BI_RGB,
    * positive dims, pixel array in bounds): anything that fails is not
    * a BMP and returns None, routing [[decodeFeatures]] to the stub —
    * total and deterministic on arbitrary payloads, so the q50/q51
    * text-as-media corpus decodes exactly as before. */
  object BmpDecoder {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    /** The strict header validation shared by [[tryMeta]] (which stops
      * here — O(header) work) and [[tryDecodePixels]] (which goes on to
      * copy the pixel array): (width, height, dataOff, topDown, stride),
      * or None for anything that is not a strictly-valid 24-bit BI_RGB
      * BMP with its whole pixel array in bounds. */
    private def tryHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Boolean, Long)] = {
      if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) None
      else {
        val dataOff = i32(bytes, 10)
        val dibSize = i32(bytes, 14)
        val w = i32(bytes, 18)
        val hRaw = i32(bytes, 22)
        val planes = u16(bytes, 26)
        val bpp = u16(bytes, 28)
        val compression = i32(bytes, 30)
        val h = math.abs(hRaw)
        val rowBytes = 3L * w
        val stride = (rowBytes + 3) & ~3L
        if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0 ||
            w <= 0 || hRaw == 0 || hRaw == Int.MinValue || w > (Int.MaxValue / 4) ||
            dataOff < 54 || dataOff.toLong + stride * h > bytes.length) None
        else Some((w, h, dataOff, hRaw < 0, stride))
      }
    }

    /** Header-truth (width, height) WITHOUT decoding pixels — the
      * O(header) metadata sniff [[Multimodal.mediaMeta]] dispatches on.
      * Validates exactly as strictly as the full decode (same
      * [[tryHeader]]), so meta-kind and decode-kind can never disagree. */
    def tryMeta(bytes: Array[Byte]): Option[(Int, Int)] =
      tryHeader(bytes).map { case (w, h, _, _, _) => (w, h) }

    /** The pixel-level decode: (width, height, pixels) with pixels in
      * top-down row-major B,G,R byte order, padding stripped — the
      * shared core of [[tryDecode]] (which folds stripe features over
      * it) and the real resize kernel (which resamples it). */
    def tryDecodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      tryHeader(bytes).map { case (w, h, dataOff, topDown, stride) =>
        val rowBytes = 3 * w
        val pixels = new Array[Byte](rowBytes * h)
        var r = 0
        while (r < h) {
          val srcRow = if (topDown) r else h - 1 - r
          System.arraycopy(bytes, dataOff + (srcRow * stride).toInt,
            pixels, r * rowBytes, rowBytes)
          r += 1
        }
        (w, h, pixels)
      }

    def tryDecode(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] =
      tryDecodePixels(bytes).map { case (w, h, pixels) =>
        MediaFeatures(docId, bytes.length.toLong, w, h, 1,
          StubDecoder.stripeFeatures(pixels))
      }
  }

  /** [[BmpDecoder]]'s inverse: encode a top-down row-major B,G,R pixel
    * array (length 3·w·h) as a strictly-valid 24-bit BI_RGB BMP —
    * classic 54-byte BITMAPFILEHEADER + BITMAPINFOHEADER, 4-byte-padded
    * rows (zero padding), `bottomUp = true` for the positive-height
    * last-row-first layout, false for the negative-height top-down one.
    * Round-trip law (MultimodalSpec): `tryDecodePixels(encodeBmp(p, w,
    * h, either)) == Some((w, h, p))` — both row orders decode back to
    * the same pixels, which is what lets q82 pin the real decode path
    * against an oracle that never needs to model padding or row order. */
  def encodeBmp(pixels: Array[Byte], w: Int, h: Int, bottomUp: Boolean): Array[Byte] = {
    require(w > 0 && h > 0, s"dimensions must be positive, got ${w}x$h")
    require(pixels.length == 3 * w * h,
      s"pixel array must hold 3*$w*$h = ${3 * w * h} bytes, got ${pixels.length}")
    val rowBytes = 3 * w
    val stride = (rowBytes + 3) & ~3
    val out = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)                  // reserved, pixel-data offset
    out.putInt(40).putInt(w).putInt(if (bottomUp) h else -h)
      .putShort(1).putShort(24).putInt(0)                  // planes, bpp, BI_RGB
      .putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0
    while (r < h) {
      val srcRow = if (bottomUp) h - 1 - r else r
      out.put(pixels, srcRow * rowBytes, rowBytes)
      var p = rowBytes
      while (p < stride) { out.put(0.toByte); p += 1 }
      r += 1
    }
    out.array()
  }

  /** Nearest-neighbor resample over a top-down row-major B,G,R pixel
    * array: target pixel (tx, ty) copies source pixel
    * (⌊tx·srcW/dstW⌋, ⌊ty·srcH/dstH⌋) — the standard floor mapping, so
    * an exact 2× downscale picks every other source pixel starting at
    * (0, 0) (MultimodalSpec pins the exact byte selection). Pure
    * per-pixel integer arithmetic: deterministic, engine-replayable,
    * and O(dst) regardless of scale direction. */
  def resizePixels(pixels: Array[Byte], srcW: Int, srcH: Int,
                   dstW: Int, dstH: Int): Array[Byte] = {
    require(srcW > 0 && srcH > 0 && dstW > 0 && dstH > 0, "dimensions must be positive")
    require(pixels.length == 3 * srcW * srcH,
      s"pixel array must hold 3*$srcW*$srcH bytes, got ${pixels.length}")
    val out = new Array[Byte](3 * dstW * dstH)
    var ty = 0
    while (ty < dstH) {
      val sy = (ty.toLong * srcH / dstH).toInt
      var tx = 0
      while (tx < dstW) {
        val sx = (tx.toLong * srcW / dstW).toInt
        val src = (sy * srcW + sx) * 3
        val dst = (ty * dstW + tx) * 3
        out(dst) = pixels(src); out(dst + 1) = pixels(src + 1); out(dst + 2) = pixels(src + 2)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Perceptual difference hash (dHash, public recipe) over a decoded
    * pixel array: nearest-neighbor resample to a 9x8 grid
    * ([[resizePixels]] — NN commutes with per-pixel grayscale, so
    * sampling then graying equals the classic gray-then-resize), gray
    * each cell as the exact B+G+R byte sum (integer, no rounding), and
    * emit 64 bits — bit (ty·8 + tx) set iff gray(tx, ty) >
    * gray(tx+1, ty). Visually-near images differ in few bits, so
    * Hamming-banded pairing (q84) finds near-duplicates without an
    * all-pairs scan — the image-space member of the dedup family,
    * same banded shape as the MinHash/SimHash text paths. */
  def dHash(pixels: Array[Byte], w: Int, h: Int): Long = {
    val rp = resizePixels(pixels, w, h, 9, 8)
    def gray(tx: Int, ty: Int): Int = {
      val i = (ty * 9 + tx) * 3
      (rp(i) & 0xff) + (rp(i + 1) & 0xff) + (rp(i + 2) & 0xff)
    }
    var hsh = 0L
    var k = 0
    var ty = 0
    while (ty < 8) {
      var tx = 0
      while (tx < 8) {
        if (gray(tx, ty) > gray(tx + 1, ty)) hsh |= 1L << k
        k += 1
        tx += 1
      }
      ty += 1
    }
    hsh
  }

  /** Acoustic fingerprint (sign-of-energy-delta, the Haitsma-Kalker
    * family's public core idea) over decoded PCM samples — the audio
    * member of the perceptual-hash family, the exact 1-D analogue of
    * [[dHash]]: mix the interleaved stream down to per-frame energy
    * (|sum of the frame's channel samples| — integer, no rounding),
    * nearest-neighbor-sample 65 frame positions with the same floor
    * mapping [[resizePixels]] uses (position j reads frame
    * ⌊j·nf/65⌋), and emit 64 bits — bit k set iff
    * energy(pos k) > energy(pos k+1). Acoustically-near streams differ
    * in few bits, so the SAME Hamming-banded pairing the image path
    * runs (q84/q112) finds near-duplicates without an all-pairs scan.
    * Pure integer arithmetic: deterministic, engine-replayable. */
  def audioFingerprint(samples: Array[Short], channels: Int): Long = {
    require(channels >= 1, s"channels must be positive, got $channels")
    require(samples.nonEmpty && samples.length % channels == 0,
      s"${samples.length} samples do not form whole non-zero $channels-channel frames")
    val nf = samples.length / channels
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var s = 0L
      var c = 0
      while (c < channels) { s += samples(f * channels + c); c += 1 }
      e(f) = math.abs(s)
      f += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      // long arithmetic in the floor mapping, as resizePixels: k*nf
      // overflows Int past ~33.5M frames (~13 min of 44.1 kHz mono)
      if (e((k.toLong * nf / 65).toInt) > e(((k + 1).toLong * nf / 65).toInt)) fp |= 1L << k
      k += 1
    }
    fp
  }

  /** Per-payload acoustic fingerprint row: null afp = payload not a
    * decodable (non-empty) canonical WAV — only real decodes get a
    * perceptual fingerprint, the [[ImageHashRow]] convention. */
  final case class AudioHashRow(doc_id: Long, afp: Option[Long])

  /** Decode + acoustic-fingerprint stage: one narrow per-partition
    * batch map, same dispatch totality as [[decodeAudio]]. */
  def audioHashes(spark: SparkSession, media: DataFrame): Dataset[AudioHashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map(r => AudioHashRow(r.doc_id,
        WavDecoder.tryDecode(r.media).collect {
          case (ch, _, samples) if samples.nonEmpty => audioFingerprint(samples, ch)
        }))
    }
  }

  /** Modality-routed perceptual hash row: the format the dispatch
    * recognized plus that modality's 64-bit perceptual fingerprint —
    * [[dHash]] over decoded BMP pixels, [[dHash]] over a container's
    * FIRST decoded frame (the thumbnail convention: the lead frame is
    * the container's visual identity), [[audioFingerprint]] over
    * decoded PCM samples. null = undecodable (stub payloads have
    * nothing perceptual to hash). */
  final case class MediaHashRow(doc_id: Long, kind: String, fp: Option[Long])

  /** One-pass modality-routed perceptual hashing — the heterogeneous-
    * corpus stage: each payload is dispatched by its magic bytes
    * (the [[decodeFeatures]] chain) and fingerprinted with ITS
    * modality's kernel, so a single narrow batch map prepares a mixed
    * image/container/audio corpus for the banded dedup family (pairs
    * then form per modality — fingerprints of different kinds live in
    * different spaces and must never compare). */
  def mediaHashes(spark: SparkSession, media: DataFrame): Dataset[MediaHashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        BmpDecoder.tryDecodePixels(r.media)
          .map { case (w, h, px) => MediaHashRow(r.doc_id, "bmp", Some(dHash(px, w, h))) }
          .orElse(IcoDecoder.tryDecodeFrames(r.media).map { frames =>
            val (w, h, px) = frames.head
            MediaHashRow(r.doc_id, "ico", Some(dHash(px, w, h)))
          })
          .orElse(WavDecoder.tryDecode(r.media).collect {
            case (ch, _, samples) if samples.nonEmpty =>
              MediaHashRow(r.doc_id, "wav", Some(audioFingerprint(samples, ch)))
          })
          .getOrElse(MediaHashRow(r.doc_id, "stub", None))
      }
    }
  }

  /** Per-image perceptual hash row: null dhash = payload not decodable
    * (only real decodes get a perceptual hash; there is nothing
    * perceptual about stub bytes). */
  final case class ImageHashRow(doc_id: Long, dhash: Option[Long])

  /** Decode + perceptual-hash stage: one narrow per-partition batch
    * map, same dispatch totality as [[decodeFeatures]]. */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map(r => ImageHashRow(r.doc_id,
        BmpDecoder.tryDecodePixels(r.media).map { case (w, h, px) => dHash(px, w, h) }))
    }
  }

  /** documents.text reinterpreted as an opaque media payload — the
    * binary-column transport shape (schema: doc_id BIGINT, media BINARY). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  /** Batch decode: one decoder pass per partition (mapPartitions keeps
    * the iterator lazy — constant memory per task regardless of
    * partition size; scale the parallelism with input partitioning).
    * Format dispatch is per payload — each real decoder's magic check
    * rejects the others' layouts in O(1), so the chain costs one
    * decode plus a few byte compares: a strictly-valid 24-bit BMP
    * ([[BmpDecoder]]), then a 24-bit ICO container ([[IcoDecoder]]:
    * first-frame dims, frames concatenated into the stripe fold), then
    * canonical 16-bit PCM WAV ([[WavDecoder.tryFeatures]]); everything
    * else falls back to the deterministic stub — one total function
    * over arbitrary binary columns. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      // a heavier codec/model would init once here, then stream the batch
      batch.map(r => BmpDecoder.tryDecode(r.doc_id, r.media)
        .orElse(IcoDecoder.tryDecode(r.doc_id, r.media))
        .orElse(WavDecoder.tryFeatures(r.doc_id, r.media))
        .getOrElse(StubDecoder.decode(r.doc_id, r.media)))
    }
  }

  /** Sniffed metadata row: the format the dispatch recognized plus its
    * header-truth dimensions. Per-kind column semantics: bmp =
    * (width, height, 1); ico = (first-frame width, first-frame height,
    * directory count); wav = (channels, bits-per-sample, per-channel
    * frames); stub = the deterministic length arithmetic. */
  final case class MediaMeta(doc_id: Long, kind: String, byte_len: Long,
    width: Int, height: Int, n_frames: Int)

  /** Metadata WITHOUT decode — each format's `tryMeta` validates the
    * header exactly as strictly as the full decoder (shared header
    * parses, so meta-kind and decode-kind can never disagree) but
    * stops before materializing pixels/samples: O(header bytes) per
    * row instead of O(payload), the right cost for a 100 TB cataloging
    * pass that only needs dimensions and frame counts. Same narrow
    * mapPartitions shape as [[decodeFeatures]]. */
  def mediaMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        val len = r.media.length.toLong
        BmpDecoder.tryMeta(r.media).map { case (w, h) =>
          MediaMeta(r.doc_id, "bmp", len, w, h, 1)
        }.orElse(IcoDecoder.tryMeta(r.media).map { dims =>
          MediaMeta(r.doc_id, "ico", len, dims.head._1, dims.head._2, dims.size)
        }).orElse(WavDecoder.tryMeta(r.media).map { case (ch, _, frames) =>
          MediaMeta(r.doc_id, "wav", len, ch, 16, frames)
        }).getOrElse(MediaMeta(r.doc_id, "stub", len,
          (len % 640 + 64).toInt, ((len * 7) % 480 + 48).toInt,
          (len % 16 + 1).toInt))
      }
    }
  }

  /** Resized media row: payload plus target dimensions (the transport
    * schema of an image-resize stage). */
  final case class ResizedRow(doc_id: Long, width: Int, height: Int, media: Array[Byte])

  /** Resize stage (STUB kernel, real plumbing): per-partition batch map
    * producing fixed-dimension payloads. The real kernel for the format
    * the engine can decode is [[resizeDecoded]]; this byte-slicing stub
    * stands in for codecs the container lacks (q81 pins its bytes). */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        val out = java.util.Arrays.copyOf(r.media, math.min(r.media.length, w * h))
        ResizedRow(r.doc_id, w, h, out)
      }
    }
  }

  /** REAL resize stage over decodable payloads: a strictly-valid 24-bit
    * BMP decodes ([[BmpDecoder.tryDecodePixels]]), resamples
    * nearest-neighbor ([[resizePixels]]), and re-encodes as a top-down
    * BMP at the target dimensions — so the stage's output is itself
    * decodable and the resize composes with [[decodeFeatures]].
    * Everything else falls back to [[resize]]'s byte-slicing stub
    * (same totality contract as the decode dispatch: one total
    * function over arbitrary binary columns). Same scale shape as the
    * stub stage: a narrow per-partition batch map, no shuffle. */
  def resizeDecoded(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        BmpDecoder.tryDecodePixels(r.media) match {
          case Some((sw, sh, px)) =>
            ResizedRow(r.doc_id, w, h,
              encodeBmp(resizePixels(px, sw, sh, w, h), w, h, bottomUp = false))
          case None =>
            val out = java.util.Arrays.copyOf(r.media, math.min(r.media.length, w * h))
            ResizedRow(r.doc_id, w, h, out)
        }
      }
    }
  }

  /** Frame-sample stage (STUB): emits every `stride`-th fixed-size
    * "frame" of the payload as its own row — the video -> frames
    * explode shape (one input row fans out to n_frames rows). The real
    * kernel for the container the engine can decode is
    * [[sampleFramesDecoded]]; this fixed-width byte slicing is ALSO the
    * honest semantics for raw (headerless) frame streams. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int, stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.flatMap { r =>
        val n = r.media.length / frameBytes
        (0 until n by stride).iterator.map { i =>
          FrameRow(r.doc_id, i,
            java.util.Arrays.copyOfRange(r.media, i * frameBytes, (i + 1) * frameBytes))
        }
      }
    }
  }

  /** REAL multi-frame container for the frame-sample path — the classic
    * ICO layout (public format): a 6-byte ICONDIR (reserved 0, type 1,
    * count), `count` 16-byte ICONDIRENTRYs (width/height bytes with the
    * 0-means-256 rule, bytesInRes, imageOffset), each entry a
    * BITMAPINFOHEADER DIB whose biHeight is DOUBLED (bottom-up 24-bit
    * XOR pixel rows followed by a 1-bpp AND mask, both rows padded to
    * 32 bits). [[IcoDecoder]] parses the strict 24-bit BI_RGB subset
    * with full bounds validation — anything else returns None, same
    * totality contract as [[BmpDecoder]]. */
  object IcoDecoder {
    private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    /** Decoded frames in directory order: (width, height, pixels) with
      * pixels top-down row-major B,G,R, XOR-image only, padding and
      * AND mask stripped. None unless EVERY entry validates. */
    def tryDecodeFrames(bytes: Array[Byte]): Option[Seq[(Int, Int, Array[Byte])]] =
      walk(bytes, withPixels = true)

    /** Directory-truth per-frame (width, height) WITHOUT decoding any
      * pixel rows — the O(directory) metadata sniff
      * [[Multimodal.mediaMeta]] dispatches on. Same strict walk (every
      * entry's DIB header and bounds validate), no arraycopies. */
    def tryMeta(bytes: Array[Byte]): Option[Seq[(Int, Int)]] =
      walk(bytes, withPixels = false).map(_.map(f => (f._1, f._2)))

    /** The [[MediaFeatures]] contract over a multi-frame container:
      * width/height from the FIRST directory entry, n_frames = the
      * directory count, features = the stripe fold over every frame's
      * DECODED pixels concatenated in directory order — so two
      * containers with the same frames in the same order embed
      * identically regardless of their byte-level packing. */
    def tryDecode(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] =
      tryDecodeFrames(bytes).map { frames =>
        val px = Array.concat(frames.map(_._3): _*)
        MediaFeatures(docId, bytes.length.toLong, frames.head._1,
          frames.head._2, frames.size, StubDecoder.stripeFeatures(px))
      }

    private def walk(bytes: Array[Byte], withPixels: Boolean): Option[Seq[(Int, Int, Array[Byte])]] = {
      if (bytes.length < 6 || u16(bytes, 0) != 0 || u16(bytes, 2) != 1) None
      else {
        val count = u16(bytes, 4)
        if (count < 1 || 6 + 16L * count > bytes.length) None
        else {
          val frames = Vector.newBuilder[(Int, Int, Array[Byte])]
          var i = 0
          var ok = true
          while (ok && i < count) {
            val e = 6 + 16 * i
            val ew = { val v = u8(bytes, e); if (v == 0) 256 else v }
            val eh = { val v = u8(bytes, e + 1); if (v == 0) 256 else v }
            val size = i32(bytes, e + 8)
            val off = i32(bytes, e + 12)
            if (off < 6 + 16 * count || size < 40 ||
                off.toLong + size > bytes.length) ok = false
            else {
              val dibSize = i32(bytes, off)
              val w = i32(bytes, off + 4)
              val h2 = i32(bytes, off + 8)
              val planes = u16(bytes, off + 12)
              val bpp = u16(bytes, off + 14)
              val compression = i32(bytes, off + 16)
              val h = h2 / 2
              val stride = (3L * w + 3) & ~3L
              val maskStride = ((w + 31) / 32) * 4L
              if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0 ||
                  w <= 0 || h2 <= 0 || h2 % 2 != 0 || w != ew || h != eh ||
                  dibSize.toLong + (stride + maskStride) * h > size) ok = false
              else if (!withPixels) frames += ((w, h, Array.emptyByteArray))
              else {
                val rowBytes = 3 * w
                val pixels = new Array[Byte](rowBytes * h)
                val dataOff = off + dibSize
                var r = 0
                while (r < h) {
                  // XOR image rows are stored bottom-up, like a BMP
                  System.arraycopy(bytes, dataOff + ((h - 1 - r) * stride).toInt,
                    pixels, r * rowBytes, rowBytes)
                  r += 1
                }
                frames += ((w, h, pixels))
              }
            }
            i += 1
          }
          if (ok) Some(frames.result()) else None
        }
      }
    }
  }

  /** [[IcoDecoder]]'s inverse: encode top-down B,G,R pixel frames as a
    * strictly-valid 24-bit ICO (zeroed AND masks). Round-trip law
    * (MultimodalSpec): `IcoDecoder.tryDecodeFrames(encodeIco(fs))`
    * recovers every frame's exact dims and pixels. */
  def encodeIco(frames: Seq[(Array[Byte], Int, Int)]): Array[Byte] = {
    require(frames.nonEmpty && frames.size <= 0xffff, "1..65535 frames")
    frames.foreach { case (px, w, h) =>
      require(w > 0 && w <= 256 && h > 0 && h <= 256, s"ICO dims are 1..256, got ${w}x$h")
      require(px.length == 3 * w * h,
        s"frame must hold 3*$w*$h bytes, got ${px.length}")
    }
    val images = frames.map { case (px, w, h) =>
      val rowBytes = 3 * w
      val stride = (rowBytes + 3) & ~3
      val maskStride = ((w + 31) / 32) * 4
      val size = 40 + (stride + maskStride) * h
      val img = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      img.putInt(40).putInt(w).putInt(2 * h)          // doubled height
        .putShort(1).putShort(24).putInt(0)           // planes, bpp, BI_RGB
        .putInt((stride + maskStride) * h).putInt(0).putInt(0).putInt(0).putInt(0)
      var r = 0
      while (r < h) {                                  // XOR rows, bottom-up
        img.put(px, (h - 1 - r) * rowBytes, rowBytes)
        var p = rowBytes
        while (p < stride) { img.put(0.toByte); p += 1 }
        r += 1
      }
      // AND mask: all-zero (fully opaque), h rows of maskStride
      img.position(img.position() + maskStride * h)
      img.array()
    }
    val headerLen = 6 + 16 * frames.size
    val out = java.nio.ByteBuffer
      .allocate(headerLen + images.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putShort(0).putShort(1).putShort(frames.size.toShort)
    var off = headerLen
    frames.zip(images).foreach { case ((_, w, h), img) =>
      out.put((if (w == 256) 0 else w).toByte).put((if (h == 256) 0 else h).toByte)
        .put(0.toByte).put(0.toByte)                   // colors, reserved
        .putShort(1).putShort(24)                      // planes, bpp
        .putInt(img.length).putInt(off)
      off += img.length
    }
    images.foreach(out.put)
    out.array()
  }

  /** REAL audio codec — canonical RIFF/WAVE PCM (public format):
    * 12-byte RIFF header, a 16-byte `fmt ` chunk (audioFormat 1 = PCM,
    * 16 bits per sample), then the `data` chunk of interleaved
    * little-endian SIGNED 16-bit samples. [[WavDecoder]] parses the
    * strict canonical-layout subset with full validation (magics,
    * PCM, 16-bit, consistent byteRate/blockAlign, chunk bounds, whole
    * frames) — anything else returns None, the same totality contract
    * as [[BmpDecoder]]/[[IcoDecoder]]. */
  object WavDecoder {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int, s: String): Boolean =
      s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

    /** The strict header validation shared by [[tryMeta]] (which stops
      * here — O(header) work) and [[tryDecode]] (which goes on to read
      * the sample array): (channels, sampleRate, dataLen), or None
      * unless strictly canonical 16-bit PCM with the data chunk in
      * bounds. */
    private def tryHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes.length < 44 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE") ||
          !tag(bytes, 12, "fmt ")) None
      else {
        val fmtSize = i32(bytes, 16)
        val audioFormat = u16(bytes, 20)
        val channels = u16(bytes, 22)
        val sampleRate = i32(bytes, 24)
        val byteRate = i32(bytes, 28)
        val blockAlign = u16(bytes, 32)
        val bps = u16(bytes, 34)
        val dataLen = i32(bytes, 40)
        if (fmtSize != 16 || audioFormat != 1 || bps != 16 ||
            channels < 1 || channels > 0xffff || sampleRate <= 0 ||
            blockAlign != 2 * channels || byteRate != sampleRate * blockAlign ||
            !tag(bytes, 36, "data") || dataLen < 0 || dataLen % blockAlign != 0 ||
            44L + dataLen > bytes.length ||
            i32(bytes, 4) != 36 + dataLen) None
        else Some((channels, sampleRate, dataLen))
      }
    }

    /** Header-truth (channels, sampleRate, perChannelFrames) WITHOUT
      * materializing the sample array — the O(header) metadata sniff
      * [[Multimodal.mediaMeta]] dispatches on. Same strict validation
      * as the full decode ([[tryHeader]]). */
    def tryMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] =
      tryHeader(bytes).map { case (ch, rate, dataLen) =>
        (ch, rate, dataLen / (2 * ch))
      }

    /** (channels, sampleRate, samples) — samples interleaved signed
      * 16-bit in frame order. None unless strictly canonical PCM. */
    def tryDecode(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
      tryHeader(bytes).map { case (channels, sampleRate, dataLen) =>
        val n = dataLen / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = u16(bytes, 44 + 2 * i).toShort
          i += 1
        }
        (channels, sampleRate, samples)
      }

    /** The [[MediaFeatures]] contract over canonical PCM audio:
      * width = channel count, height = bits per sample (16),
      * n_frames = per-channel frame count, features = the stripe fold
      * over the samples re-serialized little-endian — the byte
      * sequence the data chunk carries, so the embedding is the same
      * "stripe average over the decoded payload" law every other real
      * decoder follows. */
    def tryFeatures(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] =
      tryDecode(bytes).map { case (ch, _, samples) =>
        val b = new Array[Byte](2 * samples.length)
        var i = 0
        while (i < samples.length) {
          b(2 * i) = samples(i).toByte
          b(2 * i + 1) = (samples(i) >> 8).toByte
          i += 1
        }
        MediaFeatures(docId, bytes.length.toLong, ch, 16,
          samples.length / ch, StubDecoder.stripeFeatures(b))
      }
  }

  /** [[WavDecoder]]'s inverse: canonical 44-byte-header PCM encode.
    * Round-trip law (MultimodalSpec): decode(encode(s)) recovers the
    * exact channels, rate, and every signed sample. */
  def encodeWav(samples: Array[Short], channels: Int, sampleRate: Int): Array[Byte] = {
    require(channels >= 1 && channels <= 0xffff, s"channels 1..65535, got $channels")
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not form whole $channels-channel frames")
    val dataLen = 2 * samples.length
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * 2 * channels).putShort((2 * channels).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Decoded audio features: header-truth channels/rate/frame count
    * plus EXACT per-channel integer accounting (sum / min / max of the
    * signed samples — associative longs, so partition- and
    * engine-order independent). Null channel stats = payload not
    * decodable (routed to the stub path by the caller). */
  final case class AudioFeatures(doc_id: Long, byte_len: Long, n_channels: Int,
                                 sample_rate: Int, n_frames: Long,
                                 ch_sums: Array[Long], ch_mins: Array[Int], ch_maxs: Array[Int])

  /** REAL audio decode stage: canonical PCM WAVs decode
    * ([[WavDecoder]]) to header truth + exact per-channel sample
    * stats; everything else gets the [[StubDecoder]]-style length
    * arithmetic with empty channel stats — one total function, the
    * decode-dispatch contract of the whole multimodal family. Narrow
    * per-partition batch map, no shuffle. */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        WavDecoder.tryDecode(r.media) match {
          case Some((ch, rate, samples)) if samples.isEmpty =>
            // a zero-frame canonical WAV is valid; stats are vacuous
            AudioFeatures(r.doc_id, r.media.length.toLong, ch, rate, 0L,
              Array.empty, Array.empty, Array.empty)
          case Some((ch, rate, samples)) =>
            val sums = new Array[Long](ch)
            val mins = Array.fill(ch)(Int.MaxValue)
            val maxs = Array.fill(ch)(Int.MinValue)
            var i = 0
            while (i < samples.length) {
              val c = i % ch
              val v = samples(i).toInt
              sums(c) += v
              if (v < mins(c)) mins(c) = v
              if (v > maxs(c)) maxs(c) = v
              i += 1
            }
            AudioFeatures(r.doc_id, r.media.length.toLong, ch, rate,
              samples.length.toLong / ch, sums, mins, maxs)
          case None =>
            val len = r.media.length.toLong
            AudioFeatures(r.doc_id, len,
              (len % 2 + 1).toInt, (len % 32000 + 8000).toInt, len / 2,
              Array.empty, Array.empty, Array.empty)
        }
      }
    }
  }

  /** Decoded-frame row: real dims + decoded pixels for container
    * payloads; the raw fixed-width slice (width = frameBytes,
    * height = 1 — the headerless-stream convention) for everything
    * else. */
  final case class DecodedFrameRow(doc_id: Long, frame_idx: Int,
                                   width: Int, height: Int, frame: Array[Byte])

  /** REAL frame-sample stage: ICO payloads decode ([[IcoDecoder]]) and
    * emit every `stride`-th FRAME with its directory-truth dims and
    * decoded pixels; non-container payloads fall back to
    * [[sampleFrames]]'s fixed-width raw slicing — one total function,
    * same dispatch contract as [[decodeFeatures]]/[[resizeDecoded]].
    * Narrow per-partition batch map with an explode-shaped fan-out;
    * no shuffle. */
  def sampleFramesDecoded(spark: SparkSession, media: DataFrame, stride: Int,
                          stubFrameBytes: Int = 16): Dataset[DecodedFrameRow] = {
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    require(stubFrameBytes >= 1, "stubFrameBytes must be >= 1")
    media.as[MediaRow].mapPartitions { batch =>
      batch.flatMap { r =>
        IcoDecoder.tryDecodeFrames(r.media) match {
          case Some(frames) =>
            (0 until frames.size by stride).iterator.map { i =>
              val (w, h, px) = frames(i)
              DecodedFrameRow(r.doc_id, i, w, h, px)
            }
          case None =>
            val n = r.media.length / stubFrameBytes
            (0 until n by stride).iterator.map { i =>
              DecodedFrameRow(r.doc_id, i, stubFrameBytes, 1,
                java.util.Arrays.copyOfRange(r.media,
                  i * stubFrameBytes, (i + 1) * stubFrameBytes))
            }
        }
      }
    }
  }
}
