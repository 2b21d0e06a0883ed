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
  * The decode step itself is a STUB (no image/audio codecs in this
  * container): [[StubDecoder]] produces deterministic fake features from
  * the raw bytes. The Spark-side plumbing — schema, binary transport,
  * partition-batch shape, feature vector output — is real and tested.
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

    def tryDecode(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
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
        else {
          val pixels = new Array[Byte]((rowBytes * h).toInt)
          val topDown = hRaw < 0
          var r = 0
          while (r < h) {
            val srcRow = if (topDown) r else h - 1 - r
            System.arraycopy(bytes, dataOff + (srcRow * stride).toInt,
              pixels, r * rowBytes.toInt, rowBytes.toInt)
            r += 1
          }
          Some(MediaFeatures(docId, bytes.length.toLong, w, h, 1,
            StubDecoder.stripeFeatures(pixels)))
        }
      }
    }
  }

  /** documents.text reinterpreted as an opaque media payload — the
    * binary-column transport shape (schema: doc_id BIGINT, media BINARY). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  /** Batch decode: one decoder pass per partition (mapPartitions keeps
    * the iterator lazy — constant memory per task regardless of
    * partition size; scale the parallelism with input partitioning).
    * Format dispatch is per payload: a strictly-valid 24-bit BMP
    * decodes for real ([[BmpDecoder]]); everything else falls back to
    * the deterministic stub — one total function over arbitrary
    * binary columns. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      // a heavier codec/model would init once here, then stream the batch
      batch.map(r => BmpDecoder.tryDecode(r.doc_id, r.media)
        .getOrElse(StubDecoder.decode(r.doc_id, r.media)))
    }
  }

  /** Resized media row: payload plus target dimensions (the transport
    * schema of an image-resize stage). */
  final case class ResizedRow(doc_id: Long, width: Int, height: Int, media: Array[Byte])

  /** Resize stage (STUB kernel, real plumbing): per-partition batch map
    * producing fixed-dimension payloads. A real implementation swaps the
    * byte-slicing for a codec resize; schema, batching, and partition
    * shape are what the engine owns. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        val out = java.util.Arrays.copyOf(r.media, math.min(r.media.length, w * h))
        ResizedRow(r.doc_id, w, h, out)
      }
    }
  }

  /** Frame-sample stage (STUB): emits every `stride`-th fixed-size
    * "frame" of the payload as its own row — the video -> frames
    * explode shape (one input row fans out to n_frames rows). */
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
}
