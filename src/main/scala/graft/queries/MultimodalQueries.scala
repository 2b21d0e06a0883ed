package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.Tables
import graft.ext.Multimodal

/** Multimodal-column operators (see graft.ext.Multimodal). q50's metadata
  * is arithmetic over the payload length; q51 exercises the
  * mapPartitions batch-decode path. Both carry full oracles — the stub
  * decoder's decimal-folded stripe averages are replayable in SQL. */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(

    // Typed metadata over an opaque binary column — pure projection, stays
    // in whole-stage codegen, scales as a narrow map.
    "q50_multimodal_meta" -> Q(
      (s, d) => Multimodal.mediaTable(Tables.documents(s, d))
        .select(col("doc_id"),
          octet_length(col("media")).cast("long").as("byte_len"))
        .withColumn("width", (col("byte_len") % 640 + 64).cast("int"))
        .withColumn("height", ((col("byte_len") * 7) % 480 + 48).cast("int"))
        .withColumn("n_frames", (col("byte_len") % 16 + 1).cast("int"))
        .orderBy(col("doc_id")),
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       CAST(octet_length(encode(text)) % 640 + 64 AS INTEGER) AS width,
        |       CAST((octet_length(encode(text)) * 7) % 480 + 48 AS INTEGER) AS height,
        |       CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Batch feature extraction through mapPartitions (stubbed decode; the
    // batching/schema plumbing is the operator under test). The stub's
    // stripe averages fold in DECIMAL(27,12), so even this typed
    // mapPartitions path has a full oracle: DuckDB replays the byte
    // stripes from the hex of the same UTF-8 payload.
    "q51_multimodal_features" -> Q(
      (s, d) => {
        val feats = Multimodal.decodeFeatures(
          s, Multimodal.mediaTable(Tables.documents(s, d)))
        val fCols = (0 until Multimodal.StubDecoder.featureDim)
          .map(k => element_at(col("features"), k + 1).as(s"f$k"))
        feats.toDF()
          .select(Seq(col("doc_id"), col("byte_len"), col("width"),
            col("height"), col("n_frames")) ++ fCols: _*)
          .orderBy(col("doc_id"))
      }, {
        def f(k: Int) =
          s"""COALESCE(CAST(list_sum(list_transform(range(${k + 1}, len + 1, 8),
             |    i -> CAST(('0x' || substr(hx, CAST(2*i-1 AS INTEGER), 2))::INTEGER / 255.0 AS DECIMAL(27,12))))
             |  AS DOUBLE) / ((len - $k + 7) // 8), 0e0) AS f$k""".stripMargin
        s"""WITH b AS (
           |  SELECT doc_id, hex(encode(text)) AS hx,
           |         CAST(octet_length(encode(text)) AS BIGINT) AS len
           |  FROM documents)
           |SELECT doc_id, len AS byte_len,
           |       CAST(len % 640 + 64 AS INTEGER) AS width,
           |       CAST((len * 7) % 480 + 48 AS INTEGER) AS height,
           |       CAST(len % 16 + 1 AS INTEGER) AS n_frames,
           |${(0 until Multimodal.StubDecoder.featureDim).map(f).mkString(",\n")}
           |FROM b ORDER BY doc_id""".stripMargin
      }),

    // Frame-sample stage under the oracle: the video -> frames fan-out
    // (one input row -> ceil(n_frames / stride) rows) with every
    // emitted frame's BYTES pinned as hex — the oracle rebuilds the
    // same fixed-width byte windows by slicing the payload's hex
    // string (DuckDB 1.0 has no blob substring/md5), so the kernel's
    // slicing (not just its row counts) must agree byte-for-byte.
    // Narrow map + explode-shaped fan-out; no shuffle before the
    // output sort.
    "q80_frame_sample" -> Q(
      (s, d) => Multimodal.sampleFrames(s,
          Multimodal.mediaTable(Tables.documents(s, d)), frameBytes = 16, stride = 2)
        .toDF()
        .select(col("doc_id"), col("frame_idx"), hex(col("frame")).as("frame_hex"))
        .orderBy(col("doc_id"), col("frame_idx")),
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS blen
        |           FROM documents),
        |f AS (SELECT doc_id,
        |             CAST(unnest(range(0, blen // 16, 2)) AS INTEGER) AS frame_idx,
        |             hx
        |      FROM m)
        |SELECT doc_id, frame_idx,
        |       substr(hx, frame_idx * 32 + 1, 32) AS frame_hex
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin),

    // Resize stage under the oracle: fixed-dimension payload caps, the
    // truncated payload hash-pinned (copyOf must never zero-pad — the
    // min() keeps short payloads byte-identical).
    "q81_resize_stage" -> Q(
      (s, d) => Multimodal.resize(s,
          Multimodal.mediaTable(Tables.documents(s, d)), w = 8, h = 4)
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          octet_length(col("media")).cast("long").as("out_len"),
          hex(col("media")).as("payload_hex"))
        .orderBy(col("doc_id")),
      """SELECT doc_id, 8 AS width, 4 AS height,
        |       CAST(LEAST(octet_length(encode(text)), 32) AS BIGINT) AS out_len,
        |       substr(hex(encode(text)), 1, CAST(LEAST(octet_length(encode(text)), 32) * 2 AS INTEGER)) AS payload_hex
        |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
