package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{Sinks, Tables}
import graft.streaming.Streaming

/** The streaming surface under the DuckDB hash gate.
  *
  * Every other streaming contract in this repo is spec-pinned
  * (StreamingSpec / StreamSoak); these two rows put STREAMING-PRODUCED
  * STATE itself under the driver's oracle compare. The device is the
  * sinks' own batch-equivalence contracts: each query splits the
  * documents table into interleaved micro-batch files, drains them
  * through the real sink (`Trigger.AvailableNow`, one file per
  * trigger), and returns the final STORE — which the contract proves
  * equal to a batch computation over the union, so the oracle can
  * state that batch answer in ANSI SQL. Any admission-order
  * sensitivity, lost merge, or store-maintenance slip surfaces as a
  * hash mismatch on the store contents.
  *
  * The micro-batch split keys on doc_id % nSplits, so every batch
  * spans the whole id range: whatever order the file source picks,
  * lower-id documents arrive after higher-id duplicates were admitted
  * — the out-of-order case — and the final state is order-invariant
  * anyway (q105 by max-merge idempotence, q106 by one compact pass).
  *
  * Per-invocation stores live under a fresh java.io.tmpdir directory;
  * the returned frame reads them lazily (Verify/Bench consume it
  * within the invocation). */
object StreamQueries {

  private val nSplits = 4

  /** Write `docs` as `nSplits` interleaved parquet files under
    * `dir`/in and return a one-file-per-trigger stream over them. */
  private def splitStream(s: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val in = s"$dir/in"
    (0 until nSplits).foreach(i =>
      docs.where(col("doc_id") % nSplits === i).coalesce(1)
        .write.mode("append").parquet(in))
    s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
  }

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  val defs: Map[String, Q] = Map(

    // Streaming HLL register store (see [[Streaming.hllRegisterSink]]):
    // the documents table drained through the sink in 4 micro-batches,
    // each folding its texts into a register array and max-merging it
    // into the one-row store under the writer fence. Registers merge by
    // MAX (associative, commutative, idempotent), so the drained store
    // equals the one-shot batch sketch of the whole corpus regardless
    // of batch boundaries or order — which is exactly what the oracle
    // states: all 256 registers rebuilt from the same salted 60-bit
    // hash over the raw table (q95's register-rebuild technique, empty
    // registers completed as 0). One wrong register — a lost merge, a
    // misrouted bucket, a trigger that never landed — breaks the hash.
    "q105_stream_hll_state" -> Q(
      (s, d) => {
        val dir = freshDir("q105")
        val store = s"$dir/store/regs"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        Streaming.hllRegisterSink(splitStream(s, docs, dir), "text", store, b = 8)
          .option("checkpointLocation", s"$dir/ck").start().awaitTermination()
        s.read.parquet(store)
          .select(posexplode(col("regs")).as(Seq("reg_idx", "rho")))
          .orderBy(col("reg_idx"))
      },
      s"""WITH hx AS (SELECT ${graft.ext.TextOps.sqlHash60("hll", "text")} AS h60
         |            FROM documents),
         |rr AS (SELECT h60 // ${1L << 52} AS bucket,
         |              MAX(CASE WHEN h60 % ${1L << 52} = 0 THEN 53
         |                       ELSE 53 - length(bin(h60 % ${1L << 52})) END) AS rho
         |       FROM hx GROUP BY 1),
         |idx AS (SELECT unnest(range(0, 256)) AS i)
         |SELECT CAST(idx.i AS INTEGER) AS reg_idx,
         |       CAST(COALESCE(rr.rho, 0) AS BIGINT) AS rho
         |FROM idx LEFT JOIN rr ON rr.bucket = idx.i
         |ORDER BY reg_idx""".stripMargin),

    // Streaming curation store (see [[Streaming.incrementalCurationSink]]
    // + [[Streaming.compactCuratedStore]]): the documents table drained
    // through the incremental sink in 4 interleaved micro-batches —
    // exact dedup + near-dup suppression against the accumulating seen
    // store + quality floor, all per-trigger O(batch) — then ONE
    // maintenance compact to retro-canonicalize the out-of-order
    // admissions the interleaved split forces. The sink's equivalence
    // contract says the compacted store row-equals one batch
    // `curatedDocsOf` over the union, and that batch answer is what the
    // oracle states (q37/q100's curation chain, restated over the raw
    // table). A lower-id guard slip, a lost bucket rewrite, a compact
    // that misses a loser family — any of them leaves an extra or
    // missing row and breaks the hash.
    "q106_stream_curation" -> Q(
      (s, d) => {
        val dir = freshDir("q106")
        val curated = s"$dir/curated"
        val sig = s"$dir/sig"
        val docs = Tables.documents(s, d)
        // store sizing follows the upsert store's own rule (one bucket ≈
        // a comfortable task read): 4 buckets for a sf-scale corpus —
        // every interleaved trigger touches all buckets, so the bucket
        // count is a pure per-trigger file-op multiplier here
        Streaming.incrementalCurationSink(splitStream(s, docs, dir), curated, sig,
            numBuckets = 4)
          .option("checkpointLocation", s"$dir/ck").start().awaitTermination()
        Streaming.compactCuratedStore(s, curated, sig)
        Sinks.readUpsertStore(s, curated)
          .select(col("doc_id"), md5(col("text")).as("text_hash"),
            col("lang"), col("source"), col("n_chars"), col("quality"))
          .orderBy(col("doc_id"))
      },
      s"""WITH ${TextQueries.sqlSigCtesFrom("documents")},
         |canonical AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |sigc AS (
         |  SELECT * FROM sig WHERE doc_id IN (SELECT doc_id FROM canonical)),
         |losers AS (
         |${TextQueries.sqlBandLosersFrom("sigc")}),
         |q AS (${TextQueries.sqlQualityDocs}),
         |cur AS (
         |  SELECT q.* FROM q
         |  WHERE q.doc_id IN (SELECT doc_id FROM canonical)
         |    AND q.doc_id NOT IN (SELECT doc_id FROM losers)
         |    AND q.quality >= 0.5e0)
         |SELECT c.doc_id, md5(d.text) AS text_hash, c.lang, c.source,
         |       d.n_chars, c.quality
         |FROM cur c JOIN documents d USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin)
  )
}
