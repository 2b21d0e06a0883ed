package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{CacheScope, Parity, Tables}
import graft.ext.TextOps
import Parity.{davg, davg12, sqlDavg, sqlDavg12}
import TextOps.{saltedHash, sqlSaltedHash, sqlTokens, tokens}

/** Text-analysis + deduplication operators over `documents` — the
  * LLM-training-data-pipeline surface (BASELINE.json north star): token
  * statistics, quality scoring, heuristic language ID, fingerprinting,
  * exact dedup, MinHash+LSH, n-gram Jaccard, SimHash.
  *
  * Scale design: every per-doc feature is a pure Column expression (narrow
  * map), with each derived array (tokens, shingles, hash arrays)
  * materialized as its own projection stage so nothing is re-evaluated
  * per array element (see TextOps class doc — this is what makes MinHash
  * a zero-shuffle map rather than an explode+groupBy). Shuffles happen
  * only at the named aggregation / inverted-index join steps, and the
  * candidate-pair stages are inverted-index or LSH-bucket joins — never
  * an O(n²) cross join.
  */
object TextQueries {

  // ---- shared fragments ----
  private val sqlToks = sqlTokens("text")
  private val nHashes = 8

  /** Posting lists longer than this are chunk-expanded (q43) so one hot
    * shingle cannot become a single quadratic straggler task. */
  private val hotList = 512

  private def numShufflePartitions(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Per-doc 8-hash MinHash signature, computed entirely as a narrow map
    * by the compiled [[graft.expressions.MinHashSignature]] kernel (one
    * pass, inside whole-stage codegen; bit-equal to the Column pipeline
    * per ExprEquivalenceSpec). No explode, no shuffle — the signature
    * table is ~n_docs rows of 9 longs regardless of document length. */
  private def signatures(s: SparkSession, d: String): DataFrame =
    signaturesOf(Tables.documents(s, d))

  /** Signature derivation over an arbitrary (doc_id, text, ...) frame —
    * shared by the table-backed path above, queries that build their
    * corpus inline (q62 injects replicas the way q61 injects PII), the
    * specs that mirror the pipeline (so tests run the REAL derivation
    * instead of hand-copying it), and library callers feeding
    * [[lshPairsOf]] / [[dupClustersOfSignatures]]. */
  def signaturesOf(docs: DataFrame): DataFrame =
    docs
      // the kernel is null exactly when the doc has < 3 tokens
      // (ExprEquivalenceSpec) — filter on that CHEAP precursor, not on
      // sig.isNotNull: a filter on the derived column gets pushed below
      // the projection and re-evaluates the whole md5 pipeline per row
      .where(size(tokens(col("text"))) >= 3)
      .withColumn("sig", graft.expressions.Exprs.minhashSig(col("text")))
      .select(col("doc_id") +:
        (0 until nHashes).map(k => element_at(col("sig"), k + 1).as(s"h$k")): _*)

  /** MinHash-LSH near-dup pairs (doc_a < doc_b, est_sim >= 0.5): 4 bands
    * of 2 hashes; docs join per band bucket (never all-pairs), bands
    * union, and the full signature estimates similarity. Shared by q42
    * (reports the pairs) and q49 (clusters them).
    *
    * The signature table is tiny (n_docs x 9 longs) but expensive to
    * derive (shingle+md5 pipeline), and all 8 band-join branches need
    * it. Cache it: exchange-reuse canonicalization cannot unify
    * lambda-bearing subtrees across the union's deduplicated branches,
    * so without the cache the pipeline runs 8 times. */
  private def lshPairs(s: SparkSession, d: String): DataFrame =
    lshPairsOf(signatures(s, d).persist())

  /** Table-backed form of the band-bucket-capped pair join (see
    * [[lshPairsOf]]'s maxBucket doc) — the soak harness measures this
    * against the exact q42 path on replica-dense corpora. */
  private[graft] def lshCappedPairs(s: SparkSession, d: String, maxBucket: Int): DataFrame =
    lshPairsOf(signatures(s, d).persist(), Some(maxBucket))

  /** Duplicate-cluster formation (q49's body): connected components over
    * the MinHash-LSH near-dup graph, with exact replicas COLLAPSED by
    * full signature before the band join.
    *
    * Why the collapse is free (semantics-preserving, not approximate):
    * docs with identical signatures are always DIRECTLY connected in
    * the doc-level graph — every band key matches, so the pair survives
    * candidate generation, and est_sim = 8/8 >= 0.5 — so a signature
    * group expands to a clique, and cliques change nothing about
    * connectivity. Cross-group edges are determined entirely by the two
    * signatures, so the doc-level graph IS the group-level graph with
    * groups expanded. Components over group representatives (rep = min
    * doc_id per signature), with every member inheriting its rep's
    * component, therefore equal the doc-level components exactly — and
    * the component label (min rep reachable) equals the doc-level min,
    * because each rep is already its group's min.
    *
    * Why it matters at scale: the band join's candidate volume is
    * quadratic in replica count (N identical replicas -> N^2 candidate
    * rows per band bucket). Collapsing first makes q49 row-proportional
    * in the replica dimension — measured at the 100x soak corpus (100
    * exact replicas of every doc) this path clusters all 500k docs in
    * seconds where the doc-level join took 80 s building ~25M pairs
    * (BENCH_NOTES round-8). Same principle as [[curatedDocs]]'
    * exact-dedup-first ordering, applied inside the cluster operator.
    *
    * Members of a multi-doc signature group are clustered even when the
    * group has no external near-dup edge (they are each other's
    * duplicates); a singleton group appears only if its rep gained an
    * edge — exactly the doc-level "nodes of the edge set" semantics.
    *
    * `maxBucket`: opt-in band-bucket cap forwarded to [[lshPairsOf]] —
    * the bound for the corpus shape the collapse cannot defuse
    * (near-identical-but-distinct docs: distinct signatures, colliding
    * bands, quadratic rep-level candidates). Default None preserves the
    * exact q49 oracle semantics; clusters reachable only through hot
    * buckets fragment under a cap (documented recall trade, same family
    * as q60's df-cap). */
  def dupClusters(s: SparkSession, d: String,
                  maxBucket: Option[Int] = None,
                  scope: CacheScope = CacheScope.untracked): DataFrame =
    dupClustersOfSignatures(signatures(s, d), maxBucket, scope)

  /** [[dupClusters]] over an arbitrary (doc_id, h0..h7) signature table —
    * the whole operator below the signature derivation, split out so the
    * cap's documented fragmentation semantics are pinnable in a spec on
    * a CONSTRUCTED signature table (controlled band collisions cannot be
    * produced through the text hash pipeline). */
  def dupClustersOfSignatures(sig: DataFrame,
                              maxBucket: Option[Int] = None,
                              scope: CacheScope = CacheScope.untracked): DataFrame = {
    val sigCols = (0 until nHashes).map(k => col(s"h$k"))
    // Skew-safe collapse (r17 verdict #1): rep + group size as a
    // PARTIAL-AGGREGABLE groupBy over the full signature, joined back.
    // The signature group is the exact-replica group — the storm
    // dimension on a templated corpus — and a window over it would
    // co-locate and buffer the hottest group's entire row set in ONE
    // task (AQE cannot split a window partition). The groupBy's
    // map-side combine collapses the hot group to one partial row per
    // input partition BEFORE any shuffle; the enrichment join back is
    // a plain equi-join AQE's skew optimizer CAN split (stats carries
    // one row per distinct signature, so the hot group's probe rows
    // split across tasks against a duplicated 1-row build match).
    // Null-safe key equality (<=>): groupBy and the old window both
    // treat NULL signature components as equal, so the join must too
    // or constructed null-keyed groups (see the spec's edge tables)
    // would silently vanish on the join.
    // block ownership is the scope's (r18 verdict #5): registry entries
    // run under the Bench/Verify clearCache contract (untracked
    // default); a long-lived-session embedder passes a tracking
    // CacheScope and close() releases all three persists
    val sigP = if (sig.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      scope.persist(sig) else sig
    val stats = scope.persist(sigP.groupBy(sigCols: _*)
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("members"))
      .select((0 until nHashes).map(k => col(s"h$k").as(s"g$k")) :+
        col("rep") :+ col("members"): _*))
    val joinCond = (0 until nHashes).map(k => col(s"h$k") <=> col(s"g$k")).reduce(_ && _)
    val grouped = scope.persist(sigP.join(stats, joinCond)
      .drop((0 until nHashes).map(k => s"g$k"): _*))
    // the rep-signature table IS the stats table (one row per distinct
    // signature, rep = its min doc_id) — no filter over the enrichment
    // join needed, so the band join's input never waits on it
    val repSig = stats.select(col("rep").as("doc_id") +:
      (0 until nHashes).map(k => col(s"g$k").as(s"h$k")): _*)
    val repEdges = lshPairsOf(repSig, maxBucket).select(col("doc_a"), col("doc_b"))
    val repComp = graft.ext.Graph.connectedComponents(repEdges, "doc_a", "doc_b")
      .select(col("node").as("rep"), col("component"))
    // rep -> component is <= one row per distinct signature in an edge —
    // usually tiny, but not guaranteed driver-sized at corpus scale, so
    // the broadcast decision is left to AQE's runtime size observation
    grouped.join(repComp, Seq("rep"), "left")
      .where(col("members") >= 2 || col("component").isNotNull)
      .select(col("doc_id"),
        coalesce(col("component"), col("rep")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  private val bands = Seq((0, 1), (2, 3), (4, 5), (6, 7))

  /** Rows of the exploded (band, k1, k2) key table per shuffle partition
    * for the capped path's occupancy window — ~40 MB of 9-long rows, a
    * sort that stays in execution memory on small executor heaps. */
  private val CappedWindowRowsPerPartition = 1L << 18

  /** Estimated signature-table bytes per session shuffle partition below
    * which the capped path's occupancy window provably sorts in memory
    * under the SESSION-DEFAULT exchange — so the explicit input-sized
    * repartition (and the count job that sizes it) is skipped. 4 MB of
    * estimated signature rows explodes to ≲ 24 MB of banded keys per
    * task (4 bands × ~1.5× row widening), inside the r9 soak's measured
    * safe band even if the plan-time estimate is off 4×. The r9 spill
    * fix priced ~0.3–0.7 s at sf0.1 for a knob only the 1000×-scale
    * corpus needs (r9 verdict residual #1); this gate keeps the fix
    * where it pays and removes it where it cannot. */
  private val CappedSmallSigBytesPerPartition = 4L << 20

  /** A signature table exploded to one row per (band, k1, k2) bucket
    * key, with the full signature and the doc id (renamed) carried
    * along — the shared building block of the symmetric pair join and
    * the asymmetric store probe. */
  private def bandedKeys(sig: DataFrame, idAs: String, hPrefix: String): DataFrame =
    sig.select(col("doc_id") +:
      (0 until nHashes).map(k => col(s"h$k")) :+
      explode(array(bands.zipWithIndex.map { case ((i, j), bandNo) =>
        struct(lit(bandNo).as("band"), col(s"h$i").as("k1"), col(s"h$j").as("k2"))
      }: _*)).as("bk"): _*)
      .select(col("bk.band").as("band") +: col("bk.k1").as("k1") +: col("bk.k2").as("k2") +:
        col("doc_id").as(idAs) +: (0 until nHashes).map(k => col(s"h$k").as(s"$hPrefix$k")): _*)

  private def estSim(a: String, b: String): org.apache.spark.sql.Column =
    ((0 until nHashes).map(k => when(col(s"$a$k") === col(s"$b$k"), 1).otherwise(0))
      .reduce(_ + _) / lit(8e0))

  /** Band joins + similarity estimate over an arbitrary signature table
    * (persist it first — both join sides scan it). ONE self-join over
    * exploded (band, h_i, h_j) keys rather than four separate band
    * joins: same candidate pairs (the band id is part of the join key),
    * a quarter of the join stages, and one exchange per side instead of
    * four — at cluster scale that is 6 fewer shuffles of the signature
    * table per run.
    *
    * `maxBucket = Some(cap)`: band buckets holding more than `cap`
    * signatures are excluded from pair formation — the LSH member of
    * the capped-operator family (q60's prefix df-cap, q57's df ≤ 32).
    * A band bucket is the unit of quadratic blow-up (b members → b²
    * candidates), and the one corpus shape the exact-replica collapse
    * cannot defuse — near-identical-but-DISTINCT docs (templated text)
    * — lands exactly there: distinct full signatures, colliding bands.
    * The cap bounds per-bucket work at C(cap, 2) by dropping hot
    * buckets; a pair is still found through ANY surviving shared band,
    * so recall is lost only for pairs whose EVERY shared band is hot.
    * Reported est_sim stays exact (computed from full signatures).
    * Only the probe side is filtered: pairs form on join-key equality,
    * so keys absent from one side form nothing, and the build side
    * avoids a second aggregation pass.
    *
    * Capped-path caching contract: when the plan-time size estimate of
    * `sig` exceeds the in-memory-sort threshold, PLAN CONSTRUCTION runs
    * a `sig.count()` Spark job to size the occupancy shuffle — persist
    * `sig` before calling (every internal caller does), or the whole
    * signature pipeline executes twice (once for the count, again in
    * the returned plan). Below the threshold no job runs. */
  def lshPairsOf(sig: DataFrame, maxBucket: Option[Int] = None): DataFrame = {
    val left0 = bandedKeys(sig, "doc_a", "a")
    val left = maxBucket match {
      case Some(cap) =>
        // occupancy as an unordered window over the band key — ONE
        // shuffle of the exploded key table, already partitioned on the
        // pair join's key when the filter's output reaches it. (An
        // aggregate + semi-join states the same thing but shuffles the
        // wide exploded table twice; at 300x-scale that was most of the
        // capped path's cost.)
        val occupancy = (keys: DataFrame) => keys
          .withColumn("bucket_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("band"), col("k1"), col("k2"))))
          .where(col("bucket_n") <= cap)
          .drop("bucket_n")
        // That one shuffle must be sized to the EXPLODED row count, not
        // inherited from spark.sql.shuffle.partitions: at the 1000x soak
        // (5M sigs -> 20M exploded rows) partitions=cores put ~100 MB of
        // keys per task and the window sort spilled — the 19-52 s
        // session spread diagnosed in BENCH_NOTES r8 (commit 8e79b59;
        // a 16 g control held 17.7-20.0 s). An explicit hash
        // repartition on the window's partitionBy key satisfies its
        // required distribution, so Catalyst plans no second exchange,
        // and the pair join downstream reuses the same partitioning.
        // sig is persisted by every capped caller, so the count is a
        // cache scan; ~256k rows (~40 MB) per task keeps the sort
        // in memory at any scale while never dropping below the
        // session's parallelism at bench scale.
        //
        // GATED on the optimizer's plan-time size estimate (no job):
        // below the threshold the session-default exchange the window
        // plans itself is provably safe, so the count job + explicit
        // repartition — the r9 fix's ~0.3–0.7 s price at sf0.1 — are
        // skipped entirely. The estimate is crude (file bytes scaled
        // through projection widths), but the gate only separates
        // megabytes from hundreds of megabytes; a wrong big-path pick
        // costs one cache-scan count, a wrong small-path pick costs
        // the spill the threshold's 4× margin guards against.
        val sess = sig.sparkSession
        val sessParts = numShufflePartitions(sess)
        val estBytes = sig.queryExecution.optimizedPlan.stats.sizeInBytes
        if (estBytes <= BigInt(sessParts) * CappedSmallSigBytesPerPartition)
          occupancy(left0)
        else {
          val parts = math.max(
            sess.sparkContext.defaultParallelism,
            (sig.count() * bands.size / CappedWindowRowsPerPartition + 1).toInt)
          occupancy(left0.repartition(parts, col("band"), col("k1"), col("k2")))
        }
      case None => left0
    }
    left.join(bandedKeys(sig, "doc_b", "b"), Seq("band", "k1", "k2"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), estSim("a", "b").as("est_sim"))
      .distinct()
      .where(col("est_sim") >= 0.5)
  }

  /** Verification window (chars) for [[editVerifiedPairs]]: the exact
    * edit distance is computed over the first `editWindow` characters of
    * each document — the bounded-prefix approximation that keeps the
    * per-pair verification cost CONSTANT (O(window·band) with the banded
    * algorithm below) instead of quadratic in document length. At 100 TB
    * a full-text Levenshtein over two 100 KB documents is ~1e10 cell
    * updates per pair; the published near-dup verifiers all bound the
    * comparison (prefix, sketch, or matched-span) for exactly this
    * reason. */
  private val editWindow = 512

  /** Largest edit distance any relative-threshold decision can need:
    * verified requires dist·5 ≤ max prefix length ≤ editWindow, so
    * distances beyond editWindow/5 are reported as the band sentinel -1
    * (never individually, only "too far"). Feeding this to Spark's
    * threshold form of `levenshtein` switches the kernel to the banded
    * O(len·band) algorithm with early exit — the decision is exact, only
    * the reported magnitude saturates. */
  private val editBand = editWindow / 5

  /** Two-stage near-duplicate detection with EXACT edit-distance
    * verification (q89): MinHash-LSH generates candidates (banded,
    * never all-pairs — [[lshPairsOf]]), then each candidate pair is
    * verified by character-level Levenshtein over bounded prefixes at
    * edit similarity ≥ 0.8 (dist·5 ≤ max prefix length — the token-edit
    * analogue of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499 §4.1). This is the
    * candidate→verify shape every production dedup pipeline runs: the
    * cheap sketch join bounds the candidate volume, and the expensive
    * exact comparison touches ONLY candidates.
    *
    * Output: one row per candidate pair with est_sim (from the full
    * signature), edit_dist (exact within the decision band, -1 beyond
    * it), and the verified decision — so callers can keep, reject, or
    * audit. Scale shape: the two text joins are shuffled hash joins of
    * the (small) pair table against the corpus on doc_id — AQE
    * broadcasts the pair side when it is small; the prefix projection
    * means only `editWindow` chars per doc travel the exchange, not
    * full documents. */
  def editVerifiedPairs(docs: DataFrame,
                        scope: graft.engine.CacheScope =
                          graft.engine.CacheScope.untracked): DataFrame = {
    val pairs = lshPairsOf(scope.persist(signaturesOf(docs)))
    val tx = docs.select(col("doc_id"),
      substring(col("text"), 1, editWindow).as("pf"),
      least(length(col("text")), lit(editWindow)).as("plen"))
    pairs
      .join(tx.select(col("doc_id").as("doc_a"), col("pf").as("pa"),
        col("plen").as("la")), Seq("doc_a"))
      .join(tx.select(col("doc_id").as("doc_b"), col("pf").as("pb"),
        col("plen").as("lb")), Seq("doc_b"))
      .withColumn("edit_dist", levenshtein(col("pa"), col("pb"), editBand).cast("long"))
      .withColumn("verified",
        col("edit_dist") >= 0 && col("edit_dist") * 5 <= greatest(col("la"), col("lb")))
      .select(col("doc_a"), col("doc_b"), col("est_sim"),
        col("edit_dist"), col("verified"))
  }

  /** BPE merge-step statistic (q90): adjacent-symbol pair counts over
    * the word-frequency table — the inner loop of byte-pair-encoding
    * tokenizer training (Sennrich et al., "Neural Machine Translation
    * of Rare Words with Subword Units", arXiv:1508.07909 §3.2:
    * `get_stats` counts every adjacent symbol pair per vocabulary word,
    * weighted by word frequency; overlapping occurrences like "aaa" →
    * ("aa", 2) count per position, exactly as the reference
    * implementation does). The end-of-word marker is omitted — adding
    * it is a symbol-alphabet change, not a shape change.
    *
    * Scale shape — the reason BPE training is feasible at 100 TB: the
    * corpus collapses to its VOCABULARY first (one map-side-combined
    * count shuffle of single-token keys), and the quadratic-ish pair
    * expansion runs over distinct words only — vocabulary-sized, not
    * corpus-sized. The pair aggregation is a second map-side-combined
    * shuffle of 2-char keys, and the top-k is a TakeOrdered, never a
    * global sort. (count DESC, pair ASC) is a total order, so the k-cut
    * is deterministic on both engines. */
  def bpePairCounts(docs: DataFrame, k: Int): DataFrame = {
    val words = docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wn"))
      .where(length(col("word")) > 1)
    words
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"), col("wn"))
      .groupBy(col("pair")).agg(sum(col("wn")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Full BPE tokenizer TRAINING (q108) — the driver loop whose single
    * step q90's [[bpePairCounts]] statistic is (Sennrich et al.,
    * arXiv:1508.07909 §3.2): repeatedly take the most frequent
    * adjacent symbol pair over the word-frequency table (count DESC,
    * then (s1, s2) ASC — a total order, so every step is
    * deterministic) and merge it everywhere, left-to-right
    * non-overlapping within each word, until `maxMerges` merges have
    * been learned or the best pair's count drops below `minCount`
    * (the data-dependent stop — Sennrich's frequency threshold).
    * Returns the learned merge table (step, s1, s2, n): THE tokenizer
    * artifact — applying it in order reproduces the segmentation.
    *
    * Symbol sequences are carried as bracket-encoded strings
    * ( sym  per symbol): a merge is then ONE
    * `replace(enc, ␁s1␂␁s2␂, ␁s1s2␂)` — and `replace`'s left-to-right
    * non-overlapping scan IS the reference merge rule ("aaa" under
    * (a,a) → ("aa", "a"); the per-symbol brackets share no characters
    * between adjacent occurrences, so the scan never skips a legal
    * merge the way delimiter-sharing encodings do). Pair counting
    * splits the brackets back off and counts per POSITION (overlaps
    * included, exactly `get_stats`). Words containing the bracket
    * code points are dropped up front (they would corrupt the
    * encoding; real tokenizers byte-fallback such input).
    *
    * Scale shape — why BPE training runs at 100 TB: the corpus
    * collapses to its VOCABULARY (one map-side-combined word count)
    * before the loop, so every sweep touches vocabulary-sized state
    * only: one narrow `replace` map + one map-side-combined pair
    * count whose exchange carries distinct-pair keys. The driver
    * holds the argmax scalar and the merge list (both tokenizer-
    * sized), never the vocab; per-sweep state truncates lineage
    * through [[graft.ext.Graph.checkpointers]] (localCheckpoint, or
    * reliable files via `checkpointDir` on a real cluster — the
    * [[graft.ext.Graph.pageRankConverge]] discipline; an unbroken
    * persist chain blows the driver past a few dozen sweeps). */
  // The BPE bracket-encoding pieces, defined ONCE for training and
  // application (an edit to one that missed the other would silently
  // diverge the tokenizer the trainer learned from the tokenizer the
  // encoder applies — the Scala-side counterpart of sqlBpeIt's rule)
  private val bpeBl = "\u0001"
  private val bpeBr = "\u0002"
  /** Words the trainer/encoder can bracket-encode: multi-char (a
    * single char has no pairs) and free of the bracket code points
    * (real tokenizers byte-fallback such input). */
  private def bpeTrainable(word: Column): Column =
    length(word) > 1 && !word.contains(bpeBl) && !word.contains(bpeBr)
  /** `word` (string col) -> its bracket-encoded symbol string. */
  private val bpeEncSql: String =
    "concat_ws('', transform(sequence(1, length(word)), " +
      "i -> concat(char(1), substring(word, i, 1), char(2))))"
  /** `enc` (bracket string col) -> its symbol array. */
  private val bpeSymsSql: String =
    "split(substring(enc, 2, length(enc) - 2), concat(char(2), char(1)))"
  private def bpeMergeFrom(s1: String, s2: String): String =
    s"$bpeBl$s1$bpeBr$bpeBl$s2$bpeBr"
  private def bpeMergeTo(s1: String, s2: String): String =
    s"$bpeBl$s1$s2$bpeBr"

  def bpeTrain(docs: DataFrame, maxMerges: Int = 12, minCount: Long = 2L,
               checkpointDir: Option[String] = None): DataFrame = {
    require(maxMerges >= 1, s"need at least one merge step, got $maxMerges")
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val s = docs.sparkSession
    import s.implicits._
    val vocab = docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wn"))
      .where(bpeTrainable(col("word")))
      .select(expr(bpeEncSql).as("enc"), col("wn"))
    val cks = graft.ext.Graph.checkpointers(vocab, checkpointDir)
    // lazy truncation, ONE computation per sweep: each sweep's argmax
    // collect is the action that materializes that sweep's state (the
    // pageRankConverge discipline — ckptNow here would add an extra
    // vocab-scale job per sweep to a loop that is job-overhead bound)
    var (cur, release) = cks.lazyOnce(vocab)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < maxMerges && !done) {
      // symbols back out of the brackets; adjacent pairs per position
      val best = cur.select(expr(bpeSymsSql).as("syms"), col("wn"))
        // a fully-merged word is ONE symbol: no pairs (and Spark's
        // sequence(1, 0) would DESCEND, not come back empty)
        .where(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS s1, syms[i] AS s2))"))
          .as("p"), col("wn"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum(col("wn")).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"))
        .limit(1).as[(String, String, Long)].collect()
      release() // the collect above materialized cur's checkpoint
      best.headOption.filter(_._3 >= minCount) match {
        case None => done = true
        case Some((s1, s2, n)) =>
          step += 1
          merges += ((step, s1, s2, n))
          // the next sweep's pair count reads a flat checkpointed
          // state, not a replace-chain over every prior step
          val (next, rel) = cks.lazyOnce(cur.select(
            replace(col("enc"), lit(bpeMergeFrom(s1, s2)), lit(bpeMergeTo(s1, s2))).as("enc"),
            col("wn")))
          cur = next
          release = rel
      }
    }
    release() // idempotent; covers the maxMerges exit's unconsumed state
    merges.toSeq.toDF("step", "s1", "s2", "n")
  }

  /** Tokenizer APPLICATION (q109): replay a learned merge table (from
    * [[bpeTrain]]) over the corpus and account the result per source —
    * word occurrences, the character-symbol baseline, the post-merge
    * BPE token count, and the compression ratio (one IEEE division of
    * two exact longs). Encoding runs on the DISTINCT-WORD frame: the
    * merge replay is `merges.length` chained `replace`s in ONE narrow
    * projection (a single pass, no loop — application is
    * order-sensitive but stateless), and the corpus-scale side only
    * joins the per-(source, word) counts against that vocabulary-sized
    * encoding. Untrainable words — single-char (no pairs) or
    * bracket-containing (would corrupt the encoding; real tokenizers
    * byte-fallback) — count their characters.
    *
    * Scale shape: the encode side is vocabulary-sized end to end; the
    * corpus appears only as a map-side-combined (source, word) count
    * and a keyed join against the broadcast-able vocabulary frame. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val sw = docs.select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
    val enc0 = sw.select(col("word")).distinct()
      .where(bpeTrainable(col("word")))
      .withColumn("enc", expr(bpeEncSql))
    val encoded = merges.foldLeft(enc0) { case (df, (s1, s2)) =>
      df.withColumn("enc",
        replace(col("enc"), lit(bpeMergeFrom(s1, s2)), lit(bpeMergeTo(s1, s2))))
    }
    val venc = encoded.select(col("word"),
      size(expr(bpeSymsSql)).cast("long").as("n_syms"))
    sw.join(venc, Seq("word"), "left")
      .withColumn("ns", coalesce(col("n_syms"), length(col("word")).cast("long")))
      .groupBy(col("source")).agg(
        sum(col("cnt")).as("n_words"),
        sum(length(col("word")).cast("long") * col("cnt")).as("n_chars"),
        sum(col("ns") * col("cnt")).as("n_bpe_tokens"))
      .withColumn("compression",
        col("n_bpe_tokens").cast("double") / col("n_chars").cast("double"))
      .orderBy(col("source"))
  }

  /** Bigram-LM successor table (q91): for every context token seen at
    * least `minCtx` times, the `topK` successors by exact occurrence
    * count with the conditional probability n_pair/n_ctx (one IEEE
    * division of two exact longs — engine-independent). See the q91
    * registry comment for the published shape and scale analysis.
    *
    * r21 shape: the per-context total and the top-k cut are ONE fused
    * partial-aggregable aggregation on the context key — sum(n_pair)
    * plus a bounded [[graft.ext.TopKStrAgg]] heap — replacing the
    * prior sum+row_number windows over the context partition. A window
    * partition is co-located and buffered in ONE task that AQE cannot
    * split, so a hot context ("the", vocabulary-sized successor list
    * at web scale) serialized its whole frame through a single
    * straggler sort; the heap form combines map-side to k entries per
    * (partition, context) and exchanges only k-sized buffers (same
    * ordering contract: n_pair DESC, next_tok ASC — LmSpec pins the
    * window equivalence, SkewProbe's hotctx site measures the
    * straggler). */
  def bigramLmTop(docs: DataFrame, minCtx: Long, topK: Int): DataFrame = {
    val counts = docs
      .select(tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))"))
        .as("b"))
      .groupBy(col("b.w1").as("context"), col("b.w2").as("next_tok"))
      .agg(count(lit(1)).as("n_pair"))
    val topk = udaf(new graft.ext.TopKStrAgg(topK),
      org.apache.spark.sql.Encoders.product[graft.ext.TopKAgg.SEntry])
    counts
      .groupBy(col("context"))
      .agg(sum(col("n_pair")).as("n_ctx"),
        topk(col("n_pair").cast("double"), col("next_tok")).as("tk"))
      .where(col("n_ctx") >= minCtx)
      .select(col("context"), col("n_ctx"), explode(col("tk.items")).as("e"))
      .select(col("context"), col("e.payload").as("next_tok"),
        col("e.sortKey").cast("long").as("n_pair"), col("n_ctx"),
        (col("e.sortKey").cast("long").cast("double") / col("n_ctx")).as("p"))
  }

  /** Bigram-LM surprisal scores (q97): the CCNet-shaped perplexity
    * stage (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data", LREC 2020 §4.3 — train an LM, score
    * every document, cut by a perplexity band). The LM is q91's exact
    * bigram table; the per-bigram score is the INTEGER-QUANTIZED
    * surprisal floor(log2(n_ctx div n_pair)) = bitlength(n_ctx div
    * n_pair) − 1 — the bit-contract-safe stand-in for −log2 p(w2|w1)
    * (a transcendental log would break engine-vs-oracle bit equality;
    * the 1-bit quantization preserves the ordering a band cut
    * consumes). Unseen bigrams cannot occur — the LM is trained on the
    * corpus it scores, CCNet's in-domain configuration. Docs with < 2
    * tokens have no bigrams and drop, as in q91 training. The band cut
    * itself composes downstream with q38's exact distributed
    * percentiles — deliberately NOT a global ntile here, which would
    * be a single-reducer sort over the doc frame at corpus scale.
    *
    * Scale shape: the LM is TWO map-side-combined counts over the
    * persisted bigram frame — per-(w1, w2) pair counts
    * (vocabulary²-sized after the combine) and per-w1 context totals
    * (vocabulary-sized) — stitched by ONE broadcast join on w1, so the
    * pair-count frame never re-shuffles. The prior form computed n_ctx
    * as sum() OVER (PARTITION BY w1): a window partition is co-located
    * in ONE task AQE cannot split, so a hot context's vocabulary-sized
    * successor list serialized through a single straggler (r20 verdict
    * lead item; SkewProbe's hotctx site measures it). The context-total
    * side is one 16-byte-scale row per distinct context — broadcastable
    * far past any realistic vocabulary; if a corpus ever exceeds that,
    * drop the hint and the keyed join degrades to the window's
    * co-location, never worse. Scoring is ONE keyed join of exploded
    * doc bigrams against the LM on (w1, w2); per-doc sums combine
    * map-side. */
  def lmSurprisal(docs: DataFrame,
                  scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked): DataFrame = {
    // persisted: the exploded bigram frame feeds both LM training and
    // doc scoring
    val bg = scope.persist(docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
    val ctx = bg.groupBy(col("w1")).agg(count(lit(1)).as("n_ctx"))
    val lm = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .join(broadcast(ctx), Seq("w1"))
    bg.join(lm, Seq("w1", "w2"))
      .withColumn("s", (length(bin(expr("n_ctx div n_pair"))) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("sum_surprisal"))
      .withColumn("mean_surprisal",
        col("sum_surprisal").cast("double") / col("n_bigrams"))
      .orderBy(col("doc_id"))
  }

  /** The band cut over [[lmSurprisal]] scores with caller-supplied
    * tertile thresholds — the shared tail of q101's exact path and the
    * approx at-scale path below. `th` must be a ONE-ROW frame with
    * `t1 <= t2` threshold columns; it broadcasts, so the cut is a
    * narrow map + one band-keyed aggregate over the doc frame. */
  def surprisalBandCut(scores: DataFrame, th: DataFrame): DataFrame =
    scores.crossJoin(broadcast(th)) // one-row threshold pack
      .withColumn("band",
        when(col("mean_surprisal") <= col("t1"), "head")
          .when(col("mean_surprisal") <= col("t2"), "middle")
          .otherwise("tail"))
      .groupBy(col("band")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        min(col("mean_surprisal")).as("min_ms"),
        max(col("mean_surprisal")).as("max_ms"))
      .orderBy(col("band"))

  /** q101's documented 100 TB path: the SAME band cut with the tertile
    * thresholds from `approx_percentile` (t-digest; rank error <=
    * 1/`accuracy`) instead of the exact distributed sort — the q59
    * exact-vs-sketch contract applied to the CCNet cut. The sketch
    * folds map-side and merges associatively, so the threshold step
    * moves one digest per partition at any corpus size; the cut
    * itself is unchanged. Exactness trade: up to `n_docs / accuracy`
    * docs per boundary can land in the adjacent band (the scores near
    * a tertile are interchangeable for curation purposes — CCNet's
    * own bands are heuristic thirds); LmSpec pins the rank-error
    * bound against the exact path. */
  def surprisalBandsApprox(docs: DataFrame, accuracy: Int = 10000,
                           scope: graft.engine.CacheScope =
                             graft.engine.CacheScope.untracked): DataFrame = {
    val scores = scope.persist(lmSurprisal(docs, scope))
    surprisalBandCut(scores, surprisalApproxThresholds(scores, accuracy))
  }

  /** The t-digest/GK tertile thresholds of [[surprisalBandsApprox]] as
    * their own one-row (t1, t2) frame — factored out so the q114
    * oracle row and the production band cut consume the SAME sketch
    * computation (one definition; the gate and the pipeline cannot
    * drift). */
  def surprisalApproxThresholds(scores: DataFrame, accuracy: Int): DataFrame =
    scores.agg(
      expr(s"approx_percentile(mean_surprisal, array(${1.0 / 3}, ${2.0 / 3}), $accuracy)")
        .as("ts"))
      .select(element_at(col("ts"), 1).as("t1"), element_at(col("ts"), 2).as("t2"))

  /** Quantized TF-IDF top terms (q102): per source, the k terms with
    * the highest tf·qidf, where tf is the term's exact occurrence count
    * within the source and qidf = floor(log2(N div df)) — the bin()
    * bit-length quantization of the classic idf (q97's device; a real
    * log would break the engine-vs-oracle bit contract, and the 1-bit
    * quantization preserves the top-k ordering up to documented
    * granularity, ties broken (score DESC, term ASC)). Terms appearing
    * in every doc get qidf 0 — stop words self-suppress, the property
    * tf-idf exists for.
    *
    * Scale shape: tf is one map-side-combined count; df is a distinct
    * (doc, term) exchange then a vocabulary-sized count; the join is
    * keyed on term; N broadcasts as a one-row pack; the k-cut is a
    * bounded [[graft.ext.TopKStrAgg]] heap per source — the prior
    * row_number window partitioned by source funneled the whole
    * per-source VOCABULARY through ~|sources| sort tasks (~5 here, and
    * ~20 at corpus scale) that AQE cannot split; the heap combines
    * map-side to k entries per (partition, source) and the k·|sources|
    * winner frame broadcasts back to recover tf/df/qidf (same ordering
    * contract: score DESC, term ASC — LmSpec pins the equivalence). */
  def tfidfTopTerms(docs: DataFrame, k: Int,
                    scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked): DataFrame = {
    // two consumers: tf and df
    val toks = scope.persist(docs.select(col("source"), col("doc_id"),
      explode(tokens(col("text"))).as("term")))
    val tf = toks.groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    // scored vocabulary frame — NOT persisted (r22 A/B, r21 verdict #4):
    // both consumers (the heap cut and the winner join-back) recompute
    // the tf⋈df join from the pinned token explode above; caching the
    // joined frame cost more than the recompute at bench scale
    // (min-of-5 1.99 → 1.53 s, med 2.42 → 2.24) because the persist
    // serializes the vocabulary rows through the block store between two
    // consumers that each need one cheap hash join from cache.
    val sc =
      tf.join(dfq, Seq("term")).crossJoin(broadcast(n)) // one-row scalar pack
        .withColumn("qidf", (length(bin(expr("n_docs div df"))) - 1).cast("long"))
        .withColumn("score", col("tf") * col("qidf"))
    val topk = udaf(new graft.ext.TopKStrAgg(k),
      org.apache.spark.sql.Encoders.product[graft.ext.TopKAgg.SEntry])
    val top = sc.groupBy(col("source"))
      .agg(topk(col("score").cast("double"), col("term")).as("tk"))
      .select(col("source"), posexplode(col("tk.items")).as(Seq("_p", "e")))
      .select(col("source"), col("e.payload").as("term"),
        (col("_p") + 1).cast("int").as("rk"))
    sc.join(broadcast(top), Seq("source", "term"))
      .select(col("source"), col("term"), col("tf"), col("df"),
        col("qidf"), col("score"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** CMS heavy hitters (q93): the exact top-`k` tokens by corpus
    * frequency, each carrying its count-min-sketch estimate next to the
    * true count — the audit view of [[graft.ext.CmsAgg]] (estimate ≥
    * exact always; equality when no heavier token shares all d
    * buckets). The sketch aggregates the token stream into ONE fixed
    * d·w array row (map-side combined, one array per partition on the
    * exchange) and broadcasts back over the k-row exact side; the
    * per-token estimate is a least() over d element_at probes using the
    * SAME md5 salted hash the aggregator applied JVM-side, so the
    * DuckDB oracle can restate every bucket sum and the min exactly.
    * The exact side is a map-side-combined count over distinct tokens
    * (vocabulary-, not corpus-sized after the combine) with a
    * TakeOrdered k-cut under the total order (count DESC, tok ASC).
    * At 100 TB one keeps ONLY the sketch pass; the exact side exists
    * here because the operator's contract is the audit pairing. */
  def cmsHeavyHitters(docs: DataFrame, d: Int, w: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(tokens(col("text"))).as("tok"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok").asc).limit(k)
    // .toColumn must stay a TypedColumn through the select (an .as would
    // erase it to Column and untyped select rejects object aggregators)
    val sketch = toks.as[String]
      .select(new graft.ext.CmsAgg(d, w).toColumn).toDF("sketch")
    val probes = (0 until d).map { s =>
      element_at(col("sketch"),
        (TextOps.saltedHash(s, col("tok")) % w).cast("int") + lit(s * w + 1))
    }
    exact.crossJoin(broadcast(sketch)) // one-row scalar pack, house rule
      .withColumn("cms_est", least(probes: _*))
      .select(col("tok"), col("exact_cnt"), col("cms_est"))
      .orderBy(col("exact_cnt").desc, col("tok").asc)
  }

  /** HLL distinct-count audit (q95): per-source distinct-SHINGLE
    * cardinality, the exact count next to the raw-HLL estimate from a
    * 2^b-register [[graft.ext.HllAgg]] sketch. Shingles, not tokens,
    * deliberately: the synthetic vocabulary is ~31 tokens per source,
    * deep inside raw HLL's documented small-range bias (the regime the
    * linear-counting correction exists for), while distinct 3-gram
    * shingles run ~1.1k ≳ 2.5m — the regime where the raw estimator is
    * the published one (HllSpec pins the error inside the ~3/√m band).
    * The zero-register count rides along so a caller CAN apply the
    * correction: it needs ln(), which would break the bit contract
    * ([[graft.ext.HllAgg]] scaladoc), so the engine reports V and
    * estimates raw.
    *
    * Everything after the registers is exact fixed-point: Σ 2^(−M_j)
    * scaled by 2^(61−b) folds as longs over the register array (empty
    * registers contribute their 2^(61−b) term automatically — the
    * array always has all m entries), and the estimate is
    * α_m · m² · 2^(61−b) / Σ_scaled — one long→double conversion, one
    * IEEE division, one multiply by the α_m literal, all
    * bit-deterministic on both engines. q17 already covers Spark's
    * built-in approx_count_distinct; THIS row is the sketch whose
    * every register the oracle can rebuild and whose estimate it can
    * restate to the last bit. */
  def hllDistinct(docs: DataFrame, b: Int): DataFrame = {
    require(b >= 7, s"the alpha_m closed form needs m >= 128 registers, got b=$b")
    val sp = docs.sparkSession
    import sp.implicits._
    val m = 1 << b
    val rhoMax = 60 - b + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val numer = m.toDouble * m.toDouble * java.lang.Math.scalb(1.0, rhoMax)
    // tokens materialized ONCE before shinglesOf references it 4x
    // (TextOps class doc: shinglesOf needs a plain attribute)
    val sh = docs.select(col("source"), tokens(col("text")).as("tk"))
      .select(col("source"), explode(TextOps.shinglesOf(col("tk"))).as("sh"))
    val regs = sh.as[(String, String)].groupByKey(_._1).mapValues(_._2)
      .agg(new graft.ext.HllAgg(b).toColumn).toDF("source", "regs")
    val exact = sh.groupBy(col("source")).agg(countDistinct(col("sh")).as("n_distinct"))
    exact.join(regs, Seq("source"))
      .withColumn("sum_scaled", expr(
        s"aggregate(regs, cast(0 as bigint), (acc, r) -> acc + (cast(1 as bigint) << cast($rhoMax - r as int)))"))
      .select(col("source"), col("n_distinct"),
        expr("size(filter(regs, r -> r = 0))").cast("long").as("n_zero_regs"),
        (lit(alpha) * (lit(numer) / col("sum_scaled").cast("double"))).as("hll_est"))
      .orderBy(col("source"))
  }

  /** Asymmetric banded probe — the ingest-time form of the q42 join:
    * (probe doc, stored doc) pairs that collide in at least one band
    * and estimate similar, self-pairs (same doc_id, the crash-replay
    * case) excluded. Both inputs are (doc_id, h0..h7) signature
    * tables; the store side is typically orders of magnitude larger,
    * and only its band-colliding slice is ever joined. */
  private[graft] def lshProbe(probe: DataFrame, store: DataFrame): DataFrame =
    bandedKeys(probe, "doc_a", "a").join(bandedKeys(store, "doc_b", "b"), Seq("band", "k1", "k2"))
      .where(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"), estSim("a", "b").as("est_sim"))
      .distinct()
      .where(col("est_sim") >= 0.5)

  /** THE quality formula — shared verbatim by q31 (scoring per source)
    * and the curation floor of [[curatedDocs]]: appends toks / n_tok
    * (zero-token rows dropped) / tok_chars / stop_ratio / punct_ratio /
    * quality to a documents frame. toks is materialized ONCE as a
    * column — three downstream columns reference it, and each reference
    * to the raw split expression would re-run the regex tokenizer
    * (TextOps class doc). */
  private[graft] def withQuality(docs: DataFrame): DataFrame = docs
    .withColumn("toks", tokens(col("text")))
    .withColumn("n_tok", size(col("toks")))
    .where(col("n_tok") > 0)
    .withColumn("tok_chars",
      aggregate(transform(col("toks"), t => length(t)), lit(0), (acc, x) => acc + x))
    .withColumn("stop_ratio",
      size(filter(col("toks"), t => t.isin(TextOps.lexicons.head._2: _*))) / col("n_tok"))
    .withColumn("punct_ratio",
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))) / length(col("text")))
    .withColumn("quality",
      least(col("n_tok") / lit(100e0), lit(1e0)) * lit(0.4e0)
        + least((col("tok_chars") / col("n_tok")) / lit(8e0), lit(1e0)) * lit(0.3e0)
        + (lit(1e0) - col("stop_ratio")) * lit(0.2e0)
        + (lit(1e0) - col("punct_ratio")) * lit(0.1e0))

  /** Oracle-side mirror of [[withQuality]]: a SQL fragment yielding
    * per-doc (doc_id, lang, source, n_tok, quality) from `table` (any
    * relation with doc_id, lang, source, text), stated with the exact
    * sub-expressions q31's oracle proved hash-equal to the Spark
    * formula (tok_chars as BIGINT, plain `/` double division). New
    * oracles needing the quality score compose this instead of
    * restating the formula. */
  private[queries] def sqlQualityDocsFrom(table: String): String =
    s"""SELECT doc_id, lang, source, n_tok,
       |       LEAST(n_tok / 100e0, 1e0) * 0.4e0
       |         + LEAST((tok_chars / n_tok) / 8e0, 1e0) * 0.3e0
       |         + (1e0 - (stop_hits / n_tok)) * 0.2e0
       |         + (1e0 - (punct_cnt / n_chars2)) * 0.1e0 AS quality
       |FROM (
       |  SELECT doc_id, lang, source, len(toks) AS n_tok,
       |         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars,
       |         len(list_filter(toks, x -> x IN (${TextOps.lexicons.head._2.map(w => s"'$w'").mkString(", ")}))) AS stop_hits,
       |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_cnt,
       |         length(text) AS n_chars2
       |  FROM (SELECT doc_id, lang, source, text, $sqlToks AS toks FROM $table)
       |  WHERE len(toks) > 0)""".stripMargin

  /** [[sqlQualityDocsFrom]] over the driver's documents table. */
  private[queries] def sqlQualityDocs: String = sqlQualityDocsFrom("documents")

  /** Optional stages around the core curation pipeline — the knobs of
    * [[curatedDocsOf]] / [[curationStageCounts]]. The default value
    * reproduces the classic [[curatedDocs]] pipeline exactly (exact
    * dedup → near-dup removal → quality floor); each Option/Seq turns
    * one more production stage on, in the fixed order a real corpus
    * runs them:
    *
    *  1. `repeatedLineMinDf` — cross-corpus repeated-line removal
    *     ([[CurationQueries.removeRepeatedLines]]): boilerplate lines
    *     (df >= the threshold) are dropped from every doc's text, and
    *     docs with no surviving line are dropped entirely. Runs FIRST
    *     so every later stage (hashes, signatures, quality, rarity)
    *     sees boilerplate-free text.
    *  2. `blockedDomains` — URL/domain blocklist
    *     ([[CurationQueries.urlFilter]]): docs carrying any blocked
    *     host are dropped.
    *  3. exact dedup (always on): lowest doc_id per content hash.
    *  4. `spanDedupMinDf` — cross-document repeated-SPAN excision
    *     ([[CurationQueries.dedupRepeatedSpans]], gram length
    *     `spanDedupK`): every token span whose k-gram content occurs
    *     in >= minDf distinct documents is cut out of each doc, and
    *     docs excised to nothing are dropped. Runs AFTER exact dedup
    *     (spans should count distinct CONTENT, not distinct copies —
    *     and the positional-gram table is built over one signature
    *     per distinct text, not one per copy) and BEFORE near-dup
    *     (boilerplate spans inflate MinHash similarity between
    *     otherwise-unrelated docs; excising first lets LSH judge the
    *     residual content). Like the rarity stage, the gram-df
    *     statistic is corpus-trained — the incremental streaming sink
    *     rejects it for the same reason.
    *  5. near-dup removal (always on): MinHash-LSH est_sim >= 0.5
    *     among exact-dedup survivors, higher doc_id of each pair
    *     dropped.
    *  6. `semanticDedup` — embedding-keyed SemDeDup stage (see
    *     [[SemanticDedupStage]]): same-cell embedding pairs at cosine
    *     >= tau among the CURRENT SURVIVORS, centroid-closer member
    *     dropped. Runs after near-dup (text similarity is cheaper —
    *     let it thin the corpus first; what remains for this stage is
    *     exactly the population shingles cannot see, paraphrase
    *     replicas) and before the quality floor (like near-dup, it is
    *     a dedup decision, not a quality one — and quality must score
    *     the deduped corpus a budget stage will select from).
    *  7. `qualityFloor` (always on, default 0.5): [[withQuality]]'s
    *     score; zero-token docs drop here too.
    *  8. `maxRarity` — corpus-trained bigram-rarity ceiling
    *     ([[CurationQueries.bigramRarity]], trained on the survivors
    *     entering the stage): docs rarer than the ceiling are likely
    *     noise/garbled text and are dropped; docs with < 2 tokens have
    *     no rarity evidence and are kept.
    *  9. `budgetPerSource` — token-budget mixture selection
    *     ([[CurationQueries.budgetSelect]]): per source, best-quality-
    *     first until the budget fills. */
  /** Config of the optional embedding-keyed SEMANTIC dedup stage of
    * [[curatedDocsOf]] — the SemDeDup recipe (Abbas et al.,
    * arXiv:2303.09540) as a curation stage, catching the population no
    * text stage can: paraphrase replicas share almost no shingles
    * (MinHash est_sim ~ 0, exact hashes distinct) yet sit at cosine >=
    * `tau` in embedding space.
    *
    * `embeddings` must carry (doc_id, embedding) — the docs↔embeddings
    * key. Cells are trained on the FULL embeddings frame (cluster
    * structure is a corpus-level artifact computed once per corpus,
    * and the deterministic seed centroids — the first `nSeeds` ids —
    * must exist regardless of which docs earlier stages dropped), but
    * the pair join runs among CURRENT SURVIVORS only — the same
    * content-loss rule as the near-dup stage: pairing a survivor
    * against an already-dropped replica could drop BOTH copies of the
    * content. Docs with no embedding row are kept (no evidence).
    * `iters` >= 1 dedups within Lloyd-refined cells
    * ([[EmbeddingQueries.kmeansAssign]], the published pipeline shape
    * q77 pins); 0 within the seeded one-pass cells (q72's). `tau` /
    * `maxCellSize` have exactly q72/q76's semantics — the cap is the
    * dense-cell boundedness valve a replica-heavy corpus needs. */
  final case class SemanticDedupStage(
    embeddings: DataFrame,
    tau: Double = 0.45,
    nSeeds: Int = 8,
    iters: Int = 2,
    maxCellSize: Option[Int] = None)

  final case class CurationStages(
    repeatedLineMinDf: Option[Long] = None,
    blockedDomains: Seq[String] = Nil,
    spanDedupMinDf: Option[Long] = None,
    spanDedupK: Int = 5,
    semanticDedup: Option[SemanticDedupStage] = None,
    qualityFloor: Double = 0.5,
    maxRarity: Option[Double] = None,
    budgetPerSource: Option[Long] = None,
    stagingDir: Option[String] = None,
    /** With no `stagingDir`: localCheckpoint each stage boundary
      * instead of composing one lazy plan — same lineage truncation as
      * the parquet staged layer, without the filesystem round-trips.
      * For corpora that fit in executor storage only (a local
      * checkpoint is lost with its executor — the parquet layer is the
      * durable form a 100 TB run needs); release the checkpointed
      * blocks via a tracking [[graft.engine.CacheScope]] —
      * `clearCache()` does not cover RDD-level persists. */
    inMemoryBoundaries: Boolean = false)

  /** The staged pipeline's survivor frames: ("input", docs) plus one
    * (stageName, survivors) entry per ACTIVE stage, in execution
    * order. Every frame keeps the input's columns (text rewritten by
    * the repeated-line stage) — except from the quality stage onward,
    * which appends `quality`. Shared by [[curatedDocsOf]] (takes the
    * last frame) and [[curationStageCounts]] (counts each) so the
    * accounting can never drift from the corpus it accounts for.
    *
    * Scale notes: the cleaned corpus (when the line stage is on) and
    * the signature table persist via `scope` — every downstream stage
    * scans them. The line stage's reassembly joins back on doc_id (one
    * equi-join of the corpus — the text column only exists reassembled,
    * there is nothing narrower to join). All other stage filters are
    * semi/anti joins on doc_id against small flagged sets, which AQE
    * broadcasts from runtime stats.
    *
    * Staged-layer materialization (`stages.stagingDir`): every stage
    * references its input 2–4 times (dedup's canonical set, the LSH
    * self-join, rarity's two multiplicity consumers, the budget
    * cumsum), so the LOGICAL plan grows ~3× per stage — with all
    * seven stages on, the lazily composed tree reached 33k file scans
    * / 300k plan lines and ~17 s of pure driver overhead PER ACTION
    * at sf0.1, data size irrelevant. `.persist()` cannot help: cache
    * substitution happens per subtree occurrence and leaves the tree
    * intact. With a stagingDir, each boundary is written to
    * `$$dir/<stage>` parquet and re-read, truncating lineage to a
    * file scan — exactly the staged-layer design the reference
    * pipeline runs between steps (SURVEY §3), and what a 100 TB run
    * does anyway (no executor holds a corpus-sized lineage
    * recompute). `inMemoryBoundaries` is the small-corpus alternative:
    * localCheckpoint per boundary — the same lineage truncation held
    * in executor storage instead of files. [[curationStageCounts]]
    * never counts the lazy tree (it gates between the two boundary
    * modes on plan size); [[curatedDocsOf]] stages when configured,
    * and with the default CurationStages (two-deep tree — the classic
    * q37 pipeline) runs unstaged as one lazy plan. A tracking
    * [[graft.engine.CacheScope]] deletes the staged dirs on close. */
  private def stageFrames(docs: DataFrame, stages: CurationStages,
                          scope: graft.engine.CacheScope): Seq[(String, DataFrame)] = {
    val out = Seq.newBuilder[(String, DataFrame)]
    out += ("input" -> docs)
    var cur = docs
    // alwaysPersist: stage outputs with several downstream consumers
    // even in the unstaged single-pass plan (the cleaned corpus)
    // persist; staged boundaries need neither (they re-read files).
    def boundary(df: DataFrame, name: String, alwaysPersist: Boolean = false): DataFrame =
      stages.stagingDir match {
        case Some(dir) =>
          val path = s"$dir/$name"
          df.write.mode("overwrite").parquet(path)
          scope.trackStagedDir(path)
          docs.sparkSession.read.parquet(path)
        case None if stages.inMemoryBoundaries => scope.localCheckpoint(df)
        case None => if (alwaysPersist) scope.persist(df) else df
      }
    stages.repeatedLineMinDf.foreach { minDf =>
      val cleaned = CurationQueries.removeRepeatedLines(
        cur.select(col("doc_id"), col("text")), minDf)
        .where(col("kept_lines") > 0)
        .select(col("doc_id"), col("clean"))
      cur = boundary(cur.drop("text").join(cleaned, Seq("doc_id"))
        .withColumnRenamed("clean", "text")
        .select(docs.columns.map(col).toSeq: _*), "repeated_lines", alwaysPersist = true)
      out += ("repeated_lines" -> cur)
    }
    if (stages.blockedDomains.nonEmpty) {
      cur = boundary(CurationQueries.urlFilter(cur, stages.blockedDomains)
        .where(col("n_blocked") === 0)
        .select(docs.columns.map(col).toSeq: _*), "url_filter")
      out += ("url_filter" -> cur)
    }
    // exact dedup: canonical doc per text hash
    val canonical = cur.select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    cur = boundary(cur.join(canonical, Seq("doc_id"), "left_semi"), "exact_dedup")
    out += ("exact_dedup" -> cur)
    stages.spanDedupMinDf.foreach { minDf =>
      // same shape as the repeated-line stage: compute (doc_id, clean)
      // narrow, join back on doc_id to preserve the input columns, and
      // drop docs excised to nothing. The rewritten text feeds every
      // later stage — near-dup signatures and quality score the
      // residual content, not the boilerplate.
      val cleaned = CurationQueries.dedupRepeatedSpans(
        cur.select(col("doc_id"), col("text")), stages.spanDedupK, minDf, scope)
        .where(col("n_tok") > col("n_removed"))
        .select(col("doc_id"), col("clean"))
      cur = boundary(cur.drop("text").join(cleaned, Seq("doc_id"))
        .withColumnRenamed("clean", "text")
        .select(docs.columns.map(col).toSeq: _*), "span_dedup", alwaysPersist = true)
      out += ("span_dedup" -> cur)
    }
    // near-dup losers AMONG EXACT-DEDUP SURVIVORS — the standard
    // pipeline order (and the cheap one at duplicate-heavy scale:
    // the band joins see one signature per distinct text, not one
    // per copy). Also prevents content loss: flagging from the full
    // set can drop BOTH members of a canonical pair when a
    // lower-id replica of one flags the other.
    val losers = lshPairsOf(scope.persist(signaturesOf(cur)))
      .select(col("doc_b").as("doc_id")).distinct()
    cur = boundary(cur.join(losers, Seq("doc_id"), "left_anti"), "near_dup")
    out += ("near_dup" -> cur)
    stages.semanticDedup.foreach { sd =>
      val emb = sd.embeddings.select(col("doc_id").as("vec_id"), col("embedding"))
      val assign =
        if (sd.iters >= 1) EmbeddingQueries.kmeansAssign(emb, sd.nSeeds, sd.iters)
        else EmbeddingQueries.seededAssign(emb, sd.nSeeds)
      // pair join among current survivors only (see [[SemanticDedupStage]]):
      // the corpus-scale assignment semi-joins the survivor id set, which
      // AQE broadcasts from runtime stats; the persisted survivor
      // assignment then feeds both pair-join sides from one evaluation
      val surv = assign.join(cur.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
      val semLosers = EmbeddingQueries.semanticLosers(surv, sd.tau, scope, sd.maxCellSize)
        .select(col("vec_id").as("doc_id"))
      cur = boundary(cur.join(semLosers, Seq("doc_id"), "left_anti"), "semantic_dedup")
      out += ("semantic_dedup" -> cur)
    }
    cur = boundary(withQuality(cur)
      .where(col("quality") >= stages.qualityFloor)
      .select(docs.columns.map(col).toSeq :+ col("quality"): _*), "quality")
    out += ("quality" -> cur)
    stages.maxRarity.foreach { ceiling =>
      val rar = CurationQueries.bigramRarity(cur, scope = scope)
        .select(col("doc_id"), col("rarity"))
      cur = boundary(cur.join(rar, Seq("doc_id"), "left")
        .where(col("rarity").isNull || col("rarity") <= ceiling)
        .drop("rarity"), "rarity")
      out += ("rarity" -> cur)
    }
    stages.budgetPerSource.foreach { budget =>
      val sel = CurationQueries.budgetSelect(cur, budget, scope)
        .select(col("doc_id"))
      cur = boundary(cur.join(sel, Seq("doc_id"), "left_semi"), "budget")
      out += ("budget" -> cur)
    }
    out.result()
  }

  /** [[curatedDocs]] over an arbitrary documents frame, with the full
    * staged pipeline (see [[CurationStages]]): returns the surviving
    * documents — all input columns (text rewritten when the
    * repeated-line stage is on) plus `quality`. The default `stages`
    * is exactly the classic pipeline q37 accounts for. */
  def curatedDocsOf(docs: DataFrame, stages: CurationStages = CurationStages(),
                    scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked): DataFrame =
    stageFrames(docs, stages, scope).last._2

  /** Boundary-mode gate for [[curationStageCounts]]'s default: below
    * this plan-estimated input size, stage boundaries localCheckpoint
    * in memory instead of staging to parquet under java.io.tmpdir.
    * Deliberately conservative: for a parquet scan the optimizer's
    * sizeInBytes is COMPRESSED file bytes, and a duplicate-heavy
    * corpus dictionary-compresses up to ~60:1 (the round-10 3000×
    * finding), so 64 MB compressed may be multiple GB in memory —
    * still comfortably inside a 128 GiB local session, and a real
    * cluster run sets an explicit stagingDir anyway. */
  private val InMemoryStageBytes = 64L << 20

  /** Sum of parquet footer row counts under `dir` — the row count the
    * writer already committed, read driver-side without running a
    * count job per stage. */
  private def footerRowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(conf).listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try r.getRecordCount finally r.close()
      }.sum
  }

  /** Per-stage accounting over the SAME frames [[curatedDocsOf]]
    * returns: one row per active stage — (stage_no, stage, n_docs
    * surviving), stage 0 = the input corpus. q69 is the oracle-gated
    * view of this over an injected dirty corpus.
    *
    * Never counts a lazily composed tree (see [[stageFrames]]'s
    * staged-layer note — the full seven-stage plan multiplies beyond
    * what any driver should parse). With an explicit `stagingDir`,
    * boundaries stage to parquet and each staged stage's count comes
    * from the files' FOOTER row counts — the number the writer already
    * committed — not a count job per stage. Without one, a plan-size
    * gate ([[InMemoryStageBytes]], q62's plan-time-estimate idiom)
    * picks the boundary mode: small corpora localCheckpoint in memory
    * (no filesystem round-trips — the unit-test / notebook case),
    * large ones stage to an applicationId-suffixed tmpdir (two
    * sessions accounting concurrently must not clobber each other's
    * boundary files mid-read).
    *
    * Eager: the result is computed at call time and returned as a
    * local-rows DataFrame, so every boundary it writes is released
    * before returning. The accounting NEVER touches a caller-supplied
    * `stages.stagingDir`'s own stage paths: `mode("overwrite")` on
    * `$dir/<stage>` would replace the part files a frame held from an
    * earlier [[curatedDocsOf]] run still references (FileNotFound on
    * its next action). Instead it stages under a self-provisioned
    * unique SUBDIRECTORY of the supplied dir — same filesystem, so the
    * caller's capacity choice is honored — and deletes only that. */
  def curationStageCounts(docs: DataFrame, stages: CurationStages = CurationStages(),
                          scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked): DataFrame = {
    val spark = docs.sparkSession
    // sizeInBytes == defaultSizeInBytes is the optimizer's "unknown
    // size" sentinel (Long.MaxValue unless the session lowered it) —
    // an unknown-size plan must never checkpoint unbounded data in
    // memory, so it routes to tmpdir staging with the large corpora
    val sentinel = spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.DEFAULT_SIZE_IN_BYTES)
    val planBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val staged = stages.stagingDir match {
      case Some(dir) => stages.copy(stagingDir =
        Some(s"$dir/_accounting_${spark.sparkContext.applicationId}"))
      case None if planBytes <= InMemoryStageBytes && planBytes != BigInt(sentinel) =>
        stages.copy(inMemoryBoundaries = true)
      case None => stages.copy(stagingDir =
        Some(s"${System.getProperty("java.io.tmpdir")}/graft_curation_stages_" +
          spark.sparkContext.applicationId))
    }
    val inner = new graft.engine.CacheScope
    // track the provisioned ROOT too (recursive delete), so the unique
    // subdir itself doesn't outlive the call as an empty shell
    staged.stagingDir.foreach(inner.trackStagedDir)
    val rows =
      try stageFrames(docs, staged, inner).zipWithIndex.map { case ((name, df), i) =>
        val n = staged.stagingDir match {
          // stage 0 is the input frame — never staged, counted directly
          case Some(dir) if i > 0 => footerRowCount(spark, s"$dir/$name")
          case _ => df.count()
        }
        org.apache.spark.sql.Row(i, name, n)
      } finally inner.close()
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("stage_no", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("stage", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType, nullable = false))))
      .orderBy(col("stage_no"))
  }

  /** The curation pipeline as a LIBRARY function: the surviving
    * documents (all original columns + `quality`) after exact dedup
    * (lowest doc_id per content hash), near-dup removal among the
    * exact-dedup survivors (MinHash-LSH est_sim >= 0.5, higher doc_id
    * of each pair dropped), and the quality floor (>= 0.5). q37 is the
    * per-language accounting over this; downstream stages (split,
    * packing, decontamination) run on it directly. The optional
    * production stages (repeated-line removal, URL blocklist, span
    * dedup, embedding-keyed semantic dedup, rarity ceiling, budget
    * selection) compose through [[curatedDocsOf]].
    *
    * Caching: the signature table is persisted (all band-join branches
    * scan it). Pass a [[graft.engine.CacheScope]] and `close()` it
    * after your consuming action to release the blocks; the default
    * leaves them for `spark.catalog.clearCache()` (Bench/Verify). */
  def curatedDocs(s: SparkSession, d: String,
                  scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked): DataFrame =
    curatedDocsOf(Tables.documents(s, d), CurationStages(), scope)

  /** The scale-safe default df cap (see [[ngramJaccardPairs]]): small
    * enough to bound per-posting expansion at C(64,2) = 2016 pairs,
    * large enough that every measured non-adversarial corpus keeps
    * (near-)full recall. */
  val DefaultMaxDf: Int = 64

  /** q43 as a library function: exact n-gram Jaccard near-dup pairs
    * (jaccard >= 0.8, doc_a < doc_b) via a prefix-filtered
    * set-similarity join (PPJoin shape), entirely result-identical to
    * the naive inverted-index join the oracle states:
    *
    *  1. per doc, hash shingles (compiled kernel) and sort them — the
    *     global hash order is the canonical element order;
    *  2. index ONLY the first n - ceil(0.8n) + 1 hashes (the
    *     prefix-filter theorem: two sets with jaccard >= t must share a
    *     member of each other's prefix under any common total order) —
    *     the candidate index shrinks ~5x;
    *  3. expand candidate pairs inside per-hash posting lists with the
    *     size-ratio prune (5*min >= 4*max, integer-exact);
    *  4. close EXACT intersection counts with array_intersect on the
    *     full sorted hash arrays carried through the join — no second
    *     pass over the index.
    *
    * `maxDf`: drop prefix postings whose document frequency exceeds the
    * cap BEFORE pair expansion (the q57 dfTab move). On a near-identical-
    * heavy corpus the pair volume through ultra-common prefix shingles
    * is the quadratic term — the cap bounds each posting's work at
    * C(maxDf, 2) by construction, trading bounded recall (a pair is
    * missed only if ALL its shared prefix hashes are ultra-common) for
    * a survivable curve.
    *
    * DEFAULT = `Some(DefaultMaxDf)` (capped), because the default is
    * what production callers run at 100 TB and the exact path's cost is
    * pair-volume-bound: on a 30x-replicated worst-case corpus the exact
    * path ran 64.9 s (x28.6 vs 1x) where the capped path ran 2.75 s
    * (x1.4, flat) — see BENCH_NOTES. The recall trade is measured, not
    * guessed: lossless at sf0.001 and sf0.1, drops 1 of 26 pairs at
    *  sf0.01, and loses ~27% of pairs only on the adversarial
    * all-replicas corpus where every prefix shingle is ultra-common.
    * Exact enumeration is an EXPLICIT choice — pass `maxDf = None`
    * (what the q43 oracle does; the capped default is oracle-gated in
    * its own right by q60).
    *
    * Caching: the shingle-hash base (index + both closing join sides
    * scan it) and the posting table (both expansion branches scan it)
    * are persisted — pass a [[graft.engine.CacheScope]] to own the
    * release, as with [[curatedDocs]]. */
  def ngramJaccardPairs(s: SparkSession, d: String,
                        maxDf: Option[Int] = Some(DefaultMaxDf),
                        scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked): DataFrame = {
    val base = scope.persist(Tables.documents(s, d)
      // cheap-precursor filter — see signatures() for why not
      // hs0.isNotNull (pushdown would run the kernel twice per row)
      .where(size(tokens(col("text"))) >= 3)
      .withColumn("hs0", graft.expressions.Exprs.shingleHashes(col("text")))
      .select(col("doc_id"), array_sort(col("hs0")).as("hs"))
      .withColumn("n", size(col("hs")))
      // prefix_len = n - ceil(0.8n) + 1, in integer arithmetic
      // (ceil(0.8n) via (4n+4) div 5 — no float rounding traps)
      .withColumn("plen", col("n") - expr("(4*n + 4) div 5") + lit(1)))
    val idx = base.select(col("doc_id"), col("n"),
      explode(slice(col("hs"), lit(1), col("plen"))).as("h"))
    val postingAll = idx.groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
      .where(size(col("ds")) > 1)
    // persisted: BOTH expansion branches below scan the posting table,
    // and without the cache each branch re-runs the explode + groupBy
    // chain from base — the single most expensive stage of this query
    // paid twice. One row per duplicated prefix hash (tiny next to the
    // index), released by the same scope as base.
    val posting = scope.persist(
      maxDf.fold(postingAll)(c => postingAll.where(size(col("ds")) <= c)))
    // compiled triangle enumeration + size-ratio prune (the HOF
    // formulation re-slices the list per element, interpreted —
    // quadratic CPU on hot shingles' posting lists)
    val small = posting.where(size(col("ds")) <= hotList)
      .select(explode(graft.expressions.Exprs.prefixPairs(col("ds"))).as("p"))
    // hot posting lists (boilerplate shingles shared by thousands of
    // docs): one row's triangle would be one quadratic straggler
    // task. Chunk the list, expand (i <= j) chunk-index pairs, and
    // repartition BEFORE the kernel so the quadratic work spreads
    // across the cluster. Orientation + the final distinct make this
    // bit-identical to the single-triangle expansion (diagonal chunk
    // pairs just emit each pair twice pre-distinct).
    val nChunks = ceil(size(col("ds")) / lit(hotList.toDouble)).cast("int")
    val hot = posting.where(size(col("ds")) > hotList)
      .withColumn("cs", transform(sequence(lit(0), nChunks - 1),
        i => slice(col("ds"), i * hotList + lit(1), lit(hotList))))
      .withColumn("ij", flatten(transform(sequence(lit(0), size(col("cs")) - 1),
        i => transform(sequence(i, size(col("cs")) - 1),
          j => struct(i.as("i"), j.as("j"))))))
      .select(col("cs"), explode(col("ij")).as("ij"))
      .select(element_at(col("cs"), col("ij.i") + 1).as("ca"),
        element_at(col("cs"), col("ij.j") + 1).as("cb"))
      .repartition(numShufflePartitions(s))
      .select(explode(graft.expressions.Exprs.crossPairs(col("ca"), col("cb"))).as("p"))
    // a df cap at or under the hot threshold makes the hot branch empty
    // BY CONSTRUCTION (size(ds) <= maxDf <= hotList) — drop it at plan-
    // build time rather than paying its scan + empty shuffle (Catalyst
    // cannot prove the two filters contradict)
    val expanded =
      if (maxDf.exists(_ <= hotList)) small else small.unionAll(hot)
    val cands = expanded
      .select(col("p.doc_a"), col("p.na"), col("p.doc_b"), col("p.nb"))
      .distinct() // a pair may share several prefix hashes (or chunk orders)
    val inter = cands
      .join(base.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
    inter
      .withColumn("jaccard", col("n_common") / (col("na") + col("nb") - col("n_common")))
      .where(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB mirror of [[signaturesOf]] as a `sig` CTE chain over an
    * arbitrary (doc_id, text) relation. Claims CTE names ${p}t, ${p}s2,
    * ${p}s3, ${p}sig — composing oracles (q69) must avoid them, or pass
    * a prefix `p` to namespace the chain (q78 composes it with the
    * kmeans CTEs, which claim s1/s2/... of their own). */
  private[queries] def sqlSigCtesFrom(table: String, p: String = ""): String = {
    def h(k: Int) = {
      val src = if (k < 4) "m0" else "m1"
      s"list_min(list_transform($src, m -> ('0x' || substr(m, ${1 + 8 * (k % 4)}, 8))::BIGINT)) AS h$k"
    }
    s"""${p}t AS (SELECT doc_id, $sqlToks AS tk FROM $table),
       |${p}s2 AS (SELECT doc_id, ${TextOps.sqlShingleList("tk")} AS sh FROM ${p}t),
       |${p}s3 AS (SELECT doc_id, list_transform(sh, x -> md5('0:' || x)) AS m0,
       |              list_transform(sh, x -> md5('1:' || x)) AS m1
       |       FROM ${p}s2 WHERE len(sh) > 0),
       |${p}sig AS (SELECT doc_id, ${(0 until nHashes).map(h).mkString(",\n               ")}
       |        FROM ${p}s3)""".stripMargin
  }

  /** DuckDB mirror of [[signatures]] (the documents-table form). */
  private val sqlSigCtes: String = sqlSigCtesFrom("documents")

  /** Banded near-dup LOSER select over a sig-shaped relation (doc_id,
    * h0..h7): the doc_b (higher id) of every aligned-band collision
    * pair at est_sim >= 0.5 — the near-dup stage's drop set, stated
    * ONCE for every composing oracle (q37/q69/q78 — the same
    * drift-prevention rule as [[sqlSigCtesFrom]]). Callers wrap it in
    * their own CTE name. */
  private[queries] def sqlBandLosersFrom(sigRel: String): String =
    s"""SELECT DISTINCT doc_b AS doc_id FROM (
       |${Seq((0, 1), (2, 3), (4, 5), (6, 7)).map { case (i, j) =>
         s"""    SELECT b.doc_id AS doc_b,
            |           ${(0 until nHashes).map(k => s"CAST(a.h$k = b.h$k AS INTEGER)").mkString(" + ")} AS matches
            |    FROM $sigRel a JOIN $sigRel b ON a.h$i = b.h$i AND a.h$j = b.h$j AND a.doc_id < b.doc_id""".stripMargin
       }.mkString("\n    UNION ALL\n")}
       |  ) z WHERE matches / 8e0 >= 0.5""".stripMargin

  /** Shared oracle fragment for the doc-level clustering: band-join
    * candidates → est-sim ≥ 0.5 edge closure → recursive reachability →
    * `cl` (doc_id, cluster_id). Stated ONCE so q49 and q67 cannot
    * drift apart silently (same rule as [[sqlSigCtesFrom]] /
    * [[sqlQualityDocs]]); callers prepend `WITH RECURSIVE
    * $sqlSigCtes,`. */
  private val sqlClusterCtes: String =
    s"""cand AS (
       |${Seq((0, 1), (2, 3), (4, 5), (6, 7)).map { case (i, j) =>
         s"""  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |         ${(0 until nHashes).map(k => s"CAST(a.h$k = b.h$k AS INTEGER)").mkString(" + ")} AS matches
            |  FROM sig a JOIN sig b ON a.h$i = b.h$i AND a.h$j = b.h$j AND a.doc_id < b.doc_id""".stripMargin
       }.mkString("\n  UNION\n")}
       |),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM cand WHERE matches / 8e0 >= 0.5
       |  UNION
       |  SELECT doc_b AS a, doc_a AS b FROM cand WHERE matches / 8e0 >= 0.5),
       |reach AS (
       |  SELECT a AS node, a AS lbl FROM edges
       |  UNION
       |  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY 1)""".stripMargin

  val defs: Map[String, Q] = Map(

    // Token counting per language: counts, mean token length, vocab size.
    "q30_token_stats" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val perDoc = docs.select(col("lang"), size(tokens(col("text"))).as("n_tok"))
        val tok = docs.select(col("lang"), explode(tokens(col("text"))).as("tok"))
        val a = perDoc.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          davg(col("n_tok").cast("double")).as("avg_tokens_per_doc"))
        val b = tok.groupBy(col("lang")).agg(
          count(lit(1)).as("n_tokens"),
          davg(length(col("tok")).cast("double")).as("avg_token_len"),
          countDistinct(col("tok")).as("n_distinct_tokens"))
        a.join(b, Seq("lang")).orderBy(col("lang"))
      },
      s"""WITH t AS (SELECT lang, $sqlToks AS toks FROM documents),
         |a AS (SELECT lang, COUNT(*) AS n_docs,
         |             ${sqlDavg("CAST(len(toks) AS DOUBLE)")} AS avg_tokens_per_doc
         |      FROM t GROUP BY 1),
         |tk AS (SELECT lang, unnest(toks) AS tok FROM t),
         |b AS (SELECT lang, COUNT(*) AS n_tokens,
         |             ${sqlDavg("CAST(length(tok) AS DOUBLE)")} AS avg_token_len,
         |             COUNT(DISTINCT tok) AS n_distinct_tokens
         |      FROM tk GROUP BY 1)
         |SELECT a.lang, n_docs, avg_tokens_per_doc, n_tokens, avg_token_len, n_distinct_tokens
         |FROM a JOIN b USING (lang) ORDER BY 1""".stripMargin),

    // Quality scoring: length/punctuation/stopword components combined
    // with arithmetic only (no transcendentals — cross-engine exact).
    "q31_text_quality" -> Q(
      (s, d) => {
        // per-doc scoring is [[withQuality]] — ONE definition of the
        // formula, shared with the curation floor of curatedDocs
        val perDoc = withQuality(Tables.documents(s, d))
        perDoc.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          davg12(col("quality")).as("avg_quality"),
          davg(col("n_tok").cast("double")).as("avg_tokens"))
          .orderBy(col("source"))
      },
      s"""WITH pd AS (
         |  SELECT source, len(toks) AS n_tok,
         |         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars,
         |         len(list_filter(toks, x -> x IN (${TextOps.lexicons.head._2.map(w => s"'$w'").mkString(", ")}))) AS stop_hits,
         |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_cnt,
         |         length(text) AS n_chars2
         |  FROM (SELECT source, text, $sqlToks AS toks FROM documents)
         |  WHERE len(toks) > 0),
         |q AS (
         |  SELECT source, n_tok,
         |         LEAST(n_tok / 100e0, 1e0) * 0.4e0
         |           + LEAST((tok_chars / n_tok) / 8e0, 1e0) * 0.3e0
         |           + (1e0 - (stop_hits / n_tok)) * 0.2e0
         |           + (1e0 - (punct_cnt / n_chars2)) * 0.1e0 AS quality
         |  FROM pd)
         |SELECT source, COUNT(*) AS n_docs, ${sqlDavg12("quality")} AS avg_quality,
         |       ${sqlDavg("CAST(n_tok AS DOUBLE)")} AS avg_tokens
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin),

    // Heuristic language ID (marker-lexicon hits + CJK codepoint check)
    // reported as a confusion matrix against the labeled lang column.
    "q32_lang_confusion" -> Q(
      (s, d) => {
        def hits(words: Seq[String]) = size(filter(col("toks"), t => t.isin(words: _*)))
        val lex = TextOps.lexicons.toMap
        // toks materialized once — four lexicon scores reference it
        val scored = Tables.documents(s, d)
          .withColumn("toks", tokens(col("text")))
          .withColumn("s_en", hits(lex("en"))).withColumn("s_es", hits(lex("es")))
          .withColumn("s_fr", hits(lex("fr"))).withColumn("s_de", hits(lex("de")))
          .withColumn("pred_lang",
            when(TextOps.hasCjk(col("text")), "zh")
              .when(col("s_en") >= greatest(col("s_es"), col("s_fr"), col("s_de")) && col("s_en") > 0, "en")
              .when(col("s_es") >= greatest(col("s_fr"), col("s_de")) && col("s_es") > 0, "es")
              .when(col("s_fr") >= col("s_de") && col("s_fr") > 0, "fr")
              .when(col("s_de") > 0, "de")
              .otherwise("unknown"))
        scored.groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred_lang"))
      }, {
        def h(l: String) = {
          val ws = TextOps.lexicons.toMap.apply(l).map(w => s"'$w'").mkString(", ")
          s"len(list_filter(toks, x -> x IN ($ws)))"
        }
        s"""WITH sc AS (
           |  SELECT lang, ${h("en")} AS s_en, ${h("es")} AS s_es,
           |         ${h("fr")} AS s_fr, ${h("de")} AS s_de,
           |         regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS is_cjk
           |  FROM (SELECT lang, text, $sqlToks AS toks FROM documents)),
           |p AS (
           |  SELECT lang,
           |         CASE WHEN is_cjk THEN 'zh'
           |              WHEN s_en >= GREATEST(s_es, s_fr, s_de) AND s_en > 0 THEN 'en'
           |              WHEN s_es >= GREATEST(s_fr, s_de) AND s_es > 0 THEN 'es'
           |              WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
           |              WHEN s_de > 0 THEN 'de'
           |              ELSE 'unknown' END AS pred_lang
           |  FROM sc)
           |SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // Document fingerprinting: 60-bit content hash per doc (md5-derived so
    // any engine reproduces it bit-for-bit).
    "q33_doc_fingerprint" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("fp"),
          col("n_chars"))
        .orderBy(col("doc_id")),
      """SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Exact deduplication accounting per language (hash-groupBy — the
    // exact-dedup primitive; at scale the md5 group-by is one shuffle of
    // 16-byte keys, not full texts).
    "q40_dedup_exact" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), md5(col("text")).as("h"))
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_distinct_texts"),
          (count(lit(1)) - countDistinct(col("h"))).as("n_dup_docs"))
        .orderBy(col("lang")),
      """SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct_texts,
        |       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),

    // MinHash signatures: 8 min-hashes (two md5s sliced into four 32-bit
    // chunks each) over distinct word 3-gram shingles (docs with < 3
    // tokens have no signature, same on both engines). Zero-shuffle
    // narrow map — see [[signatures]].
    "q41_minhash_signatures" -> Q(
      (s, d) => signatures(s, d).orderBy(col("doc_id")),
      s"""WITH $sqlSigCtes
         |SELECT * FROM sig ORDER BY doc_id""".stripMargin),

    // MinHash + LSH candidate pairs: 4 bands of 2 hashes; join docs per
    // band bucket (never all-pairs), union bands, then filter by estimated
    // similarity >= 0.5 from the full signature.
    "q42_minhash_lsh_pairs" -> Q(
      (s, d) => lshPairs(s, d)
        .select(col("doc_a"), col("doc_b"), col("est_sim"))
        .orderBy(col("doc_a"), col("doc_b")),
      s"""WITH $sqlSigCtes,
         |cand AS (
         |${Seq((0, 1), (2, 3), (4, 5), (6, 7)).map { case (i, j) =>
           s"""  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         ${(0 until nHashes).map(k => s"CAST(a.h$k = b.h$k AS INTEGER)").mkString(" + ")} AS matches
              |  FROM sig a JOIN sig b ON a.h$i = b.h$i AND a.h$j = b.h$j AND a.doc_id < b.doc_id""".stripMargin
         }.mkString("\n  UNION\n")}
         |)
         |SELECT doc_a, doc_b, matches / 8e0 AS est_sim FROM cand
         |WHERE matches / 8e0 >= 0.5 ORDER BY doc_a, doc_b""".stripMargin),

    // Duplicate-CLUSTER formation: connected components over the
    // MinHash-LSH near-dup pairs — the transitive-closure step a real
    // dedup pipeline runs after pairwise LSH (A~B and B~C must collapse
    // to ONE cluster even when A,C never share a band). Distributed
    // min-label propagation (graft.ext.Graph); the oracle states the
    // same closure as a recursive CTE. Output: one row per clustered
    // doc with its cluster id (= min doc_id in the component).
    "q49_dup_clusters" -> Q(
      // NOT wrapped in withAqeOff (measured, r21): unlike q103/q107's
      // node-/pack-scale loops, the eager phase here includes the
      // corpus-scale banded pair generation, where AQE's runtime
      // coalescing buys more than its per-stage barriers cost
      // (subset A/B read 2.75 -> 3.38 s with AQE off)
      (s, d) => dupClusters(s, d),
      s"""WITH RECURSIVE $sqlSigCtes,
         |$sqlClusterCtes
         |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin),

    // Representative selection: the BEST-quality member of each dup
    // cluster (ties toward the smaller doc_id), with member accounting —
    // what a curation pipeline keeps from each cluster (q49 keeps the
    // min-id; real pipelines keep the best doc). The Spark side selects
    // reps via max_by over (quality, -doc_id) — a PARTIAL-aggregable
    // map-side combine, so one pathological giant cluster streams
    // through partial aggregates instead of sorting in a single window
    // reducer (PlanAuditSpec pins the partial phase). The oracle states
    // the same choice as a row_number window — fine at oracle scale,
    // wrong shape at corpus scale, which is exactly why the Spark side
    // differs. Every clustered doc has >= 3 tokens (signatures require
    // it), so the quality join is lossless by construction.
    "q67_cluster_reps" -> Q(
      (s, d) => {
        // ONE max over (quality, -doc_id) yields both outputs: the rep
        // IS -negid (the ordering key embeds the identity), so no
        // second max_by buffer travels the shuffle and each row is
        // struct-compared once. Duplicate-free ord (unique doc_id)
        // makes the choice deterministic.
        val best = max(struct(col("quality"), (-col("doc_id")).as("negid")))
        dupClusters(s, d)
          .join(withQuality(Tables.documents(s, d)).select(col("doc_id"), col("quality")),
            Seq("doc_id"))
          .groupBy(col("cluster_id")).agg(
            count(lit(1)).as("n_members"), best.as("best"))
          .select(col("cluster_id"), col("n_members"),
            (-col("best.negid")).cast("long").as("rep_doc_id"),
            col("best.quality").as("rep_quality"))
          .orderBy(col("cluster_id"))
      },
      s"""WITH RECURSIVE $sqlSigCtes,
         |$sqlClusterCtes,
         |pd AS (${sqlQualityDocs}),
         |m AS (SELECT cl.cluster_id, cl.doc_id, pd.quality
         |      FROM cl JOIN pd USING (doc_id)),
         |r AS (SELECT m.*, row_number() OVER (
         |        PARTITION BY cluster_id ORDER BY quality DESC, doc_id ASC) AS rk
         |      FROM m)
         |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |       MAX(CASE WHEN rk = 1 THEN doc_id END) AS rep_doc_id,
         |       MAX(CASE WHEN rk = 1 THEN quality END) AS rep_quality
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),

    // Cluster-aware train/val/test split — the near-dup-safe form of
    // q52: hashing each DOC into a split lets near-duplicates straddle
    // train and test (the classic eval-contamination flaw — the test
    // set "leaks" through its training-set near-copies). Here the
    // split key is the doc's q49 DUP-CLUSTER id when it has one (the
    // closure's min-label canonical), its own id otherwise, pushed
    // through q52's md5-bucket arithmetic — so a whole near-dup family
    // lands in ONE split by construction. Output: per-split doc/char/
    // cluster accounting plus the self-audit column
    // n_straddling_clusters (clusters seen in >1 split — 0 by
    // construction, recomputed independently by both engines). Scale
    // shape: q49's banded closure plus one left join and a split-keyed
    // aggregate; the straddle audit groups the CLUSTERED slice only.
    "q118_cluster_aware_split" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val cl = dupClusters(s, d)
        val bucket = conv(substring(md5(col("skey").cast("string")), 1, 2), 16, 10)
          .cast("int")
        val keyed = docs.join(cl, Seq("doc_id"), "left")
          .withColumn("skey", coalesce(col("cluster_id"), col("doc_id")))
          .withColumn("split",
            when(bucket < 205, "train").when(bucket < 230, "val").otherwise("test"))
          .persist()
        val straddle = keyed.where(col("cluster_id").isNotNull)
          .groupBy(col("cluster_id")).agg(countDistinct(col("split")).as("ns"))
          .where(col("ns") > 1)
          .agg(count(lit(1)).as("n_straddling_clusters"))
        keyed.groupBy(col("split")).agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            count(col("cluster_id")).as("n_clustered_docs"),
            countDistinct(col("cluster_id")).as("n_clusters"))
          .crossJoin(broadcast(straddle)) // one-row audit pack
          .orderBy(col("split"))
      },
      s"""WITH RECURSIVE $sqlSigCtes,
         |$sqlClusterCtes,
         |k AS (
         |  SELECT d.doc_id, d.n_chars, cl.cluster_id,
         |         COALESCE(cl.cluster_id, d.doc_id) AS skey
         |  FROM documents d LEFT JOIN cl USING (doc_id)),
         |kb AS (
         |  SELECT k.*,
         |         CASE WHEN ('0x' || substr(md5(CAST(skey AS VARCHAR)), 1, 2))::INTEGER < 205 THEN 'train'
         |              WHEN ('0x' || substr(md5(CAST(skey AS VARCHAR)), 1, 2))::INTEGER < 230 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM k),
         |st AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_straddling_clusters
         |  FROM (SELECT cluster_id FROM kb WHERE cluster_id IS NOT NULL
         |        GROUP BY 1 HAVING COUNT(DISTINCT split) > 1) z)
         |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |       COUNT(cluster_id) AS n_clustered_docs,
         |       COUNT(DISTINCT cluster_id) AS n_clusters,
         |       (SELECT n_straddling_clusters FROM st) AS n_straddling_clusters
         |FROM kb GROUP BY 1 ORDER BY 1""".stripMargin),

    // The df-capped q43: same pairs, but prefix postings with document
    // frequency > 64 are dropped before expansion — the bounded-work
    // variant for boilerplate-heavy corpora (BENCH_NOTES: x1.4 at 30x
    // where exact is x28.6). The cap changes SEMANTICS (a pair must
    // share >= 1 rare prefix hash), so it gets its own FULL oracle: the
    // SQL states the prefix-filter + df-cap + exact-intersection
    // definition declaratively and must agree hash-exactly.
    // Runs the library DEFAULT (capped at DefaultMaxDf = 64): the oracle
    // below gates exactly what a production caller gets without opting
    // into anything.
    "q60_capped_jaccard_pairs" -> Q(
      (s, d) => ngramJaccardPairs(s, d),
      s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |s2 AS (SELECT doc_id, ${TextOps.sqlShingleList("tk")} AS sh FROM t),
         |hs AS (SELECT doc_id,
         |              list_sort(list_distinct(list_transform(sh,
         |                x -> ('0x' || substr(md5('g:' || x), 1, 15))::BIGINT))) AS hl
         |       FROM s2 WHERE len(sh) > 0),
         |hn AS (SELECT doc_id, hl, len(hl) AS n,
         |              len(hl) - ((4 * len(hl) + 4) // 5) + 1 AS plen
         |       FROM hs),
         |pfx AS (SELECT doc_id, n, hl, unnest(hl[1:plen]) AS h FROM hn),
         |rare AS (SELECT h FROM pfx GROUP BY h
         |         HAVING COUNT(*) > 1 AND COUNT(*) <= 64),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.n AS na, b.n AS nb, a.hl AS ha, b.hl AS hb
         |  FROM pfx a JOIN rare USING (h) JOIN pfx b USING (h)
         |  WHERE a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT doc_a, doc_b,
         |         CAST(len(list_intersect(ha, hb)) AS BIGINT) AS n_common, na, nb
         |  FROM cand)
         |SELECT doc_a, doc_b, n_common,
         |       n_common / (na + nb - n_common) AS jaccard
         |FROM scored
         |WHERE n_common / (na + nb - n_common) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin),

    // Exact n-gram Jaccard near-dup pairs via inverted-index join — no
    // O(n²) stage. The index carries 60-bit hashed shingles (longs, not
    // strings: ~8 bytes/key through the shuffle instead of ~50-char
    // grams) and each doc's shingle count rides along with the index
    // rows, so the Jaccard formula closes inside the pair aggregation
    // with no extra joins. Skew on ultra-common shingles is the known
    // scale risk — bounded by the maxDf cap of [[ngramJaccardPairs]]
    // (this oracle runs cap-off for exactness; q60 gates the capped
    // path with its own oracle).
    "q43_ngram_jaccard_pairs" -> Q(
      (s, d) => ngramJaccardPairs(s, d, maxDf = None), // exact: opt-out of the scale-safe default cap
      s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |s2 AS (SELECT doc_id, ${TextOps.sqlShingleList("tk")} AS sh FROM t),
         |hs AS (SELECT doc_id, len(sh) AS n,
         |              unnest(list_transform(sh, x -> ('0x' || substr(md5('g:' || x), 1, 15))::BIGINT)) AS h
         |       FROM s2 WHERE len(sh) > 0),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb, COUNT(*) AS n_common
         |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b, n_common,
         |       n_common / (na + nb - n_common) AS jaccard
         |FROM inter
         |WHERE n_common / (na + nb - n_common) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin),

    // The full curation pipeline in ONE plan — what an LLM-data engine
    // actually runs: exact dedup (keep lowest doc_id per content hash)
    // -> near-dup removal (drop the higher doc_id of every MinHash-LSH
    // pair with estimated similarity >= 0.5) -> quality floor -> per-
    // language accounting. Composes the q40/q42/q31 operators; each
    // stage stays distributed (hash group-bys, band joins, anti-join).
    // The SURVIVING CORPUS itself is the library surface
    // ([[curatedDocs]]) — this query is its accounting view.
    "q37_curation_pipeline" -> Q(
      (s, d) =>
        curatedDocs(s, d)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            davg12(col("quality")).as("avg_quality"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang")),
      s"""WITH $sqlSigCtes,
         |canonical AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |sigc AS (
         |  SELECT * FROM sig WHERE doc_id IN (SELECT doc_id FROM canonical)),
         |losers AS (
         |${sqlBandLosersFrom("sigc")}),
         |scored AS (
         |  SELECT doc_id, lang, n_chars,
         |         LEAST(len(toks) / 100e0, 1e0) * 0.4e0
         |           + LEAST((CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) / len(toks)) / 8e0, 1e0) * 0.3e0
         |           + (1e0 - (len(list_filter(toks, x -> x IN (${TextOps.lexicons.head._2.map(w => s"'$w'").mkString(", ")}))) / len(toks))) * 0.2e0
         |           + (1e0 - ((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / length(text))) * 0.1e0 AS quality
         |  FROM (SELECT doc_id, lang, n_chars, text, $sqlToks AS toks FROM documents)
         |  WHERE len(toks) > 0)
         |SELECT lang, COUNT(*) AS n_kept, ${Parity.sqlDavg12("quality")} AS avg_quality,
         |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM scored
         |WHERE doc_id IN (SELECT doc_id FROM canonical)
         |  AND doc_id NOT IN (SELECT doc_id FROM losers)
         |  AND quality >= 0.5
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Regex ("BPE-ish") tokenization: class-based subword tokens
    // (letter runs / digit runs / punctuation runs) via
    // regexp_extract_all — the codegen'd tokenizer shape a real BPE
    // pre-tokenizer uses — with per-language class distribution.
    "q35_regex_tokens" -> Q(
      (s, d) => {
        val pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
        val tok = Tables.documents(s, d)
          .select(col("lang"), explode(regexp_extract_all(col("text"), lit(pat), lit(0))).as("tok"))
          .withColumn("cls",
            when(col("tok").rlike("^[a-zA-Z]+$"), "alpha")
              .when(col("tok").rlike("^[0-9]+$"), "num")
              .otherwise("punct"))
        tok.groupBy(col("lang"), col("cls"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("n_distinct"),
            davg(length(col("tok")).cast("double")).as("avg_len"))
          .orderBy(col("lang"), col("cls"))
      },
      s"""WITH tok AS (
         |  SELECT lang, unnest(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS tok
         |  FROM documents),
         |c AS (
         |  SELECT lang, tok,
         |         CASE WHEN regexp_full_match(tok, '[a-zA-Z]+') THEN 'alpha'
         |              WHEN regexp_full_match(tok, '[0-9]+') THEN 'num'
         |              ELSE 'punct' END AS cls
         |  FROM tok)
         |SELECT lang, cls, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct,
         |       ${sqlDavg("CAST(length(tok) AS DOUBLE)")} AS avg_len
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Winnowing fingerprints (rolling-hash document fingerprinting):
    // hash every k-char gram, take the min of each w-wide sliding window
    // of those hashes, dedup — the classic local fingerprint selection
    // (robust to insertions, unlike a whole-doc hash). The per-gram
    // md5 + sliding min runs in the compiled WinnowFingerprints kernel
    // (one JVM pass, monotonic-deque O(n) window min) instead of the
    // interpreted per-character HOF lambda it replaced — at corpus scale
    // that lambda dispatch was the dominant CPU of this query.
    // ExprEquivalenceSpec pins bit-equality against the HOF form; the
    // cheap length pre-filter matches the kernel's null condition so the
    // kernel itself never runs inside a pushed-down predicate.
    "q36_winnow_fingerprints" -> Q(
      (s, d) => {
        val k = 8; val w = 4
        val fps = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .where(length(col("text")) >= k + w - 1)
          .withColumn("fps", graft.expressions.Exprs.winnowFingerprints(col("text"), k, w))
        fps.select(col("doc_id"), size(col("fps")).as("n_fps"),
          array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
          .orderBy(col("doc_id"))
      },
      """WITH h AS (
        |  SELECT doc_id,
        |         list_transform(range(1, length(text) - 6),
        |           i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 8))::BIGINT) AS hs
        |  FROM documents WHERE length(text) >= 11),
        |f AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(hs) - 2),
        |           j -> list_min(list_slice(hs, CAST(j AS INTEGER), CAST(j + 3 AS INTEGER))))) AS fps
        |  FROM h)
        |SELECT doc_id, len(fps) AS n_fps, list_min(fps) AS min_fp, list_max(fps) AS max_fp
        |FROM f ORDER BY doc_id""".stripMargin),

    // Substring-containment pairs — the dedup modality token-Jaccard
    // misses (a short doc pasted inside a long one scores low Jaccard
    // but high containment). Winnowing fingerprints are position-local,
    // so shared fingerprints ≈ shared substrings: inverted-index join on
    // fingerprints, score = shared / min(|fps_a|, |fps_b|). The
    // document-frequency cap (df <= 32) drops ubiquitous fingerprints
    // BEFORE pairing — the standard common-shingle drop, and the reason
    // this stays bounded at corpus scale: per-fingerprint pair work is
    // capped at C(32,2) regardless of corpus size, so there are no hot
    // posting lists by construction (q43 needs chunking because exact
    // Jaccard cannot drop shingles; containment with a df cap can).
    // Threshold compares in integers (shared*2 >= min) — no float edge.
    "q57_containment_pairs" -> Q(
      (s, d) => {
        val k = 8; val w = 4; val dfCap = 32
        // persist the ARRAY form, not the exploded index: same bytes,
        // ~2 orders of magnitude fewer cached rows, and the winnow
        // kernel (the expensive part) still runs exactly once — the
        // downstream consumers re-explode from cache, which is a
        // per-element array walk, not a kernel re-evaluation.
        val fpArr = Tables.documents(s, d)
          .where(length(col("text")) >= k + w - 1)
          .select(col("doc_id"),
            graft.expressions.Exprs.winnowFingerprints(col("text"), k, w).as("fps"))
          .persist() // df table + join sides; Bench/Verify clearCache()s
        val fps = fpArr.select(col("doc_id"), explode(col("fps")).as("fp"))
        val dfTab = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .where(col("df") <= dfCap)
        val rare = fps.join(dfTab, Seq("fp"))
          .select(col("doc_id"), col("fp")).persist()
        val nk = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
        val pairs = rare.select(col("doc_id").as("doc_a"), col("fp"))
          .join(rare.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
          .where(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
        pairs
          .join(nk.select(col("doc_id").as("doc_a"), col("n_kept").as("ka")), Seq("doc_a"))
          .join(nk.select(col("doc_id").as("doc_b"), col("n_kept").as("kb")), Seq("doc_b"))
          .where(col("shared") * 2 >= least(col("ka"), col("kb")))
          .select(col("doc_a"), col("doc_b"), col("shared"),
            (col("shared").cast("double") / least(col("ka"), col("kb"))).as("containment"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      """WITH h AS (
        |  SELECT doc_id,
        |         list_transform(range(1, length(text) - 6),
        |           i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 8))::BIGINT) AS hs
        |  FROM documents WHERE length(text) >= 11),
        |f AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(hs) - 2),
        |           j -> list_min(list_slice(hs, CAST(j AS INTEGER), CAST(j + 3 AS INTEGER))))) AS fps
        |  FROM h),
        |e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
        |dfreq AS (SELECT fp, COUNT(*) AS df FROM e GROUP BY 1),
        |rare AS (SELECT e.doc_id, e.fp FROM e JOIN dfreq USING (fp) WHERE dfreq.df <= 32),
        |nk AS (SELECT doc_id, COUNT(*) AS n_kept FROM rare GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        |  FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, shared,
        |       CAST(shared AS DOUBLE) / LEAST(na.n_kept, nb.n_kept) AS containment
        |FROM pairs JOIN nk na ON doc_a = na.doc_id JOIN nk nb ON doc_b = nb.doc_id
        |WHERE shared * 2 >= LEAST(na.n_kept, nb.n_kept)
        |ORDER BY doc_a, doc_b""".stripMargin),

    // SimHash: 32-bit near-dup fingerprint — per-bit +1/-1 votes over
    // token hashes, bit set where the vote is positive.
    "q44_simhash_fingerprints" -> Q(
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .withColumn("h", saltedHash(0, col("tok")))
        val votes = tok.groupBy(col("doc_id")).agg(
          sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as("b0"),
          (1 until 32).map(j =>
            sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")): _*)
        votes.select(col("doc_id"),
          (0 until 32).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
          .orderBy(col("doc_id"))
      },
      s"""WITH tok AS (
         |  SELECT doc_id, ${sqlSaltedHash(0, "tok")} AS h
         |  FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents)),
         |votes AS (
         |  SELECT doc_id,
         |${(0 until 32).map(j => s"         SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(",\n")}
         |  FROM tok GROUP BY 1)
         |SELECT doc_id,
         |       CAST(${(0 until 32).map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
         |FROM votes ORDER BY doc_id""".stripMargin),

    // PII redaction ([[TextOps.redactPii]]): URL -> email -> phone
    // regexp_replace chain, codegen'd, zero shuffles — corpus cleaning's
    // standard pre-tokenization pass. The test corpus carries no PII
    // (verified: no '@'/'http' anywhere), so the query INJECTS a
    // deterministic synthetic email + phone + URL per doc before
    // redacting — the oracle must agree on the redacted text hash-
    // exactly, and chars_delta != 0 proves the chain rewrote every row
    // (CleaningSpec pins that plus the marker tokens). Both engines'
    // regex dialects (Java, RE2) agree on these lookaround-free patterns
    // by construction — see the TextOps scaladoc.
    "q61_pii_redaction" -> Q(
      (s, d) => {
        val dirty = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          concat(col("text"),
            lit(" Contact user"), col("doc_id").cast("string"), lit("@example.com"),
            lit(" or +1 (555) 010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" via https://ex.org/u/"), col("doc_id").cast("string"),
            lit(" now.")).as("t"))
        // redacted text materialized ONCE as its own projection stage
        // (the TextOps rule: never make two consumers re-run the chain)
        dirty.withColumn("clean", TextOps.redactPii(col("t")))
          .select(col("doc_id"),
            md5(col("clean")).as("red_hash"),
            (length(col("t")) - length(col("clean"))).cast("long").as("chars_removed"))
          .orderBy(col("doc_id"))
      },
      """WITH dirty AS (
        |  SELECT doc_id,
        |         text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |              || ' or +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              || ' via https://ex.org/u/' || CAST(doc_id AS VARCHAR) || ' now.' AS t
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, t,
        |         regexp_replace(regexp_replace(regexp_replace(t,
        |           'https?://[^\s]+', '<URL>', 'g'),
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g') AS clean
        |  FROM dirty)
        |SELECT doc_id, md5(clean) AS red_hash,
        |       CAST(length(t) - length(clean) AS BIGINT) AS chars_removed
        |FROM red ORDER BY doc_id""".stripMargin),

    // Band-bucket-capped LSH pairs — the LSH member of the capped-
    // operator family (q60: prefix df-cap; q57: posting df <= 32). A
    // band bucket is the unit of quadratic blow-up, and the one corpus
    // shape the q49 signature collapse cannot defuse (near-identical-
    // but-DISTINCT docs) lands exactly there. The synthetic corpus has
    // no hot buckets, so — like q61 injecting PII — the query builds
    // them: 4 extra replicas of every 7th doc. Their 5-doc signature
    // groups exceed the cap (4) in EVERY band, so all their pairs drop
    // and only cool-bucket pairs survive; the oracle states bucket
    // occupancy + the cap + the full-signature estimate declaratively,
    // so both engines must agree on exactly which pairs those are.
    "q62_lsh_capped_pairs" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val aug = (1 to 4).map(r =>
          base.where(col("doc_id") % 7 === 0)
            .select((col("doc_id") + lit(1000000L * r)).as("doc_id"), col("text")))
          .foldLeft(base)(_ unionAll _)
        val sig = signaturesOf(aug).persist()
        lshPairsOf(sig, maxBucket = Some(4))
          .select(col("doc_a"), col("doc_b"), col("est_sim"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      s"""WITH docs2 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 * r AS doc_id, text FROM documents
         |  CROSS JOIN (VALUES (1), (2), (3), (4)) AS reps(r)
         |  WHERE doc_id % 7 = 0),
         |${sqlSigCtesFrom("docs2")},
         |k AS (
         |  SELECT 0 AS band, h0 AS k1, h1 AS k2, doc_id FROM sig
         |  UNION ALL SELECT 1, h2, h3, doc_id FROM sig
         |  UNION ALL SELECT 2, h4, h5, doc_id FROM sig
         |  UNION ALL SELECT 3, h6, h7, doc_id FROM sig),
         |ok AS (SELECT band, k1, k2 FROM k GROUP BY 1, 2, 3 HAVING COUNT(*) <= 4),
         |ka AS (SELECT k.* FROM k JOIN ok USING (band, k1, k2)),
         |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |       FROM ka a JOIN k b USING (band, k1, k2)
         |       WHERE a.doc_id < b.doc_id),
         |est AS (SELECT doc_a, doc_b,
         |        (${(0 until nHashes).map(k => s"CAST(sa.h$k = sb.h$k AS INTEGER)").mkString(" + ")}) / 8e0 AS est_sim
         |        FROM pr JOIN sig sa ON sa.doc_id = pr.doc_a
         |                JOIN sig sb ON sb.doc_id = pr.doc_b)
         |SELECT doc_a, doc_b, est_sim FROM est WHERE est_sim >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin),

    // Two-stage near-dup with exact edit-distance verification (see
    // [[editVerifiedPairs]]): LSH candidates -> banded Levenshtein over
    // bounded prefixes at edit similarity >= 0.8. The synthetic corpus
    // is augmented (the q61/q62 injection pattern) so the verifier
    // provably exercises every outcome class: every 7th doc gains a
    // 3-char-suffix replica (candidate, ACCEPTED: dist 3), every 11th a
    // token-halves-swapped replica (shingle set ≈ preserved so LSH
    // still pairs it, but char-level distance ≈ half the doc —
    // REJECTED, mostly via the -1 band sentinel). Organic corpus pairs
    // land in both classes. The oracle restates the augmentation, the
    // signature pipeline, the band join, and the banded distance (CASE
    // over DuckDB's unbanded levenshtein) declaratively.
    "q89_edit_verified_pairs" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val near = base.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            concat(col("text"), lit(" zq")).as("text"))
        val tk = tokens(col("text"))
        val mid = floor(size(tk) / 2).cast("int")
        val swapped = base.where(col("doc_id") % 11 === 0)
          .select((col("doc_id") + lit(4000000L)).as("doc_id"),
            concat_ws(" ", concat(
              slice(tk, mid + 1, size(tk) - mid), slice(tk, lit(1), mid))).as("text"))
        editVerifiedPairs(base.unionAll(near).unionAll(swapped))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      s"""WITH docs2 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, text || ' zq' AS text
         |  FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 4000000 AS doc_id,
         |         array_to_string(list_concat(tk[mid+1:], tk[1:mid]), ' ') AS text
         |  FROM (SELECT doc_id, $sqlToks AS tk, len($sqlToks) // 2 AS mid
         |        FROM documents)
         |  WHERE doc_id % 11 = 0),
         |${sqlSigCtesFrom("docs2")},
         |cand AS (
         |${Seq((0, 1), (2, 3), (4, 5), (6, 7)).map { case (i, j) =>
           s"""  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         ${(0 until nHashes).map(k => s"CAST(a.h$k = b.h$k AS INTEGER)").mkString(" + ")} AS matches
              |  FROM sig a JOIN sig b ON a.h$i = b.h$i AND a.h$j = b.h$j AND a.doc_id < b.doc_id""".stripMargin
         }.mkString("\n  UNION\n")}
         |),
         |pairs AS (SELECT doc_a, doc_b, matches / 8e0 AS est_sim FROM cand
         |          WHERE matches / 8e0 >= 0.5),
         |tx AS (SELECT doc_id, substr(text, 1, 512) AS pf,
         |              least(length(text), 512) AS plen FROM docs2),
         |lv AS (
         |  SELECT p.doc_a, p.doc_b, p.est_sim, ta.plen AS la, tb.plen AS lb,
         |         levenshtein(ta.pf, tb.pf) AS raw
         |  FROM pairs p JOIN tx ta ON ta.doc_id = p.doc_a
         |               JOIN tx tb ON tb.doc_id = p.doc_b)
         |SELECT doc_a, doc_b, est_sim,
         |       CAST(CASE WHEN raw <= 102 THEN raw ELSE -1 END AS BIGINT) AS edit_dist,
         |       (raw <= 102 AND raw * 5 <= GREATEST(la, lb)) AS verified
         |FROM lv ORDER BY doc_a, doc_b""".stripMargin),

    // Distributed bigram-LM estimation (the MapReduce n-gram-LM shape of
    // Brants et al., "Large Language Models in Machine Translation",
    // EMNLP 2007 §3: count n-grams, then derive conditional
    // probabilities per context): the top-3 successors of every context
    // seen >= 50 times, with exact occurrence counts and the conditional
    // probability as ONE IEEE division of two exact longs (identical on
    // both engines). Scale shape: the bigram count is a map-side-combined
    // shuffle of (w1, w2) keys over DISTINCT bigrams (vocabulary², not
    // corpus-sized, after the combine); the per-context total and the
    // 3-cut are ONE fused partial-aggregable aggregation on the context
    // key (sum + bounded TopKStrAgg heap — never a window, whose
    // partition a hot context would serialize through one un-splittable
    // task; see [[bigramLmTop]]). (n_pair DESC, next_tok ASC)
    // totally orders successors, so the 3-cut is deterministic.
    "q91_bigram_lm_top" -> Q(
      (s, d) => bigramLmTop(Tables.documents(s, d), minCtx = 50, topK = 3)
        .orderBy(col("context"), col("next_tok")),
      s"""WITH t AS (SELECT $sqlToks AS tk FROM documents),
         |bg AS (SELECT unnest(list_transform(range(1, len(tk)),
         |              i -> {'w1': tk[i], 'w2': tk[i+1]})) AS b
         |       FROM t WHERE len(tk) >= 2),
         |c AS (SELECT b.w1 AS context, b.w2 AS next_tok,
         |             CAST(COUNT(*) AS BIGINT) AS n_pair
         |      FROM bg GROUP BY 1, 2),
         |r AS (SELECT context, next_tok, n_pair,
         |             CAST(SUM(n_pair) OVER (PARTITION BY context) AS BIGINT) AS n_ctx,
         |             row_number() OVER (PARTITION BY context
         |               ORDER BY n_pair DESC, next_tok ASC) AS rk
         |      FROM c)
         |SELECT context, next_tok, n_pair, n_ctx,
         |       CAST(n_pair AS DOUBLE) / n_ctx AS p
         |FROM r WHERE n_ctx >= 50 AND rk <= 3
         |ORDER BY context, next_tok""".stripMargin),

    // BPE tokenizer-training merge statistic (see [[bpePairCounts]]):
    // the top-20 adjacent character pairs over the word-frequency
    // table, each occurrence weighted by word frequency. The ordering
    // (n DESC, pair ASC) totally orders rows, so the 20-cut is pinned.
    "q90_bpe_merge_pairs" -> Q(
      (s, d) => bpePairCounts(Tables.documents(s, d), 20),
      s"""WITH wf AS (
         |  SELECT w AS word, COUNT(*) AS wn
         |  FROM (SELECT unnest($sqlToks) AS w FROM documents) GROUP BY 1),
         |pr AS (
         |  SELECT unnest(list_transform(range(1, length(word)),
         |                i -> substr(word, i, 2))) AS pair, wn
         |  FROM wf WHERE length(word) > 1)
         |SELECT pair, CAST(SUM(wn) AS BIGINT) AS n FROM pr
         |GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin),

    // Count-min-sketch heavy hitters (see [[cmsHeavyHitters]] and
    // [[graft.ext.CmsAgg]]): the exact top-20 tokens with their CMS
    // estimates from a 4×256 sketch. The oracle restates the sketch
    // ALGEBRA, not the array: each row's bucket sums are a group-by on
    // the same md5 salted hash, and the estimate is the min of the
    // top-token's four bucket sums — so a single misplaced count in any
    // of the 1024 cells breaks the hash compare. (count DESC, tok ASC)
    // totally orders the cut.
    "q93_cms_heavy_hitters" -> {
      val (d, w, k) = (4, 256, 20)
      def bkt(s: Int, e: String) = s"(${TextOps.sqlSaltedHash(s, e)}) % $w"
      Q(
        (sp, dir) => cmsHeavyHitters(Tables.documents(sp, dir), d, w, k),
        s"""WITH t AS (SELECT unnest($sqlToks) AS tok FROM documents),
           |ex AS (SELECT tok, COUNT(*) AS exact_cnt FROM t GROUP BY 1
           |       ORDER BY exact_cnt DESC, tok ASC LIMIT $k),
           |bs AS (
           |${(0 until d).map(s =>
              s"  SELECT $s AS salt, ${bkt(s, "tok")} AS bucket, COUNT(*) AS c FROM t GROUP BY 1, 2")
              .mkString("\n  UNION ALL\n")}),
           |sel AS (
           |${(0 until d).map(s =>
              s"  SELECT tok, exact_cnt, $s AS salt, ${bkt(s, "tok")} AS bucket FROM ex")
              .mkString("\n  UNION ALL\n")})
           |SELECT s.tok, MIN(s.exact_cnt) AS exact_cnt, CAST(MIN(b.c) AS BIGINT) AS cms_est
           |FROM sel s JOIN bs b USING (salt, bucket)
           |GROUP BY 1 ORDER BY exact_cnt DESC, tok ASC""".stripMargin)
    },

    // HLL distinct audit (see [[hllDistinct]]): the oracle rebuilds all
    // 256 registers from the same 60-bit md5 hash (top 8 bits bucket,
    // rho = 53 - bitlength of the low 52 bits via bin()), completes the
    // absent registers' 2^53 terms arithmetically, and restates the
    // estimate with the identical alpha/numerator literals — so a
    // single wrong register, a missed empty bucket, or one non-IEEE
    // step breaks the bit compare on the DOUBLE estimate column.
    "q95_hll_distinct" -> {
      val b = 8
      val m = 1 << b
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val numer = m.toDouble * m.toDouble * java.lang.Math.scalb(1.0, 61 - b)
      val bucketDiv = 1L << (60 - b)
      val scale = 1L << (61 - b)
      Q(
        (sp, dir) => hllDistinct(Tables.documents(sp, dir), b),
        s"""WITH t AS (SELECT source, $sqlToks AS tk FROM documents),
           |sh AS (SELECT source, unnest(${TextOps.sqlShingleList("tk")}) AS sh FROM t),
           |h AS (SELECT source, sh, ${TextOps.sqlHash60("hll", "sh")} AS h60 FROM sh),
           |rb AS (SELECT source, h60 // $bucketDiv AS bucket, h60 % $bucketDiv AS rest FROM h),
           |rr AS (SELECT source, bucket,
           |              MAX(CASE WHEN rest = 0 THEN ${60 - b + 1}
           |                       ELSE ${60 - b + 1} - length(bin(rest)) END) AS rho
           |       FROM rb GROUP BY 1, 2),
           |sums AS (SELECT source,
           |                CAST(SUM(1::BIGINT << CAST(${60 - b + 1} - rho AS INTEGER)) AS BIGINT)
           |                  + ($m - COUNT(*)) * $scale AS sum_scaled,
           |                $m - COUNT(*) AS n_zero_regs
           |         FROM rr GROUP BY 1),
           |ex AS (SELECT source, COUNT(DISTINCT sh) AS n_distinct FROM sh GROUP BY 1)
           |SELECT ex.source, ex.n_distinct, s.n_zero_regs,
           |       $alpha * ($numer / CAST(s.sum_scaled AS DOUBLE)) AS hll_est
           |FROM ex JOIN sums s USING (source)
           |ORDER BY ex.source""".stripMargin)
    },

    // Bigram-LM surprisal scoring (see [[lmSurprisal]]): per-doc exact
    // bigram count, summed integer-quantized surprisal under the
    // corpus-trained bigram LM, and the mean as one IEEE division of
    // exact longs. The oracle restates LM training (q91's fragments),
    // the floor-log2 via bin() bit length, and the per-doc fold — a
    // single miscounted bigram anywhere in the LM breaks the compare.
    "q97_lm_surprisal" -> Q(
      (s, d) => lmSurprisal(Tables.documents(s, d)),
      s"""WITH $sqlLmScores
         |SELECT doc_id, n_bigrams, sum_surprisal, mean_surprisal
         |FROM docscore ORDER BY doc_id""".stripMargin),

    // CCNet's percentile band cut (LREC 2020 §4.3 — "head/middle/tail"
    // by LM perplexity thirds), composed over q97's scores with EXACT
    // interpolated tertiles (the q38 percentile/quantile_cont pair,
    // proven hash-equal there). The global percentile runs over the
    // DOC frame — already 4-6 orders smaller than the token explode
    // that feeds it; the 100 TB path swaps in approx_percentile with
    // the identical API (the q59 contract) rather than sorting the doc
    // frame through one reducer.
    "q101_surprisal_bands" -> {
      val (p1, p2) = (1.0 / 3, 2.0 / 3)
      Q(
        (s, d) => {
          val scores = lmSurprisal(Tables.documents(s, d))
          val th = scores.agg(
            expr(s"percentile(mean_surprisal, $p1)").as("t1"),
            expr(s"percentile(mean_surprisal, $p2)").as("t2"))
          // the cut itself is shared with [[surprisalBandsApprox]] —
          // exact and at-scale paths differ ONLY in the threshold agg
          surprisalBandCut(scores, th)
        },
        s"""WITH $sqlLmScores,
           |th AS (SELECT quantile_cont(mean_surprisal, $p1) AS t1,
           |              quantile_cont(mean_surprisal, $p2) AS t2
           |       FROM docscore),
           |b AS (SELECT CASE WHEN mean_surprisal <= t1 THEN 'head'
           |                  WHEN mean_surprisal <= t2 THEN 'middle'
           |                  ELSE 'tail' END AS band,
           |             n_bigrams, mean_surprisal
           |      FROM docscore, th)
           |SELECT band, COUNT(*) AS n_docs, CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
           |       MIN(mean_surprisal) AS min_ms, MAX(mean_surprisal) AS max_ms
           |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // The at-scale CCNet band cut under the oracle (r16 verdict ask
    // #5): [[surprisalBandsApprox]]'s sketch-threshold path — until now
    // spec-gated only (CleaningSpec's rank-error contract) — driven
    // inside a hash-gated row via the q59 device. Each engine computes
    // its OWN approx tertiles (Spark: Greenwald-Khanna at accuracy
    // 10000; DuckDB: t-digest), runs the production band cut over
    // them, and emits (a) threshold-independent exact facts — total
    // docs and bigrams REASSEMBLED FROM THE CUT'S OUTPUT, so a band
    // that lost or double-counted docs breaks the compare even though
    // the per-band split is engine-specific — plus the exact
    // interpolated tertiles, and (b) the q59 containment booleans:
    // this engine's approx threshold must land inside the exact
    // percentile window at p -/+ 2% rank. A sketch outside its error
    // bound, a cut that drops a doc, or a drifted exact tertile all
    // break the hash.
    "q114_surprisal_bands_approx" -> {
      val eps = 0.02
      val (p1, p2) = (1.0 / 3, 2.0 / 3)
      Q(
        (s, d) => {
          val scores = lmSurprisal(Tables.documents(s, d)).persist()
          val thA = surprisalApproxThresholds(scores, accuracy = 10000)
          val totals = surprisalBandCut(scores, thA).agg(
            sum(col("n_docs")).as("n_docs"),
            sum(col("n_bigrams")).as("n_bigrams"))
          val ex = scores.agg(expr(
            s"percentile(mean_surprisal, array(${p1 - eps}, $p1, ${p1 + eps}, ${p2 - eps}, $p2, ${p2 + eps}))")
            .as("ex"))
          totals.crossJoin(broadcast(ex)).crossJoin(broadcast(thA)) // one-row packs
            .select(col("n_docs"), col("n_bigrams"),
              element_at(col("ex"), 2).as("t1_exact"),
              element_at(col("ex"), 5).as("t2_exact"),
              col("t1").between(element_at(col("ex"), 1), element_at(col("ex"), 3)).as("t1_ok"),
              col("t2").between(element_at(col("ex"), 4), element_at(col("ex"), 6)).as("t2_ok"))
        },
        s"""WITH $sqlLmScores,
           |ta AS (SELECT approx_quantile(mean_surprisal, $p1) AS t1,
           |              approx_quantile(mean_surprisal, $p2) AS t2
           |       FROM docscore),
           |cut AS (SELECT CASE WHEN mean_surprisal <= t1 THEN 'head'
           |                    WHEN mean_surprisal <= t2 THEN 'middle'
           |                    ELSE 'tail' END AS band,
           |               n_bigrams
           |        FROM docscore, ta),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           |               CAST(SUM(nb) AS BIGINT) AS n_bigrams
           |        FROM (SELECT band, COUNT(*) AS n, SUM(n_bigrams) AS nb
           |              FROM cut GROUP BY 1) z),
           |ex AS (SELECT quantile_cont(mean_surprisal, ${p1 - eps}) AS e1lo,
           |              quantile_cont(mean_surprisal, $p1) AS e1,
           |              quantile_cont(mean_surprisal, ${p1 + eps}) AS e1hi,
           |              quantile_cont(mean_surprisal, ${p2 - eps}) AS e2lo,
           |              quantile_cont(mean_surprisal, $p2) AS e2,
           |              quantile_cont(mean_surprisal, ${p2 + eps}) AS e2hi
           |       FROM docscore)
           |SELECT tot.n_docs, tot.n_bigrams, ex.e1 AS t1_exact, ex.e2 AS t2_exact,
           |       ta.t1 BETWEEN ex.e1lo AND ex.e1hi AS t1_ok,
           |       ta.t2 BETWEEN ex.e2lo AND ex.e2hi AS t2_ok
           |FROM tot, ta, ex""".stripMargin)
    },

    // Quantized TF-IDF (see [[tfidfTopTerms]]): the oracle restates tf,
    // doc-frequency, the bin() idf quantization, and the k-cut under the
    // (score DESC, term ASC) total order — top-5 per source. The engine
    // cut is the bounded per-source heap (the window form would funnel
    // the whole vocabulary through ~|sources| sort tasks); the oracle
    // states the same cut as a window because DuckDB's optimizer, not
    // this engine, owns that plan.
    "q102_tfidf_terms" -> Q(
      (s, d) => tfidfTopTerms(Tables.documents(s, d), 5),
      s"""WITH tk AS (SELECT source, doc_id, unnest($sqlToks) AS term FROM documents),
         |tf AS (SELECT source, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(*) AS df
         |        FROM (SELECT DISTINCT doc_id, term FROM tk) GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |sc AS (
         |  SELECT tf.source, tf.term, tf.tf, dfq.df,
         |         CAST(length(bin(n.n_docs // dfq.df)) - 1 AS BIGINT) AS qidf,
         |         tf.tf * CAST(length(bin(n.n_docs // dfq.df)) - 1 AS BIGINT) AS score
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY source
         |                                   ORDER BY score DESC, term ASC) AS rk
         |      FROM sc)
         |SELECT source, term, tf, df, qidf, score, CAST(rk AS INTEGER) AS rk
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin),

    // Full BPE tokenizer training under the oracle (see [[bpeTrain]]):
    // the driver loop whose single step q90 pins, run 24 merges deep.
    // EVERY row is a data-dependent argmax over the state every prior
    // merge rewrote — the three SFs produce entirely different merge
    // tables from step ~6 on. The oracle replays the trainer as a
    // recursive CTE whose working row is the whole bracket-encoded
    // vocabulary (one list of (enc, wn) structs): per step, the SAME
    // (count DESC, pair ASC) argmax over per-position pairs, then ONE
    // string replace per word — both engines' `replace` scans
    // left-to-right non-overlapping, which IS Sennrich's merge rule,
    // and the per-symbol brackets make the match exact (no shared
    // delimiters between adjacent occurrences). A wrong count anywhere
    // (overlap handling, the tie order, a merge that leaked across
    // symbol boundaries) diverges the merge table from that step on.
    "q108_bpe_train" -> Q(
      // NOT wrapped in withAqeOff (measured, r21: 2.92 -> 3.24 s with
      // AQE off — the vocab-frame sweeps benefit from coalescing)
      (s, d) => bpeTrain(Tables.documents(s, d), maxMerges = 24, minCount = 2L)
        .orderBy(col("step")),
      s"""WITH RECURSIVE
         |$sqlBpeIt
         |SELECT CAST(i AS INTEGER) AS step, s1, s2, n
         |FROM it WHERE i >= 1 ORDER BY step""".stripMargin),

    // Tokenizer APPLICATION + compression accounting (see [[bpeEncode]]):
    // train q108's merge table, replay it over the corpus vocabulary,
    // and account per source — total word occurrences, the
    // character-symbol baseline, the post-merge BPE token count, and
    // the compression ratio (one IEEE division of exact longs). The
    // oracle shares q108's recursive trainer verbatim (the
    // sqlSigCtesFrom drift-prevention rule) and reads the final
    // state's encodings back per word: the TRAINER's end state IS the
    // 24-merge replay for every trainable word, and untrainable words
    // (single-char; bracket-containing, none in this data) fall back
    // to their character count on both engines. A single wrong merge
    // ANYWHERE in training shifts some source's token count.
    "q109_bpe_encode" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = bpeTrain(docs, maxMerges = 24, minCount = 2L)
          .orderBy(col("step")).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        bpeEncode(docs, merges).orderBy(col("source"))
      },
      s"""WITH RECURSIVE
         |$sqlBpeIt,
         |fin AS (SELECT st FROM it ORDER BY i DESC LIMIT 1),
         |venc AS (
         |  SELECT u.w AS word,
         |         CAST(len(string_split(substring(u.e, 2, length(u.e) - 2),
         |                               chr(2) || chr(1))) AS BIGINT) AS n_syms
         |  FROM fin, unnest(fin.st) AS t(u)),
         |sw AS (
         |  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT source, unnest($sqlToks) AS word FROM documents)
         |  GROUP BY 1, 2)
         |SELECT sw.source,
         |       CAST(SUM(sw.cnt) AS BIGINT) AS n_words,
         |       CAST(SUM(length(sw.word) * sw.cnt) AS BIGINT) AS n_chars,
         |       CAST(SUM(COALESCE(v.n_syms, length(sw.word)) * sw.cnt) AS BIGINT)
         |         AS n_bpe_tokens,
         |       CAST(SUM(COALESCE(v.n_syms, length(sw.word)) * sw.cnt) AS DOUBLE)
         |         / CAST(SUM(length(sw.word) * sw.cnt) AS DOUBLE) AS compression
         |FROM sw LEFT JOIN venc v ON v.word = sw.word
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** q108's recursive BPE trainer as a reusable CTE block ending in
    * `it` (i, st, s1, s2, n) — the state carries (w := original word,
    * e := bracket-encoded symbols, wn := count) so composing oracles
    * (q109) can read the final encodings back per word. Stated ONCE,
    * the sqlSigCtesFrom rule. */
  private def sqlBpeIt: String =
    s"""w AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wn
       |  FROM (SELECT unnest($sqlToks) AS word FROM documents)
       |  GROUP BY 1
       |  HAVING length(word) > 1
       |     AND NOT contains(word, chr(1)) AND NOT contains(word, chr(2))),
       |enc0 AS (
       |  SELECT list(struct_pack(
       |           w := word,
       |           e := chr(1) || array_to_string(str_split(word, ''), chr(2) || chr(1)) || chr(2),
       |           wn := wn) ORDER BY word) AS st
       |  FROM w),
       |it AS (
       |  SELECT 0 AS i, st,
       |         CAST(NULL AS VARCHAR) AS s1, CAST(NULL AS VARCHAR) AS s2,
       |         CAST(NULL AS BIGINT) AS n
       |  FROM enc0
       |  UNION ALL
       |  SELECT i + 1,
       |         list_transform(st, r -> struct_pack(
       |           w := r.w,
       |           e := replace(r.e,
       |                        chr(1) || b.s1 || chr(2) || chr(1) || b.s2 || chr(2),
       |                        chr(1) || b.s1 || b.s2 || chr(2)),
       |           wn := r.wn)),
       |         b.s1, b.s2, b.n
       |  FROM (
       |    SELECT i, st,
       |      (SELECT struct_pack(s1 := q.s1, s2 := q.s2, n := q.n) FROM (
       |         SELECT p.s1, p.s2, CAST(SUM(p.wn) AS BIGINT) AS n FROM (
       |           SELECT syms[k] AS s1, syms[k + 1] AS s2, wn FROM (
       |             SELECT syms, wn, unnest(range(1, len(syms))) AS k
       |             FROM (SELECT string_split(substring(u.e, 2, length(u.e) - 2),
       |                                       chr(2) || chr(1)) AS syms,
       |                          u.wn AS wn
       |                   FROM unnest(it.st) AS t(u)))) p
       |         GROUP BY 1, 2) q
       |       ORDER BY q.n DESC, q.s1, q.s2 LIMIT 1) AS b
       |    FROM it) z
       |  WHERE b.n >= 2 AND i < 24
       |)""".stripMargin

  /** [[lmSurprisal]]'s oracle chain as a reusable CTE block ending in
    * `docscore` (doc_id, n_bigrams, sum_surprisal, mean_surprisal) —
    * shared by q97 and q101 so the LM restatement cannot drift. */
  private def sqlLmScores: String =
    s"""t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
       |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
       |              i -> {'w1': tk[i], 'w2': tk[i+1]})) AS b
       |       FROM t WHERE len(tk) >= 2),
       |bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
       |lm AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM bb GROUP BY 1, 2),
       |lm2 AS (SELECT w1, w2, n_pair,
       |               CAST(SUM(n_pair) OVER (PARTITION BY w1) AS BIGINT) AS n_ctx
       |        FROM lm),
       |sc AS (SELECT bb.doc_id,
       |              CAST(length(bin(n_ctx // n_pair)) - 1 AS BIGINT) AS s
       |       FROM bb JOIN lm2 USING (w1, w2)),
       |docscore AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(s) AS BIGINT) AS sum_surprisal,
       |         CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_surprisal
       |  FROM sc GROUP BY 1)""".stripMargin
}
