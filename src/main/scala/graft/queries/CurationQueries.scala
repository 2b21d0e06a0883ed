package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{CacheScope, Parity, Tables}
import graft.ext.TextOps

/** Corpus-curation operators beyond dedup: deterministic dataset
  * splitting, sequence-packing accounting, and benchmark
  * decontamination — the remaining steps a training-data pipeline runs
  * between "deduped corpus" and "training batches".
  *
  * Everything here is integer/string arithmetic (md5 buckets, token
  * counts, cumulative sums), so results are bit-identical across
  * engines and partitionings with no decimal folding needed.
  */
object CurationQueries {

  /** Context length for the packing plan (tokens per training chunk). */
  private val chunk = 512
  /** Shared-shingle threshold for contamination flagging. */
  private val contamK = 5
  /** Per-source token budget for the mixture selection (q64) — sized so
    * the sf0.01 oracle keeps a strict, non-trivial subset per source. */
  private val tokenBudget = 600L
  /** GLOBAL token budget for the temperature-smoothed domain mixture
    * (q88) — ~45% of the sf0.01 corpus, so every source's allocation
    * cuts a real quality tail and the largest-remainder +1s are
    * exercised. */
  private val mixBudget = 12000L
  /** Global token budget for the UniMax allocation (q92) — ~96% of the
    * sf0.01 corpus at maxEpochs = 1, calibrated so the waterline lands
    * MID-corpus: the ~9 smallest sources saturate their 1-epoch cap
    * (keep everything) while the rest take the uniform share and cut a
    * real quality tail — both allocator branches exercised. */
  private val unimaxBudget = 26000L
  /** q100's UniMax budget over the CURATED corpus (25,845 tokens at
    * sf0.01 after q37's three stages) — ~95%, waterline mid-corpus
    * again so both allocator branches stay exercised post-curation. */
  private val recipeBudget = 24500L
  /** Sliding-window chunking (q65): window length / stride in tokens —
    * sized to the synthetic docs (~50 tokens) so most docs emit several
    * overlapping windows; a production caller would use e.g. 2048/1536. */
  private val winLen = 16
  private val winStride = 12
  /** Bloom geometry for q94 — 8192 shared bits / 3 salts over the
    * benchmark's ~1.25k distinct shingle hashes at sf0.01 ⇒ ~37% of
    * bits set and a ~5% false-positive tail on corpus shingles, so the
    * pre-filter demonstrably prunes (~95%) AND the FP accounting is
    * non-trivially exercised. */
  private val bloomBits = 8192
  private val bloomSalts = 3
  /** Blocklist for q66 — hits both match branches: dom1/dom3 via the
    * subdomain suffix, cdn2.net via the exact host. (Declared before
    * `defs`: the oracle SQL interpolates it EAGERLY at map build.) */
  private val blockedDomains = Seq("dom1.example.com", "dom3.example.com", "cdn2.net")
  /** A bigram is corpus-rare (q68) when its occurrence count is at or
    * below this. */
  private val rareMaxCount = 2
  /** q73 DSIR importance scoring: hashed-gram feature-bucket count and
    * the target-slice quality floor (high-quality English — the
    * "trusted corpus" a DSIR selection resamples toward; ~30% of the
    * synthetic corpus at every sf, so both the target and its
    * complement stay populated). */
  private val dsirBuckets = 4096L
  private val dsirTargetQuality = 0.6
  /** q74 rule-filter battery: the Gopher stop-word inventory (Rae et
    * al., arXiv:2112.11446, Table A1). The published gate is ">= 2 of
    * these present"; the synthetic vocabulary carries only "the" from
    * this set, so the gate here is >= 1 — the corpus-adapted threshold
    * that keeps the rule non-vacuous (78% pass / 22% fail at sf0.001)
    * instead of rejecting every document. */
  private val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
  /** q74 injection tails — the synthetic corpus is clean word soup
    * (no symbols, newlines, braces, or boilerplate at any sf), so the
    * query wrapper plants one deterministic defect class per
    * doc_id % 7 residue, the q61/q66 pattern that makes every rule's
    * oracle non-vacuous. Sizes are chosen against the corpus envelope
    * (10..99 words/doc): 13 symbol tokens push symbol_ratio past 0.1
    * even at 99 words; 30 30-char words push mean word length past 10
    * even against 99 short words; 30 digit tokens pull the alphabetic
    * fraction under 0.8 even at 99 words. */
  private val symbolTail = " # # # # # # # # # # # # ..."
  private val loremTail = " lorem ipsum dolor sit amet"
  private val braceTail = " config { \"retries\": 3 }"
  private val longWordTail = Seq.fill(30)("pneumonoultramicroscopicsilico").mkString(" ")
  private val digitTail = Seq.fill(30)("12345").mkString(" ")
  /** q71 span-dedup knobs: gram length k = 5 (spans shorter than 5
    * tokens are phrase-level noise, not boilerplate) and cross-doc
    * df >= 2 (any span shared verbatim by two documents is suspect).
    * The synthetic corpus draws from a small vocabulary, so 5-gram
    * collisions occur naturally at every sf (measured sf0.01: 71/500
    * docs lose tokens, 24 fully covered; sf0.1: 2064/5000 and 252) —
    * no injection needed, and the populations (untouched / partially
    * excised / fully wiped) all exist at every scale. */
  private val spanK = 5
  private val spanMinDf = 2L

  /** Exchange sizing for [[dedupRepeatedSpans]]' corpus-wide aggregates
    * (the lshPairsOf occupancy-window pattern): positional grams explode
    * to ~one row per corpus token, and a session-default shuffle (32
    * partitions at bench config) puts the WHOLE per-partition slice of
    * that exploded table through one hash-aggregate task — at the r13
    * 3000× soak (15M docs, ~1.5B gram rows) that is ~47M rows per task
    * and the spill-merge's read-ahead buffers OOM'd the 8 g heap. Above
    * the plan-estimate gate, one narrow count job sizes the exchanges to
    * ~4M gram rows (~110 MB) per task — hash maps and merges stay in
    * memory at any corpus size; below it the session default is provably
    * fine and no job runs. */
  private val SpanGramRowsPerPartition = 4L << 20
  private val SpanSmallCorpusBytesPerPartition = 8L << 20

  private def numShufflePartitions(s: org.apache.spark.sql.SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions", "32").toInt
  /** q69 staged-pipeline knobs. minDf: q63's 30. Quality floor 0.6:
    * the raw corpus's quality distribution has ~27% of docs below it
    * (measured at sf0.01), so the floor drops a robust nonzero band at
    * any sf — the default 0.5 floor sits under the distribution's min
    * once the injected URL line nudges scores up. Rarity ceiling 0.5:
    * the injected gibberish docs score ~1.0 (every bigram unique in
    * the corpus) while natural docs stay under ~0.15 even with the
    * rare URL-token bigrams, so the ceiling separates the two
    * populations with wide margin at every scale. Budget 400: keeps a
    * strict, non-trivial per-source subset at sf0.01 (q64's device). */
  /** q79 Gopher repetition ceilings (Rae et al., arXiv:2112.11446,
    * Table A1): documents above any are dropped. */
  private val dupLineMax = 0.30
  private val dupParaMax = 0.30
  private val dupLineCharMax = 0.20
  private val dupParaCharMax = 0.20
  private val topGramMax = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  private val dupGramMax = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
    8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
  /** q79 injection tails (q74's device — the synthetic corpus has no
    * within-doc repetition at any sf, so each doc_id % 6 residue
    * plants one repetition class, zz-prefixed so injected vocabulary
    * never collides with corpus words; sizes chosen against the
    * 10..99-words/doc envelope so the designated gate trips even for
    * the longest docs — a class may trip NEIGHBORING gates of the
    * same family too (duplicated paragraphs duplicate their lines;
    * a period-5 repeated span duplicates its 6..10-grams), which is
    * the real behavior of the published battery, not a defect). */
  private val dupLineTail =
    "\nzzline repeated verbatim today\nzzline repeated verbatim today\nzzline repeated verbatim today"
  private val dupParaTail =
    "\n\nzzpara rights reserved worldwide notice\n\nzzpara rights reserved worldwide notice"
  private val topGramTail = " " + Seq.fill(40)("zzclick zzhere").mkString(" ")
  private val dupFiveTail = " " + Seq.fill(6)("zzaa zzbb zzcc zzdd zzee").mkString(" ")
  private val dupTenTail =
    " " + Seq.fill(4)("zzp zzq zzr zzs zzt zzu zzv zzw zzx zzy").mkString(" ")
  /** Tail as a DuckDB string literal (newlines via chr(10) — a raw
    * newline inside the interpolated oracle SQL would survive but
    * reads as an accident; this states the byte). */
  private def sqlLit(s: String): String =
    "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

  /** q78 semantic-stage cosine threshold. Lower than q72/q76/q77's
    * pure-embedding 0.45: the stage sees only TEXT-dedup survivors, so
    * the densest embedding near-dups (which co-occur with exact/near
    * text replicas in the synthetic corpus) are already gone — 0.35
    * keeps a non-trivial drop population among the survivors at every
    * sf, so the oracle distinguishes the stage from a no-op. */
  private val semStageTau = 0.35
  private val stageMinDf = 30L
  private val stageQualityFloor = 0.6
  private val stageMaxRarity = 0.5
  private val stageBudget = 400L

  /** q96/q103 PageRank mass scale — unscaled-long rank arithmetic at
    * 1e12 ≡ mass 1.0 (overflow bound: scale·n < 2^63, see
    * [[graft.ext.Graph.pageRank]]). */
  private val prScale = 1000000000000L
  /** The q96/q103 synthetic host graph, stated ONCE for both engines
    * (sqlSigCtesFrom's drift-prevention rule): each doc injects one
    * deterministic edge h(doc_id % 7) -> h((doc_id%101)²+3 mod 11),
    * whose quadratic-residue image leaves h7/h8 dangling and
    * h0/h2/h5 uncited — both structural edge cases at every sf. */
  private val hostEdgeSrcSql = "'h' || CAST(doc_id % 7 AS VARCHAR)"
  private val hostEdgeDstSql =
    "'h' || CAST(((doc_id % 101) * (doc_id % 101) + 3) % 11 AS VARCHAR)"
  private def hostEdges(s: org.apache.spark.sql.SparkSession,
                        d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d).select(
      concat(lit("h"), (col("doc_id") % 7).cast("string")).as("src"),
      concat(lit("h"),
        (((col("doc_id") % 101) * (col("doc_id") % 101) + 3) % 11).cast("string")).as("dst"))

  val defs: Map[String, Q] = Map(

    // Deterministic train/val/test split: first md5 byte of the doc id
    // buckets every row into 256 cells, split at 205/230 (~80/10/10).
    // Hash-based (not random, not row_number) so the assignment is
    // stable under reruns, repartitioning, and corpus growth — the only
    // split that is reproducible on a cluster. Accounting per (lang,
    // split) closes the query.
    "q52_train_split" -> Q(
      (s, d) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int")
        Tables.documents(s, d)
          .withColumn("split",
            when(bucket < 205, "train").when(bucket < 230, "val").otherwise("test"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"), col("split"))
      },
      """SELECT lang,
        |       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER < 205 THEN 'train'
        |            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER < 230 THEN 'val'
        |            ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Sequence-packing plan: concatenate each language's docs in
    // deterministic (doc_id) order and cut at the context length — the
    // standard pretraining packing. Each doc's [start, end) token span is
    // a running sum in (lang, doc_id) order, computed as a DISTRIBUTED
    // prefix-sum: range-partition by (lang, doc_id) into shards, cumsum
    // inside each shard (one bounded sort per shard, parallelism =
    // #shards), then add each shard's exclusive-prefix offset back via a
    // broadcast of the tiny (shard, lang, offset) table. Result-identical
    // to a global per-lang window for ANY order-respecting sharding, but
    // with ~5 languages and a 100 TB corpus a lang-partitioned window is
    // 5 single-reducer sorts — this shape never builds a partition larger
    // than corpus/#shards (PlanAuditSpec pins it).
    "q53_packing_plan" -> Q(
      (s, d) => packingSpans(Tables.documents(s, d))
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(when(expr(s"(end_tok - 1) div $chunk") >
            expr(s"(end_tok - n_tok) div $chunk"), 1).otherwise(0)).as("n_split_docs"))
        .withColumn("n_chunks", expr(s"(total_tokens + ${chunk - 1}) div $chunk"))
        .select(col("lang"), col("n_docs"), col("total_tokens"),
          col("n_chunks"), col("n_split_docs"))
        .orderBy(col("lang")),
      s"""WITH dt AS (
         |  SELECT lang, doc_id, CAST(len(${TextOps.sqlTokens("text")}) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT lang, n_tok,
         |         SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
         |  FROM dt WHERE n_tok > 0)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |       CAST((CAST(SUM(n_tok) AS BIGINT) + ${chunk - 1}) // $chunk AS BIGINT) AS n_chunks,
         |       CAST(SUM(CASE WHEN (end_tok - 1) // $chunk > (end_tok - n_tok) // $chunk
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),

    // Repetition quality signal (the Gopher-style duplicate-n-gram
    // filter): per doc, the fraction of bigram occurrences whose bigram
    // appears more than once in that doc — high values mean boilerplate
    // / looping text a pretraining corpus should drop. Per-doc stats
    // never need to leave the row: the compiled RepetitionStats kernel
    // counts duplicate bigrams in one pass, so the ONLY shuffle is the
    // tiny per-lang aggregate (vs exploding corpus-sized (doc, gram)
    // rows through two aggregations). The cheap size(tokens)>=2
    // pre-filter matches the kernel's null condition, keeping the
    // kernel out of pushed-down predicates; the repetitive-doc
    // threshold is integer arithmetic (rep*2 > total), no float edge.
    "q55_repetition_stats" -> Q(
      (s, d) => {
        val perDoc = Tables.documents(s, d)
          .where(size(TextOps.tokens(col("text"))) >= 2)
          .withColumn("rs", graft.expressions.Exprs.repetitionStats(col("text")))
          .select(col("lang"), col("rs.total").as("total"), col("rs.rep").as("rep"))
        perDoc.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          Parity.davg12((col("rep") / col("total")).cast("double")).as("avg_rep_frac"),
          sum(when(col("rep") * 2 > col("total"), 1).otherwise(0)).as("n_repetitive"))
          .orderBy(col("lang"))
      },
      s"""WITH t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
         |g AS (SELECT doc_id, lang,
         |             unnest(list_transform(range(1, len(toks)),
         |               i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i + 1 AS INTEGER)])) AS gram
         |      FROM t WHERE len(toks) >= 2),
         |c AS (SELECT doc_id, lang, gram, COUNT(*) AS n FROM g GROUP BY 1, 2, 3),
         |d AS (SELECT doc_id, lang, SUM(n) AS total,
         |             SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS rep
         |      FROM c GROUP BY 1, 2)
         |SELECT lang, COUNT(*) AS n_docs,
         |       ${Parity.sqlDavg12("CAST(rep AS DOUBLE) / CAST(total AS DOUBLE)")} AS avg_rep_frac,
         |       CAST(SUM(CASE WHEN rep * 2 > total THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),

    // Deterministic stratified sampling — the data-mixture weighting
    // step (downsample over-represented languages before training).
    // Same md5-bucket device as q52: a per-lang keep-rate out of 256
    // cells makes the sample stable under reruns, repartitioning, and
    // corpus growth; the operator is a narrow filter (no shuffle until
    // the accounting aggregate), so it costs a scan at any corpus size.
    "q56_stratified_sample" -> Q(
      (s, d) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int")
        val rate = when(col("lang") === "en", 205)
          .when(col("lang") === "zh", 128)
          .otherwise(64)
        Tables.documents(s, d)
          .withColumn("kept", when(bucket < rate, 1).otherwise(0))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(col("kept")).as("n_kept"),
            sum(col("kept") * col("n_chars")).as("kept_chars"))
          .orderBy(col("lang"))
      },
      """WITH k AS (
        |  SELECT lang, n_chars,
        |         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER <
        |                   (CASE WHEN lang = 'en' THEN 205 WHEN lang = 'zh' THEN 128 ELSE 64 END)
        |              THEN 1 ELSE 0 END AS kept
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total, CAST(SUM(kept) AS BIGINT) AS n_kept,
        |       CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin),

    // Benchmark decontamination: flag corpus docs sharing >= K distinct
    // shingle hashes with ANY doc of the held-out source ('src0' stands
    // in for the eval benchmark). The benchmark's inverted index is the
    // small side and broadcasts — the corpus never shuffles for the
    // probe, which is what makes decontamination affordable at 100 TB
    // (benchmarks are tiny; the corpus is not).
    "q54_decontamination" -> Q(
      (s, d) => {
        // no null filter needed: explode drops null arrays, so the
        // shingle kernel runs exactly once per row in the projection
        val idx = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            graft.expressions.Exprs.shingleHashes(col("text")).as("hs"))
          .select(col("doc_id"), col("source"), explode(col("hs")).as("h"))
        val bench = idx.where(col("source") === "src0")
          .select(col("doc_id").as("bid"), col("h"))
        val corpus = idx.where(col("source") =!= "src0")
        val flagged = corpus.join(broadcast(bench), Seq("h"))
          .groupBy(col("doc_id"), col("bid")).agg(count(lit(1)).as("n_shared"))
          .where(col("n_shared") >= contamK)
          .select(col("doc_id").as("fid")).distinct()
        Tables.documents(s, d).where(col("source") =!= "src0")
          .join(flagged, col("doc_id") === col("fid"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), count(col("fid")).as("n_flagged"))
          .orderBy(col("source"))
      },
      s"""WITH t AS (SELECT doc_id, source, $sqlToks AS tk FROM documents),
         |s2 AS (SELECT doc_id, source, ${TextOps.sqlShingleList("tk")} AS sh FROM t),
         |hs AS (SELECT doc_id, source,
         |              unnest(list_transform(sh, x -> ('0x' || substr(md5('g:' || x), 1, 15))::BIGINT)) AS h
         |       FROM s2 WHERE len(sh) > 0),
         |flags AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id AS doc_id, b.doc_id AS bid, COUNT(*) AS n_shared
         |    FROM hs c JOIN hs b ON c.h = b.h AND b.source = 'src0' AND c.source <> 'src0'
         |    GROUP BY 1, 2) z
         |  WHERE n_shared >= $contamK)
         |SELECT d.source, COUNT(*) AS n_docs, COUNT(f.doc_id) AS n_flagged
         |FROM documents d LEFT JOIN flags f ON d.doc_id = f.doc_id
         |WHERE d.source <> 'src0'
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Bloom-prefiltered decontamination (see [[bloomDecontaminate]]):
    // the broadcast-bitset pre-filter in front of q54's exact confirm.
    // The oracle restates the bitset as the DISTINCT position set over
    // the benchmark's shingle hashes under ALL k salts — ONE shared bit
    // space, the classic Bloom layout BloomAgg implements (a
    // salt-partitioned restatement under-counts false positives; the
    // first cut of this oracle made exactly that mistake) — and keeps
    // the probe ROW-aligned with the engine (k correlated membership
    // tests per shingle row, no row-collapsing group-by), so candidate
    // counts, true-hit counts, and the false-positive gap between them
    // are pinned exactly per source.
    "q94_bloom_decontamination" -> {
      def pos(s: Int, e: String) = s"((${TextOps.sqlSaltedHash(s, e)}) % $bloomBits)"
      Q(
        (sp, dir) => bloomDecontaminate(Tables.documents(sp, dir), bloomBits, bloomSalts),
        s"""WITH t AS (SELECT doc_id, source, $sqlToks AS tk FROM documents),
           |s2 AS (SELECT doc_id, source, ${TextOps.sqlShingleList("tk")} AS sh FROM t),
           |hs AS (SELECT doc_id, source,
           |              unnest(list_transform(sh, x -> ('0x' || substr(md5('g:' || x), 1, 15))::BIGINT)) AS h
           |       FROM s2 WHERE len(sh) > 0),
           |bbits AS (SELECT DISTINCT pos FROM (
           |${(0 until bloomSalts).map(s =>
              s"  SELECT ${pos(s, "CAST(h AS VARCHAR)")} AS pos FROM hs WHERE source = 'src0'")
              .mkString("\n  UNION ALL\n")})),
           |probe AS (
           |  SELECT source, h,
           |${(0 until bloomSalts).map(s =>
              s"         ${pos(s, "CAST(h AS VARCHAR)")} AS p$s").mkString(",\n")}
           |  FROM hs WHERE source <> 'src0'),
           |cand AS (
           |  SELECT source, h FROM probe
           |  WHERE ${(0 until bloomSalts).map(s =>
                s"EXISTS (SELECT 1 FROM bbits WHERE pos = p$s)")
                .mkString("\n    AND ")}),
           |ben AS (SELECT DISTINCT h FROM hs WHERE source = 'src0'),
           |conf AS (
           |  SELECT c.source, COUNT(*) AS n_candidates,
           |         CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true_hits
           |  FROM cand c LEFT JOIN ben b USING (h) GROUP BY 1),
           |tot AS (SELECT source, COUNT(*) AS n_shingles FROM hs WHERE source <> 'src0' GROUP BY 1)
           |SELECT tot.source, tot.n_shingles,
           |       COALESCE(conf.n_candidates, 0) AS n_candidates,
           |       COALESCE(conf.n_true_hits, 0) AS n_true_hits
           |FROM tot LEFT JOIN conf USING (source)
           |ORDER BY tot.source""".stripMargin)
    },

    // Deterministic interleave manifest (see [[interleaveManifest]]):
    // the quantized Bresenham stride keys and the contiguous global
    // position both restate exactly — the oracle uses plain windows
    // (single-node), the engine the sharded prefix-counts, and the
    // hash compare proves them row-identical.
    "q99_interleave_manifest" -> Q(
      (s, d) => interleaveManifest(Tables.documents(s, d)),
      s"""WITH b AS (SELECT source, doc_id FROM documents),
         |j AS (SELECT source, doc_id,
         |             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS j
         |      FROM b),
         |ns AS (SELECT source, COUNT(*) AS ns FROM b GROUP BY 1),
         |k AS (SELECT j.source, j.doc_id,
         |             ((2 * j.j - 1) * ${1L << 40}) // ns.ns AS k
         |      FROM j JOIN ns USING (source))
         |SELECT row_number() OVER (ORDER BY k, source, doc_id) AS pos,
         |       source, doc_id, k
         |FROM k ORDER BY pos""".stripMargin),

    // The composed pretraining recipe (q100): q37's curated corpus
    // (exact dedup -> near-dup removal -> quality floor) feeds the
    // UniMax allocator (q92), whose selected docs feed the interleave
    // manifest (q99) — corpus to training order in one oracle-gated
    // chain, the composition pattern of q69/q77/q78. The oracle
    // composes q37's curation CTEs, the shared sqlUnimax block, and
    // q99's stride-key manifest; per-source accounting pins curated
    // counts, allocator state on both branches, selected tokens, and
    // the manifest's first/last positions (the interleave evidence:
    // every source's selections span nearly the whole order).
    "q100_pretraining_recipe" -> Q(
      (s, d) => {
        // pinned NARROW (r22, prove-or-revert of r21's wide persist):
        // the curated chain is consumed twice (the allocator's scoring
        // pass and the per-source curated counts), but both consumers
        // only need (source, doc_id, n_tok, quality) — the same scored
        // projection unimaxSelect pins internally anyway. Persisting
        // THAT (instead of the text-bearing curated frame, r21's form,
        // which was the 8c driver run's worst reading) runs the
        // exact-dedup -> banded-LSH -> quality chain once and caches 4
        // scalar columns instead of the corpus text. Row-identical for
        // the counts: every curated doc has n_tok > 0 (the quality
        // floor ran), so withQuality's zero-token filter drops nothing.
        // Released by the harness clearCache like every untracked-scope
        // persist in this registry.
        val scored = TextQueries.withQuality(TextQueries.curatedDocs(s, d))
          .select(col("source"), col("doc_id"),
            col("n_tok").cast("long").as("n_tok"), col("quality"))
          .persist()
        val sel = unimaxSelectScored(scored, recipeBudget)
        val mani = interleaveManifest(sel.select(col("source"), col("doc_id")))
        val perCur = scored.groupBy(col("source")).agg(count(lit(1)).as("n_curated"))
        val perSel = sel.groupBy(col("source")).agg(
          min(col("tot_tokens")).as("tot_tokens"),
          min(col("cap_tokens")).as("cap_tokens"),
          min(col("capped").cast("long")).as("capped"),
          min(col("target_tokens")).as("target_tokens"),
          count(lit(1)).as("n_selected"),
          sum(col("n_tok")).as("tokens_selected"))
        val perMani = mani.groupBy(col("source")).agg(
          min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"))
        perCur.join(perSel, Seq("source")).join(perMani, Seq("source"))
          .orderBy(col("source"))
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
         |    AND q.quality >= 0.5e0),
         |${sqlUnimax("cur", recipeBudget)},
         |jj AS (SELECT source, doc_id,
         |              row_number() OVER (PARTITION BY source ORDER BY doc_id) AS j
         |       FROM sel),
         |nsel AS (SELECT source, COUNT(*) AS ns FROM sel GROUP BY 1),
         |kk AS (SELECT jj.source, jj.doc_id,
         |              ((2 * jj.j - 1) * ${1L << 40}) // nsel.ns AS k
         |       FROM jj JOIN nsel USING (source)),
         |mani AS (SELECT row_number() OVER (ORDER BY k, source, doc_id) AS pos, source
         |         FROM kk),
         |mm AS (SELECT source, MIN(pos) AS first_pos, MAX(pos) AS last_pos
         |       FROM mani GROUP BY 1),
         |nc AS (SELECT source, COUNT(*) AS n_curated FROM cur GROUP BY 1),
         |ps AS (SELECT source, MIN(tot) AS tot_tokens, MIN(cap) AS cap_tokens,
         |              CAST(MIN(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS capped,
         |              MIN(alloc) AS target_tokens, COUNT(*) AS n_selected,
         |              CAST(SUM(n_tok) AS BIGINT) AS tokens_selected
         |       FROM sel GROUP BY 1)
         |SELECT nc.source, nc.n_curated, ps.tot_tokens, ps.cap_tokens, ps.capped,
         |       ps.target_tokens, ps.n_selected, ps.tokens_selected,
         |       mm.first_pos, mm.last_pos
         |FROM nc JOIN ps USING (source) JOIN mm USING (source)
         |ORDER BY nc.source""".stripMargin),

    // Host-graph PageRank (see [[graft.ext.Graph.pageRank]]): the
    // host-level quality rank web-corpus filters consume (a hyperlink
    // centrality prior next to q66's blocklist). The testdata carries
    // no links, so — the q61/q66 device — each doc injects one
    // deterministic edge h(doc_id % 7) -> h((doc_id%101)²+3 mod 11),
    // whose quadratic-residue image leaves h7/h8 DANGLING (out-deg 0,
    // mass dropped) and h0/h2/h5 uncited (in-deg 0, base rank only) —
    // both structural edge cases live at every sf. Three unrolled
    // integer sweeps; the oracle restates them as a CTE chain, so one
    // wrong floor division in any sweep breaks the compare.
    "q96_host_pagerank" -> {
      val prIters = 3
      val sweeps = (1 to prIters).map { k =>
        s"""c$k AS (SELECT e.dst AS node, CAST(SUM(r.rank // o.odeg) AS BIGINT) AS c
           |        FROM e JOIN od o USING (src) JOIN r${k - 1} r ON r.node = e.src GROUP BY 1),
           |r$k AS (SELECT n.node,
           |               (SELECT (15 * ($prScale // n)) // 100 FROM nn)
           |                 + (85 * COALESCE(c$k.c, 0)) // 100 AS rank
           |        FROM nodes n LEFT JOIN c$k USING (node))""".stripMargin
      }.mkString(",\n")
      Q(
        (s, d) => graft.ext.Graph.pageRank(hostEdges(s, d), prIters, prScale),
        s"""WITH e AS (
           |  SELECT DISTINCT $hostEdgeSrcSql AS src, $hostEdgeDstSql AS dst
           |  FROM documents WHERE $hostEdgeSrcSql <> $hostEdgeDstSql),
           |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |od AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY 1),
           |ideg AS (SELECT dst, COUNT(*) AS ideg FROM e GROUP BY 1),
           |nn AS (SELECT COUNT(*) AS n FROM nodes),
           |r0 AS (SELECT node, (SELECT $prScale // n FROM nn) AS rank FROM nodes),
           |$sweeps
           |SELECT n.node, COALESCE(o.odeg, 0) AS out_deg,
           |       COALESCE(i.ideg, 0) AS in_deg, r$prIters.rank AS rank_scaled
           |FROM nodes n LEFT JOIN od o ON o.src = n.node
           |     LEFT JOIN ideg i ON i.dst = n.node
           |     JOIN r$prIters ON r$prIters.node = n.node
           |ORDER BY n.node""".stripMargin)
    },

    // The PRODUCTION PageRank codepath under the hash gate: q96 gates
    // three unrolled sweeps, this row gates [[graft.ext.Graph.pageRankConverge]]
    // — the driver loop that runs sweep-by-sweep with per-sweep lineage
    // truncation and a data-dependent stop at the EXACT integer
    // fixpoint (tol = 0; the floor arithmetic makes rank states
    // discrete, so the fixpoint is reached, not approached — 38 sweeps
    // on the 11-host graph, identical at every sf because the distinct
    // edge set saturates). The oracle runs the SAME iteration as a
    // recursive CTE whose working row is the ENTIRE rank state (one
    // sorted list-of-structs), stepping while next <> current. The
    // loop runs with checkEvery = 4 — the production batching that
    // pays the driver barrier once per 4-sweep block — so `iters` is
    // the block arithmetic the scaladoc states: the fixpoint state
    // first appears at CTE index i* (37 here), and the loop stops at
    // the first multiple of 4 whose block-end state matches the
    // previous block end, 4·((i* + 7) div 4) = 44 executed sweeps;
    // `delta` = 0 asserts it stopped ON convergence, not at maxIters.
    // A single wrong floor division in ANY sweep, or a loop that stops
    // a block early or late, breaks the compare. (The inner CTEs avoid
    // bare UNION: under WITH RECURSIVE, DuckDB gives a set-op CTE
    // recursive anchor semantics and stops deduplicating within the
    // anchor — q49's closure dodges this by construction, here
    // DISTINCT is explicit.)
    "q103_pagerank_fixpoint" -> Q(
      (s, d) => {
        // AQE off for the loop (see [[graft.Q.withAqeOff]]): the rank
        // state is NODE-scale (11 hosts here) — measured 10.0 -> 5.7 s
        // at sf0.1.
        val r = graft.Q.withAqeOff(s) {
          graft.ext.Graph.pageRankConverge(hostEdges(s, d), prScale,
            maxIters = 60, tol = 0L, checkEvery = 4)
        }
        r.ranks.select(col("node"), col("rank"),
            lit(r.iters).as("iters"), lit(r.delta).as("delta"))
          .orderBy(col("node"))
      },
      s"""WITH RECURSIVE
         |e AS (
         |  SELECT DISTINCT $hostEdgeSrcSql AS src, $hostEdgeDstSql AS dst
         |  FROM documents WHERE $hostEdgeSrcSql <> $hostEdgeDstSql),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |od AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |st0 AS (
         |  SELECT list(struct_pack(node := node,
         |                          rank := (SELECT $prScale // n FROM nn))
         |              ORDER BY node) AS st
         |  FROM nodes),
         |it AS (
         |  SELECT 0 AS i, st FROM st0
         |  UNION ALL
         |  SELECT i + 1, nxt FROM (
         |    SELECT i, st,
         |      (SELECT list(struct_pack(node := n.node,
         |                 rank := (SELECT (15 * ($prScale // n)) // 100 FROM nn)
         |                         + (85 * COALESCE(c.c, 0)) // 100)
         |              ORDER BY n.node)
         |       FROM nodes n LEFT JOIN (
         |         SELECT e.dst AS node, CAST(SUM(r.rank // o.odeg) AS BIGINT) AS c
         |         FROM e JOIN od o USING (src)
         |              JOIN (SELECT u.node, u.rank FROM unnest(it.st) AS t(u)) r
         |                ON r.node = e.src
         |         GROUP BY 1) c USING (node)) AS nxt
         |    FROM it
         |  ) WHERE nxt <> st AND i < 50
         |),
         |fin AS (SELECT i, st FROM it ORDER BY i DESC LIMIT 1)
         |SELECT u.node AS node, u.rank AS rank,
         |       (SELECT CAST(4 * ((i + 7) // 4) AS INTEGER) FROM fin) AS iters,
         |       CAST(0 AS BIGINT) AS delta
         |FROM fin, unnest(fin.st) AS t(u)
         |ORDER BY node""".stripMargin),

    // Cross-corpus repeated-line removal (the C4/RefinedWeb boilerplate
    // filter): drop every line whose content appears in >= minDf
    // distinct docs — the navigation chrome / cookie banners / license
    // footers that survive document-level dedup because the documents
    // AROUND them differ. The testdata texts are single-line token
    // streams, so (same device as q61's PII injection and q62's hot
    // buckets) the query builds its own line structure: a universal
    // boilerplate header (df = n_docs), a second boilerplate on even
    // docs only (df = n_docs/2), a pair-shared notice (df = 2 at ANY
    // sf — below threshold by construction) and a unique tail (df = 1).
    // minDf = 30 removes exactly the two boilerplates; per-doc clean
    // hash + kept/removed accounting must match DuckDB, which states
    // the same df rule declaratively.
    "q63_repeated_line_removal" -> Q(
      (s, d) => {
        val docs2 = Tables.documents(s, d).select(col("doc_id"),
          concat_ws("\n",
            lit("join the mailing list today"),
            col("text"),
            when(col("doc_id") % 2 === 0, lit("all rights reserved worldwide")),
            concat(lit("shared pair notice "),
              floor(col("doc_id") / 2).cast("long").cast("string")),
            concat(lit("doc tail marker "), col("doc_id").cast("string"))).as("text"))
        removeRepeatedLines(docs2, minDf = 30)
          .select(col("doc_id"), md5(col("clean")).as("clean_hash"),
            col("kept_lines"), col("removed_lines"))
          .orderBy(col("doc_id"))
      },
      """WITH docs2 AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    'join the mailing list today',
        |    text,
        |    CASE WHEN doc_id % 2 = 0 THEN 'all rights reserved worldwide' END,
        |    'shared pair notice ' || CAST(doc_id // 2 AS VARCHAR),
        |    'doc tail marker ' || CAST(doc_id AS VARCHAR)) AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2),
        |lines AS (SELECT doc_id, unnest(range(1, len(l)+1)) AS pos, unnest(l) AS line FROM ls),
        |hot AS (SELECT md5(line) AS h FROM lines GROUP BY 1
        |        HAVING COUNT(DISTINCT doc_id) >= 30),
        |f AS (SELECT lines.*, (h.h IS NOT NULL) AS is_hot
        |      FROM lines LEFT JOIN hot h ON md5(lines.line) = h.h),
        |agg AS (SELECT doc_id,
        |               string_agg(CASE WHEN NOT is_hot THEN line END, chr(10) ORDER BY pos) AS clean,
        |               COUNT(CASE WHEN NOT is_hot THEN 1 END) AS kept_lines,
        |               COUNT(CASE WHEN is_hot THEN 1 END) AS removed_lines
        |        FROM f GROUP BY doc_id)
        |SELECT doc_id, md5(coalesce(clean, '')) AS clean_hash,
        |       CAST(kept_lines AS BIGINT) AS kept_lines,
        |       CAST(removed_lines AS BIGINT) AS removed_lines
        |FROM agg ORDER BY doc_id""".stripMargin),

    // Token-budget corpus selection: per source, take docs best-quality-
    // first until a fixed token budget fills — the mixture-construction
    // step after curation ("n tokens of each source, highest quality
    // first"). A doc is kept iff it fits ENTIRELY within the budget at
    // its rank (end_tok <= budget), so the cutoff is deterministic and
    // rerun-stable; cutoff_quality (min kept quality) is the number a
    // pipeline publishes as the source's effective quality bar.
    //
    // Scale shape: same distributed prefix-sum as q53 — but ordered by
    // (quality DESC, doc_id), which is the whole point: a per-source
    // window would sort corpus/#sources rows in ONE reducer per source
    // (~20 sources at 100 TB = 20 stragglers); range-sharding on the
    // full sort key keeps every partition bounded at corpus/#shards,
    // and the per-(shard, source) offsets rejoin via broadcast. The
    // per-row quality double is bit-identical across engines (q31/q37
    // prove it by hash), so the DESC order — and therefore the kept
    // set — agrees exactly; ties break on doc_id.
    "q64_budget_select" -> Q(
      (s, d) => budgetSelect(Tables.documents(s, d), tokenBudget)
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_kept"),
          sum(col("n_tok")).as("tokens_kept"),
          min(col("quality")).as("cutoff_quality"))
        .orderBy(col("source")),
      s"""WITH pd AS (${TextQueries.sqlQualityDocs}),
         |c AS (
         |  SELECT source, n_tok, quality,
         |         SUM(n_tok) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
         |  FROM pd)
         |SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
         |       MIN(quality) AS cutoff_quality
         |FROM c WHERE end_tok <= $tokenBudget
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Temperature-smoothed domain mixture (see [[mixtureSelect]]): q64
    // fills a FIXED per-source budget; this apportions ONE global budget
    // across sources by α = 0.5 exponentiated shares (⌊√tokens⌋ weights,
    // the published multilingual smoothing) with exact largest-remainder
    // rounding, then fills each allocation by the same greedy rule. The
    // oracle restates the whole chain — totals, isqrt weights, integer
    // div/mod apportionment, remainder ranking, prefix-sum cut — so the
    // per-source targets and kept sets are pinned bit-exactly. A source
    // whose allocation selects no docs would drop out of both sides
    // identically (cannot happen at sf0.01: every allocation exceeds the
    // largest single doc).
    "q88_domain_mixture" -> Q(
      (s, d) => mixtureSelect(Tables.documents(s, d), mixBudget)
        .groupBy(col("source")).agg(
          min(col("weight")).as("weight"),
          min(col("target_tokens")).as("target_tokens"),
          count(lit(1)).as("n_kept"),
          sum(col("n_tok")).as("tokens_kept"),
          min(col("quality")).as("cutoff_quality"))
        .orderBy(col("source")),
      s"""WITH pd AS (${TextQueries.sqlQualityDocs}),
         |tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tot FROM pd GROUP BY 1),
         |wts AS (SELECT source, CAST(floor(sqrt(CAST(tot AS DOUBLE))) AS BIGINT) AS w FROM tot),
         |app AS (
         |  SELECT source, w,
         |         ($mixBudget * w) // (SUM(w) OVER ()) AS base,
         |         ($mixBudget * w) % (SUM(w) OVER ()) AS rem
         |  FROM wts),
         |rk AS (
         |  SELECT app.*, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
         |         $mixBudget - SUM(base) OVER () AS xtra
         |  FROM app),
         |alloc AS (
         |  -- the window SUMs promote to HUGEINT (still exact integers);
         |  -- cast back so the result schema is int64 like the engine's
         |  SELECT source, w,
         |         CAST(base + (CASE WHEN rk <= xtra THEN 1 ELSE 0 END) AS BIGINT) AS alloc
         |  FROM rk),
         |c AS (
         |  SELECT p.source, p.n_tok, p.quality, a.w, a.alloc,
         |         SUM(p.n_tok) OVER (PARTITION BY p.source ORDER BY p.quality DESC, p.doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
         |  FROM pd p JOIN alloc a USING (source))
         |SELECT source, MIN(w) AS weight, MIN(alloc) AS target_tokens,
         |       COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
         |       MIN(quality) AS cutoff_quality
         |FROM c WHERE end_tok <= alloc
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // UniMax epoch-capped allocation (see [[unimaxSelect]]): where q88
    // smooths shares by a temperature, UniMax splits the budget as
    // uniformly as the per-source epoch caps allow — exact integer
    // waterfilling (the saturated set is a provably-monotone prefix in
    // ascending-cap order, so it falls out of one window pass) plus
    // largest-remainder uniformity over the unsaturated sources. The
    // oracle restates the whole chain — totals, caps, the rank-r
    // saturation predicate, leftover div/mod split, prefix-sum cut —
    // so targets and kept sets are pinned bit-exactly on both branches
    // (at sf0.01 the waterline saturates ~9 of 20 sources).
    "q92_unimax_mixture" -> Q(
      (s, d) => unimaxSelect(Tables.documents(s, d), unimaxBudget)
        .groupBy(col("source")).agg(
          min(col("tot_tokens")).as("tot_tokens"),
          min(col("cap_tokens")).as("cap_tokens"),
          min(col("capped").cast("long")).as("capped"),
          min(col("target_tokens")).as("target_tokens"),
          count(lit(1)).as("n_kept"),
          sum(col("n_tok")).as("tokens_kept"),
          min(col("quality")).as("cutoff_quality"))
        .orderBy(col("source")),
      s"""WITH pd AS (${TextQueries.sqlQualityDocs}),
         |${sqlUnimax("pd", unimaxBudget)}
         |SELECT source, MIN(tot) AS tot_tokens, MIN(cap) AS cap_tokens,
         |       CAST(MIN(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS capped,
         |       MIN(alloc) AS target_tokens,
         |       COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
         |       MIN(quality) AS cutoff_quality
         |FROM sel
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Fixed-stride sliding-window chunking: each doc becomes
    // ceil(max(n_tok - L, 0) / S) + 1 token windows of length <= L at
    // stride S — the per-doc chunking a long-context pipeline runs
    // (overlap = L - S tokens preserves cross-boundary context). The
    // chunk_hash is the md5 of the actual window text, so the oracle
    // verifies CONTENT, not just offsets. Narrow map + explode: no
    // shuffle before the output sort, embarrassingly parallel at any
    // corpus size, and the explode multiplies rows only by ~n_tok/S.
    "q65_chunk_windows" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
          .withColumn("toks", TextOps.tokens(col("text")))
          .withColumn("n_tok", size(col("toks")))
          .where(col("n_tok") > 0)
          .withColumn("n_win",
            (expr(s"(greatest(n_tok - $winLen, 0) + ${winStride - 1}) div $winStride") + 1)
              .cast("int"))
        base.withColumn("win_id", explode(sequence(lit(0), col("n_win") - 1)))
          .withColumn("start_tok", (col("win_id") * winStride).cast("long"))
          .withColumn("end_tok", least(col("start_tok") + winLen, col("n_tok").cast("long")))
          .withColumn("chunk_hash", md5(concat_ws(" ",
            slice(col("toks"), col("start_tok") + 1, (col("end_tok") - col("start_tok")).cast("int")))))
          .select(col("doc_id"), col("win_id"), col("start_tok"), col("end_tok"),
            col("chunk_hash"))
          .orderBy(col("doc_id"), col("win_id"))
      },
      s"""WITH b AS (
         |  SELECT doc_id, toks, len(toks) AS n_tok
         |  FROM (SELECT doc_id, $sqlToks AS toks FROM documents)
         |  WHERE len(toks) > 0),
         |w AS (
         |  SELECT doc_id, toks, n_tok,
         |         unnest(range(0, (greatest(n_tok - $winLen, 0) + ${winStride - 1}) // $winStride + 1)) AS wid
         |  FROM b)
         |SELECT doc_id, CAST(wid AS INT) AS win_id,
         |       CAST(wid * $winStride AS BIGINT) AS start_tok,
         |       CAST(LEAST(wid * $winStride + $winLen, n_tok) AS BIGINT) AS end_tok,
         |       md5(array_to_string(toks[(wid * $winStride + 1):LEAST(wid * $winStride + $winLen, n_tok)], ' ')) AS chunk_hash
         |FROM w ORDER BY doc_id, win_id""".stripMargin),

    // Corpus-trained bigram-rarity scoring (the CCNet/RedPajama-style
    // LM-plausibility signal, with counts standing in for a trained
    // LM): count every bigram's corpus frequency, then score each doc
    // by how much of it is corpus-rare — a doc whose bigrams barely
    // recur anywhere else is likely noise/garbled text a pretraining
    // corpus drops. All-integer accounting (occurrence counts, rare
    // tallies) with single exact IEEE divisions at the end, so parity
    // needs no decimal folding.
    //
    // Scale shape: bigrams travel as 60-bit md5 hashes (fixed-width
    // keys, never the strings). The tokenize/explode pipeline runs
    // ONCE: it pre-aggregates to per-(doc, bigram) multiplicities
    // (map-side combined), which is persisted and read by BOTH
    // consumers — corpus counts derive as sum(m), and the scoring join
    // probes with the distinct-bigram table, not the ~n_tokens
    // occurrence rows (all downstream sums weight by m, which is
    // output-identical to joining occurrences). Hot bigrams (stopword
    // pairs) are AQE's skew-join case. No all-pairs anywhere. Hash
    // collisions merge counts identically in both engines (same
    // hash), so the oracle is exact regardless.
    "q68_bigram_rarity" -> Q(
      (s, d) => bigramRarity(Tables.documents(s, d)).orderBy(col("doc_id")),
      s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |b AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(2, len(tk) + 1),
         |                               i -> tk[i - 1] || ' ' || tk[i])) AS g
         |  FROM t WHERE len(tk) >= 2),
         |hh AS (SELECT doc_id, ${TextOps.sqlHash60("b", "g")} AS h FROM b),
         |c AS (SELECT h, COUNT(*) AS c FROM hh GROUP BY 1),
         |j AS (SELECT hh.doc_id, c.c FROM hh JOIN c USING (h)),
         |a AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams,
         |         SUM(CASE WHEN c <= $rareMaxCount THEN 1 ELSE 0 END) AS rare_bigrams,
         |         SUM(c) AS sum_freq
         |  FROM j GROUP BY 1)
         |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |       CAST(rare_bigrams AS BIGINT) AS rare_bigrams,
         |       rare_bigrams / n_bigrams AS rarity,
         |       sum_freq / n_bigrams AS avg_freq
         |FROM a ORDER BY doc_id""".stripMargin),

    // URL/domain blocklist filtering (the C4/RefinedWeb source filter):
    // extract every URL host, match against a blocked-domain list with
    // subdomain semantics (exact host OR any "*.domain"), account per
    // doc. The testdata texts carry no URLs, so — q61's device — the
    // query injects two per doc with deterministic domains: doc_id % 5
    // picks the example.com subdomain (blocked for 1 and 3, via the
    // SUFFIX branch: the host is sub.domN...), doc_id % 3 picks the
    // cdn host (blocked for 2, via the EXACT branch) — both match
    // paths and both outcomes exercised at every scale. blocked_hosts
    // is the sorted joined list, so the oracle pins WHICH hosts
    // matched, not just how many.
    "q66_url_filter" -> Q(
      (s, d) => {
        val dirty = Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" see https://sub.dom"), (col("doc_id") % 5).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string"),
            lit(" and http://cdn"), (col("doc_id") % 3).cast("string"),
            lit(".net/x ok")).as("text"))
        urlFilter(dirty, blockedDomains)
          .select(col("doc_id"), col("n_urls"), col("n_blocked"),
            array_join(array_sort(col("blocked_hosts")), ",").as("blocked_list"))
          .orderBy(col("doc_id"))
      },
      s"""WITH dirty AS (
         |  SELECT doc_id,
         |         text || ' see https://sub.dom' || CAST(doc_id % 5 AS VARCHAR)
         |              || '.example.com/p/' || CAST(doc_id AS VARCHAR)
         |              || ' and http://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.net/x ok' AS t
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |         list_transform(regexp_extract_all(t, '(?i)https?://([A-Za-z0-9.-]+)', 1),
         |                        x -> lower(regexp_replace(x, '\\.+$$', ''))) AS hosts
         |  FROM dirty),
         |f AS (
         |  SELECT doc_id, hosts,
         |         list_filter(hosts, x -> ${blockedDomains.map(b =>
                     s"x = '$b' OR ends_with(x, '.$b')").mkString(" OR ")}) AS bl
         |  FROM h)
         |SELECT doc_id, CAST(len(hosts) AS BIGINT) AS n_urls,
         |       CAST(len(bl) AS BIGINT) AS n_blocked,
         |       coalesce(array_to_string(list_sort(bl), ','), '') AS blocked_list
         |FROM f ORDER BY doc_id""".stripMargin),

    // The STAGED curation pipeline end-to-end (r9 verdict #2): the
    // production path a real corpus runs — repeated-line removal →
    // URL blocklist → exact dedup → near-dup removal → quality floor
    // → rarity ceiling → per-source token budget — composed through
    // TextQueries.curatedDocsOf, with per-stage survivor counts as
    // the declarative accounting (TextQueries.curationStageCounts
    // counts the SAME frames curatedDocsOf returns, so this oracle
    // gates the composition itself, not a parallel restatement).
    // The synthetic corpus is too clean for most stages to fire, so —
    // q61/q62/q63/q66's devices combined — the query builds a dirty
    // one where EVERY stage has a population to drop:
    //  - replicas of every 10th doc (exact dedup's prey; footer
    //    parity differences wash out in the line stage first, which
    //    is exactly the boilerplate-blind dedup a real pipeline gets);
    //  - a universal boilerplate header (line df = n) and an even-doc
    //    footer (df = n/2) — removed; every 97th doc is ALL
    //    boilerplate and drops whole at the line stage;
    //  - every 41st doc's content is deterministic gibberish (12
    //    corpus-unique tokens) — survives to the rarity ceiling and
    //    dies there, rarity ~1.0 against natural docs' < 0.15;
    //  - a URL line whose subdomain digit and path derive from
    //    md5(content) — content-derived, so replicas keep identical
    //    lines (df = replica count, survives the line stage) while
    //    ~2/5 of distinct contents hit the blocklist's subdomain
    //    branch (digits 1 and 3).
    // The quality floor (0.6, mid-distribution) and budget (400)
    // drop their own bands. Every stage's count is pinned exactly.
    "q69_curation_stages" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
        val aug = base.unionAll(base.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            col("lang"), col("source"), col("text")))
        val gibberish = concat_ws(" ", ('a' to 'l').map(ch =>
          concat(lit("zqx"), col("doc_id").cast("string"), lit(s"$ch$ch"))): _*)
        val dirty = aug
          .withColumn("content",
            when(col("doc_id") % 97 === 0, lit(null).cast("string"))
              .when(col("doc_id") % 41 === 0, gibberish)
              .otherwise(col("text")))
          .select(col("doc_id"), col("lang"), col("source"),
            concat_ws("\n",
              lit("join the mailing list today"),
              col("content"),
              when(col("content").isNotNull,
                concat(lit("ref https://sub.dom"),
                  (conv(substring(md5(col("content")), 1, 2), 16, 10).cast("int") % 5)
                    .cast("string"),
                  lit(".example.com/p/"), substring(md5(col("content")), 1, 4))),
              when(col("doc_id") % 2 === 0, lit("all rights reserved worldwide"))).as("text"))
        TextQueries.curationStageCounts(dirty, TextQueries.CurationStages(
          repeatedLineMinDf = Some(stageMinDf),
          blockedDomains = blockedDomains,
          qualityFloor = stageQualityFloor,
          maxRarity = Some(stageMaxRarity),
          budgetPerSource = Some(stageBudget)))
      },
      s"""WITH aug AS (
         |  SELECT doc_id, lang, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, source, text FROM documents WHERE doc_id % 10 = 0),
         |d0 AS (
         |  SELECT doc_id, lang, source,
         |         CASE WHEN doc_id % 97 = 0 THEN NULL
         |              WHEN doc_id % 41 = 0 THEN ${('a' to 'l').map(ch =>
                          s"'zqx' || CAST(doc_id AS VARCHAR) || '$ch$ch'").mkString(" || ' ' || ")}
         |              ELSE text END AS content
         |  FROM aug),
         |dirty AS (
         |  SELECT doc_id, lang, source,
         |         concat_ws(chr(10),
         |           'join the mailing list today',
         |           content,
         |           CASE WHEN content IS NOT NULL
         |                THEN 'ref https://sub.dom'
         |                     || CAST(('0x' || substr(md5(content), 1, 2))::INTEGER % 5 AS VARCHAR)
         |                     || '.example.com/p/' || substr(md5(content), 1, 4) END,
         |           CASE WHEN doc_id % 2 = 0 THEN 'all rights reserved worldwide' END) AS text
         |  FROM d0),
         |ls0 AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM dirty),
         |ln0 AS (SELECT doc_id, unnest(range(1, len(l)+1)) AS pos, unnest(l) AS line FROM ls0),
         |hot0 AS (SELECT md5(line) AS h FROM ln0 GROUP BY 1
         |         HAVING COUNT(DISTINCT doc_id) >= $stageMinDf),
         |fl0 AS (SELECT ln0.*, (h.h IS NOT NULL) AS is_hot
         |        FROM ln0 LEFT JOIN hot0 h ON md5(ln0.line) = h.h),
         |cl0 AS (SELECT doc_id,
         |               string_agg(CASE WHEN NOT is_hot THEN line END, chr(10) ORDER BY pos) AS clean,
         |               COUNT(CASE WHEN NOT is_hot THEN 1 END) AS kept
         |        FROM fl0 GROUP BY doc_id),
         |st1 AS (SELECT d.doc_id, d.lang, d.source, c.clean AS text
         |        FROM dirty d JOIN cl0 c ON d.doc_id = c.doc_id WHERE c.kept > 0),
         |uh AS (SELECT doc_id,
         |              list_transform(regexp_extract_all(text, '(?i)https?://([A-Za-z0-9.-]+)', 1),
         |                             x -> lower(regexp_replace(x, '\\.+$$', ''))) AS hosts
         |       FROM st1),
         |st2 AS (SELECT st1.* FROM st1 JOIN uh ON st1.doc_id = uh.doc_id
         |        WHERE len(list_filter(uh.hosts, x -> ${blockedDomains.map(b =>
                     s"x = '$b' OR ends_with(x, '.$b')").mkString(" OR ")})) = 0),
         |canon AS (SELECT MIN(doc_id) AS doc_id FROM st2 GROUP BY md5(text)),
         |st3 AS (SELECT * FROM st2 WHERE doc_id IN (SELECT doc_id FROM canon)),
         |${TextQueries.sqlSigCtesFrom("st3")},
         |losers AS (
         |${TextQueries.sqlBandLosersFrom("sig")}),
         |st4 AS (SELECT * FROM st3 WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |qd AS (${TextQueries.sqlQualityDocsFrom("st4")}),
         |st5 AS (SELECT * FROM qd WHERE quality >= $stageQualityFloor),
         |rt AS (SELECT d4.doc_id AS doc_id, d4.text AS text
         |       FROM st4 d4 JOIN st5 ON d4.doc_id = st5.doc_id),
         |rb AS (SELECT doc_id,
         |              unnest(list_transform(range(2, len(tk) + 1),
         |                                    i -> tk[i - 1] || ' ' || tk[i])) AS g
         |       FROM (SELECT doc_id, $sqlToks AS tk FROM rt) WHERE len(tk) >= 2),
         |rh AS (SELECT doc_id, ${TextOps.sqlHash60("b", "g")} AS h FROM rb),
         |rc AS (SELECT h, COUNT(*) AS c FROM rh GROUP BY 1),
         |rj AS (SELECT rh.doc_id, rc.c FROM rh JOIN rc USING (h)),
         |rar AS (SELECT doc_id,
         |               SUM(CASE WHEN c <= $rareMaxCount THEN 1 ELSE 0 END) / COUNT(*) AS rarity
         |        FROM rj GROUP BY 1),
         |st6 AS (SELECT st5.* FROM st5 LEFT JOIN rar ON st5.doc_id = rar.doc_id
         |        WHERE rar.doc_id IS NULL OR rar.rarity <= $stageMaxRarity),
         |bsel AS (SELECT doc_id,
         |                SUM(n_tok) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
         |         FROM st6),
         |st7 AS (SELECT doc_id FROM bsel WHERE end_tok <= $stageBudget)
         |SELECT stage_no, stage, n_docs FROM (
         |  SELECT 0 AS stage_no, 'input' AS stage, COUNT(*) AS n_docs FROM dirty
         |  UNION ALL SELECT 1, 'repeated_lines', COUNT(*) FROM st1
         |  UNION ALL SELECT 2, 'url_filter', COUNT(*) FROM st2
         |  UNION ALL SELECT 3, 'exact_dedup', COUNT(*) FROM st3
         |  UNION ALL SELECT 4, 'near_dup', COUNT(*) FROM st4
         |  UNION ALL SELECT 5, 'quality', COUNT(*) FROM st5
         |  UNION ALL SELECT 6, 'rarity', COUNT(*) FROM st6
         |  UNION ALL SELECT 7, 'budget', COUNT(*) FROM st7
         |) ORDER BY stage_no""".stripMargin),

    // The semantic-dedup stage composed INTO the curation pipeline
    // (r13 verdict #4): the default text chain (exact dedup → near-dup
    // → quality floor) with the embedding-keyed SemDeDup stage between
    // near-dup and quality — cells trained on the FULL embeddings
    // table by q77's exact Lloyd chain, pair join among CURRENT
    // SURVIVORS only (the near-dup stage's content-loss rule), keyed
    // doc_id = vec_id (the driver's tables align 1:1). The oracle
    // restates the whole composition: q37's dedup chain (sig CTEs
    // namespaced "n" — the kmeans CTEs claim s1/s2 of their own),
    // q77's sweep + assignment CTEs verbatim, the survivor-restricted
    // capped pair join, and the same per-stage counts
    // TextQueries.curationStageCounts derives from the frames
    // curatedDocsOf returns — so the row gates the stage's placement
    // and survivor restriction, not just the dedup arithmetic.
    "q78_semantic_curation_stages" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding"))
        TextQueries.curationStageCounts(Tables.documents(s, d),
          TextQueries.CurationStages(
            semanticDedup = Some(TextQueries.SemanticDedupStage(
              emb, tau = semStageTau,
              nSeeds = EmbeddingQueries.nSeeds,
              iters = EmbeddingQueries.kmeansIters,
              maxCellSize = Some(EmbeddingQueries.semDedupCap)))))
      },
      s"""WITH ${TextQueries.sqlSigCtesFrom("documents", "n")},
         |canon AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |sigc AS (SELECT * FROM nsig WHERE doc_id IN (SELECT doc_id FROM canon)),
         |tlosers AS (
         |${TextQueries.sqlBandLosersFrom("sigc")}),
         |st2 AS (SELECT doc_id FROM canon
         |        WHERE doc_id NOT IN (SELECT doc_id FROM tlosers)),
         |${EmbeddingQueries.sqlVecsQ},
         |${EmbeddingQueries.sqlKmeansAssignCtes},
         |asurv AS (SELECT * FROM assign WHERE vec_id IN (SELECT doc_id FROM st2)),
         |${EmbeddingQueries.sqlSemanticCoreLosers("asurv", semStageTau, EmbeddingQueries.semDedupCap)},
         |st3 AS (SELECT doc_id FROM st2
         |        WHERE doc_id NOT IN (SELECT vec_id FROM slosers)),
         |qd AS (${TextQueries.sqlQualityDocsFrom("documents")}),
         |st4 AS (SELECT doc_id FROM qd
         |        WHERE doc_id IN (SELECT doc_id FROM st3) AND quality >= 0.5)
         |SELECT stage_no, stage, n_docs FROM (
         |  SELECT 0 AS stage_no, 'input' AS stage, COUNT(*) AS n_docs FROM documents
         |  UNION ALL SELECT 1, 'exact_dedup', COUNT(*) FROM canon
         |  UNION ALL SELECT 2, 'near_dup', COUNT(*) FROM st2
         |  UNION ALL SELECT 3, 'semantic_dedup', COUNT(*) FROM st3
         |  UNION ALL SELECT 4, 'quality', COUNT(*) FROM st4
         |) z ORDER BY stage_no""".stripMargin),

    // Span-level decontamination ([[decontaminateSpans]]): q54 FLAGS
    // docs overlapping the benchmark; this REMOVES the overlapping
    // token spans and keeps the doc — the surgical form real
    // pipelines apply to otherwise-valuable contaminated docs. The
    // oracle states the same positional-gram match + span-cover +
    // token reconstruction declaratively; clean text is compared by
    // hash, so the reconstruction (not just the counts) must agree
    // byte-for-byte on every doc.
    "q70_span_decontamination" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        decontaminateSpans(docs.where(col("source") =!= "src0"),
          docs.where(col("source") === "src0"))
          .select(col("doc_id"), col("n_tok"), col("n_removed"),
            md5(col("clean")).as("clean_hash"))
          .orderBy(col("doc_id"))
      },
      s"""WITH t AS (SELECT doc_id, source, $sqlToks AS tk FROM documents),
         |c AS (SELECT doc_id, tk, len(tk) AS n_tok FROM t WHERE source <> 'src0'),
         |bg AS (SELECT DISTINCT ('0x' || substr(md5('g:' || g), 1, 15))::BIGINT AS h
         |       FROM (SELECT unnest(${TextOps.sqlShingleList("tk")}) AS g
         |             FROM t WHERE source = 'src0' AND len(tk) >= 3)),
         |pg AS (SELECT doc_id, tk, unnest(range(1, n_tok - 1)) AS i
         |       FROM c WHERE n_tok >= 3),
         |cg AS (SELECT doc_id, i,
         |              ('0x' || substr(md5('g:' || tk[CAST(i AS INTEGER)] || ' ' ||
         |                                   tk[CAST(i + 1 AS INTEGER)] || ' ' ||
         |                                   tk[CAST(i + 2 AS INTEGER)]), 1, 15))::BIGINT AS h
         |       FROM pg),
         |m AS (SELECT cg.doc_id, cg.i FROM cg JOIN bg USING (h)),
         |st AS (SELECT doc_id, list(i) AS starts FROM m GROUP BY 1),
         |r AS (SELECT c.doc_id, c.n_tok, c.tk, st.starts
         |      FROM c LEFT JOIN st ON c.doc_id = st.doc_id),
         |f AS (SELECT doc_id, n_tok, tk,
         |             list_filter(range(1, n_tok + 1),
         |               j -> starts IS NULL OR
         |                    len(list_filter(starts, s -> j >= s AND j <= s + 2)) = 0) AS kept
         |      FROM r)
         |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |       CAST(n_tok - len(kept) AS BIGINT) AS n_removed,
         |       md5(coalesce(array_to_string(
         |         list_transform(kept, j -> tk[CAST(j AS INTEGER)]), ' '), '')) AS clean_hash
         |FROM f ORDER BY doc_id""".stripMargin),

    // Cross-document repeated-substring span dedup ([[dedupRepeatedSpans]]):
    // the corpus-vs-ITSELF form of q70 — excise every token span whose
    // 5-gram content recurs in >= 2 distinct documents (the
    // exact-substring dedup of public pretraining practice; q63 removes
    // repeated LINES, this removes repeated spans at sub-line grain).
    // The oracle states the same gram-df + span-cover + reconstruction
    // declaratively and compares clean text BY HASH, so the compiled
    // cover kernel's excision must agree byte-for-byte on every doc.
    "q71_span_dedup" -> Q(
      (s, d) => dedupRepeatedSpans(Tables.documents(s, d), spanK, spanMinDf)
        .select(col("doc_id"), col("n_tok"), col("n_removed"),
          md5(col("clean")).as("clean_hash"))
        .orderBy(col("doc_id")),
      s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |c AS (SELECT doc_id, tk, len(tk) AS n_tok FROM t),
         |pg AS (SELECT doc_id, tk, unnest(range(1, n_tok - ${spanK - 2})) AS i
         |       FROM c WHERE n_tok >= $spanK),
         |cg AS (SELECT doc_id, i,
         |              ${TextOps.sqlHash60("d",
                          s"array_to_string(tk[CAST(i AS INTEGER):CAST(i + ${spanK - 1} AS INTEGER)], ' ')")} AS h
         |       FROM pg),
         |hot AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM cg)
         |        GROUP BY h HAVING COUNT(*) >= $spanMinDf),
         |m AS (SELECT cg.doc_id, cg.i FROM cg JOIN hot USING (h)),
         |st AS (SELECT doc_id, list(i) AS starts FROM m GROUP BY 1),
         |r AS (SELECT c.doc_id, c.n_tok, c.tk, st.starts
         |      FROM c LEFT JOIN st ON c.doc_id = st.doc_id),
         |f AS (SELECT doc_id, n_tok, tk,
         |             list_filter(range(1, n_tok + 1),
         |               j -> starts IS NULL OR
         |                    len(list_filter(starts, s -> j >= s AND j <= s + ${spanK - 1})) = 0) AS kept
         |      FROM r)
         |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |       CAST(n_tok - len(kept) AS BIGINT) AS n_removed,
         |       md5(coalesce(array_to_string(
         |         list_transform(kept, j -> tk[CAST(j AS INTEGER)]), ' '), '')) AS clean_hash
         |FROM f ORDER BY doc_id""".stripMargin),

    // DSIR-style data selection (see [[importanceWeights]]): score every
    // doc's hashed unigram+bigram profile against the high-quality-English
    // target slice vs the raw corpus; selected = target-enriched
    // (importance >= 1). The oracle restates the identical exact-integer
    // accounting, so the hash compare covers the doubles too.
    "q73_importance_weights" -> Q(
      (s, d) => importanceWeights(Tables.documents(s, d)).orderBy(col("doc_id")),
      s"""WITH qd AS (${TextQueries.sqlQualityDocs}),
         |t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |f AS (SELECT t.doc_id,
         |             (qd.lang = 'en' AND qd.quality >= $dsirTargetQuality) AS is_target,
         |             list_concat(t.toks,
         |               CASE WHEN len(t.toks) >= 2
         |                    THEN list_transform(range(2, len(t.toks) + 1),
         |                                        i -> t.toks[i - 1] || ' ' || t.toks[i])
         |                    ELSE [] END) AS grams
         |      FROM t JOIN qd USING (doc_id)),
         |g AS (SELECT doc_id, is_target,
         |             (${TextOps.sqlHash60("i", "g")}) % $dsirBuckets AS b
         |      FROM (SELECT doc_id, is_target, unnest(grams) AS g FROM f)),
         |pd AS (SELECT doc_id, is_target, b, COUNT(*) AS m FROM g GROUP BY 1, 2, 3),
         |bk AS (SELECT b, SUM(m) AS q_cnt,
         |              SUM(CASE WHEN is_target THEN m ELSE 0 END) AS p_cnt
         |       FROM pd GROUP BY 1),
         |tt AS (SELECT CAST(SUM(q_cnt) AS BIGINT) AS q_tot,
         |              CAST(SUM(p_cnt) AS BIGINT) AS p_tot FROM bk),
         |sc AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_grams,
         |              CAST(SUM(m * (p_cnt + 1)) AS BIGINT) AS target_mass,
         |              CAST(SUM(m * (q_cnt + 1)) AS BIGINT) AS raw_mass
         |       FROM pd JOIN bk USING (b) GROUP BY 1)
         |SELECT doc_id, n_grams, target_mass, raw_mass,
         |       (CAST(target_mass AS DOUBLE) * (q_tot + $dsirBuckets))
         |         / (CAST(raw_mass AS DOUBLE) * (p_tot + $dsirBuckets)) AS importance,
         |       (CAST(target_mass AS DOUBLE) * (q_tot + $dsirBuckets))
         |         / (CAST(raw_mass AS DOUBLE) * (p_tot + $dsirBuckets)) >= 1e0 AS selected
         |FROM sc CROSS JOIN tt ORDER BY doc_id""".stripMargin),

    // Gopher/C4 rule-filter battery (see [[ruleFilters]]): per-doc
    // boolean gates at the published thresholds. The corpus is clean
    // word soup, so the wrapper plants one defect class per
    // doc_id % 7 residue (symbols/ellipsis, lorem-ipsum, braces,
    // bullet lines, over-long words, digit runs, untouched) — the
    // q61/q66 injection pattern; the two naturally-varying rules
    // (word-count floor, stop-word gate) need no injection. The oracle
    // restates injection and every rule, so the hash compare pins all
    // nine flags and the composite keep per doc.
    "q74_rule_filters" -> Q(
      (s, d) => {
        val c = col("doc_id") % 7
        val dirty = Tables.documents(s, d).select(col("doc_id"),
          when(c === 0, concat(col("text"), lit(symbolTail)))
            .when(c === 1, concat(col("text"), lit(loremTail)))
            .when(c === 2, concat(col("text"), lit(braceTail)))
            .when(c === 3, replace(col("text"), lit(" "), lit("\n- ")))
            .when(c === 4, concat(col("text"), lit(" " + longWordTail)))
            .when(c === 5, concat(col("text"), lit(" " + digitTail)))
            .otherwise(col("text")).as("text"))
        ruleFilters(dirty).orderBy(col("doc_id"))
      },
      s"""WITH inj AS (
         |  SELECT doc_id,
         |         CASE doc_id % 7
         |           WHEN 0 THEN text || '$symbolTail'
         |           WHEN 1 THEN text || '$loremTail'
         |           WHEN 2 THEN text || '$braceTail'
         |           WHEN 3 THEN replace(text, ' ', chr(10) || '- ')
         |           WHEN 4 THEN text || ' $longWordTail'
         |           WHEN 5 THEN text || ' $digitTail'
         |           ELSE text END AS t
         |  FROM documents),
         |w AS (
         |  SELECT doc_id, t, ${TextOps.sqlTokens("t")} AS w,
         |         list_filter(string_split(t, chr(10)), x -> x <> '') AS ln
         |  FROM inj),
         |m AS (
         |  SELECT doc_id, t,
         |         CAST(len(w) AS BIGINT) AS n_words,
         |         CAST(len(ln) AS BIGINT) AS n_lines,
         |         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_wlen,
         |         CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS hash_cnt,
         |         CAST((length(t) - length(replace(t, '...', ''))) / 3 AS BIGINT) AS dots_cnt,
         |         CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_cnt,
         |         CAST(${gopherStops.map(sw =>
                     s"(CASE WHEN list_contains(w, '$sw') THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS stop_kinds,
         |         CAST(len(list_filter(ln, x -> starts_with(x, '- ') OR starts_with(x, '* '))) AS BIGINT) AS bullet_cnt,
         |         CAST(len(list_filter(ln, x -> ends_with(x, '...'))) AS BIGINT) AS dotl_cnt
         |  FROM w WHERE len(w) > 0),
         |f AS (
         |  SELECT doc_id, n_words, n_lines, stop_kinds,
         |         sum_wlen / n_words AS mean_wlen,
         |         (hash_cnt + dots_cnt) / n_words AS symbol_ratio,
         |         alpha_cnt / n_words AS alpha_frac,
         |         bullet_cnt / n_lines AS bullet_frac,
         |         dotl_cnt / n_lines AS dots_line_frac,
         |         NOT contains(lower(t), 'lorem ipsum') AS r_lorem,
         |         NOT contains(t, '{') AS r_brace
         |  FROM m)
         |SELECT doc_id, n_words, mean_wlen, symbol_ratio, alpha_frac, stop_kinds,
         |       n_lines, bullet_frac, dots_line_frac,
         |       (n_words >= 50 AND n_words <= 100000) AS r_words,
         |       (mean_wlen >= 3e0 AND mean_wlen <= 10e0) AS r_wlen,
         |       (symbol_ratio <= 0.1e0) AS r_symbol,
         |       (bullet_frac < 0.9e0) AS r_bullet,
         |       (dots_line_frac <= 0.3e0) AS r_dots,
         |       (alpha_frac >= 0.8e0) AS r_alpha,
         |       (stop_kinds >= 1) AS r_stop,
         |       r_lorem, r_brace,
         |       (n_words >= 50 AND n_words <= 100000
         |        AND mean_wlen >= 3e0 AND mean_wlen <= 10e0
         |        AND symbol_ratio <= 0.1e0 AND bullet_frac < 0.9e0
         |        AND dots_line_frac <= 0.3e0 AND alpha_frac >= 0.8e0
         |        AND stop_kinds >= 1 AND r_lorem AND r_brace) AS keep
         |FROM f ORDER BY doc_id""".stripMargin),

    // Gopher repetition-signal battery ([[repetitionSignals]]): the
    // within-document repetition half of the published quality suite,
    // thirteen fractions + gates at the Table A1 ceilings. Injection
    // (q74's device): doc_id % 6 plants one repetition class each —
    // duplicated lines, duplicated paragraphs, a spammed 2-gram, a
    // period-5 repeated span, a period-10 repeated span — so every
    // gate family trips a pinned population at every sf; residue 0
    // stays clean and keeps. All accounting is exact BIGINT counts
    // and occurrence-weighted characters divided once at the end, so
    // the oracle hash-pins all 13 fractions and 14 booleans.
    "q79_repetition_signals" -> Q(
      (s, d) => {
        val c = col("doc_id") % 6
        val dirty = Tables.documents(s, d).select(col("doc_id"),
          when(c === 1, concat(col("text"), lit(dupLineTail)))
            .when(c === 2, concat(col("text"), lit(dupParaTail)))
            .when(c === 3, concat(col("text"), lit(topGramTail)))
            .when(c === 4, concat(col("text"), lit(dupFiveTail)))
            .when(c === 5, concat(col("text"), lit(dupTenTail)))
            .otherwise(col("text")).as("text"))
        repetitionSignals(dirty).orderBy(col("doc_id"))
      },
      s"""WITH inj AS (
         |  SELECT doc_id,
         |         CASE doc_id % 6
         |           WHEN 1 THEN text || ${sqlLit(dupLineTail)}
         |           WHEN 2 THEN text || ${sqlLit(dupParaTail)}
         |           WHEN 3 THEN text || ${sqlLit(topGramTail)}
         |           WHEN 4 THEN text || ${sqlLit(dupFiveTail)}
         |           WHEN 5 THEN text || ${sqlLit(dupTenTail)}
         |           ELSE text END AS t
         |  FROM documents),
         |base AS (SELECT * FROM (
         |    SELECT doc_id, t, ${TextOps.sqlTokens("t")} AS w FROM inj) z
         |  WHERE len(w) > 0),
         |lns AS (SELECT doc_id, unnest(list_filter(string_split(t, chr(10)), x -> x <> '')) AS u FROM base),
         |lcc AS (SELECT doc_id, u, COUNT(*) AS c FROM lns GROUP BY 1, 2),
         |lst AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ln_n,
         |               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS ln_dup,
         |               CAST(SUM(c * length(u)) AS BIGINT) AS ln_chars,
         |               CAST(SUM(CASE WHEN c > 1 THEN c * length(u) ELSE 0 END) AS BIGINT) AS ln_dup_chars
         |        FROM lcc GROUP BY 1),
         |pas AS (SELECT doc_id, unnest(list_filter(string_split(t, chr(10) || chr(10)), x -> x <> '')) AS u FROM base),
         |pcc AS (SELECT doc_id, u, COUNT(*) AS c FROM pas GROUP BY 1, 2),
         |pst AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS pa_n,
         |               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS pa_dup,
         |               CAST(SUM(c * length(u)) AS BIGINT) AS pa_chars,
         |               CAST(SUM(CASE WHEN c > 1 THEN c * length(u) ELSE 0 END) AS BIGINT) AS pa_dup_chars
         |        FROM pcc GROUP BY 1),
         |gx AS (SELECT doc_id, nn.n AS n,
         |              unnest(list_transform(range(1, len(w) - nn.n + 2),
         |                i -> array_to_string(w[CAST(i AS INTEGER):CAST(i + nn.n - 1 AS INTEGER)], ' '))) AS g
         |       FROM base, (SELECT unnest(range(2, 11)) AS n) nn
         |       WHERE len(w) >= nn.n),
         |gcc AS (SELECT doc_id, n, g, COUNT(*) AS c FROM gx GROUP BY 1, 2, 3),
         |gss AS (SELECT doc_id, n,
         |               CAST(SUM(c * length(g)) AS BIGINT) AS tot,
         |               MAX({'c': CAST(c AS BIGINT), 'cov': CAST(c * length(g) AS BIGINT)}) AS top,
         |               CAST(SUM(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS BIGINT) AS dup
         |        FROM gcc GROUP BY 1, 2),
         |gw AS (SELECT doc_id,
         |${(2 to 4).map(n => s"         COALESCE(MAX(CASE WHEN n = $n THEN struct_extract(top, 'cov') / tot END), 0e0) AS top${n}gram_frac").mkString(",\n")},
         |${(5 to 10).map(n => s"         COALESCE(MAX(CASE WHEN n = $n THEN dup / tot END), 0e0) AS dup${n}gram_frac").mkString(",\n")}
         |       FROM gss GROUP BY 1),
         |f AS (SELECT b.doc_id,
         |             ln_dup / ln_n AS dup_line_frac,
         |             ln_dup_chars / ln_chars AS dup_line_char_frac,
         |             pa_dup / pa_n AS dup_para_frac,
         |             pa_dup_chars / pa_chars AS dup_para_char_frac,
         |${((2 to 4).map(n => s"             COALESCE(top${n}gram_frac, 0e0) AS top${n}gram_frac") ++
            (5 to 10).map(n => s"             COALESCE(dup${n}gram_frac, 0e0) AS dup${n}gram_frac")).mkString(",\n")}
         |      FROM base b JOIN lst USING (doc_id) JOIN pst USING (doc_id)
         |      LEFT JOIN gw USING (doc_id))
         |SELECT doc_id,
         |       dup_line_frac, dup_line_char_frac, dup_para_frac, dup_para_char_frac,
         |       top2gram_frac, top3gram_frac, top4gram_frac,
         |       dup5gram_frac, dup6gram_frac, dup7gram_frac, dup8gram_frac,
         |       dup9gram_frac, dup10gram_frac,
         |       (dup_line_frac <= $dupLineMax) AS r_dup_line,
         |       (dup_line_char_frac <= $dupLineCharMax) AS r_dup_line_char,
         |       (dup_para_frac <= $dupParaMax) AS r_dup_para,
         |       (dup_para_char_frac <= $dupParaCharMax) AS r_dup_para_char,
         |${(2 to 4).map(n => s"       (top${n}gram_frac <= ${topGramMax(n)}) AS r_top$n").mkString(",\n")},
         |${(5 to 10).map(n => s"       (dup${n}gram_frac <= ${dupGramMax(n)}) AS r_dup$n").mkString(",\n")},
         |       (dup_line_frac <= $dupLineMax AND dup_line_char_frac <= $dupLineCharMax
         |        AND dup_para_frac <= $dupParaMax AND dup_para_char_frac <= $dupParaCharMax
         |        AND ${(2 to 4).map(n => s"top${n}gram_frac <= ${topGramMax(n)}").mkString(" AND ")}
         |        AND ${(5 to 10).map(n => s"dup${n}gram_frac <= ${dupGramMax(n)}").mkString(" AND ")}) AS keep
         |FROM f ORDER BY doc_id""".stripMargin)
  )

  /** Gopher repetition-signal battery (Rae et al., arXiv:2112.11446,
    * Table A1 — the WITHIN-document repetition half of the quality
    * suite; [[ruleFilters]] carries the format gates, q55 the
    * duplicate-bigram rate): per document,
    *
    *  - duplicate line / paragraph fraction: the fraction of units
    *    (lines split on `\n`, paragraphs on `\n\n`, empties dropped)
    *    belonging to any group that occurs more than once — ALL
    *    members of a duplicated group count, the published inventory's
    *    reading ("fraction of lines that are duplicates");
    *  - duplicate line / paragraph CHARACTER fraction: the same rule
    *    weighted by unit length;
    *  - top n-gram character fraction (n = 2..4): the most frequent
    *    word n-gram's occurrences x gram length, over the total
    *    occurrence-weighted n-gram characters (ties on count resolve
    *    by larger coverage — the tie value is then the same either
    *    way, so no string comparison crosses engines);
    *  - duplicate n-gram character fraction (n = 5..10): occurrence-
    *    weighted characters of all n-grams occurring more than once,
    *    over the same total.
    *
    * (DeepMind's exact character accounting is unpublished; these
    * denominators make every fraction a well-defined [0,1] ratio of
    * exact BIGINTs, so the oracle pins them bit-for-bit.) Gates apply
    * the published Table A1 ceilings; `keep` = all thirteen pass. A
    * document with fewer than n tokens has no n-gram evidence and
    * scores 0 for that n.
    *
    * Scale shape: a PURE NARROW MAP — every fraction is a per-document
    * statistic, so none of it ever needs to leave the row. The
    * compiled [[graft.expressions.GopherRepetition]] kernel computes
    * all thirteen in one JVM pass per document (q55's repetition()
    * argument widened to the full battery; the declarative
    * explode-and-aggregate form pays nine corpus-sized (doc, gram)
    * shuffles and interpreted per-gram HOF dispatch — measured 5x
    * slower at sf0.1 and needless at any scale). Zero joins, zero
    * aggregates; per-task memory is bounded by the largest single
    * document (see the kernel's scaladoc). */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val fracs = Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
      "dup_para_char_frac") ++ (2 to 4).map(n => s"top${n}gram_frac") ++
      (5 to 10).map(n => s"dup${n}gram_frac")
    docs
      .withColumn("rs", graft.expressions.Exprs.gopherRepetition(col("text")))
      .where(col("rs").isNotNull) // zero-token docs carry no signals
      .select(col("doc_id") +: fracs.map(f => col(s"rs.$f").as(f)): _*)
      .withColumn("r_dup_line", col("dup_line_frac") <= dupLineMax)
      .withColumn("r_dup_line_char", col("dup_line_char_frac") <= dupLineCharMax)
      .withColumn("r_dup_para", col("dup_para_frac") <= dupParaMax)
      .withColumn("r_dup_para_char", col("dup_para_char_frac") <= dupParaCharMax)
      .withColumn("r_top2", col("top2gram_frac") <= topGramMax(2))
      .withColumn("r_top3", col("top3gram_frac") <= topGramMax(3))
      .withColumn("r_top4", col("top4gram_frac") <= topGramMax(4))
      .withColumn("r_dup5", col("dup5gram_frac") <= dupGramMax(5))
      .withColumn("r_dup6", col("dup6gram_frac") <= dupGramMax(6))
      .withColumn("r_dup7", col("dup7gram_frac") <= dupGramMax(7))
      .withColumn("r_dup8", col("dup8gram_frac") <= dupGramMax(8))
      .withColumn("r_dup9", col("dup9gram_frac") <= dupGramMax(9))
      .withColumn("r_dup10", col("dup10gram_frac") <= dupGramMax(10))
      .withColumn("keep",
        col("r_dup_line") && col("r_dup_line_char") && col("r_dup_para")
          && col("r_dup_para_char") && col("r_top2") && col("r_top3")
          && col("r_top4") && col("r_dup5") && col("r_dup6") && col("r_dup7")
          && col("r_dup8") && col("r_dup9") && col("r_dup10"))
  }

  /** URL/domain blocklist annotation: appends `urls` (every extracted
    * URL host), `n_urls`, `blocked_hosts` (those matching `blocked` —
    * exact host or any subdomain of a blocked domain), and `n_blocked`
    * to a documents frame; callers drop `n_blocked > 0` rows or route
    * them for review. The blocklist folds into the row expression as
    * literals (real blocklists of ~1e5 domains would broadcast-join on
    * the registered domain instead — this form is for the curated-list
    * case), so the whole operator is a narrow map: zero shuffles,
    * embarrassingly parallel at any corpus size. */
  def urlFilter(docs: org.apache.spark.sql.DataFrame,
                blocked: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing to filter")
    // recall edges a byte-exact match would miss (hosts are
    // case-insensitive per RFC, URLs end at ports/punctuation in
    // prose): the scheme matches case-insensitively, the host charset
    // [A-Za-z0-9.-] stops BEFORE ':8080' / ',' / ')' on its own, and
    // extracted hosts are lowercased; the blocklist is normalized the
    // same way so a mixed-case entry still matches.
    val blockedLc = blocked.map(_.toLowerCase)
    val isBlocked = (h: org.apache.spark.sql.Column) =>
      blockedLc.map(b => h === b || h.endsWith("." + b)).reduce(_ || _)
    docs
      .withColumn("urls", transform(
        regexp_extract_all(col("text"), lit("(?i)https?://([A-Za-z0-9.-]+)"), lit(1)),
        // lowercase + strip trailing dots: a sentence-final period joins
        // the charset match, and 'bad.com.' is the same FQDN as 'bad.com'
        h => lower(regexp_replace(h, lit("\\.+$"), lit("")))))
      .withColumn("n_urls", size(col("urls")).cast("long"))
      .withColumn("blocked_hosts", filter(col("urls"), isBlocked))
      .withColumn("n_blocked", size(col("blocked_hosts")).cast("long"))
  }

  /** Bloom-prefiltered decontamination (q94): q54's broadcast exact
    * index answers "which corpus docs share shingles with the
    * benchmark"; THIS operator is the shape you run first when even the
    * benchmark's exact hash index is too big to broadcast everywhere or
    * the corpus-side join volume is the bottleneck — build a
    * [[graft.ext.BloomAgg]] bitset over the benchmark's shingle hashes
    * (mBits/64 longs, map-side OR-combined), broadcast the ONE-row
    * bitset, and pre-filter the corpus's own shingles with pure column
    * arithmetic (k md5 probes + bit tests — no join, no shuffle). Only
    * the surviving candidates (true hits + the Bloom's false-positive
    * tail) reach the exact confirm join against the benchmark's
    * distinct-hash set. No false negatives by construction (BloomSpec
    * pins it), so the confirmed set equals q54's ground truth; the
    * output quantifies the trade per source: total shingles vs
    * bloom candidates vs true hits.
    *
    * Returns (source, n_shingles, n_candidates, n_true_hits) per
    * non-benchmark source, ordered by source. */
  def bloomDecontaminate(docs: org.apache.spark.sql.DataFrame,
                         mBits: Int, kSalts: Int,
                         benchSource: String = "src0",
                         scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    // persisted: three consumers (bloom build, probe pass, totals)
    val idx = scope.persist(docs
      .select(col("doc_id"), col("source"),
        explode(graft.expressions.Exprs.shingleHashes(col("text"))).as("h")))
    val bench = idx.where(col("source") === benchSource).select(col("h"))
    val bloom = bench.as[Long]
      .select(new graft.ext.BloomAgg(mBits, kSalts).toColumn).toDF("bits")
    val corpus = idx.where(col("source") =!= benchSource)
    // k probe positions as named columns, then pure-arithmetic bit tests
    // against the broadcast one-row bitset (div/% keep longs exact)
    val probed = (0 until kSalts).foldLeft(corpus.crossJoin(broadcast(bloom))) {
      (df, s) => df.withColumn(s"p$s",
        TextOps.saltedHash(s, col("h").cast("string")) % mBits)
    }
    val hit = (0 until kSalts).map(s =>
      expr(s"((element_at(bits, cast(p$s div 64 as int) + 1) >> cast(p$s % 64 as int)) & 1) = 1"))
      .reduce(_ && _)
    val cand = probed.where(hit).select(col("source"), col("h"))
    val benchSet = bench.distinct().withColumn("in_bench", lit(1L))
    val confirmed = cand.join(broadcast(benchSet), Seq("h"), "left")
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_candidates"),
        sum(coalesce(col("in_bench"), lit(0L))).as("n_true_hits"))
    val totals = corpus.groupBy(col("source")).agg(count(lit(1)).as("n_shingles"))
    totals.join(confirmed, Seq("source"), "left")
      .select(col("source"), col("n_shingles"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_true_hits"), lit(0L)).as("n_true_hits"))
      .orderBy(col("source"))
  }

  /** Deterministic interleave manifest (q99): the global training ORDER
    * a multi-source loader consumes — source s's j-th doc (doc_id order)
    * gets the quantized stride key ⌊(2j−1)·G / n_s⌋, the classic
    * Bresenham/stride-scheduling rule that spaces each source's docs
    * evenly across [0, 2G) proportional to its size, so no source forms
    * long same-source runs (T5/Pile-style deterministic mixing without
    * an RNG). Key collisions across sources break deterministically on
    * (source, doc_id) — the contract is the G-QUANTIZED interleave,
    * exact both engines. Overflow bound: 2·j_max·G < 2^63; the default
    * G = 2^40 covers 4M docs per source, and a 100 TB deployment drops
    * G (evenness degrades only at the G/n_s granularity).
    *
    * Scale shape: per-source j and the global contiguous position are
    * BOTH sharded distributed prefix-counts (range-shard, local
    * row_number, broadcast shard offsets — the q53/q64 machinery; a
    * bare global row_number window is one reducer over the corpus).
    * The final total order ships as the range-partitioned sort the
    * manifest write needs anyway.
    *
    * Returns (pos, source, doc_id, k) with pos = 1..N contiguous. */
  def interleaveManifest(docs: org.apache.spark.sql.DataFrame,
                         quantum: Long = 1L << 40,
                         scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    require(quantum > 0, s"quantum must be positive, got $quantum")
    val nShards = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val base = docs.select(col("source"), col("doc_id"))
    // ---- per-source j (sharded prefix-count)
    val sharded = base.repartitionByRange(nShards, col("source"), col("doc_id"))
      .withColumn("shard", spark_partition_id())
    val wLoc = Window.partitionBy(col("shard"), col("source")).orderBy(col("doc_id"))
    val local = scope.persist(sharded
      .withColumn("lj", row_number().over(wLoc).cast("long")))
    val wOff = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local.groupBy(col("shard"), col("source")).agg(max(col("lj")).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("shard"), col("source"), col("off"))
    val ns = base.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val keyed = local.join(broadcast(offs), Seq("shard", "source"))
      .join(broadcast(ns), Seq("source"))
      .withColumn("k", expr(s"((2 * (lj + off) - 1) * ${quantum}L) div ns"))
      .select(col("source"), col("doc_id"), col("k"))
    // ---- global contiguous pos over the key order (sharded prefix-count;
    // shards hold contiguous key ranges by construction, so local
    // row_numbers + shard offsets ARE the global rank)
    val sharded2 = keyed.repartitionByRange(nShards, col("k"), col("source"), col("doc_id"))
      .withColumn("shard2", spark_partition_id())
    val wLoc2 = Window.partitionBy(col("shard2"))
      .orderBy(col("k"), col("source"), col("doc_id"))
    val local2 = scope.persist(sharded2
      .withColumn("lp", row_number().over(wLoc2).cast("long")))
    val wOff2 = Window.partitionBy(lit(1)).orderBy(col("shard2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs2 = local2.groupBy(col("shard2")).agg(max(col("lp")).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff2), lit(0L)))
      .select(col("shard2"), col("off"))
    local2.join(broadcast(offs2), Seq("shard2"))
      .select((col("lp") + col("off")).as("pos"), col("source"), col("doc_id"), col("k"))
      .orderBy(col("pos"))
  }

  /** The [[unimaxSelect]] oracle chain as a reusable CTE block over any
    * relation `rel` carrying (source, doc_id, n_tok, quality): emits
    * `tot/caps/rkd/flg/agg/alloc/c/sel`, where `sel` is the selected
    * doc set with (source, doc_id, n_tok, quality, tot, cap, capped,
    * alloc, end_tok). Shared by the q92 and q100 oracles so the
    * waterfilling restatement cannot drift between them. */
  private def sqlUnimax(rel: String, budget: Long): String =
    s"""tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tot FROM $rel GROUP BY 1),
       |caps AS (SELECT source, tot, tot * 1 AS cap FROM tot),
       |rkd AS (
       |  SELECT source, tot, cap,
       |         row_number() OVER (ORDER BY cap ASC, source ASC) AS r,
       |         CAST(COALESCE(SUM(cap) OVER (ORDER BY cap ASC, source ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pfx,
       |         COUNT(*) OVER () AS k
       |  FROM caps),
       |flg AS (SELECT *, cap * (k - r + 1) <= $budget - pfx AS capped FROM rkd),
       |agg AS (
       |  SELECT *,
       |         CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) OVER () AS BIGINT) AS spent,
       |         CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS BIGINT) AS nun,
       |         row_number() OVER (PARTITION BY capped ORDER BY source ASC) AS urk
       |  FROM flg),
       |alloc AS (
       |  SELECT source, tot, cap, capped,
       |         CAST(CASE WHEN capped THEN cap
       |              ELSE ($budget - spent) // greatest(nun, 1)
       |                   + (CASE WHEN urk <= ($budget - spent) % greatest(nun, 1)
       |                      THEN 1 ELSE 0 END)
       |              END AS BIGINT) AS alloc
       |  FROM agg),
       |c AS (
       |  SELECT p.source, p.doc_id, p.n_tok, p.quality, a.tot, a.cap, a.capped, a.alloc,
       |         SUM(p.n_tok) OVER (PARTITION BY p.source ORDER BY p.quality DESC, p.doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
       |  FROM $rel p JOIN alloc a USING (source)),
       |sel AS (SELECT * FROM c WHERE end_tok <= alloc)""".stripMargin

  /** Token-budget mixture selection: per source, docs best-quality-first
    * (ties on doc_id) until `budgetPerSource` tokens fill; a doc is kept
    * iff it fits ENTIRELY (its cumulative end <= budget), so one
    * over-budget doc at the front of a source blocks that source — the
    * deterministic "take until full" contract, not best-effort packing.
    * Returns the kept (source, doc_id, n_tok, quality, end_tok) rows.
    *
    * Scale shape: the per-source quality-ranked cumsum runs as the same
    * sharded prefix-sum as q53 (range-shard on the full sort key, local
    * window, broadcast offsets) — a plain per-source window would be one
    * reducer per source (~20 stragglers at corpus scale). PlanAuditSpec
    * pins the shard-partitioned window + range partitioning.
    *
    * Caching: the scored projection (range-sampler double-eval guard)
    * and the local cumsum (two consumers) persist — pass a
    * [[graft.engine.CacheScope]] to own the release, as with
    * [[TextQueries.curatedDocs]]. */
  def budgetSelect(docs: org.apache.spark.sql.DataFrame,
                   budgetPerSource: Long,
                   scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    val nShards = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted BEFORE the range exchange: unlike q53 (whose sort key
    // needs no tokens, so it tokenizes after the shuffle), the sort key
    // HERE is the quality score — and the range partitioner's sampling
    // job would otherwise run the whole tokenizer+scoring pipeline a
    // second time for the shuffle write. Four narrow columns per doc.
    val scored0 = scope.persist(TextQueries.withQuality(docs)
      .select(col("source"), col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        col("quality")))
    val scored = scored0
      .repartitionByRange(nShards, col("source"), col("quality").desc, col("doc_id"))
      .withColumn("shard", spark_partition_id())
    val wLoc = Window.partitionBy(col("shard"), col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    // two consumers (spans + offsets)
    val local = scope.persist(scored.withColumn("local_end", sum(col("n_tok")).over(wLoc)))
    val wOff = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("shard"), col("source"))
      .agg(max(col("local_end")).as("shard_tok"))
      .withColumn("offset", coalesce(sum(col("shard_tok")).over(wOff), lit(0L)))
      .select(col("shard"), col("source"), col("offset"))
    local.join(broadcast(offsets), Seq("shard", "source"))
      .withColumn("end_tok", col("local_end") + col("offset"))
      .where(col("end_tok") <= budgetPerSource)
      .select(col("source"), col("doc_id"), col("n_tok"), col("quality"), col("end_tok"))
  }

  /** Temperature-smoothed domain-mixture selection (q88): apportion ONE
    * global token budget across sources by exponentiated-share weights
    * at α = 0.5 — w_s = ⌊√(source's total tokens)⌋, the published
    * smoothing that upweights rare domains relative to their natural
    * share (Conneau & Lample, "Cross-lingual Language Model
    * Pretraining", NeurIPS 2019 §3.1; the same α-sampling XLM-R and
    * multilingual BERT document) — then fill each source's allocation
    * greedily by (quality DESC, doc_id), the q64 rule.
    *
    * The apportionment is EXACT integer arithmetic end-to-end
    * (largest-remainder / Hamilton rounding): base_s = (B·w_s) div W,
    * and the (B − Σ base_s) leftover tokens go +1 each to the largest
    * (B·w_s) mod W remainders, ties to the lexicographically first
    * source — so Σ target_s = B identically and both engines agree bit
    * for bit. The only double in the weight is √tot computed on an
    * exactly-represented long (IEEE sqrt is correctly rounded, floor is
    * exact; tot must stay under 2^52 ≈ 4.5e15 tokens per source — a
    * comfortable bound even at 100 TB). Overflow bound: B·w_s must stay
    * under 2^63.
    *
    * Scale shape: the per-source totals are one map-side-combined
    * aggregate; the apportionment runs on the SOURCES-row frame (the
    * single-partition windows there move k rows, k = #domains, by
    * definition small); the selection is [[budgetSelect]]'s sharded
    * distributed prefix-sum with the per-source cap joined from the
    * broadcast allocation table — no global sort, no partition larger
    * than corpus/#shards.
    *
    * Returns the selected docs carrying (source, doc_id, n_tok,
    * quality, end_tok, weight, target_tokens). */
  def mixtureSelect(docs: org.apache.spark.sql.DataFrame,
                    totalBudget: Long,
                    scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    val nShards = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted before the range exchange for budgetSelect's reason: the
    // range partitioner's sampling pass would re-run the scoring pipeline
    val scored0 = scope.persist(TextQueries.withQuality(docs)
      .select(col("source"), col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        col("quality")))
    // ---- apportionment on the k-row per-source frame
    val wAll = Window.partitionBy(lit(1))
    val alloc = scored0.groupBy(col("source")).agg(sum(col("n_tok")).as("tot"))
      .select(col("source"), floor(sqrt(col("tot").cast("double"))).cast("long").as("w"))
      .withColumn("wsum", sum(col("w")).over(wAll))
      .withColumn("base", expr(s"($totalBudget * w) div wsum"))
      .withColumn("rem", expr(s"($totalBudget * w) % wsum"))
      .withColumn("xtra", lit(totalBudget) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("source").asc)))
      .select(col("source"), col("w").as("weight"),
        (col("base") + when(col("rk") <= col("xtra"), 1L).otherwise(0L))
          .as("target_tokens"))
    // ---- budgetSelect's sharded prefix-sum, cap joined per source
    fillByAllocation(scored0, alloc, Seq("weight", "target_tokens"), nShards, scope)
  }

  /** The greedy per-source fill shared by [[mixtureSelect]] and
    * [[unimaxSelect]]: [[budgetSelect]]'s sharded distributed prefix-sum
    * over (quality DESC, doc_id) with each source's cap joined from the
    * broadcast `alloc` table (which must carry `source` and
    * `target_tokens`; its `carry` columns ride along into the output).
    * A doc is kept iff its cumulative end fits ENTIRELY — the same
    * take-until-full contract as q64. Returns (source, doc_id, n_tok,
    * quality, end_tok, carry...). */
  private def fillByAllocation(scored0: org.apache.spark.sql.DataFrame,
                               alloc: org.apache.spark.sql.DataFrame,
                               carry: Seq[String], nShards: Int,
                               scope: CacheScope): org.apache.spark.sql.DataFrame = {
    val scored = scored0
      .repartitionByRange(nShards, col("source"), col("quality").desc, col("doc_id"))
      .withColumn("shard", spark_partition_id())
    val wLoc = Window.partitionBy(col("shard"), col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    val local = scope.persist(scored.withColumn("local_end", sum(col("n_tok")).over(wLoc)))
    val wOff = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("shard"), col("source"))
      .agg(max(col("local_end")).as("shard_tok"))
      .withColumn("offset", coalesce(sum(col("shard_tok")).over(wOff), lit(0L)))
      .select(col("shard"), col("source"), col("offset"))
    local.join(broadcast(offsets), Seq("shard", "source"))
      .withColumn("end_tok", col("local_end") + col("offset"))
      .join(broadcast(alloc), Seq("source"))
      .where(col("end_tok") <= col("target_tokens"))
      .select((Seq("source", "doc_id", "n_tok", "quality", "end_tok") ++ carry).map(col): _*)
  }

  /** UniMax epoch-capped mixture selection (q92): allocate ONE global
    * token budget B as UNIFORMLY as possible across sources, except no
    * source may exceed `maxEpochs` passes over its own corpus — the
    * published UniMax sampler (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023, Algorithm 1), the successor to q88's
    * temperature smoothing that removes the temperature hyperparameter
    * entirely. Then fill each source's allocation greedily by
    * (quality DESC, doc_id), the q64 rule.
    *
    * The waterfilling is EXACT integer arithmetic end-to-end. In
    * ascending cap order (cap_s = maxEpochs·tot_s, ties broken on
    * source name), source at rank r is SATURATED iff its cap fits under
    * the uniform share still available when the waterline reaches it:
    * cap_r · (k − r + 1) ≤ B − Σ_{j<r} cap_j. That predicate is
    * provably monotone in r (if it fails at r it fails at every later
    * rank: caps ascend while the remaining budget per remaining source
    * only tightens), so the saturated set is a PREFIX and each row can
    * decide it independently from its own exclusive prefix sum — no
    * sequential driver loop. Saturated sources get their cap; the
    * leftover splits over the u unsaturated sources as
    * ⌊left/u⌋ (+1 for the first left mod u of them by source name) —
    * largest-remainder uniformity, so Σ alloc = B identically whenever
    * any source is unsaturated, and alloc = cap everywhere when B
    * exceeds every cap (the epoch bound, not the budget, then binds —
    * exactly the UniMax contract). Overflow bound: maxEpochs·tot_s and
    * cap·k must stay under 2^63 — comfortable at 100 TB.
    *
    * Scale shape: identical to q88 — one map-side-combined per-source
    * total, waterfilling windows on the k-row frame (k = #domains,
    * small by definition), then [[fillByAllocation]]'s sharded
    * distributed prefix-sum with the broadcast allocation table.
    *
    * Returns the kept docs carrying (source, doc_id, n_tok, quality,
    * end_tok, tot_tokens, cap_tokens, capped, target_tokens). */
  def unimaxSelect(docs: org.apache.spark.sql.DataFrame,
                   totalBudget: Long,
                   maxEpochs: Long = 1L,
                   scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame =
    // persisted before the range exchange (see mixtureSelect)
    unimaxSelectScored(scope.persist(TextQueries.withQuality(docs)
        .select(col("source"), col("doc_id"), col("n_tok").cast("long").as("n_tok"),
          col("quality"))),
      totalBudget, maxEpochs, scope)

  /** [[unimaxSelect]] for callers that already hold the scored NARROW
    * frame — exactly (source, doc_id, n_tok BIGINT, quality), one row
    * per candidate doc, ALREADY pinned (it feeds the allocation
    * aggregate and the fill's range exchange). q100 shares one such
    * persist between this allocator and its per-source curated counts
    * instead of pinning the whole text-bearing curated frame (r21
    * verdict: the wide persist was the 8c run's worst reading; the
    * narrow one caches 4 scalar columns instead of the corpus text). */
  private[graft] def unimaxSelectScored(scored0: org.apache.spark.sql.DataFrame,
                                        totalBudget: Long,
                                        maxEpochs: Long = 1L,
                                        scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val nShards = scored0.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val wAll = Window.partitionBy(lit(1))
    val wAsc = Window.partitionBy(lit(1)).orderBy(col("cap").asc, col("source").asc)
    val alloc = scored0.groupBy(col("source")).agg(sum(col("n_tok")).as("tot"))
      .withColumn("cap", col("tot") * maxEpochs)
      .withColumn("r", row_number().over(wAsc))
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("pfx", coalesce(sum(col("cap"))
        .over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        col("cap") * (col("k") - col("r") + lit(1)) <= lit(totalBudget) - col("pfx"))
      .withColumn("spent", sum(when(col("capped"), col("cap")).otherwise(0L)).over(wAll))
      .withColumn("nun", sum(when(col("capped"), 0L).otherwise(1L)).over(wAll))
      // rank among the unsaturated only (the saturated partition's
      // numbering is never read); greatest(nun, 1) keeps the untaken
      // branch division total when EVERY source saturates
      .withColumn("urk", row_number().over(
        Window.partitionBy(col("capped")).orderBy(col("source").asc)))
      .withColumn("target_tokens", when(col("capped"), col("cap")).otherwise(
        expr(s"($totalBudget - spent) div greatest(nun, 1)") +
          when(col("urk") <= expr(s"($totalBudget - spent) % greatest(nun, 1)"), 1L)
            .otherwise(0L)))
      .select(col("source"), col("tot").as("tot_tokens"), col("cap").as("cap_tokens"),
        col("capped"), col("target_tokens"))
    fillByAllocation(scored0, alloc,
      Seq("tot_tokens", "cap_tokens", "capped", "target_tokens"), nShards, scope)
  }

  /** q53's body as a library function: each doc's [end_tok - n_tok,
    * end_tok) token span under per-language concatenation in (lang,
    * doc_id) order — the packing assignment a pretraining loader
    * consumes. Returns (lang, doc_id, shard, n_tok, end_tok); empty
    * docs emit no row.
    *
    * Scale shape: DISTRIBUTED prefix-sum — range-partition by the
    * concatenation order into shards, cumsum inside each shard (one
    * bounded sort per shard), add back each shard's exclusive-prefix
    * offset via a broadcast of the tiny (shard, lang, offset) table.
    * Result-identical to a global per-lang window for ANY
    * order-respecting sharding, but with ~5 languages and a 100 TB
    * corpus a lang-partitioned window is 5 single-reducer sorts —
    * this shape never builds a partition larger than corpus/#shards
    * (PlanAuditSpec pins it). Range partitioner bounds are
    * sample-based, but any boundary choice yields the same end_tok:
    * shards hold contiguous (lang, doc_id) ranges in partition-id
    * order by construction. Tokenize AFTER the exchange: the range
    * sampler evaluates its child twice (sample pass + shuffle write),
    * so a pre-exchange token count would run the tokenizer over the
    * corpus twice. Filtering empty docs after sharding keeps
    * contiguity — a filter cannot reorder rows across shard
    * boundaries.
    *
    * Caching: the local cumsum persists (spans + offsets both read
    * it) — pass a [[graft.engine.CacheScope]] to own the release, as
    * with [[TextQueries.curatedDocs]]. */
  def packingSpans(docs: org.apache.spark.sql.DataFrame,
                   scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    val nShards = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sharded = docs
      .select(col("lang"), col("doc_id"), col("text"))
      .repartitionByRange(nShards, col("lang"), col("doc_id"))
      .withColumn("shard", spark_partition_id())
      .select(col("lang"), col("doc_id"), col("shard"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
    val wLoc = Window.partitionBy(col("shard"), col("lang")).orderBy(col("doc_id"))
    // two consumers (spans + offsets)
    val local = scope.persist(sharded.withColumn("local_end", sum(col("n_tok")).over(wLoc)))
    // per-(shard, lang) totals: #shards × #langs rows — window over
    // this tiny aggregate is driver-scale work, then broadcast back
    val wOff = Window.partitionBy(col("lang")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("shard"), col("lang"))
      .agg(max(col("local_end")).as("shard_tok"))
      .withColumn("offset", coalesce(sum(col("shard_tok")).over(wOff), lit(0L)))
      .select(col("shard"), col("lang"), col("offset"))
    local.join(broadcast(offsets), Seq("shard", "lang"))
      .withColumn("end_tok", col("local_end") + col("offset"))
      .select(col("lang"), col("doc_id"), col("shard"), col("n_tok"), col("end_tok"))
  }

  /** q68's body as a library function: per-doc corpus-trained bigram
    * rarity — (doc_id, n_bigrams, rare_bigrams, rarity, avg_freq),
    * where a bigram is corpus-rare when its total occurrence count is
    * <= `rareMax`. Docs with < 2 tokens have no bigrams and emit no
    * row (no rarity evidence); compositions treat them as unscored
    * and keep them.
    *
    * Scale shape (q68's comment in `defs` has the full story): ONE
    * tokenize/explode pass pre-aggregated to per-(doc, bigram)
    * multiplicities over 60-bit hashed keys (map-side combined),
    * corpus counts derived as sum(m), one distinct-bigram-sized
    * equi-join probe. No all-pairs anywhere.
    *
    * Caching: the multiplicity table — the largest intermediate in
    * the query set at corpus scale — persists (counts + scoring both
    * read it); pass a [[graft.engine.CacheScope]] to own the release,
    * as with [[TextQueries.curatedDocs]]. */
  def bigramRarity(docs: org.apache.spark.sql.DataFrame,
                   rareMax: Long = rareMaxCount,
                   scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    val perDoc = scope.persist(docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(tk)), i -> concat(element_at(tk, i - 1), ' ', element_at(tk, i)))")).as("g"))
      .select(col("doc_id"), TextOps.hash60("b", col("g")).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("m")))
    val counts = perDoc.groupBy(col("h")).agg(sum(col("m")).as("c"))
    perDoc.join(counts, Seq("h"))
      .groupBy(col("doc_id")).agg(
        sum(col("m")).as("n_bigrams"),
        sum(when(col("c") <= rareMax, col("m")).otherwise(0L)).as("rare_bigrams"),
        sum(col("m") * col("c")).as("sum_freq"))
      .select(col("doc_id"), col("n_bigrams"), col("rare_bigrams"),
        (col("rare_bigrams") / col("n_bigrams")).as("rarity"),
        (col("sum_freq") / col("n_bigrams")).as("avg_freq"))
  }

  /** DSIR-style hashed-ngram importance scoring (Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169): score every raw doc by how much its hashed
    * unigram+bigram profile resembles a TARGET slice (by default the
    * high-quality-English docs, per the shared quality formula) versus
    * the raw corpus as a whole — the published recipe for selecting
    * pretraining data that looks like a trusted reference set. Feature
    * space: md5-derived 60-bit gram hashes folded into `nBuckets`
    * buckets (the paper's hashed n-gram generative model), both
    * distributions Laplace-smoothed (+1 per bucket).
    *
    * Estimator note — parity by construction: the paper scores docs by
    * a log-probability-ratio SUM, but a float log-sum is not
    * bit-reproducible across engines, so this operator uses the ratio
    * of smoothed MASSES instead: with m_g the doc's count of gram g,
    * b(g) its bucket, p/q the target/raw bucket counts and P/Q their
    * totals,
    *   importance = [Σ m_g·(p_b(g)+1)] · (Q+B)  /  [Σ m_g·(q_b(g)+1)] · (P+B)
    * — the doc's average per-gram target-model mass over its average
    * raw-model mass. Both sums are exact BIGINT accounting; the score
    * is four exact int→double conversions, one multiply per side, one
    * division — bit-identical in any IEEE-754 engine (q68's parity
    * pattern). Monotone agreement with the log form is not claimed
    * (it is a different mean); the selection semantics are the
    * paper's: docs whose gram profile is target-enriched score > 1,
    * anti-target profiles score ≪ 1, and out-of-vocabulary grams pull
    * toward the smoothing prior (Q+B)/(P+B).
    *
    * Scale shape: the tokenize/explode pipeline runs ONCE,
    * pre-aggregated map-side to per-(doc, bucket) multiplicities and
    * persisted for its two consumers; the bucket distributions are
    * `nBuckets` rows computed in ONE aggregation (the target flag
    * rides the gram rows, so p and q are two sums of the same
    * groupBy), broadcast back for scoring — the only data-sized
    * shuffles are the two doc-keyed aggregations. The smoothing
    * totals join as a broadcast 1-row cross (q05's scalar pattern).
    * Nothing is all-pairs; no driver-side collect. Overflow bound: a
    * per-doc mass is ≤ n_grams_doc · (corpus grams + 1), so BIGINT
    * accounting is exact past 10^9-gram corpora for multi-thousand-
    * token docs; the final score's int→double conversions round
    * identically in both engines regardless, so parity outlives
    * exactness. */
  def importanceWeights(docs: org.apache.spark.sql.DataFrame,
                        target: org.apache.spark.sql.Column =
                          col("lang") === "en" && col("quality") >= dsirTargetQuality,
                        nBuckets: Long = dsirBuckets,
                        scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    val grams = TextQueries.withQuality(docs)
      .select(col("doc_id"), target.as("is_target"), col("toks"))
      // unigrams ++ bigrams in one materialized array (TextOps class
      // doc: toks is already a plain attribute, so the higher-order
      // transform evaluates it once); the if-guard keeps sequence()
      // ascending-only — sequence(2, 1) would DESCEND, not empty out
      .withColumn("grams", expr(
        "concat(toks, if(size(toks) >= 2, transform(sequence(2, size(toks)), " +
          "i -> concat(element_at(toks, i - 1), ' ', element_at(toks, i))), array()))"))
      .select(col("doc_id"), col("is_target"), explode(col("grams")).as("g"))
    val perDoc = scope.persist(grams
      .select(col("doc_id"), col("is_target"),
        (TextOps.hash60("i", col("g")) % nBuckets).as("b"))
      .groupBy(col("doc_id"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("m")))
    val buckets = perDoc.groupBy(col("b")).agg(
      sum(col("m")).as("q_cnt"),
      sum(when(col("is_target"), col("m")).otherwise(0L)).as("p_cnt"))
    val totals = buckets.agg(
      sum(col("q_cnt")).as("q_tot"), sum(col("p_cnt")).as("p_tot"))
    perDoc.join(broadcast(buckets), Seq("b"))
      .groupBy(col("doc_id")).agg(
        sum(col("m")).as("n_grams"),
        sum(col("m") * (col("p_cnt") + lit(1L))).as("target_mass"),
        sum(col("m") * (col("q_cnt") + lit(1L))).as("raw_mass"))
      .crossJoin(broadcast(totals))
      .withColumn("importance",
        (col("target_mass").cast("double") * (col("q_tot") + lit(nBuckets)))
          / (col("raw_mass").cast("double") * (col("p_tot") + lit(nBuckets))))
      .select(col("doc_id"), col("n_grams"), col("target_mass"), col("raw_mass"),
        col("importance"), (col("importance") >= lit(1e0)).as("selected"))
  }

  /** Gopher/C4-style rule-filter battery — the hard boolean gates a
    * web-corpus pipeline runs BEFORE any scoring (Rae et al.,
    * arXiv:2112.11446 Table A1; Raffel et al., arXiv:1910.10683 §2.2),
    * distinct from q31's continuous quality score: each rule is an
    * independent published threshold, and `keep` is their conjunction.
    * Per doc over (doc_id, text):
    *
    *  - r_words:  50 <= word count <= 100,000          (Gopher)
    *  - r_wlen:   3 <= mean word length <= 10          (Gopher)
    *  - r_symbol: (#{'#'} + #{'...'}) / words <= 0.1   (Gopher)
    *  - r_bullet: bullet-started line fraction < 0.9   (Gopher)
    *  - r_dots:   '...'-ended line fraction <= 0.3     (Gopher)
    *  - r_alpha:  words containing a letter >= 0.8     (Gopher)
    *  - r_stop:   >= 1 stop word present               (Gopher, corpus-
    *              adapted threshold — see [[gopherStops]])
    *  - r_lorem:  no 'lorem ipsum'                     (C4)
    *  - r_brace:  no '{'                               (C4)
    *
    * Words are whitespace tokens (symbol and digit runs COUNT as words
    * — that is what the symbol/alpha ratios measure); lines are
    * newline splits, empties dropped on both axes.
    *
    * Scale shape: a pure narrow map — one projection pass per doc,
    * zero joins, zero aggregations, nothing leaves the partition
    * (PlanAuditSpec pins exchanges == 1, the output sort only). Every
    * ratio is exact BIGINT-over-BIGINT division, so the doubles and
    * the derived booleans are bit-identical in any IEEE-754 engine and
    * independent of partitioning. The `w`/`ln` arrays materialize as
    * their own projection columns before any higher-order consumer
    * (TextOps class doc: un-materialized array args re-evaluate per
    * element). */
  def ruleFilters(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = docs
    .withColumn("w", TextOps.tokens(col("text")))
    .withColumn("ln", filter(split(col("text"), "\n"), x => x =!= ""))
    .withColumn("n_words", size(col("w")).cast("long"))
    .where(col("n_words") > 0)
    .withColumn("n_lines", size(col("ln")).cast("long"))
    .withColumn("sum_wlen",
      aggregate(transform(col("w"), x => length(x).cast("long")), lit(0L), (a, x) => a + x))
    .withColumn("hash_cnt",
      (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))).cast("long"))
    .withColumn("dots_cnt",
      ((length(col("text")) - length(replace(col("text"), lit("..."), lit("")))) / lit(3)).cast("long"))
    .withColumn("alpha_cnt", size(filter(col("w"), x => x.rlike("[A-Za-z]"))).cast("long"))
    .withColumn("stop_kinds", gopherStops.map(sw =>
      when(array_contains(col("w"), sw), lit(1L)).otherwise(lit(0L))).reduce(_ + _))
    .withColumn("bullet_cnt",
      size(filter(col("ln"), x => x.startsWith("- ") || x.startsWith("* "))).cast("long"))
    .withColumn("dotl_cnt", size(filter(col("ln"), x => x.endsWith("..."))).cast("long"))
    .withColumn("mean_wlen", col("sum_wlen") / col("n_words"))
    .withColumn("symbol_ratio", (col("hash_cnt") + col("dots_cnt")) / col("n_words"))
    .withColumn("alpha_frac", col("alpha_cnt") / col("n_words"))
    .withColumn("bullet_frac", col("bullet_cnt") / col("n_lines"))
    .withColumn("dots_line_frac", col("dotl_cnt") / col("n_lines"))
    .withColumn("r_words", col("n_words") >= 50L && col("n_words") <= 100000L)
    .withColumn("r_wlen", col("mean_wlen") >= 3e0 && col("mean_wlen") <= 10e0)
    .withColumn("r_symbol", col("symbol_ratio") <= 0.1e0)
    .withColumn("r_bullet", col("bullet_frac") < 0.9e0)
    .withColumn("r_dots", col("dots_line_frac") <= 0.3e0)
    .withColumn("r_alpha", col("alpha_frac") >= 0.8e0)
    .withColumn("r_stop", col("stop_kinds") >= 1L)
    .withColumn("r_lorem", !lower(col("text")).contains("lorem ipsum"))
    .withColumn("r_brace", !col("text").contains("{"))
    .withColumn("keep",
      col("r_words") && col("r_wlen") && col("r_symbol") && col("r_bullet")
        && col("r_dots") && col("r_alpha") && col("r_stop")
        && col("r_lorem") && col("r_brace"))
    .select(col("doc_id"), col("n_words"), col("mean_wlen"), col("symbol_ratio"),
      col("alpha_frac"), col("stop_kinds"), col("n_lines"), col("bullet_frac"),
      col("dots_line_frac"), col("r_words"), col("r_wlen"), col("r_symbol"),
      col("r_bullet"), col("r_dots"), col("r_alpha"), col("r_stop"),
      col("r_lorem"), col("r_brace"), col("keep"))

  /** Span-level benchmark decontamination — the removal step after
    * q54's doc-level flagging: instead of dropping every doc that
    * overlaps the held-out benchmark, excise ONLY the overlapping
    * token spans and keep the rest (what production pipelines do when
    * a contaminated doc is otherwise valuable). A corpus token is
    * covered when any word n-gram starting at or before it matches a
    * benchmark n-gram exactly (the same 3-gram shingle SEMANTICS as
    * q54 — identical tokenization and gram formation, so the two
    * operators agree on what "contaminated" means; the internal hash
    * differs: q54's doc-level flags go through the shared md5 shingle
    * kernel, while the span probe uses the positional xxhash64 grams —
    * see [[positionalGramHashes]]). Returns per-doc
    * (doc_id, n_tok, n_removed, clean) where `clean` is the
    * surviving tokens space-joined — token-level reconstruction, the
    * standard post-tokenizer form.
    *
    * Scale shape: the benchmark's distinct gram-hash set broadcasts
    * (benchmarks are tiny; the corpus is not — q54's argument), so
    * the corpus-side probe is a narrow map + broadcast join; the only
    * aggregation is over MATCHED gram positions (a small fraction of
    * the corpus), and the match list rejoins the token table by
    * doc_id with the small side broadcast from runtime stats. The
    * corpus itself is never shuffled. */
  def decontaminateSpans(corpus: org.apache.spark.sql.DataFrame,
                         benchmark: org.apache.spark.sql.DataFrame,
                         n: Int = 3): org.apache.spark.sql.DataFrame = {
    // not withShingles: that helper pins n = 3, and the benchmark and
    // corpus sides must agree on the SAME n for any setting
    val bGrams = benchmark
      .select(TextOps.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= n)
      .select(explode(TextOps.shinglesOf(col("tk"), n)).as("g"))
      .select(xxhash64(lit("g"), col("g")).as("h")) // must match positionalGramHashes' salt+hash
      .distinct()
    val toks = corpus.select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .withColumn("n_tok", size(col("tk")))
    val starts = positionalGramHashes(toks, n, "g").join(broadcast(bGrams), Seq("h"))
      .groupBy(col("doc_id")).agg(collect_list(col("i")).as("starts"))
    reconstructClean(toks.join(starts, Seq("doc_id"), "left"), n)
  }

  /** Positional word n-gram hashes over a (doc_id, tk, n_tok) frame:
    * one (doc_id, i, h) row per gram start index i (1-based). The
    * distinct-shingle kernel cannot serve the span operators — span
    * removal needs EVERY start index, not the distinct gram set.
    *
    * Hash choice: xxhash64 (codegen'd single pass), NOT the md5-derived
    * hash60 the fingerprint operators expose. Those operators OUTPUT
    * their hashes (q33/q36's fingerprints are oracle-compared values,
    * so both engines must compute the identical function); the span
    * operators only ever compare gram hashes AGAINST EACH OTHER inside
    * one engine run, and their oracle-compared outputs are the
    * reconstructed clean texts. Positional grams are the dominant
    * per-token cost at soak scale — one row per token, not per distinct
    * shingle — and the md5→substr→conv chain was ~half of q71's runtime
    * at 100× (r13 measurement), so the internal hash uses the cheap
    * kernel and 64 bits instead of 60. */
  private def positionalGramHashes(toks: org.apache.spark.sql.DataFrame, k: Int,
                                   salt: String): org.apache.spark.sql.DataFrame =
    toks.where(col("n_tok") >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, n_tok - ${k - 1}), i -> struct(i AS i, concat_ws(' ', slice(tk, i, $k)) AS g))")).as("pg"))
      .select(col("doc_id"), col("pg.i").as("i"),
        xxhash64(lit(salt), col("pg.g")).as("h"))

  /** Span-cover reconstruction over a (doc_id, tk, n_tok, starts) frame:
    * excise every k-token span at a matched start, emit (doc_id, n_tok,
    * n_removed, clean). The cover runs in the compiled
    * [[graft.expressions.TextHash.spanKept]] kernel — O(n_tok + m log m)
    * per doc where the lambda formulation (per-position exists() over
    * the match list) is O(n_tok * m), quadratic on a heavily
    * contaminated production doc. */
  private def reconstructClean(joined: org.apache.spark.sql.DataFrame,
                               k: Int): org.apache.spark.sql.DataFrame =
    joined
      .withColumn("kept", graft.expressions.Exprs.spanCoverKept(col("n_tok"),
        coalesce(col("starts"), expr("CAST(array() AS ARRAY<INT>)")), k))
      .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        (col("n_tok") - size(col("kept"))).cast("long").as("n_removed"),
        expr("array_join(transform(kept, j -> element_at(tk, j)), ' ')").as("clean"))

  /** Cross-document repeated-substring span dedup — the exact-substring
    * dedup of public pretraining practice (and the span-level
    * generalization of [[removeRepeatedLines]]): excise every token
    * span whose k-gram content occurs in >= `minDf` DISTINCT documents,
    * keeping the rest of each doc. Any repeated substring of length
    * >= k contains only hot k-grams, so covering the hot k-gram starts
    * removes exactly the cross-document-repeated spans of length >= k;
    * within-document repeats (df = 1) survive — the operator targets
    * cross-doc boilerplate, not self-repetition (q55 scores that).
    * Returns per-doc (doc_id, n_tok, n_removed, clean).
    *
    * Scale shape: gram df aggregates map-side on fixed-width 60-bit
    * hashes ([[removeRepeatedLines]]'s pattern — the gram text never
    * crosses the wire for counting); the positional-gram table persists
    * (df aggregate + match probe both read it); the hot set holds at
    * most total_grams / minDf rows and joins as a plain equi-join (NOT
    * a forced broadcast — unlike the benchmark side of
    * [[decontaminateSpans]], a corpus-derived hot set can be large, so
    * AQE picks the strategy from runtime stats); span assembly stays
    * row-local per doc. No all-pairs stage exists at any step. */
  def dedupRepeatedSpans(corpus: org.apache.spark.sql.DataFrame,
                         k: Int = 5, minDf: Long = 2,
                         scope: CacheScope = CacheScope.untracked): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "span gram length must be positive")
    require(minDf >= 2, "a span repeated in fewer than 2 docs is not cross-document")
    val toks = corpus.select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .withColumn("n_tok", size(col("tk")))
    // exchange sizing, gated on the optimizer's corpus-scan estimate (no
    // job below the threshold — see SpanGramRowsPerPartition): the
    // identity path keeps the session-default exchanges; the big path
    // counts grams once (one narrow scan+sum) and hash-repartitions the
    // gram table / match table so every downstream aggregate task sees a
    // bounded slice of the EXPLODED volume, not 1/32nd of it
    val sess = corpus.sparkSession
    val sessParts = numShufflePartitions(sess)
    val estBytes = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    val bigParts: Option[Int] =
      if (estBytes <= BigInt(sessParts) * SpanSmallCorpusBytesPerPartition) None
      else {
        val nGrams = toks
          .select(sum(greatest(col("n_tok") - (k - 1), lit(0))))
          .collect()(0).getLong(0)
        // dev-only knob, but validated up front: a malformed or
        // non-positive value would otherwise surface as a bare
        // NumberFormatException / ArithmeticException deep inside plan
        // construction with no hint of which env var caused it
        val rowsPerPart = sys.env.get("GRAFT_SPAN_GRAM_ROWS_PER_PART").map { v =>
          val n = try v.toLong catch {
            case e: NumberFormatException => throw new IllegalArgumentException(
              s"GRAFT_SPAN_GRAM_ROWS_PER_PART must be a positive long, got '$v'", e)
          }
          require(n > 0, s"GRAFT_SPAN_GRAM_ROWS_PER_PART must be > 0, got '$v'")
          n
        }.getOrElse(SpanGramRowsPerPartition)
        Some(math.max(sess.sparkContext.defaultParallelism,
          (nGrams / rowsPerPart + 1).toInt))
      }
    def sized(df: org.apache.spark.sql.DataFrame,
              key: String): org.apache.spark.sql.DataFrame =
      bigParts.fold(df)(p => df.repartition(p, col(key)))
    // spill-band tuning knobs (dev/bench experiments — see BENCH_NOTES
    // "q71 spill band"): GRAFT_SPAN_GRAM_STORAGE overrides the gram
    // table's storage level (StorageLevel.fromString names), and
    // GRAFT_SPAN_GRAM_ROWS_PER_PART the per-partition gram-row target
    // of the sized exchanges. Defaults = production behavior.
    val gramLevel = sys.env.get("GRAFT_SPAN_GRAM_STORAGE")
      .map { v =>
        try org.apache.spark.storage.StorageLevel.fromString(v)
        catch {
          case e: IllegalArgumentException => throw new IllegalArgumentException(
            s"GRAFT_SPAN_GRAM_STORAGE must be a StorageLevel name " +
              s"(e.g. MEMORY_AND_DISK, MEMORY_ONLY, DISK_ONLY), got '$v'", e)
        }
      }
      .getOrElse(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = scope.persist(sized(positionalGramHashes(toks, k, "d"), "h"), gramLevel)
    // cross-doc df: per-doc occurrences collapse map-side (distinct) so
    // a gram looping inside ONE doc cannot fake cross-doc evidence
    val hot = grams.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .select(col("h"))
    val starts = sized(grams.join(hot, Seq("h")), "doc_id")
      .groupBy(col("doc_id")).agg(collect_list(col("i")).as("starts"))
    reconstructClean(toks.join(starts, Seq("doc_id"), "left"), k)
  }

  /** C4/RefinedWeb-style repeated-line removal: drop every line whose
    * content appears in >= `minDf` distinct documents. Returns
    * (doc_id, clean, kept_lines, removed_lines); a doc whose every
    * line is boilerplate stays in the output with clean = "".
    *
    * Scale shape: line df is a map-side-combined aggregate keyed on
    * md5(line) (fixed-width keys — the line text crosses the wire
    * once, in the reassembly shuffle, never in the df aggregate); the
    * hot set joins back as the small side — at minDf it holds at most
    * total_lines / minDf distinct contents and in real corpora is
    * tiny, so AQE broadcasts it from runtime stats (not forced: a
    * pathological corpus could make it large, and a shuffle join is
    * then the correct plan). Reassembly is ONE groupBy(doc_id) with an
    * order-restoring array_sort over (pos, line) structs — no rejoin
    * against the document table, and docs with zero surviving lines
    * are still emitted because every line (kept or hot-flagged)
    * reaches the group. Three shuffles total. */
  def removeRepeatedLines(docs: org.apache.spark.sql.DataFrame, minDf: Long,
                          sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    val lines = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))
    val hot = lines.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
      .select(col("h"), lit(true).as("is_hot"))
    lines.join(hot, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("is_hot").isNull,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), sep).as("clean"),
        count(when(col("is_hot").isNull, 1)).as("kept_lines"),
        count(when(col("is_hot").isNotNull, 1)).as("removed_lines"))
  }

  private def sqlToks = TextOps.sqlTokens("text")
}
