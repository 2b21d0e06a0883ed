package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the cluster-formation step a
  * dedup pipeline runs AFTER pairwise candidate generation (LSH /
  * minhash emits near-dup PAIRS; keeping one doc per duplicate GROUP
  * needs the transitive closure of those pairs).
  *
  * Algorithm: iterative min-label propagation WITH pointer jumping.
  * Every node starts labeled with itself; each round every node takes
  * the min of its own and its neighbors' labels (one shuffle join +
  * one aggregation over the edge list), then jumps its label to its
  * label's label (one self-join of the small per-node label table:
  * lbl <- lbl[lbl]). Labels only ever decrease and always name a node
  * of the same component, so the fixpoint — every node carries the min
  * node id of its component — is unchanged by the jump; what changes
  * is the convergence rate: propagation alone needs diameter rounds
  * (label 1 crosses one edge per round), while the jump doubles the
  * collapsed pointer distance per round, so a depth-d chain converges
  * in O(log d) rounds. Fewer rounds = fewer jobs = less scheduler and
  * driver-contention exposure per query (each round's only action is
  * the convergence count). No driver-side graph, no collect.
  *
  * Near-dup graphs are dense clumps (diameter 2-3: 3 rounds). For
  * graphs whose EDGE LIST itself is too large to re-join each round,
  * the alternating small-star/large-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) shrinks
  * the state as it goes at the cost of two edge-table shuffles per
  * round; it remains available via `starContraction = true`.
  */
object Graph {

  import scala.util.chaining.scalaUtilChainingOps

  /** Lineage-truncation strategies for the iteration state:
    * localCheckpoint (executor block stores — fast, not fault-tolerant)
    * by default, or RELIABLE checkpoint when a directory is given.
    * Returns (lazy, eager):
    *   - LAZY for per-round state — each round's convergence count is
    *     the action that materializes the round's checkpoint as a side
    *     effect, keeping one job per round;
    *   - EAGER for the loop INPUTS (the symmetric edge table and the
    *     initial labels). These must be materialized before the first
    *     round: a lazy checkpoint finalizes only at the END of the
    *     first job that computes it, so every OTHER reference to it in
    *     that same job re-executes the full upstream plan. With the
    *     edge list that upstream plan is the caller's candidate-pair
    *     generation (e.g. the LSH band join), which appears twice in
    *     the symmetric union and again under the label init — measured
    *     at a 30x-scale corpus, the lazy version re-ran pair-gen ~4x
    *     inside round 0 (19 s shipped vs 4 s pair-gen + 0.5 s of
    *     rounds when materialized eagerly). Two up-front jobs are noise
    *     next to that. */
  /** The three lineage-truncation modes an iteration loop needs. */
  private[graft] final case class Checkpointers(
    /** Lazy truncation — for state whose FIRST action is also its last
      * within the loop body, or when the caller manages caching. On the
      * reliable path the checkpoint-writer job recomputes the plan a
      * second time; prefer [[lazyOnce]] inside loops. */
    ckpt: DataFrame => DataFrame,
    /** Eager truncation — inputs materialized up front, computed once. */
    ckptNow: DataFrame => DataFrame,
    /** Lazy truncation that computes the plan ONCE even on the reliable
      * path: the frame persists across the caller's first action (which
      * materializes the computation into cache) and the checkpoint-file
      * writer job (which then reads the cache instead of re-running the
      * sweep). Call the returned `release` after that first action —
      * the checkpoint files are the durable copy from then on, so the
      * blocks free immediately instead of waiting on ContextCleaner. */
    lazyOnce: DataFrame => (DataFrame, () => Unit))

  private[graft] def checkpointers(probe: DataFrame, dir: Option[String]): Checkpointers =
    dir match {
      case Some(d) =>
        probe.sparkSession.sparkContext.setCheckpointDir(d)
        // eager reliable checkpoints compute the plan TWICE unpersisted
        // (Dataset.checkpoint's count, then the checkpoint-file writer
        // job recomputing every partition) — persist across the two jobs
        // so the upstream still runs exactly once, then release the
        // blocks (the checkpoint files are the durable copy)
        Checkpointers(
          df => df.checkpoint(eager = false),
          df => {
            val cached = df.persist()
            val out = cached.checkpoint(eager = true)
            cached.unpersist()
            out
          },
          df => {
            val cached = df.persist()
            (cached.checkpoint(eager = false), () => { cached.unpersist(false); () })
          })
      case None =>
        // localCheckpoint persists the computed blocks by construction —
        // no second computation to shield against, release is a no-op
        Checkpointers(
          df => df.localCheckpoint(eager = false),
          df => df.localCheckpoint(eager = true),
          df => (df.localCheckpoint(eager = false), () => ()))
    }

  /** Components of the undirected graph given by `edges`; returns one
    * row per distinct endpoint: (node, component) with component = min
    * node id reachable. Deterministic for any input order.
    * `starContraction = true` switches to the alternating small-star /
    * large-star algorithm — also O(log^2 n) rounds, but its per-round
    * state is the (shrinking) edge set rather than the edge set re-joined
    * against labels, which can win when edges >> nodes.
    *
    * `checkpointDir = Some(dir)` truncates lineage through RELIABLE
    * checkpoints (HDFS/object-store files) instead of localCheckpoint:
    * localCheckpoint keeps iteration state in executor block stores, so
    * on a real cluster one lost executor kills the job mid-propagation;
    * with a reliable dir the state survives executor loss at the cost
    * of a write per round. Set it for any run long enough that executor
    * churn is expected. */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 50,
                          starContraction: Boolean = false,
                          checkpointDir: Option[String] = None): DataFrame = {
    if (starContraction)
      return connectedComponentsStar(edges, src, dst, maxIter, checkpointDir)
    val cks = checkpointers(edges, checkpointDir)
    import cks.{ckptNow, lazyOnce}
    val e = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
    // symmetric closure once, so each round is a single directed join.
    // Iteration state goes through checkpoints, NOT persist: the
    // round's plan references the previous labels twice (propagation +
    // convergence check), so without lineage truncation the logical plan
    // doubles per round and analysis itself blows up after ~15 rounds.
    // Inputs are EAGER (pair-gen upstream runs exactly once — see
    // checkpointers); per-round state stays lazy so the convergence
    // count remains the round's ONLY job.
    val sym = ckptNow(e.unionAll(e.select(col("b").as("a"), col("a").as("b"))))
    var labels = ckptNow(sym.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node")))
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIter) {
      // neighbor labels + own label -> min per node. The node's PREVIOUS
      // label rides through the aggregation as min of a null-for-
      // neighbors column (each node has exactly one own row), so the
      // convergence check needs no extra join against the old labels.
      val prop = sym.join(labels, sym("a") === labels("node"))
        .select(col("b").as("node"), col("lbl"), lit(null).cast("long").as("own"))
        .unionAll(labels.select(col("node"), col("lbl"), col("lbl").as("own")))
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"), min(col("own")).as("prev"))
      // pointer jump: lbl <- lbl[lbl]. Every label value is itself a
      // node id present in the table (labels start as node ids and only
      // mins of existing labels propagate), and lbl(x) <= x always, so
      // the jumped label is <= the propagated one and still inside the
      // component — this is what collapses a depth-d chain in O(log d)
      // rounds instead of d. Self-join of the SAME Dataset: Spark
      // de-duplicates the attribute ids; both references reuse the
      // aggregation's shuffle output (ReuseExchange), so the agg runs
      // once. The label table is one row per node — tiny next to the
      // edge join — so the extra exchange is cheap; left+coalesce is
      // belt-and-braces for the (impossible) dangling-label case.
      val (next, release) = lazyOnce(prop.alias("x").join(prop.alias("y"),
          col("x.lbl") === col("y.node"), "left")
        .select(col("x.node").as("node"),
          least(col("x.lbl"), coalesce(col("y.lbl"), col("x.lbl"))).as("lbl"),
          col("x.prev").as("prev")))
      changed = next.where(col("lbl") =!= col("prev")).count()
      release() // checkpoint files durable; superseded local blocks GC'd by ContextCleaner
      labels = next.select(col("node"), col("lbl"))
      it += 1
    }
    // silent non-convergence would return an UNDER-MERGED clustering —
    // fail loudly instead (with pointer jumping, rounds ~ log2(diameter),
    // so hitting the default cap means a pathological graph — raise the
    // cap or use the star-contraction variant)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds ($changed labels still changing)")
    labels.select(col("node"), col("lbl").as("component"))
  }

  /** Alternating star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Each round:
    * large-star hangs every strictly-larger neighbor of a center onto
    * the neighborhood min; small-star re-hangs the smaller neighbors.
    * The fixpoint is one star per component, centered at the component's
    * min id — reached in O(log^2 n) rounds for ANY diameter without
    * needing pointer jumping. Measured head-to-head on deep chains
    * (GraphSoak: 1M nodes as 100×10k and 10×100k chains), the DEFAULT
    * min-label + pointer-jumping loop converges faster with about half
    * the Spark jobs — two half-round shuffles per iteration make star
    * the more expensive route on sparse low-fan-in graphs. Its niche is
    * edges >> nodes: per-round state here is the SHRINKING edge set,
    * never the full edge set re-joined against labels. Both half-rounds
    * are join + partial-agg shapes (no collect_set: a giant component's
    * root fan-in streams through the aggregate, it is never materialized
    * as one array). */
  def connectedComponentsStar(edges: DataFrame, src: String, dst: String,
                              maxIter: Int = 30,
                              checkpointDir: Option[String] = None): DataFrame = {
    val cks = checkpointers(edges, checkpointDir)
    import cks.{ckpt, ckptNow, lazyOnce}
    // eager: the caller's pair-gen runs once; nodes / the oriented edge
    // init / the final join all read the materialized blocks instead of
    // re-executing the upstream plan (see checkpointers)
    val e0 = ckptNow(edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .where(col("u") =!= col("v")))
    val nodes = ckpt(e0.select(col("u").as("node"))
      .unionAll(e0.select(col("v").as("node"))).distinct())
    // state: distinct edges oriented (larger u, smaller v); same
    // lineage truncation as the min-label loop
    var cur = ckpt(e0.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct())
    var curCount = cur.count()
    var it = 0
    var done = curCount == 0
    while (!done && it < maxIter) {
      // large-star over the symmetric neighborhood: center u, m = min of
      // N(u) ∪ {u}; every neighbor v > u re-hangs onto m
      val sym = cur.unionAll(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
      // small-star: edges are (u, v<u); all of N(u) ∪ {u} hangs onto
      // m = min(N(u))
      val smins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val (small, release) = lazyOnce(large.join(smins, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(smins.select(col("u"), col("m").as("v")))
        .distinct())
      val nextCount = small.count()
      release()
      // fixpoint = identical edge SET (count match + empty anti-join;
      // counts alone can tie without equality)
      done = nextCount == curCount &&
        small.join(cur, Seq("u", "v"), "left_anti").limit(1).count() == 0
      cur = small
      curCount = nextCount
      it += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixpoint edges are (child, component root); roots have no out-edge
    nodes.join(cur, nodes("node") === cur("u"), "left")
      .select(col("node"), coalesce(col("v"), col("node")).as("component"))
  }

  /** Fixed-point PageRank (Page, Brin, Motwani & Winograd 1999) over a
    * directed edge table — exact INTEGER arithmetic throughout, the
    * q96 contract: ranks live as unscaled longs at `scale` (mass 1.0 ≡
    * `scale`), each sweep's contribution is rank div outdeg (floor),
    * and the damping update is rank' = (15·(scale div n)) div 100 +
    * (85·Σcontrib) div 100 — every step a floor division of exact
    * longs, so both engines agree bit for bit at any partitioning and
    * the oracle can restate the sweeps as a CTE chain. The floor
    * remainders leak mass (so ranks sum to slightly UNDER `scale`) and
    * dangling nodes drop their mass instead of redistributing it —
    * both deliberate: the classic real-valued variants of those rules
    * need arbitrary-precision or transcendental steps the
    * engine-vs-oracle bit contract excludes, and the ORDER of hosts by
    * rank — what a corpus quality filter consumes — is unaffected by
    * a uniform leak. Overflow bound: scale·n < 2^63.
    *
    * Scale shape: the textbook distributed iteration — edges join
    * ranks on src (both keyed shuffles co-partition), contributions
    * map-side-combine into per-dst sums, the node table left-joins the
    * sums back. Edge and outdeg tables persist across sweeps (pass a
    * scope); sweeps here are UNROLLED like the q75 k-means — a
    * production run at 100 TB wraps this in the kmeansConverge-style
    * driver loop with per-sweep checkpointing to truncate lineage.
    *
    * `edges` must carry string columns `src`/`dst`; self-loops and
    * duplicate edges are removed here. Returns (node, out_deg, in_deg,
    * rank_scaled). */
  def pageRank(edges: DataFrame, iters: Int, scale: Long,
               scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(scale >= 100, s"scale must hold the percent divisions, got $scale")
    val e = scope.persist(edges
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct())
    val nodes = scope.persist(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct())
    val odeg = scope.persist(e.groupBy(col("src")).agg(count(lit(1)).as("odeg")))
    val ideg = e.groupBy(col("dst")).agg(count(lit(1)).as("ideg"))
    val n = nodes.count() // one gated scalar, sizes the uniform prior
    require(n > 0, "the edge table produced no nodes")
    val r0 = nodes.withColumn("rank", lit(scale / n))
    val base = (15L * (scale / n)) / 100L
    val rk = (1 to iters).foldLeft(r0)((r, _) => rankSweep(nodes, e, odeg, base, r))
    nodes.join(odeg, nodes("node") === odeg("src"), "left")
      .join(ideg, nodes("node") === ideg("dst"), "left")
      .join(rk.withColumnRenamed("node", "rnode"), col("node") === col("rnode"))
      .select(col("node"), coalesce(col("odeg"), lit(0L)).as("out_deg"),
        coalesce(col("ideg"), lit(0L)).as("in_deg"), col("rank").as("rank_scaled"))
      .orderBy(col("node"))
  }

  /** One PageRank sweep — the single definition [[pageRank]]'s unrolled
    * fold and [[pageRankConverge]]'s driver loop both apply, so the two
    * forms cannot drift (GraphSpec pins their fixpoint equality). */
  private def rankSweep(nodes: DataFrame, e: DataFrame, odeg: DataFrame,
                        base: Long, r: DataFrame): DataFrame = {
    val contrib = e.join(odeg, Seq("src"))
      .join(r.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("dst"), expr("rank div odeg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("c"))
    nodes.join(contrib, nodes("node") === contrib("dst"), "left")
      .select(col("node"),
        (lit(base) + expr("85 * coalesce(c, cast(0 as bigint)) div 100")).as("rank"))
  }

  /** Converged ranks plus the loop's audit trail. */
  final case class PageRankConverged(ranks: DataFrame, iters: Int, delta: Long)

  /** Driver-loop PageRank to an exact integer fixpoint — the
    * production form of [[pageRank]] for rank states too large to plan
    * unrolled (the kmeansConverge analogue, but the per-sweep state is
    * NODE-scale, so it localCheckpoints / reliably checkpoints through
    * [[checkpointers]] instead of collecting to the driver; the only
    * driver-side scalar per sweep is the max-|Δrank| convergence
    * aggregate, which doubles as the action that materializes the
    * sweep — one computation per sweep on both checkpoint paths, the
    * connectedComponents discipline; the reliable path adds a
    * cache-fed checkpoint-writer job, see [[Checkpointers.lazyOnce]]).
    * Stops when max |rank' − rank| ≤ `tol` (tol = 0 is an
    * EXACT fixpoint: the integer floor arithmetic makes rank states
    * discrete, so fixpoints are reachable, not just approachable) or at
    * `maxIters`, whichever first; returns the last state either way
    * with the observed delta, as [[graft.queries.EmbeddingQueries.kmeansConverge]]
    * does. Returns (node, rank) — join [[pageRank]]'s degree columns
    * back if needed.
    *
    * `checkEvery` batches the convergence check: that many sweeps
    * compose lazily between driver barriers, so a cluster-scale run
    * pays the scheduling/aggregate round-trip once per BLOCK instead of
    * once per sweep (sweeping past the fixpoint is idempotent, so the
    * answer is unchanged — at most checkEvery−1 extra sweeps run).
    * `iters` counts sweeps EXECUTED: with checkEvery = k the loop stops
    * at the first multiple of k whose block-end state matches the
    * previous block end, i.e. k·⌈(i* + k)/k⌉ sweeps for a fixpoint
    * first reached at sweep i* (q103's oracle restates exactly that
    * arithmetic). delta is the L∞ change across the final block. */
  def pageRankConverge(edges: DataFrame, scale: Long,
                       maxIters: Int = 50, tol: Long = 0L,
                       checkpointDir: Option[String] = None,
                       scope: graft.engine.CacheScope = graft.engine.CacheScope.untracked,
                       checkEvery: Int = 1): PageRankConverged = {
    require(maxIters >= 1, s"need at least one sweep, got $maxIters")
    require(tol >= 0, s"tol must be non-negative, got $tol")
    require(scale >= 100, s"scale must hold the percent divisions, got $scale")
    require(checkEvery >= 1, s"checkEvery must be >= 1, got $checkEvery")
    val e = scope.persist(edges
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct())
    val nodes = scope.persist(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct())
    val odeg = scope.persist(e.groupBy(col("src")).agg(count(lit(1)).as("odeg")))
    val n = nodes.count()
    require(n > 0, "the edge table produced no nodes")
    val base = (15L * (scale / n)) / 100L
    val cks = checkpointers(e, checkpointDir)
    var cur = cks.ckptNow(nodes.withColumn("rank", lit(scale / n)))
    var iters = 0
    var delta = Long.MaxValue
    while (iters < maxIters && delta > tol) {
      // `checkEvery` sweeps compose lazily into ONE block; the block's
      // convergence aggregate is the only driver synchronization. At
      // 1000 executors the per-sweep cost floor is the DRIVER BARRIER
      // (schedule, aggregate, collect, checkpoint bookkeeping), not the
      // shuffles — batching the check trades up to checkEvery-1 extra
      // (idempotent-past-the-fixpoint, GraphSpec) sweeps for checkEvery×
      // fewer barriers. delta is then the L∞ change ACROSS the block:
      // 0 certifies state(t) = state(t+checkEvery), which for the
      // damped-contraction update means the fixpoint (a genuine
      // period-k orbit would also re-loop — callers gating bit-exact
      // results, like q103's oracle, distinguish the two by comparing
      // the state itself).
      val k = math.min(checkEvery, maxIters - iters)
      val swept = (1 to k).foldLeft(cur)((r, _) => rankSweep(nodes, e, odeg, base, r))
      val (next, release) = cks.lazyOnce(swept)
      // the convergence aggregate IS the action that materializes the
      // block — one COMPUTATION per sweep on both paths (localCheckpoint
      // stores the computed blocks directly; the reliable path persists
      // across the aggregate and the checkpoint-writer job, see
      // [[Checkpointers.lazyOnce]], then releases the blocks here)
      delta = next.join(cur.withColumnRenamed("rank", "prev"), Seq("node"))
        .agg(max(abs(col("rank") - col("prev")))).collect()(0).getLong(0)
      release()
      cur = next
      iters += k
    }
    PageRankConverged(cur, iters, delta)
  }
}
