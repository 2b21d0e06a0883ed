package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the cluster-formation step a
  * dedup pipeline runs AFTER pairwise candidate generation (LSH /
  * minhash emits near-dup PAIRS; keeping one doc per duplicate GROUP
  * needs the transitive closure of those pairs).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the min of its own
  * and its neighbors' labels; a fixpoint means every node carries the
  * min node id of its component. Each round is one shuffle join plus
  * one aggregation over the edge list — no driver-side graph, no
  * collect; the driver loop only checks the convergence count, so the
  * operator scales with the cluster like any join.
  *
  * Rounds needed = the largest component's diameter. Near-dup graphs
  * are dense clumps (diameter 2-3, so 3-4 rounds). For adversarially
  * chain-shaped graphs the alternating small-star/large-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) drops rounds to O(log n) at the cost of two joins per
  * round; min-label is the right default for the dedup workload.
  */
object Graph {

  /** Components of the undirected graph given by `edges`; returns one
    * row per distinct endpoint: (node, component) with component = min
    * node id reachable. Deterministic for any input order. */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
    // symmetric closure once, so each round is a single directed join.
    // Iteration state goes through localCheckpoint, NOT persist: the
    // round's plan references the previous labels twice (propagation +
    // convergence check), so without lineage truncation the logical plan
    // doubles per round and analysis itself blows up after ~15 rounds.
    // (On a real cluster prefer reliable checkpoint() for fault
    // tolerance; localCheckpoint keeps the toy-scale path driverless.)
    // lazy checkpoints: the convergence count is the round's ONLY job —
    // it materializes the checkpoint as a side effect
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(false)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint(false)
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIter) {
      // neighbor labels + own label -> min per node
      val next = sym.join(labels, sym("a") === labels("node"))
        .select(col("b").as("node"), col("lbl"))
        .unionAll(labels)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(false)
      changed = next.join(labels.select(col("node"), col("lbl").as("prev")), Seq("node"))
        .where(col("lbl") =!= col("prev")).count()
      labels = next // the superseded RDD blocks are GC'd by ContextCleaner
      it += 1
    }
    // silent non-convergence would return an UNDER-MERGED clustering —
    // fail loudly instead (a diameter > maxIter component needs a
    // higher cap or the star-contraction variant)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds ($changed labels still changing)")
    labels.select(col("node"), col("lbl").as("component"))
  }
}
