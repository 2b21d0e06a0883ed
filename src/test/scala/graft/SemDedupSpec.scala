package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.queries.EmbeddingQueries

/** Pins the SemDeDup semantics (q72): cell-local near-dup pairs drop the
  * member CLOSER to its cell centroid — the farthest-from-centroid
  * exemplar survives — with ties dropping the higher vec_id. A
  * hand-built corpus exercises each branch of the loser rule.
  */
class SemDedupSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, Seq[Float])]) = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(rows.map { case (id, v) => Row(id, v) }.asJava, schema)
  }

  test("keeps the farthest-from-centroid member of a near-dup pair, not the lowest id") {
    // centroids: vec 0 -> cell 0 axis, vec 1 -> cell 1 axis (nSeeds = 2)
    val emb = corpus(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),        // centroid of cell 0 (ccos = 1)
      1L -> Seq(0f, 1f, 0f, 0f),        // centroid of cell 1 (ccos = 1)
      2L -> Seq(1f, 0.10f, 0f, 0f),     // cell 0, ccos ~ 0.9950 — CLOSER to centroid
      3L -> Seq(1f, 0.12f, 0f, 0f),     // cell 0, ccos ~ 0.9929 — farther; dup of 2
      4L -> Seq(0f, 1f, 0.3f, 0f),      // cell 1, no near-dup
      5L -> Seq(0f, 1f, 0.5f, 0f),      // cell 1, identical twin of 6
      6L -> Seq(0f, 1f, 0.5f, 0f)))     // cell 1, tie on ccos -> higher id loses
    // tau high enough that only (2,3) and (5,6) pair up: cos(2,3) ~ 0.99983,
    // cos(0,2) ~ 0.9950 stays below it — the centroid itself is not dropped
    val out = EmbeddingQueries.semanticDedup(emb, nSeeds = 2, tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cell 0: {0,2,3}, pair (2,3): 2 is closer (higher ccos) so 2 drops —
    // the HIGHER id 3 survives, pinning that this is not lowest-id-wins
    // cell 1: {1,4,5,6}, identical (5,6): tie -> 6 drops
    assert(out.toSeq == Seq((0L, 3L, 2L, 1L), (1L, 4L, 3L, 1L)))
    spark.catalog.clearCache()
  }

  test("a dup clique keeps exactly its minimum-centroid-cosine member") {
    // three mutual near-dups in cell 0 at distinct centroid distances:
    // survivors must be exactly the farthest one (vec 4)
    val emb = corpus(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(1f, 0.100f, 0f, 0f),
      3L -> Seq(1f, 0.101f, 0f, 0f),
      4L -> Seq(1f, 0.102f, 0f, 0f)))
    val out = EmbeddingQueries.semanticDedup(emb, nSeeds = 2, tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cell 0 = {0,2,3,4}: clique {2,3,4} -> keep 4 only; centroid 0 kept
    assert(out.toSeq == Seq((0L, 4L, 2L, 2L), (1L, 1L, 1L, 0L)))
    spark.catalog.clearCache()
  }

  test("registry q72 runs on testdata and accounts every vector exactly once") {
    val out = SparkEntry.queries("q72_semantic_dedup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(out.map(_._2).sum == total, "per-cell n_vecs must partition the corpus")
    out.foreach { case (cell, n, k, d) =>
      assert(k + d == n, s"cell $cell: kept $k + dropped $d != $n")
      assert(k >= 1, s"cell $cell: at least its least-central member survives")
    }
    spark.catalog.clearCache()
  }

  test("kmeansConverge reaches an exact fixpoint equal to the unrolled kmeansAssign") {
    // two tight clusters, both seeds planted near the diagonal so the
    // FIRST sweep genuinely moves the centroids (delta > 0) before the
    // loop settles: converged-in-few-sweeps by construction, so the
    // driver loop is comparable against the (<= 4 sweep) unrolled plan
    val emb = corpus(Seq(
      0L -> Seq(1f, 0.8f, 0f, 0f),      // seed 0, leans cluster A
      1L -> Seq(0.8f, 1f, 0f, 0f),      // seed 1, leans cluster B
      2L -> Seq(1f, 0.05f, 0f, 0f),     // cluster A
      3L -> Seq(1f, 0.08f, 0.02f, 0f),  // cluster A
      4L -> Seq(1f, 0.02f, 0f, 0.03f),  // cluster A
      5L -> Seq(0.06f, 1f, 0f, 0f),     // cluster B
      6L -> Seq(0.01f, 1f, 0.04f, 0f),  // cluster B
      7L -> Seq(0.03f, 1f, 0f, 0.05f))) // cluster B
    val res = EmbeddingQueries.kmeansConverge(emb, nSeeds = 2, maxIters = 10, tol = 0.0)
    assert(res.iters < 10, "must CONVERGE, not hit the sweep cap")
    assert(res.delta == 0.0, "tol = 0 stop means a bit-identical centroid fixpoint")
    assert(res.iters >= 2, "the confirmation sweep follows at least one real movement")
    // the driver loop and the unrolled plan are the same computation:
    // at the fixpoint, the same sweep count gives the same assignment
    assert(res.iters <= 4, s"test corpus must converge within kmeansAssign's bound, took ${res.iters}")
    val loop = res.assign.select("vec_id", "cell", "ccos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val unrolled = EmbeddingQueries.kmeansAssign(emb, nSeeds = 2, iters = res.iters)
      .select("vec_id", "cell", "ccos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(loop == unrolled, s"fixpoint assignment must equal the unrolled plan:\n$loop\n$unrolled")
    // and the clusters actually separated: seeds 0/2-4 vs 1/5-7
    val cells = loop.map(t => t._1 -> t._2).toMap
    assert(Seq(0L, 2L, 3L, 4L).map(cells).distinct.size == 1)
    assert(Seq(1L, 5L, 6L, 7L).map(cells).distinct.size == 1)
    assert(cells(0L) != cells(1L))
    spark.catalog.clearCache()
  }

  test("semanticDedupRefined at zero sweeps degrades to the seeded one-pass semanticDedup") {
    // the scaladoc's advertised degenerate case must actually run:
    // iters = 0 routes to the seeded assignment, not kmeansAssign's
    // sweep bound
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val seeded = EmbeddingQueries.semanticDedup(emb, nSeeds = 8, tau = 0.45).collect().toSeq
    val zero = EmbeddingQueries.semanticDedupRefined(emb, nSeeds = 8, iters = 0, tau = 0.45)
      .collect().toSeq
    assert(zero == seeded, "iters = 0 must equal the seeded one-pass recipe")
    spark.catalog.clearCache()
  }

  test("tau outside (0, 1] is rejected") {
    val emb = corpus(Seq(0L -> Seq(1f, 0f)))
    intercept[IllegalArgumentException] {
      EmbeddingQueries.semanticDedup(emb, nSeeds = 1, tau = 0.0)
    }
    intercept[IllegalArgumentException] {
      EmbeddingQueries.semanticDedup(emb, nSeeds = 1, tau = 1.5)
    }
  }

  test("q75 kmeans: Lloyd sweeps pull a between-clusters seed onto its cluster") {
    // seed 1 starts BETWEEN the x and y clusters (cos ~0.64 to the
    // y-cluster members); after two mean updates it sits on the
    // y-cluster's center and the members' final cosine reflects that
    val emb = corpus(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),        // seed 0: x-axis
      1L -> Seq(0.8f, 0.6f, 0f, 0f),    // seed 1: between the clusters
      2L -> Seq(1f, 0.05f, 0f, 0f),     // x cluster
      3L -> Seq(1f, -0.05f, 0f, 0f),    // x cluster
      4L -> Seq(0.05f, 1f, 0f, 0f),     // y cluster
      5L -> Seq(0f, 1f, 0.05f, 0f),     // y cluster
      6L -> Seq(-0.05f, 1f, 0f, 0f)))   // y cluster
    val out = EmbeddingQueries.kmeansRefine(emb, nSeeds = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // the seed VECTOR itself is at 37 degrees from x / 53 from y — it is
    // an x-cluster member, and refinement correctly migrates it to cell
    // 0 once centroid 1 moves onto the y cluster
    assert(Seq(0L, 1L, 2L, 3L).forall(out(_)._1 == 0L), s"x cluster must land in cell 0: $out")
    assert(Seq(4L, 5L, 6L).forall(out(_)._1 == 1L), s"y cluster must land in cell 1: $out")
    // refinement moved centroid 1 off (0.8, 0.6): vec 4's cosine to the
    // ORIGINAL seed is ~0.64; to the refined y-center it must be high
    assert(out(4L)._2 > 0.9, s"vec 4's fit must improve after refinement: ${out(4L)}")
    // partitioning invariance: decimal-fold centroid sums make the
    // output bit-identical under any input layout
    val re = EmbeddingQueries.kmeansRefine(emb.repartition(7), nSeeds = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = out.map { case (id, (c, s)) => (id, c, s) }.toSet
    assert(re == base, "centroid accounting must not depend on the partitioning")
  }

  test("q75 kmeans: a duplicated seed's emptied cell keeps its centroid and can recapture") {
    // seeds 0 and 1 are identical: sweep 1 ties every x vector between
    // cells 0/1 and the tie-break sends all to cell 0, so cell 1
    // empties and the empty-cluster rule KEEPS its pristine x-axis
    // centroid. Sweep 1 then drags cell 0's centroid toward vec 3
    // (1, 0.05), after which the exactly-on-axis vectors 0 and 1 fit
    // the preserved cell-1 centroid BETTER (cos = 1 exactly) — the
    // kept centroid legitimately wins them back, vec 3 keeps cell 0,
    // and nothing is ever null/NaN. Pinned end state of that dance:
    val emb = corpus(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f, 0f),        // exact duplicate of seed 0
      2L -> Seq(0f, 1f, 0f, 0f),        // seed 2: y-axis
      3L -> Seq(1f, 0.05f, 0f, 0f),
      4L -> Seq(0f, 1f, 0.05f, 0f)))
    val out = EmbeddingQueries.kmeansRefine(emb, nSeeds = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 5 && out.forall { case (_, _, c) => !c.isNaN && c > 0.99 })
    assert(out.filter(r => Seq(0L, 1L).contains(r._1)).forall(r => r._2 == 1L && r._3 == 1.0),
      s"the preserved pristine centroid must win back the on-axis vectors: ${out.toSeq}")
    assert(out.filter(_._1 == 3L).forall(r => r._2 == 0L && r._3 == 1.0),
      s"cell 0's drifted centroid converges onto its sole member: ${out.toSeq}")
    assert(out.filter(r => Seq(2L, 4L).contains(r._1)).forall(_._2 == 2L), s"y vectors: ${out.toSeq}")
  }

  test("full recipe: kmeansRefine cells feed semanticDedupInCells") {
    import org.apache.spark.sql.functions._
    // x/y clusters with one tight near-dup pair each ((2,3) and (5,6),
    // cos > 0.999); the looser neighbors stay under tau. The refined
    // cells (x cluster = {0,1,2,3} including the migrated seed, y
    // cluster = {4,5,6}) drive the within-cell pass: exactly one drop
    // per cell, whichever pair member sits closer to its centroid.
    val emb = corpus(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.8f, 0.6f, 0f, 0f),
      2L -> Seq(1f, 0.05f, 0f, 0f),
      3L -> Seq(1f, 0.0501f, 0f, 0f),
      4L -> Seq(0.05f, 1f, 0f, 0f),
      5L -> Seq(0f, 1f, 0.05f, 0f),
      6L -> Seq(0f, 1f, 0.0501f, 0f)))
    val cells = EmbeddingQueries.kmeansRefine(emb, nSeeds = 2, iters = 2)
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(aggregate(
        zip_with(col("v"), col("v"), (x, y) => x * y), lit(0d), (acc, x) => acc + x)))
    val out = EmbeddingQueries
      .semanticDedupInCells(base.join(cells, Seq("vec_id")), tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 4L, 3L, 1L), (1L, 3L, 2L, 1L)),
      s"one near-dup drop inside each refined cell: ${out.toSeq}")
    // the cap composes with refined cells: capping at the full cell
    // size changes nothing, and a cap of 1 leaves nothing to pair —
    // every member auto-kept
    val capped = EmbeddingQueries
      .semanticDedupInCells(base.join(cells, Seq("vec_id")), tau = 0.999,
        maxCellSize = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(capped.toSeq == out.toSeq, "cap >= refined cell size is the identity")
    val solo = EmbeddingQueries
      .semanticDedupInCells(base.join(cells, Seq("vec_id")), tau = 0.999,
        maxCellSize = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(solo.toSeq == Seq((0L, 4L, 4L, 0L), (1L, 3L, 3L, 0L)),
      s"a 1-member core can form no pairs — everything survives: ${solo.toSeq}")
    spark.catalog.clearCache()
  }

  test("maxCellSize caps the pair join to the cell core and auto-keeps the tail") {
    // cell 0 by centroid-cosine rank: 0 (1.0), 2 (~.9950), 3 (~.9929),
    // 4 (~.8944), 5 (~.8871). Near-dup pairs: (2,3) and (4,5), both
    // cos > 0.999; nothing else reaches tau. cap=3 -> core {0,2,3}:
    // the core pair still dedups (2 is closer, drops), the tail pair
    // (4,5) is never formed and BOTH survive.
    val emb = corpus(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(1f, 0.10f, 0f, 0f),
      3L -> Seq(1f, 0.12f, 0f, 0f),
      4L -> Seq(1f, 0.50f, 0f, 0f),
      5L -> Seq(1f, 0.52f, 0f, 0f)))
    def run(cap: Option[Int]) =
      EmbeddingQueries.semanticDedup(emb, nSeeds = 2, tau = 0.999, maxCellSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(Some(3)) == Seq((0L, 5L, 4L, 1L), (1L, 1L, 1L, 0L)),
      "capped: core pair drops its closer member, tail pair is auto-kept")
    // uncapped ALSO drops 4 (closer than 5 to the centroid)...
    assert(run(None) == Seq((0L, 5L, 3L, 2L), (1L, 1L, 1L, 0L)))
    // ...and a cap at least the cell size reproduces it exactly
    assert(run(Some(10)) == run(None), "cap >= cell size must be the identity")
    intercept[IllegalArgumentException] {
      EmbeddingQueries.semanticDedup(emb, nSeeds = 2, tau = 0.999, maxCellSize = Some(0))
    }
    spark.catalog.clearCache()
  }

  test("composed recipe (q77): refinement merges a seed-straddling near-dup pair the seeded cells split") {
    // Near-dup pair (2,3) straddles the SEED boundary: seed 0 sits at 0°,
    // seed 1 at 53.1°, so the seeded decision boundary is ~26.6° — vec 2
    // (25.8°) goes to cell 0, vec 3 (27.3°) to cell 1, the pair never
    // meets, and one-pass semanticDedup drops nothing. Two Lloyd sweeps
    // drag centroid 1 onto the y bulk (~80°) and centroid 0 toward the
    // pair (~18°); both members then share the refined cell 0 and the
    // composed recipe drops the closer-to-centroid member (vec 2,
    // ccos ~.990 vs vec 3's ~.986). This is the decision the published
    // recipe's clustering step exists to enable — pinned end to end.
    val emb = corpus(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.6f, 0.8f, 0f, 0f),
      2L -> Seq(0.9003f, 0.4352f, 0f, 0f),   // 25.8°; cos(2,3) ~ 0.99966
      3L -> Seq(0.8886f, 0.4586f, 0f, 0f),   // 27.3°
      4L -> Seq(0f, 1f, 0f, 0f),             // y bulk (all pairwise < tau)
      5L -> Seq(0.05f, 1f, 0f, 0f),
      6L -> Seq(0f, 1f, 0.05f, 0f)))
    val seeded = EmbeddingQueries.semanticDedup(emb, nSeeds = 2, tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(seeded.map(_._4).sum == 0L,
      s"the seeded cells split the only near-dup pair — nothing may drop: ${seeded.toSeq}")
    val refined = EmbeddingQueries
      .semanticDedupRefined(emb, nSeeds = 2, iters = 2, tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(refined.toSeq == Seq((0L, 3L, 2L, 1L), (1L, 4L, 4L, 0L)),
      s"refined cell 0 = {0,2,3} must drop exactly the closer pair member: ${refined.toSeq}")
    spark.catalog.clearCache()
  }

  test("registry q77 runs on testdata and accounts the corpus exactly once over refined cells") {
    val out = SparkEntry.queries("q77_semantic_dedup_refined")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(out.map(_._2).sum == total, "refined cells must partition the corpus")
    out.foreach { case (cell, n, k, d) =>
      assert(k + d == n, s"cell $cell: kept $k + dropped $d != $n")
      assert(k >= 1, s"cell $cell: at least its least-central member survives")
    }
    // the refined partition must actually differ from the seeded one —
    // otherwise q77 is q76 with extra steps on this corpus
    val seeded = SparkEntry.queries("q76_semantic_dedup_capped")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(r => r._1 -> r._2).toMap != seeded,
      "two Lloyd sweeps must move at least one vector across cells on this corpus")
    spark.catalog.clearCache()
  }

  test("registry q76 runs on testdata; cap only ever keeps more than q72") {
    def acct(q: String) =
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val capped = acct("q76_semantic_dedup_capped")
    val exact = acct("q72_semantic_dedup")
    assert(capped.keySet == exact.keySet, "same cell partition")
    capped.foreach { case (cell, (n, k, d)) =>
      assert(k + d == n, s"cell $cell: kept $k + dropped $d != $n")
      val (en, ek, _) = exact(cell)
      assert(n == en, s"cell $cell: n_vecs must match q72")
      assert(k >= ek, s"cell $cell: the cap can only ADD survivors (got $k < $ek)")
    }
    spark.catalog.clearCache()
  }

  test("kmeansRefine rejects an unbounded sweep count") {
    val emb = corpus(Seq(0L -> Seq(1f, 0f)))
    intercept[IllegalArgumentException] {
      EmbeddingQueries.kmeansRefine(emb, nSeeds = 1, iters = 9)
    }
  }
}
