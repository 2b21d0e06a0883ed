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

  test("tau outside (0, 1] is rejected") {
    val emb = corpus(Seq(0L -> Seq(1f, 0f)))
    intercept[IllegalArgumentException] {
      EmbeddingQueries.semanticDedup(emb, nSeeds = 1, tau = 0.0)
    }
    intercept[IllegalArgumentException] {
      EmbeddingQueries.semanticDedup(emb, nSeeds = 1, tau = 1.5)
    }
  }
}
