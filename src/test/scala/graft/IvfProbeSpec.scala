package graft

import graft.queries.EmbeddingQueries

/** Pins the IVF multi-probe recall contract: nprobe widens the probed
  * cell set only (the corpus-side assignment map is nprobe-free), so
  * nprobe = nSeeds degrades gracefully to EXACT brute force, and recall
  * is monotone in nprobe. */
class IvfProbeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("rank")),
      r.getLong(r.fieldIndex("neighbor_id")), r.getDouble(r.fieldIndex("cosine")))).toSeq

  test("nprobe = nSeeds probes every cell and equals brute-force top-k exactly") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val ivfAll = rows(EmbeddingQueries.ivfTopK(emb, nQueries = 10, nSeeds = 8, k = 3, nprobe = 8))
    // the exact baseline: registry q45 (top-5 brute force) cut to rank <= 3
    val brute = rows(SparkEntry.queries("q45_ann_bruteforce_topk")(spark, sf)
      .where(org.apache.spark.sql.functions.col("rank") <= 3))
    assert(ivfAll == brute,
      "all-cells IVF must reproduce brute-force ranks, neighbors, and cosines bit-exactly")
    spark.catalog.clearCache()
  }

  test("recall is monotone in nprobe: widening probes rank-wise dominates") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    def byQuery(nprobe: Int): Map[Long, Seq[Double]] =
      rows(EmbeddingQueries.ivfTopK(emb, nQueries = 10, nSeeds = 8, k = 3, nprobe = nprobe))
        .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._4) }
    // rank-wise dominance is the metric that IS monotone in candidate-set
    // inclusion: at every rank both answered, the wider probe's cosine is
    // >= the narrower's. (A floor over the found top-k is NOT monotone —
    // an underfull narrow result gets its floor LOWERED when wider probes
    // fill the remaining ranks with true-but-smaller cosines.)
    def dominates(wide: Map[Long, Seq[Double]], narrow: Map[Long, Seq[Double]],
                  what: String): Unit =
      narrow.foreach { case (q, ns) =>
        val ws = wide(q)
        // count monotonicity first: a wider probe must answer at least
        // as many ranks — losing answered ranks is itself a violation
        assert(ws.length >= ns.length,
          s"query $q: $what answered ${ws.length} ranks < ${ns.length}")
        ns.indices.foreach { r =>
          assert(ws(r) >= ns(r) - 1e-12,
            s"query $q rank ${r + 1}: $what ${ws(r)} < ${ns(r)}")
        }
      }
    val p1 = byQuery(1); val p4 = byQuery(4); val p8 = byQuery(8)
    dominates(p4, p1, "nprobe=4 vs 1")
    dominates(p8, p4, "nprobe=8 vs 4")
    spark.catalog.clearCache()
  }

  test("nprobe outside [1, nSeeds] is rejected") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    intercept[IllegalArgumentException] {
      EmbeddingQueries.ivfTopK(emb, nQueries = 10, nSeeds = 8, nprobe = 0)
    }
    intercept[IllegalArgumentException] {
      EmbeddingQueries.ivfTopK(emb, nQueries = 10, nSeeds = 8, nprobe = 9)
    }
  }

  test("mmrTopK: the diversity term demotes a duplicate that relevance-only ranking would keep") {
    import spark.implicits._
    // query direction (1,0); two EXACT-duplicate near hits (ids 1,2,
    // rel ~.98) and one equally-relevant but DIFFERENT vector (id 3,
    // rel ~.98, sim-to-id-1 ~.92). Relevance-only top-2 = (1, 2) —
    // tie to the lower id. MMR at lambda=.7 picks 1, then id 2 scores
    // .7*.98 - .3*1.0 (a duplicate) vs id 3's .7*.98 - .3*.92 — the
    // diverse vector wins rank 2.
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.98, 0.199)),
      (2L, Seq(0.98, 0.199)), (3L, Seq(0.98, -0.199)))
      .toDF("vec_id", "embedding")
    val mmr = EmbeddingQueries.mmrTopK(emb, nQueries = 1, poolSize = 3, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(mmr.map(x => (x._1, x._2)).toSeq == Seq((1, 1L), (2, 3L)),
      s"MMR must pick the diverse vector at rank 2: ${mmr.toSeq}")
    assert(mmr(0)._3 == 0.0, s"rank 1 has no selected set: maxsim ${mmr(0)._3}")
    assert(mmr(1)._3 < 0.99, s"rank 2's maxsim must be the non-duplicate sim: ${mmr(1)._3}")
    // relevance-only ranking on the same pool keeps the duplicate
    val rel2 = EmbeddingQueries.mmrTopK(emb, nQueries = 1, poolSize = 3, k = 2,
      lambda = 1.0, mu = 0.0)
      .collect().map(r => r.getLong(2)).toSeq
    assert(rel2 == Seq(1L, 2L), s"lambda=1 degenerates to pure relevance: $rel2")
  }

  test("mmrTopKIvf at nprobe = nSeeds degrades gracefully to the brute-force MMR") {
    // every candidate lives in exactly one cell and a full probe visits
    // all cells, so the nprobe = nSeeds pool IS the brute-force pool —
    // and the shared greedy loop then produces identical rankings (the
    // ivfTopK-vs-q45 equivalence contract, lifted to the composition)
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val brute = EmbeddingQueries.mmrTopK(emb).collect().map(_.toSeq).toSeq
    val full = EmbeddingQueries.mmrTopKIvf(emb, nprobe = 8).collect().map(_.toSeq).toSeq
    assert(full == brute, "full-probe IVF MMR must equal brute-force MMR")
    // a narrow probe still answers every (query, rank) slot here, from
    // the reduced candidate slice
    val narrow = EmbeddingQueries.mmrTopKIvf(emb, nprobe = 1).collect()
    assert(narrow.length == brute.length)
    spark.catalog.clearCache()
  }
}
