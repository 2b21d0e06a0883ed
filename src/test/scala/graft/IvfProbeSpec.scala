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
}
