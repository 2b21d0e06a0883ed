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
  }

  test("recall is monotone in nprobe: widening probes never worsens the found top-k") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    // per query, the worst cosine among the top-3 found — a growing
    // candidate set can only improve (or tie) it
    def floorByQuery(nprobe: Int): Map[Long, Double] =
      rows(EmbeddingQueries.ivfTopK(emb, nQueries = 10, nSeeds = 8, k = 3, nprobe = nprobe))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._4).min }
    val f1 = floorByQuery(1); val f4 = floorByQuery(4); val f8 = floorByQuery(8)
    f1.keys.foreach { q =>
      assert(f4(q) >= f1(q) - 1e-12, s"query $q: nprobe=4 floor ${f4(q)} < nprobe=1 ${f1(q)}")
      assert(f8(q) >= f4(q) - 1e-12, s"query $q: nprobe=8 floor ${f8(q)} < nprobe=4 ${f4(q)}")
    }
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
