package graft

import org.apache.spark.sql.functions._
import graft.queries.EmbeddingQueries

/** Pins the product-quantization contract of [[EmbeddingQueries.pqTopK]]
  * (q87): codeword assignment, exact-long ADC accumulation, and the
  * zero-reconstruction-error equivalence with brute force.
  *
  * The equivalence lever: quantization is PER-ELEMENT (floor(x·y·1e12 +
  * 0.5) summed as longs), so the sum of a vector's m per-subspace
  * quantized dots IS the full-vector quantized dot — when a candidate
  * decodes exactly (its sub-slices are codewords), the ADC score equals
  * qdot(query, candidate) with no approximation at all. On such a
  * corpus PQ must reproduce brute-force ranking bit-exactly.
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val dim = 64

  /** An embeddings-shaped frame from (vec_id, Array[Double]) rows. */
  private def embOf(rows: Seq[(Long, Array[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"), lit("t").as("label"))
  }

  /** Four seed vectors with distinctive per-subspace slices: seed j is
    * the constant (j + 1) · 0.1, except a position-dependent ripple so
    * sub-slices differ across subspaces too. */
  private def seed(j: Int): Array[Double] =
    Array.tabulate(dim)(i => (j + 1) * 0.1 + (i % 8) * 0.01)

  /** A vector that concatenates, per 8-dim subspace m, the m-th slice of
    * seed `picks(m)` — reconstruction error exactly zero. */
  private def composed(picks: Seq[Int]): Array[Double] =
    Array.tabulate(dim) { i =>
      val m = i / 8
      seed(picks(m))(i)
    }

  test("zero-reconstruction-error corpus: ADC ranking equals brute force bit-exactly") {
    // vec_id 0..3 are the seeds (the codebook); 4.. are codeword
    // compositions; queries are the first 2 rows (themselves seeds)
    val picks = Seq(
      Seq(0, 1, 2, 3, 0, 1, 2, 3), Seq(3, 2, 1, 0, 3, 2, 1, 0),
      Seq(1, 1, 1, 1, 2, 2, 2, 2), Seq(2, 0, 2, 0, 2, 0, 2, 0),
      Seq(0, 0, 1, 1, 2, 2, 3, 3), Seq(3, 3, 3, 3, 3, 3, 3, 0))
    val corpus = (0 until 4).map(j => (j.toLong, seed(j))) ++
      picks.zipWithIndex.map { case (p, i) => ((i + 4).toLong, composed(p)) }
    val emb = embOf(corpus)

    val pq = EmbeddingQueries.pqTopK(emb, nQueries = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

    // brute force over the same corpus with the same quantized dot and
    // the same tie rule (score desc, cand_id asc)
    def qdot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => math.floor(a(i) * b(i) * 1e12 + 0.5).toLong).sum.toDouble / 1e12
    val expected = (0L until 2L).flatMap { q =>
      val qv = corpus.find(_._1 == q).get._2
      corpus.filter(_._1 != q)
        .map { case (id, v) => (id, qdot(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((id, s), r) => (q, r + 1, id, s) }
    }
    assert(pq == expected,
      s"ADC must equal exact quantized ranking on a zero-error corpus:\n$pq\nvs\n$expected")
  }

  test("an exactly-tied sub-slice takes the LOWER codeword") {
    // An EXACT tie in the quantized encoding distance, by symmetry
    // rather than real-arithmetic coincidence (per-element floors do
    // not preserve a midpoint tie): codeword 1's every sub-slice is a
    // PERMUTATION of codeword 0's, and the tied row is constant — so
    // qdot(c0,c0) = qdot(c1,c1) and qdot(x,c0) = qdot(x,c1) as equal
    // sums over equal multisets of quantized longs, making
    // d0 = d1 bit-exactly. The tie must resolve to code 0 (lower),
    // which the oracle mirrors with key ASC.
    val p = Array.tabulate(8)(r => 0.1 + r * 0.01)
    val s0 = Array.tabulate(dim)(i => p(i % 8))
    val s1 = Array.tabulate(dim)(i => p(7 - i % 8)) // every slice reversed
    val s2 = Array.fill(dim)(0.55)
    val s3 = Array.fill(dim)(0.95)
    val tied = Array.fill(dim)(0.3)
    val corpus = Seq((0L, s0), (1L, s1), (2L, s2), (3L, s3), (4L, tied))
    val out = EmbeddingQueries.pqTopK(embOf(corpus), nQueries = 1, k = 4).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    def qdot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => math.floor(a(i) * b(i) * 1e12 + 0.5).toLong).sum.toDouble / 1e12
    // the tied row's codes must all be 0, so its ADC score against the
    // s0 query is qdot(s0, s0); code 1 would have scored qdot(s0, s1),
    // which differs (p is not a palindrome)
    assert(qdot(s0, s0) != qdot(s0, s1), "construction sanity: codes distinguishable")
    assert(out(4L) == qdot(s0, s0),
      "equidistant sub-slices must take the LOWER codeword (code 0)")
  }

  test("registry q87 runs on the test corpus with full per-query depth") {
    val df = SparkEntry.queries("q87_pq_topk")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 10 * 5, s"10 queries x top-5, got ${rows.length}")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5), "dense ranks 1..5")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "approx_dot non-increasing in rank")
    }
  }
}
