package graft

import org.apache.spark.sql.functions._
import graft.ext.{BloomAgg, CmsAgg}

/** Bloom filter: the no-false-negative guarantee (the property that
  * makes the q94 pre-filter sound), merge-by-OR partition independence,
  * and the decontamination accounting against an exact reference. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildBits(keys: Seq[Long], m: Int, k: Int): Array[Long] =
    keys.toDF("h").as[Long].select(new BloomAgg(m, k).toColumn).collect().head

  private def probe(bits: Array[Long], key: Long, m: Int, k: Int): Boolean =
    (0 until k).forall { s =>
      val pos = (CmsAgg.saltedHash(s, key.toString) % m).toInt
      ((bits(pos >> 6) >> (pos & 63)) & 1L) == 1L
    }

  test("no false negatives: every inserted key probes true") {
    val (m, k) = (512, 3)
    val keys = (1L to 200L).map(_ * 7919L)
    val bits = buildBits(keys, m, k)
    keys.foreach(key => assert(probe(bits, key, m, k), s"inserted $key must probe true"))
  }

  test("merge is bitwise OR: split builds equal the whole build") {
    val (m, k) = (256, 2)
    val a = Seq(1L, 2L, 3L)
    val b = Seq(100L, 200L)
    val whole = buildBits(a ++ b, m, k)
    val merged = buildBits(a, m, k).zip(buildBits(b, m, k)).map { case (x, y) => x | y }
    assert(whole.toSeq == merged.toSeq, "OR of partials must equal the whole")
  }

  test("bloomDecontaminate: candidates contain every true hit; true hits match an exact reference") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.queries.CurationQueries.bloomDecontaminate(docs, 8192, 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.forall(_._1 != "src0"), "benchmark source excluded")
    out.foreach { case (s, nSh, nCand, nTrue) =>
      assert(nTrue <= nCand, s"$s: candidates must contain every true hit")
      assert(nCand <= nSh, s"$s: candidates bounded by the source's shingles")
    }
    // exact reference for the true hits: corpus shingle rows whose hash
    // is in the benchmark's distinct-hash set (no bloom involved)
    val idx = docs.select(col("source"),
      explode(graft.expressions.Exprs.shingleHashes(col("text"))).as("h"))
    val bench = idx.where(col("source") === "src0").select("h").distinct()
      .collect().map(_.getLong(0)).toSet
    val want = idx.where(col("source") =!= "src0")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.count(p => bench(p._2)).toLong).toMap
    out.foreach { case (s, _, _, nTrue) =>
      assert(nTrue == want.getOrElse(s, 0L), s"$s: true hits ${nTrue} != exact ${want.get(s)}")
    }
    spark.catalog.clearCache()
  }

  test("a saturated filter passes everything as candidates but confirms only true hits") {
    import spark.implicits._
    // m = 64 with 200 inserted keys: every bit set, FP rate 1 — every
    // corpus shingle becomes a candidate, confirms stay exact
    val bench = (0 until 50).map(i => (i.toLong, s"b$i x$i y$i z$i common tail words", "src0"))
    val corp = (0 until 20).map(i => (1000L + i, s"c$i p$i q$i r$i unrelated tokens", "srcA"))
    val docs = (bench ++ corp).toDF("doc_id", "text", "source")
    val out = graft.queries.CurationQueries.bloomDecontaminate(docs, 64, 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 1 && out.head._1 == "srcA")
    val (_, nSh, nCand, nTrue) = out.head
    assert(nCand == nSh, s"saturated filter must flag every shingle: $nCand of $nSh")
    assert(nTrue == 0L, "disjoint corpora confirm nothing")
    spark.catalog.clearCache()
  }
}
