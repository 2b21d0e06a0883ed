package graft

import org.apache.spark.sql.functions._
import graft.ext.{CmsAgg, TextOps}

/** Count-min sketch: JVM-hash vs Column-hash bucket agreement (the
  * property the q93 oracle leans on), the ≥-exact estimate guarantee,
  * merge linearity, and the audit pairing itself. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("JVM salted hash matches the Column/oracle form bit-for-bit, incl. non-ASCII") {
    val toks = Seq("the", "a", "", "naïve", "日本語", "x:y", "0:", "1:weird salt prefix")
    val gotCol = toks.toDF("tok")
      .select(col("tok"), TextOps.saltedHash(0, col("tok")).as("h0"),
        TextOps.saltedHash(3, col("tok")).as("h3"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    toks.foreach { t =>
      assert(CmsAgg.saltedHash(0, t) == gotCol(t)._1, s"salt 0 mismatch for '$t'")
      assert(CmsAgg.saltedHash(3, t) == gotCol(t)._2, s"salt 3 mismatch for '$t'")
    }
  }

  test("estimate >= exact for every token; small distinct sets with a wide sketch are exact") {
    val (d, w) = (4, 256)
    // 5 distinct tokens, engineered multiplicities
    val corpus = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq.fill(11)("gamma") ++ Seq("delta") ++ Seq.fill(2)("eps")
    val sketch = corpus.toDF("tok").as[String]
      .select(new CmsAgg(d, w).toColumn).collect().head
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, n) =>
      val est = (0 until d).map(s => sketch(s * w + CmsAgg.bucket(s, t, w))).min
      assert(est >= n, s"CMS must never under-count: $t est=$est exact=$n")
    }
    // total mass conservation: every row's buckets sum to |corpus|
    (0 until d).foreach { s =>
      val rowSum = (0 until w).map(b => sketch(s * w + b)).sum
      assert(rowSum == corpus.size, s"row $s mass ${rowSum} != ${corpus.size}")
    }
  }

  test("merge linearity: sketch(a ++ b) == sketch(a) + sketch(b) elementwise") {
    val (d, w) = (2, 16)
    val a = Seq("x", "y", "x", "z")
    val b = Seq("y", "y", "w")
    def sk(ts: Seq[String]) =
      ts.toDF("tok").as[String].select(new CmsAgg(d, w).toColumn).collect().head
    val (sa, sb, sab) = (sk(a), sk(b), sk(a ++ b))
    assert(sab.toSeq == sa.zip(sb).map { case (p, q) => p + q }.toSeq,
      "counters must be linear under merge")
  }

  test("cmsHeavyHitters pairs the exact top-k with its own sketch probes") {
    val docs = Seq(
      (1L, "the the the quick brown the"),
      (2L, "the quick quick fox"),
      (3L, "lazy dog the quick")).toDF("doc_id", "text")
    val out = graft.queries.TextQueries.cmsHeavyHitters(docs, 4, 256, 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq("the", "quick", "brown"),
      s"top-3 by (count DESC, tok ASC): ${out.toSeq}")
    assert(out.forall { case (_, exact, est) => est >= exact },
      s"every estimate >= exact: ${out.toSeq}")
    // 9 distinct tokens in 4x256 cells: no collisions, estimates exact
    assert(out.forall { case (_, exact, est) => est == exact },
      s"collision-free corpus must estimate exactly: ${out.toSeq}")
  }
}
