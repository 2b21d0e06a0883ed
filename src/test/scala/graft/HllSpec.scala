package graft

import org.apache.spark.sql.functions._
import graft.ext.{HllAgg, TextOps}

/** HyperLogLog registers: JVM-vs-Column hash agreement, duplicate
  * idempotence, max-merge partition independence, and the raw
  * estimator's accuracy in its valid range. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def build(keys: Seq[String], b: Int): Array[Long] =
    keys.toDF("k").as[String].select(new HllAgg(b).toColumn).collect().head

  test("JVM hash60 matches the Column/oracle form bit-for-bit") {
    val keys = Seq("alpha beta gamma", "", "日本語 x y", "a:b:c")
    val got = keys.toDF("k")
      .select(col("k"), TextOps.hash60("hll", col("k")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(graft.expressions.TextHash.hash60("hll", k) == got(k), s"hash mismatch for '$k'")
    }
  }

  test("duplicates are free: inserting every key twice leaves the registers unchanged") {
    val keys = (1 to 500).map(i => s"key-$i")
    assert(build(keys, 8).toSeq == build(keys ++ keys, 8).toSeq,
      "registers are max-of-rho — multiplicity must not matter")
  }

  test("merge is elementwise max: split builds equal the whole build") {
    val (a, b) = ((1 to 300).map(i => s"a$i"), (1 to 200).map(i => s"b$i"))
    val whole = build(a ++ b, 8)
    val merged = build(a, 8).zip(build(b, 8)).map { case (x, y) => math.max(x, y) }
    assert(whole.toSeq == merged.toSeq)
  }

  test("register values stay in [0, 53] for b = 8 and the array has all 256 entries") {
    val regs = build((1 to 2000).map(i => s"v$i"), 8)
    assert(regs.length == 256)
    assert(regs.forall(r => r >= 0 && r <= 53), s"rho out of range: ${regs.max}")
    assert(regs.exists(_ > 0), "2000 keys must populate some registers")
  }

  test("raw estimate lands within 3 standard errors in its valid range (n >= 2.5m)") {
    val n = 20000
    val docs = (1 to n).map(i => s"w${i}a w${i}b w${i}c") // 1 shingle per doc, all distinct
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "s1") }
      .toDF("doc_id", "text", "source")
    val out = graft.queries.TextQueries.hllDistinct(docs, 8).collect().head
    val (exact, est) = (out.getLong(1), out.getDouble(3))
    assert(exact == n)
    val relErr = math.abs(est - n) / n
    assert(relErr < 3 * 1.04 / math.sqrt(256.0),
      f"raw HLL must track truth in range: est=$est%.1f exact=$n relErr=$relErr%.3f")
  }
}
