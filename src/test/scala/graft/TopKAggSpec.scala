package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.TopKAgg

/** Direct unit coverage of [[graft.ext.TopKAgg.perGroupTopK]] — the
  * bounded heap cut the whole ANN family rides (q45/q47/q87 + MMR
  * pools). SkewSpec pins the q26==q39 end-to-end equivalence; this
  * suite exercises the aggregator boundary itself: row-for-row window
  * equivalence on adversarial tie data, the full-buffer skip path
  * (reduce's one-comparison short-circuit), k larger than the group,
  * and the documented NaN exclusion (r19 ADVICE). */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  /** 6 groups × 200 rows with many exact score ties (score = id % 17),
    * so the deterministic tie-break (score DESC, id ASC) is actually
    * load-bearing, and enough rows per group that the buffer fills and
    * the skip path runs. */
  private def scored = (0L until 1200L)
    .map(i => (i % 6, (i % 17).toDouble, i))
    .toDF("g", "score", "id")

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"), col("score"))
  }

  test("perGroupTopK == window row_number, ranks included, on tie-heavy data") {
    for (k <- Seq(1, 3, 16)) {
      val heap = TopKAgg.perGroupTopK(scored, "g", "score", "id", k)
      val win = windowTopK(k)
      assert(heap.count() == 6L * k, s"k=$k row count")
      assert(heap.exceptAll(win).count() == 0 && win.exceptAll(heap).count() == 0,
        s"k=$k heap/window divergence")
    }
  }

  test("k > group size returns the whole group, fully ranked") {
    val tiny = Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (2L, 1.0, 20L))
      .toDF("g", "score", "id")
    val out = TopKAgg.perGroupTopK(tiny, "g", "score", "id", k = 50)
      .orderBy(col("g"), col("rank")).as[(Long, Int, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1, 11L, 7.0), (1L, 2, 10L, 5.0), (2L, 1, 20L, 1.0)))
  }

  test("full-buffer skip path: a non-improving row changes nothing") {
    // direct Aggregator-level exercise of reduce's short-circuit: with
    // the buffer full at k=2, a strictly-worse entry must return the
    // buffer unchanged (same object semantics: equal items)
    val agg = new TopKAgg(2)
    val full = Seq(TopKAgg.Entry(9.0, 1L), TopKAgg.Entry(8.0, 2L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(full.items == Seq(TopKAgg.Entry(9.0, 1L), TopKAgg.Entry(8.0, 2L)))
    val afterWorse = agg.reduce(full, TopKAgg.Entry(7.0, 3L))
    assert(afterWorse.items == full.items, "worse row must be skipped")
    // a tie with a HIGHER payload also loses (score tie → lower id wins)
    val afterTie = agg.reduce(full, TopKAgg.Entry(8.0, 5L))
    assert(afterTie.items == full.items, "tie with higher id must be skipped")
    // a tie with a LOWER payload evicts the incumbent
    val afterBetterTie = agg.reduce(full, TopKAgg.Entry(8.0, 0L))
    assert(afterBetterTie.items == Seq(TopKAgg.Entry(9.0, 1L), TopKAgg.Entry(8.0, 0L)))
  }

  test("NaN scores are filtered at the boundary, not ranked") {
    // a zero-norm vector's cosine is 0/0 = NaN; the window formulation
    // would rank it FIRST (Spark sorts NaN as largest) while the heap
    // would rank it last-or-dropped depending on arrival order — the
    // boundary filter makes the behavior deterministic: NaN rows never
    // appear, everything else ranks exactly as the window ranks it
    val withNaN = Seq((1L, 5.0, 10L), (1L, Double.NaN, 11L), (1L, 7.0, 12L))
      .toDF("g", "score", "id")
    val out = TopKAgg.perGroupTopK(withNaN, "g", "score", "id", k = 3)
      .orderBy(col("rank")).as[(Long, Int, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1, 12L, 7.0), (1L, 2, 10L, 5.0)))
  }
}
