package graft

/** Partition-count invariance pin (r20 verdict #7, and the safety
  * argument behind r21's input-derived streaming state partitioning):
  * the engine's bit-exactness claims rest on exact-long/decimal folds
  * and deterministic tie orders, which make every hash-gated result a
  * pure function of the DATA, not of `spark.sql.shuffle.partitions`.
  * This spec re-runs a sample of hash-gated queries under partition
  * counts {1, 7, 32} and asserts identical sorted row multisets —
  * turning the BENCH_NOTES exact-fold argument into a green test.
  *
  * Sample choice (the verdict's): q58 (group stats with double means —
  * the Parity decimal-sum device), q75 (k-means refinement sweeps —
  * floating accumulation order), q95 (HLL registers + IEEE estimate),
  * q100 (the full composed recipe: curation chain + allocator +
  * manifest — windows, joins, range partitioning all in one plan).
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rowsUnder(q: String, parts: Int): Seq[String] = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, parts.toString)
    try {
      // cold plan per sweep: a cached frame from the previous partition
      // count would make the sweep vacuous
      spark.catalog.clearCache()
      // the delimiter is U+0001 (a control char no testdata field
      // carries — unlike '|', which appears in text), so a divergence
      // shifting bytes across adjacent field boundaries cannot compare
      // equal (the r21 ADVICE concern; the char renders invisibly,
      // hence this note)
      SparkEntry.queries(q)(spark, sf).collect().map(_.mkString("")).toSeq.sorted
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.catalog.clearCache()
    }
  }

  Seq("q58_group_stats", "q75_kmeans_refine", "q95_hll_distinct",
    "q100_pretraining_recipe").foreach { q =>
    test(s"$q: identical rows under shuffle.partitions in {1, 7, 32}") {
      val base = rowsUnder(q, 1)
      assert(base.nonEmpty, s"$q produced no rows at $sf")
      Seq(7, 32).foreach { n =>
        val got = rowsUnder(q, n)
        assert(got == base,
          s"$q diverged between 1 and $n shuffle partitions: " +
            s"${got.diff(base).take(2)} vs ${base.diff(got).take(2)}")
      }
    }
  }
}
