package graft

import org.apache.spark.sql.functions._
import graft.engine.{Sinks, Tables}

/** Bucketing = the co-located-join strategy for repeated large joins:
  * both sides pre-partitioned on the key at write time -> the join plan
  * has NO shuffle exchanges at all. This is the difference between
  * re-shuffling 100 TB per run and never shuffling it again. */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed join runs with zero shuffle exchanges") {
    Sinks.bucketedTable(Tables.orders(spark, sf), "orders_b",
      bucketCols = Seq("o_custkey"), buckets = 8)
    Sinks.bucketedTable(Tables.customer(spark, sf), "customer_b",
      bucketCols = Seq("c_custkey"), buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the test exercises the exchange path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      joined.collect()
      // AQE toString repeats the pre-adaptive plan under "Initial Plan";
      // assert against the final plan only
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      // the join itself must be exchange-free; the final small groupBy on
      // a different key is the only permitted shuffle
      assert(shuffles <= 1, s"co-bucketed join must not shuffle the fact sides:\n$plan")
      assert(!plan.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning(o_custkey") ||
          l.contains("Exchange hashpartitioning(c_custkey")),
        "join keys must come pre-partitioned from the bucketed files")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LSH band self-join over a band-bucketed signature table is exchange-free") {
    // the storage-side dedup accelerator: persist the signature table
    // bucketed on a band's hash columns, and the nightly band self-join
    // (the expensive stage of every LSH dedup run) reads both sides
    // pre-partitioned — no shuffle of the corpus, ever
    import graft.expressions.Exprs
    val sig = Tables.documents(spark, sf)
      .where(size(graft.ext.TextOps.tokens(col("text"))) >= 3)
      .withColumn("sig", Exprs.minhashSig(col("text")))
      .select(col("doc_id"), element_at(col("sig"), 1).as("h0"),
        element_at(col("sig"), 2).as("h1"))
    Sinks.bucketedTable(sig, "sig_b", bucketCols = Seq("h0", "h1"), buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = spark.table("sig_b")
      val b = spark.table("sig_b").select(col("doc_id").as("doc_b"),
        col("h0").as("g0"), col("h1").as("g1"))
      val pairs = a.join(b, col("h0") === col("g0") && col("h1") === col("g1")
        && col("doc_id") < col("doc_b"))
      pairs.collect()
      val plan = pairs.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"band self-join must read both sides pre-bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket-key aggregation also skips the exchange") {
    val agg = spark.table("orders_b").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"aggregation on the bucket key must be exchange-free:\n$plan")
  }
}
