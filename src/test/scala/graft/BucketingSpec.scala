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

  test("bucket-key aggregation also skips the exchange") {
    val agg = spark.table("orders_b").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"aggregation on the bucket key must be exchange-free:\n$plan")
  }
}
