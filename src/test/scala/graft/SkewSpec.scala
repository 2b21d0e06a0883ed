package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ext.Skew

/** Salting helpers must be result-identical to their unsalted forms —
  * they only change WHERE rows aggregate/join, never what comes out. */
class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("saltedSum == plain sum/count on a skewed key distribution") {
    // events.event_type is naturally skewed (5 values over 10k rows)
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n"))
    val salted = Skew.saltedSum(ev, Seq("event_type"), "value",
      saltSrc = col("event_id"), salts = 16)
      .withColumnRenamed("sum_value", "sum_value")
    val joined = plain.join(salted.withColumnRenamed("sum_value", "s2")
      .withColumnRenamed("n", "n2"), Seq("event_type"))
    // sums of doubles in different orders: compare within 1e-6 relative;
    // counts exactly
    val bad = joined.where(
      abs(col("sum_value") - col("s2")) > abs(col("sum_value")) * 1e-6 ||
        col("n") =!= col("n2")).count()
    assert(bad == 0)
  }

  test("saltedJoin == plain join (row multiset)") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey",
      bigSaltSrc = col("l_quantity"), salts = 8)
      .select(plain.columns.map(col).toIndexedSeq: _*)
    assert(plain.count() == salted.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("TopKAgg == window row_number formulation") {
    val q26 = SparkEntry.queries("q26_priority_top3")(spark, sf)
    val q39 = SparkEntry.queries("q39_topk_aggregator")(spark, sf)
      .select(q26.columns.map(col).toIndexedSeq: _*)
    assert(q39.exceptAll(q26).count() == 0 && q26.exceptAll(q39).count() == 0)
  }
}
