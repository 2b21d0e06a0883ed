package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{Parity, Tables}
import Parity.{davg, dsum, sqlDavg, sqlDsum}

/** Relational surface over the TPC-H-ish star schema: multi-way joins,
  * semi/anti joins, window ranking, pricing-summary aggregation. The
  * reference itself has no joins (SURVEY.md §2.5) — this is the extension
  * surface that makes the engine a complete analytics library at scale.
  *
  * Scale notes per query:
  *  - dimension sides (region/nation/customer/part) are broadcast — at
  *    100 TB the fact table shuffles zero bytes for those joins;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE
  *    handles skew; both sides prune columns before the exchange;
  *  - aggregates are partial (map-side combine) before the shuffle.
  */
object RelQueries {

  private val revenue = "l_extendedprice * (1e0 - l_discount)"

  val defs: Map[String, Q] = Map(

    // TPC-H Q1 shape — pricing summary: one wide hash aggregate after a
    // pushed-down scan filter.
    "q20_pricing_summary" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1e0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1e0) - col("l_discount")) * (lit(1e0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      s"""SELECT l_returnflag, l_linestatus,
         |       ${sqlDsum("l_quantity")} AS sum_qty,
         |       ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |       ${sqlDsum(revenue)} AS sum_disc_price,
         |       ${sqlDsum(s"l_extendedprice * (1e0 - l_discount) * (1e0 + l_tax)")} AS sum_charge,
         |       ${sqlDavg("l_quantity")} AS avg_qty,
         |       ${sqlDavg("l_extendedprice")} AS avg_price,
         |       ${sqlDavg("l_discount")} AS avg_disc,
         |       COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // TPC-H Q3 shape — top revenue orders for one segment: broadcast the
    // filtered customer dim, shuffle-join lineitem⋈orders, top-10 with a
    // deterministic tie-break.
    "q21_top_revenue_orders" -> Q(
      (s, d) => {
        val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = Tables.orders(s, d)
          .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_odate"), col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1e0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)
      },
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_odate, o_orderpriority,
         |       ${sqlDsum(revenue)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    // TPC-H Q5 shape — revenue per nation in one region, customer and
    // supplier in the same nation: 5-way join, dims broadcast.
    "q22_region_revenue" -> Q(
      (s, d) => {
        val rn = Tables.region(s, d).where(col("r_name") === "ASIA")
          .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1e0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      s"""SELECT n_name, ${sqlDsum(revenue)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin),

    // Broadcast dim join — per-brand stats; part is a dimension, so the
    // lineitem side never shuffles.
    "q23_brand_stats" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_quantity"))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(davg(col("l_extendedprice")).as("avg_price"),
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand")),
      s"""SELECT p_brand, ${sqlDavg("l_extendedprice")} AS avg_price,
         |       ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Left-semi join (EXISTS) — customers that have orders, per segment.
    "q24_segments_with_orders" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment")),
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Left-anti join (NOT EXISTS) — customers with no urgent orders, per
    // segment (filtered right side so the anti-join is non-degenerate).
    "q25_segments_without_urgent_orders" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment")),
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
        |                                WHERE o_custkey = c_custkey
        |                                  AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Same result as q26 through the TYPED path: a bounded top-k
    // Aggregator (graft.ext.TopKAgg) combines map-side to k rows per
    // group per partition — no full per-partition sort, the shape that
    // wins when groups are huge. Oracle identical to q26's.
    "q39_topk_aggregator" -> Q(
      (s, d) => {
        import s.implicits._
        val ds = Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
          .as[(String, Double, Long)]
        val top = ds.groupByKey(_._1)
          .mapValues(t => graft.ext.TopKAgg.Entry(t._2, t._3))
          .agg(new graft.ext.TopKAgg(3).toColumn)
        top.flatMap { case (prio, buf) =>
          buf.items.zipWithIndex.map { case (e, i) => (prio, i + 1, e.payload, e.sortKey) }
        }.toDF("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      """SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin),

    // Analytic window — top-3 orders by totalprice within each priority
    // (rank-in-partition; the scalable form of the reference's idxmax).
    // With ~5 priorities, a bare priority-partitioned window sorts the
    // whole fact table through 5 reducers — so prune FIRST with a
    // partition-local top-3 (a row outside its input-partition's top-3
    // can never be in the global top-3), then run the 5-way window over
    // the tiny ≤ 3*partitions*priorities candidate set. Deterministic
    // orderkey tiebreak makes the two-pass result identical.
    "q26_priority_top3" -> Q(
      (s, d) => {
        val ord = col("o_totalprice").desc :: col("o_orderkey").asc :: Nil
        val wLocal = Window.partitionBy(col("o_orderpriority"), col("pid"))
          .orderBy(ord: _*)
        val cands = Tables.orders(s, d)
          .withColumn("pid", spark_partition_id())
          .withColumn("lrn", row_number().over(wLocal)).where(col("lrn") <= 3)
          .drop("pid", "lrn")
        val w = Window.partitionBy(col("o_orderpriority")).orderBy(ord: _*)
        cands
          .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      """SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin),

    // Statistical aggregates (covariance, correlation, OLS slope,
    // stddev) in PARTITION-INDEPENDENT form: built-in corr/covar sum
    // doubles in shuffle order, so their last ulps change with the
    // cluster layout. Folding the five moment sums (Σx, Σy, Σxy, Σx²,
    // Σy²) through exact decimals makes every statistic a deterministic
    // function of the data alone — same bits on 4 partitions or 4,000 —
    // and the closing double arithmetic mirrors the oracle's expression
    // tree operation-for-operation (IEEE ops incl. sqrt are correctly
    // rounded, so identical trees give identical bits). The price is
    // scaled to k$ BEFORE squaring so every moment sum stays under 2^53
    // decimal units: above that, DuckDB's decimal->double (int128 cast,
    // then divide by 10^scale — two roundings) can drift one ulp from
    // Java's single correctly-rounded BigDecimal conversion. corr is
    // scale-invariant; covar/slope are defined in k$ units.
    "q58_group_stats" -> Q(
      (s, d) => {
        val base = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice") / 1000.0).as("y"))
        val agg = base.groupBy(col("flag")).agg(
          count(lit(1)).as("n"),
          Parity.dsum(col("x")).as("sx"), Parity.dsum(col("y")).as("sy"),
          Parity.dsum(col("x") * col("y")).as("sxy"),
          Parity.dsum(col("x") * col("x")).as("sxx"),
          Parity.dsum(col("y") * col("y")).as("syy"))
        val vx = (col("sxx") - (col("sx") * col("sx")) / col("n")) / (col("n") - 1)
        val vy = (col("syy") - (col("sy") * col("sy")) / col("n")) / (col("n") - 1)
        val cov = (col("sxy") - (col("sx") * col("sy")) / col("n")) / (col("n") - 1)
        agg.select(col("flag"), col("n"),
          cov.as("covar_xy"),
          (cov / (sqrt(vx) * sqrt(vy))).as("corr_xy"),
          ((col("sxy") - (col("sx") * col("sy")) / col("n")) /
            (col("sxx") - (col("sx") * col("sx")) / col("n"))).as("slope_yx"),
          sqrt(vx).as("stddev_x"))
          .orderBy(col("flag"))
      },
      s"""WITH a AS (
         |  SELECT l_returnflag AS flag, COUNT(*) AS n,
         |         ${Parity.sqlDsum("CAST(l_quantity AS DOUBLE)")} AS sx,
         |         ${Parity.sqlDsum("(l_extendedprice / 1000.0)")} AS sy,
         |         ${Parity.sqlDsum("CAST(l_quantity AS DOUBLE) * (l_extendedprice / 1000.0)")} AS sxy,
         |         ${Parity.sqlDsum("CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)")} AS sxx,
         |         ${Parity.sqlDsum("(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)")} AS syy
         |  FROM lineitem GROUP BY 1)
         |SELECT flag, n,
         |       ((sxy - ((sx * sy) / n)) / (n - 1)) AS covar_xy,
         |       (((sxy - ((sx * sy) / n)) / (n - 1)) /
         |        (sqrt((sxx - ((sx * sx) / n)) / (n - 1)) * sqrt((syy - ((sy * sy) / n)) / (n - 1)))) AS corr_xy,
         |       ((sxy - ((sx * sy) / n)) / (sxx - ((sx * sx) / n))) AS slope_yx,
         |       sqrt((sxx - ((sx * sx) / n)) / (n - 1)) AS stddev_x
         |FROM a ORDER BY flag""".stripMargin)
  )
}
