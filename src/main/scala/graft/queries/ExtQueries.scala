package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{Parity, Tables}
import Parity.{davg, davg12, dsum, sqlDavg, sqlDavg12, sqlDsum}

/** Coverage extensions over `events`: long->wide pivot (SURVEY.md R5),
  * parallel-array flatten round-trip (R1), approximate distinct counting,
  * rollup/grouping sets, analytic lag windows, and JSON property
  * extraction (the reference's semi-structured payload surface, S4/R3).
  */
object ExtQueries {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val defs: Map[String, Q] = Map(

    // R5 — pivot long->wide with aggregate (the reference's
    // pivot_table(index=(city,time), columns=param) shape,
    // ETL_Multi_Lvl_API/transform.py:196-202). Explicit value list keeps
    // the plan deterministic and avoids the extra distinct-collect job.
    "q15_pivot_wide" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("date"))
        .pivot("event_type", eventTypes)
        .agg(davg(col("value")))
        .orderBy(col("date")),
      s"""SELECT CAST(ts AS DATE) AS date,
         |${eventTypes.map(t =>
             s"""       CAST(SUM(CAST(value AS DECIMAL(27,6))) FILTER (event_type = '$t') AS DOUBLE)
                |         / COUNT(value) FILTER (event_type = '$t') AS "$t"""".stripMargin)
             .mkString(",\n")}
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // R1 — parallel-array flatten round-trip: per-user time-sorted
    // parallel arrays (ts[], event_id[], value[]) are zipped and
    // re-exploded index-aligned (arrays_zip + posexplode — exactly the
    // struct-of-arrays -> rows primitive of the weather transform,
    // ETL_Weather_API/transform.py:15-40), keeping the first 3 events
    // per user. The oracle states the same thing relationally.
    "q16_flatten_arrays" -> Q(
      (s, d) => {
        val sorted = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("evs"))
        val arrs = sorted.select(col("user_id"),
          transform(col("evs"), e => e.getField("ts")).as("ts_arr"),
          transform(col("evs"), e => e.getField("event_id")).as("eid_arr"),
          transform(col("evs"), e => e.getField("value")).as("val_arr"))
        arrs.select(col("user_id"),
          posexplode(arrays_zip(col("ts_arr"), col("eid_arr"), col("val_arr"))))
          .where(col("pos") < 3)
          .select(col("user_id"), col("pos"),
            unix_micros(col("col.ts_arr")).as("ts_us"),
            col("col.eid_arr").as("event_id"), col("col.val_arr").as("value"))
          .orderBy(col("user_id"), col("pos"))
      },
      """SELECT user_id, CAST(rn - 1 AS INTEGER) AS pos, epoch_us(ts) AS ts_us, event_id, value
        |FROM (SELECT user_id, ts, event_id, value,
        |             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id, value) AS rn
        |      FROM events) t
        |WHERE rn <= 3 ORDER BY user_id, pos""".stripMargin),

    // Approximate distinct counting (HLL) cross-checked against the
    // exact count: the approx VALUE is engine-specific, so the contract
    // surfaced to the oracle is the exact count plus a relative-error
    // bound both engines' sketches must meet.
    "q17_approx_distinct" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id")).as("n_approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) / col("n_exact") <= 0.1).as("approx_ok"))
        .orderBy(col("event_type")),
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        |       (ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
        |          / CAST(COUNT(DISTINCT user_id) AS DOUBLE)) <= 0.1 AS approx_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // Rollup (grouping sets): per (event_type, hour) with subtotal and
    // grand-total rows, disambiguated by the grouping bitmask.
    "q18_rollup_aggregate" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("hour", hour(col("ts")))
        .rollup(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          grouping_id().cast("int").as("g"))
        .orderBy(col("g"), col("event_type"), col("hour")),
      s"""SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
         |       COUNT(*) AS n, ${sqlDsum("value")} AS sum_value,
         |       CAST(GROUPING(event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER)) AS INTEGER) AS g
         |FROM events
         |GROUP BY ROLLUP(event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER))
         |ORDER BY g, event_type, hour""".stripMargin),

    // Analytic lag window: per-user consecutive value deltas, averaged
    // per event_type (the frame-based window surface the reference
    // lacks; scale note: partitions are per-user, so the window shuffle
    // is balanced by the user-id key space).
    "q19_lag_delta" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
          .where(col("delta").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_deltas"), davg12(col("delta")).as("avg_delta"))
          .orderBy(col("event_type"))
      },
      s"""WITH l AS (
         |  SELECT event_type,
         |         value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
         |  FROM events)
         |SELECT event_type, COUNT(*) AS n_deltas, ${sqlDavg12("delta")} AS avg_delta
         |FROM l WHERE delta IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin),

    // Semi-structured payload extraction: pull the numeric `k` property
    // out of the JSON props column and aggregate it — the reference's
    // raw-JSON parsing surface re-expressed as a queryable column
    // (ETL_Multi_Lvl_API/transform.py:89-130 reads payload keys the same
    // way). get_json_object stays inside codegen; no UDF.
    "q27_json_props" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          dsum(col("k").cast("double")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      s"""SELECT event_type, COUNT(k) AS n_with_k,
         |       ${sqlDsum("CAST(k AS DOUBLE)")} AS sum_k,
         |       MIN(k) AS min_k, MAX(k) AS max_k
         |FROM (SELECT event_type, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k FROM events) t
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
