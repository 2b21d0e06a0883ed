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
        // prune to each user's first 3 events BEFORE collecting: the
        // collected arrays are then ≤ 3 elements by construction, so a
        // hot user with millions of events cannot blow an aggregation
        // buffer (user_id is high-cardinality — this window parallelizes
        // fine; same rows as sorting the full array and taking pos < 3,
        // since the orderBy matches the struct sort order)
        val w3 = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc, col("value").asc)
        val pruned = Tables.events(s, d)
          .withColumn("rn", row_number().over(w3)).where(col("rn") <= 3).drop("rn")
        val sorted = pruned
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

    // As-of join (an operator Spark lacks natively), expressed as a
    // conditional running aggregate instead of a range join: for every
    // purchase event, the most recent STRICTLY PRIOR click by the same
    // user. One sort-shuffle on user_id — no per-pair join, no state
    // explosion; this is the formulation that survives a 100x scale-up.
    "q28_asof_prev_click" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("prev_click_us",
            max(when(col("event_type") === "click", unix_micros(col("ts")))).over(w))
          .where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("prev_click_us"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, prev_click_us
        |FROM (SELECT event_id, user_id, ts, event_type,
        |             MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |               OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_us
        |      FROM events) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin),

    // Banded range join: pairs of events from the same user within 5
    // minutes of each other. The naive theta join is O(n^2) per user; the
    // scale path buckets time into band-width bins and joins each event
    // to its own and the next bin (every qualifying pair lands in
    // exactly one of the two bucket combinations), then applies the
    // exact predicate. The oracle states the plain theta join — results
    // must be identical, only the plan differs.
    "q29_range_pairs" -> Q(
      (s, d) => {
        val bandUs = 5L * 60 * 1000000
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("bin", floor(col("us") / bandUs))
        val left = ev.select(col("user_id"), col("event_id").as("id_a"),
          col("us").as("us_a"), explode(array(col("bin"), col("bin") + 1)).as("jbin"))
        val right = ev.select(col("user_id"), col("event_id").as("id_b"),
          col("us").as("us_b"), col("bin").as("jbin"))
        left.join(right, Seq("user_id", "jbin"))
          // orient each unordered pair by TIME (earlier event on the
          // exploded side): then the later event's bin is always bin or
          // bin+1 of the earlier one, so every qualifying pair is found,
          // and found exactly once (the two exploded bins are distinct)
          .where((col("us_a") < col("us_b") ||
              (col("us_a") === col("us_b") && col("id_a") < col("id_b"))) &&
            col("us_b") - col("us_a") <= bandUs)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("user_id"))
      },
      """SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= 5 * 60 * 1000000
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Sessionization: gap > 30 min starts a new session; session ids via
    // a running sum over the per-user timeline (single window, no
    // iterative state) — the batch form of stream session windows.
    "q34_sessionize" -> Q(
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        val ev = Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
          .withColumn("sess_id", sum(col("new_sess")).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, 0)))
        ev.groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            davg(col("n_events").cast("double")).as("avg_events_per_session"),
            davg(col("duration_us").cast("double")).as("avg_session_duration_us"))
          .orderBy(col("user_id"))
      },
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id,
         |         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |                   > 30 * 60 * 1000000
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |s AS (
         |  SELECT user_id, epoch_us(ts) AS us,
         |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM g),
         |per AS (
         |  SELECT user_id, sess_id, COUNT(*) AS n_events,
         |         MAX(us) - MIN(us) AS duration_us
         |  FROM s GROUP BY 1, 2)
         |SELECT user_id, COUNT(*) AS n_sessions,
         |       ${sqlDavg("CAST(n_events AS DOUBLE)")} AS avg_events_per_session,
         |       ${sqlDavg("CAST(duration_us AS DOUBLE)")} AS avg_session_duration_us
         |FROM per GROUP BY 1 ORDER BY 1""".stripMargin),

    // Exact percentiles (linear interpolation — the reference's pandas
    // quantile semantics, matched by DuckDB quantile_cont). Exact
    // percentile sorts within each group; the approx path for wide
    // groups at scale is approx_percentile (t-digest), same API shape.
    "q38_percentiles" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"),
          count(col("value")).as("n"))
        .orderBy(col("event_type")),
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        |       quantile_cont(value, 0.9) AS p90,
        |       quantile_cont(value, 0.99) AS p99, COUNT(value) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // The approximate companion to q38 — the at-scale percentile path.
    // Exact percentile sorts every group; approx_percentile folds a
    // bounded-error quantile sketch (Greenwald-Khanna here, t-digest in
    // DuckDB) in one pass, mergeable across partitions. As with q17,
    // the approx VALUE is engine/merge-order specific, so the oracle
    // contract is the exact percentile plus a rank-error-bound check
    // each engine's own sketch must meet: accuracy=100 bounds Spark's
    // rank error at 1%, so the approx value must land between the exact
    // percentiles at p ∓ 2% (p99's upper window caps at the max).
    "q59_approx_percentiles" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(expr("percentile(value, array(0.48, 0.5, 0.52, 0.88, 0.9, 0.92, 0.97, 0.99, 1.0))").as("ex"),
          expr("approx_percentile(value, 0.5, 100)").as("a50"),
          expr("approx_percentile(value, 0.9, 100)").as("a90"),
          expr("approx_percentile(value, 0.99, 100)").as("a99"),
          count(col("value")).as("n"))
        .select(col("event_type"),
          element_at(col("ex"), 2).as("p50"),
          element_at(col("ex"), 5).as("p90"),
          element_at(col("ex"), 8).as("p99"),
          col("n"),
          col("a50").between(element_at(col("ex"), 1), element_at(col("ex"), 3)).as("p50_ok"),
          col("a90").between(element_at(col("ex"), 4), element_at(col("ex"), 6)).as("p90_ok"),
          col("a99").between(element_at(col("ex"), 7), element_at(col("ex"), 9)).as("p99_ok"))
        .orderBy(col("event_type")),
      """SELECT event_type,
        |       quantile_cont(value, 0.5) AS p50,
        |       quantile_cont(value, 0.9) AS p90,
        |       quantile_cont(value, 0.99) AS p99,
        |       COUNT(value) AS n,
        |       approx_quantile(value, 0.5) BETWEEN quantile_cont(value, 0.48)
        |         AND quantile_cont(value, 0.52) AS p50_ok,
        |       approx_quantile(value, 0.9) BETWEEN quantile_cont(value, 0.88)
        |         AND quantile_cont(value, 0.92) AS p90_ok,
        |       approx_quantile(value, 0.99) BETWEEN quantile_cont(value, 0.97)
        |         AND quantile_cont(value, 1.0) AS p99_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

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
