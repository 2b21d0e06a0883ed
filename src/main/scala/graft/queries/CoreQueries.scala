package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{Features, Parity, Tables}
import Parity.{davg, dsum, sqlDavg, sqlDsum}

/** The reference's analysis surface (SURVEY.md §2.3, §2.4, §2.5, §2.7)
  * transplanted onto the `events` table: grand aggregates, group-by means,
  * argmax KPIs, crosstabs, histograms, tumbling windows, top-k, binning,
  * AQI/severity/risk features, upsert semantics, deterministic sampling.
  *
  * Parity conventions shared with the oracle SQL:
  *  - double aggregation via Parity.dsum/davg (order-independent);
  *  - timestamps surfaced as epoch microseconds (unix_micros/epoch_us) so
  *    parquet ns-vs-us physical types can't skew the compare;
  *  - every query deterministically ordered with full tie-breaks;
  *  - scalar double arithmetic written with identical parenthesization on
  *    both sides (IEEE doubles then match bit-for-bit).
  */
object CoreQueries {

  /** CASE-chain mirror of Features.severity with only the pm2.5 term bound
    * (events.value plays the pm2.5 role). */
  private val sevSql =
    "(COALESCE(value, 0e0)*5e0 + COALESCE(CAST(NULL AS DOUBLE), 0e0)*3e0" +
      " + COALESCE(CAST(NULL AS DOUBLE), 0e0)*4e0 + COALESCE(CAST(NULL AS DOUBLE), 0e0)*4e0" +
      " + COALESCE(CAST(NULL AS DOUBLE), 0e0)*2e0 + COALESCE(CAST(NULL AS DOUBLE), 0e0)*3e0)"

  private def sevCol = Features.severity(
    col("value"), lit(null).cast("double"), lit(null).cast("double"),
    lit(null).cast("double"), lit(null).cast("double"), lit(null).cast("double"))

  val defs: Map[String, Q] = Map(

    // A6 + A10 + W1 — the flagship: per event_type, the hour-of-day with the
    // highest average value (reference marquee KPI, etl_analysis.py:200-221).
    "q01_worst_hour" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), hour(col("ts")).as("hour"))
          .agg(davg(col("value")).as("avg_value"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("avg_value").desc, col("hour").asc)
        hourly.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("event_type"), col("hour"), col("avg_value"))
          .orderBy(col("event_type"))
      },
      s"""WITH h AS (
         |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
         |         ${sqlDavg("value")} AS avg_value
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, hour, avg_value
         |FROM (SELECT h.*, row_number() OVER (PARTITION BY event_type ORDER BY avg_value DESC, hour ASC) AS rn FROM h) t
         |WHERE rn = 1 ORDER BY event_type""".stripMargin),

    // A1 — grand aggregate in one pass (analysis_summary.csv shape,
    // ETL_Weather_API/etl_analysis.py:107-114).
    "q02_grand_aggregate" -> Q(
      (s, d) => Tables.events(s, d).agg(
        count(lit(1)).as("n_rows"),
        unix_micros(min(col("ts"))).as("min_ts_us"),
        unix_micros(max(col("ts"))).as("max_ts_us"),
        davg(col("value")).as("avg_value")),
      s"""SELECT COUNT(*) AS n_rows, epoch_us(MIN(ts)) AS min_ts_us,
         |       epoch_us(MAX(ts)) AS max_ts_us, ${sqlDavg("value")} AS avg_value
         |FROM events""".stripMargin),

    // A2 — group-by mean on composite (date, hour) key
    // (hourly_avg_temp.csv shape, ETL_Weather_API/etl_analysis.py:126-130).
    "q03_avg_by_date_hour" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("date"), hour(col("ts")).as("hour"))
        .agg(davg(col("value")).as("avg_value"), count(lit(1)).as("n"))
        .orderBy(col("date"), col("hour")),
      s"""SELECT CAST(ts AS DATE) AS date, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
         |       ${sqlDavg("value")} AS avg_value, COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // A5 — value_counts of the categorical key
    // (ETL_Multi_Lvl_API/etl_analysis.py:193-197).
    "q04_event_type_counts" -> Q(
      (s, d) => Tables.events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type").asc),
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, event_type""".stripMargin),

    // A7 — percentage-of-total via broadcast cross-join with the grand
    // total (scales: no single-partition window, the 1-row side broadcasts).
    "q05_pct_of_total" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val counts = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val total = ev.agg(count(lit(1)).as("total"))
        counts.crossJoin(broadcast(total))
          .withColumn("pct", lit(100e0) * col("n") / col("total"))
          .select(col("event_type"), col("n"), col("pct"))
          .orderBy(col("event_type"))
      },
      """SELECT event_type, COUNT(*) AS n, 100e0 * COUNT(*) / MAX(t.total) AS pct
        |FROM events CROSS JOIN (SELECT COUNT(*) AS total FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // R8 + A7 + A8 — crosstab of risk_class counts per event_type with
    // row totals and percentages (city_risk_distribution.csv shape,
    // ETL_Multi_Lvl_API/etl_analysis.py:227-245).
    "q06_risk_crosstab" -> Q(
      (s, d) => {
        val risk = Tables.events(s, d)
          .withColumn("risk_class", Features.riskClass(sevCol))
        risk.groupBy(col("event_type"))
          .pivot("risk_class", Seq("High Risk", "Moderate Risk", "Low Risk"))
          .count().na.fill(0)
          .withColumnRenamed("High Risk", "high_risk")
          .withColumnRenamed("Moderate Risk", "moderate_risk")
          .withColumnRenamed("Low Risk", "low_risk")
          .withColumn("total_hours", col("high_risk") + col("moderate_risk") + col("low_risk"))
          .withColumn("pct_high", lit(100e0) * col("high_risk") / col("total_hours"))
          .withColumn("pct_moderate", lit(100e0) * col("moderate_risk") / col("total_hours"))
          .withColumn("pct_low", lit(100e0) * col("low_risk") / col("total_hours"))
          .orderBy(col("event_type"))
      },
      s"""WITH r AS (
         |  SELECT event_type,
         |         CASE WHEN $sevSql > 400 THEN 'High Risk'
         |              WHEN $sevSql > 200 THEN 'Moderate Risk'
         |              ELSE 'Low Risk' END AS risk_class
         |  FROM events)
         |SELECT event_type,
         |       COUNT(*) FILTER (risk_class = 'High Risk') AS high_risk,
         |       COUNT(*) FILTER (risk_class = 'Moderate Risk') AS moderate_risk,
         |       COUNT(*) FILTER (risk_class = 'Low Risk') AS low_risk,
         |       COUNT(*) AS total_hours,
         |       100e0 * (COUNT(*) FILTER (risk_class = 'High Risk')) / COUNT(*) AS pct_high,
         |       100e0 * (COUNT(*) FILTER (risk_class = 'Moderate Risk')) / COUNT(*) AS pct_moderate,
         |       100e0 * (COUNT(*) FILTER (risk_class = 'Low Risk')) / COUNT(*) AS pct_low
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),

    // A9 — equal-width histogram, 30 bins from data min/max (matplotlib
    // formula; hist_pm2_5.png data, ETL_Multi_Lvl_API/etl_analysis.py:266-275).
    // min/max via 1-row broadcast cross-join, not a single-partition window.
    "q07_histogram" -> Q(
      (s, d) => {
        val v = Tables.events(s, d).select(col("value")).where(col("value").isNotNull)
        val mm = v.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
        v.crossJoin(broadcast(mm))
          .withColumn("bin", least(
            floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / lit(30e0))),
            lit(29e0)).cast("int"))
          .groupBy(col("bin")).agg(count(lit(1)).as("n"))
          .orderBy(col("bin"))
      },
      """WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
        |     mm AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM v)
        |SELECT CAST(LEAST(FLOOR((value - mn) / ((mx - mn) / 30e0)), 29e0) AS INTEGER) AS bin,
        |       COUNT(*) AS n
        |FROM v CROSS JOIN mm GROUP BY 1 ORDER BY 1""".stripMargin),

    // A10 / W1 — tumbling 1-hour window mean per key (THE streaming-ready
    // primitive; hourly_pm2_5_trends.png data, etl_analysis.py:320).
    "q08_tumbling_hour" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(davg(col("value")).as("avg_value"), count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("hour_start_us"),
          col("event_type"), col("avg_value"), col("n"))
        .orderBy(col("hour_start_us"), col("event_type")),
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
         |       ${sqlDavg("value")} AS avg_value, COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // W1 extension — HOPPING (sliding) windows: 1-hour windows every 30
    // minutes, so every event lands in exactly TWO overlapping windows
    // (start = the slide-aligned slot at-or-before ts, and that minus
    // one slide — Spark's epoch-aligned window() semantics). The oracle
    // restates the fan-out as a UNION ALL of the two slot computations;
    // the decimal avg keeps the doubles engine-identical per q08.
    "q98_hopping_window" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(davg(col("value")).as("avg_value"), count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("event_type"), col("avg_value"), col("n"))
        .orderBy(col("win_start_us"), col("event_type")),
      s"""WITH slots AS (
         |  SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS win_start_us,
         |         event_type, value
         |  FROM events
         |  UNION ALL
         |  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000,
         |         event_type, value
         |  FROM events)
         |SELECT win_start_us, event_type, ${sqlDavg("value")} AS avg_value, COUNT(*) AS n
         |FROM slots GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // O3 — top-k by count with deterministic tie-break
    // (ETL_Multi_Lvl_API/etl_analysis.py:304).
    "q09_topk_users" -> Q(
      (s, d) => Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id").asc).limit(6),
      """SELECT user_id, COUNT(*) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, user_id LIMIT 6""".stripMargin),

    // P9 — AQI categorizer CASE chain, with the reference's threshold gaps
    // (50 < v < 51 -> Unknown) exercised by real double-valued data.
    "q10_aqi_counts" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("aqi_pm25", Features.aqiCategory(col("value")))
        .groupBy(col("aqi_pm25"))
        .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
        .orderBy(col("aqi_pm25")),
      s"""SELECT CASE WHEN value IS NULL THEN 'Unknown'
         |            WHEN value <= 50 THEN 'Good'
         |            WHEN value >= 51 AND value <= 100 THEN 'Moderate'
         |            WHEN value >= 101 AND value <= 200 THEN 'Unhealthy'
         |            WHEN value >= 201 AND value <= 300 THEN 'Very Unhealthy'
         |            WHEN value > 300 THEN 'Hazardous'
         |            ELSE 'Unknown' END AS aqi_pm25,
         |       COUNT(*) AS n, ${sqlDavg("value")} AS avg_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // P7 + P8 — pd.cut right-closed binning and the feels_like arithmetic
    // projection (ETL_Weather_API/transform.py:75-77), aggregated per bin.
    "q11_temp_bins" -> Q(
      (s, d) => {
        val t = Tables.events(s, d)
          .withColumn("temp_c", col("value") / lit(10e0))
          .withColumn("rel_humidity", pmod(col("user_id"), lit(100L)).cast("double"))
          .withColumn("feels_like_c", Features.feelsLike(col("temp_c"), col("rel_humidity")))
          .withColumn("temp_category", Features.tempCategory(col("temp_c")))
        t.groupBy(col("temp_category"))
          .agg(count(lit(1)).as("n"), davg(col("feels_like_c")).as("avg_feels_like"))
          .orderBy(col("temp_category"))
      },
      s"""WITH t AS (
         |  SELECT value / 10e0 AS temp_c,
         |         (value / 10e0) - (((user_id % 100) / 100e0) * 2e0) AS feels_like_c
         |  FROM events),
         |     c AS (
         |  SELECT CASE WHEN temp_c IS NULL OR temp_c <= -100 OR temp_c > 100 THEN NULL
         |              WHEN temp_c <= 0 THEN 'very_cold'
         |              WHEN temp_c <= 10 THEN 'cold'
         |              WHEN temp_c <= 20 THEN 'mild'
         |              WHEN temp_c <= 30 THEN 'warm'
         |              ELSE 'hot' END AS temp_category,
         |         feels_like_c
         |  FROM t)
         |SELECT temp_category, COUNT(*) AS n, ${sqlDavg("feels_like_c")} AS avg_feels_like
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),

    // S11 / W2 — upsert semantics as last-write-wins dedup at the
    // (user_id, hour) grain: row_number over an explicit recency order, not
    // bare dropDuplicates (which is nondeterministic under parallelism).
    "q12_upsert_latest" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("hour_start_us", unix_micros(date_trunc("hour", col("ts"))))
        val w = Window.partitionBy(col("user_id"), col("hour_start_us"))
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("user_id"), col("hour_start_us"), col("event_id"), col("value"))
          .orderBy(col("user_id"), col("hour_start_us"))
      },
      """SELECT user_id, hour_start_us, event_id, value
        |FROM (SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hour_start_us,
        |             event_id, value,
        |             row_number() OVER (PARTITION BY user_id, epoch_us(date_trunc('hour', ts))
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, hour_start_us""".stripMargin),

    // O5 — deterministic hash-based sample (the reference samples 2000 rows
    // for its scatter plot; rand() isn't oracle-reproducible, a hash
    // predicate is, and it scales embarrassingly-parallel).
    "q13_hash_sample" -> Q(
      (s, d) => Tables.events(s, d)
        .where(substring(md5(col("event_id").cast("string")), 1, 2) === "00")
        .withColumn("severity", sevCol)
        .select(col("event_id"), col("user_id"), col("value"), col("severity"))
        .orderBy(col("event_id")),
      s"""SELECT event_id, user_id, value, $sevSql AS severity
         |FROM events
         |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) = '00'
         |ORDER BY event_id""".stripMargin),

    // §2.7 summary_metrics.csv — three argmax KPIs unpivoted to
    // (metric, value) rows (ETL_Multi_Lvl_API/etl_analysis.py:359-380).
    "q14_summary_metrics" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        def argmax(keyCol: String, metric: String) = {
          ev.groupBy(col(keyCol).cast("string").as("k"))
            .agg(davg(col("value")).as("m"))
            .orderBy(col("m").desc, col("k").asc).limit(1)
            .select(lit(metric).as("metric"), col("k").as("value"))
        }
        argmax("event_type", "worst_event_type_by_avg_value")
          .unionAll(argmax("user_id", "worst_user_by_avg_value"))
          .unionAll(
            ev.groupBy(hour(col("ts")).cast("string").as("k"))
              .agg(davg(col("value")).as("m"))
              .orderBy(col("m").desc, col("k").asc).limit(1)
              .select(lit("worst_hour_by_avg_value").as("metric"), col("k").as("value")))
          .orderBy(col("metric"))
      },
      s"""WITH a AS (SELECT CAST(event_type AS VARCHAR) AS k, ${sqlDavg("value")} AS m FROM events GROUP BY 1),
         |     b AS (SELECT CAST(user_id AS VARCHAR) AS k, ${sqlDavg("value")} AS m FROM events GROUP BY 1),
         |     c AS (SELECT CAST(CAST(EXTRACT(hour FROM ts) AS INTEGER) AS VARCHAR) AS k, ${sqlDavg("value")} AS m FROM events GROUP BY 1)
         |SELECT metric, value FROM (
         |  SELECT 'worst_event_type_by_avg_value' AS metric,
         |         (SELECT k FROM a ORDER BY m DESC, k ASC LIMIT 1) AS value
         |  UNION ALL
         |  SELECT 'worst_user_by_avg_value',
         |         (SELECT k FROM b ORDER BY m DESC, k ASC LIMIT 1)
         |  UNION ALL
         |  SELECT 'worst_hour_by_avg_value',
         |         (SELECT k FROM c ORDER BY m DESC, k ASC LIMIT 1)
         |) ORDER BY metric""".stripMargin)
  )
}
