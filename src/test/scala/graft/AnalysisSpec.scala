package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{Analysis, Pipeline, Pipelines}

/** §2.7 report queries + P12 conditional derive + the full layered
  * pipeline run, exercised on the reference's committed raw files. */
class AnalysisSpec extends SparkSpec {

  private lazy val aq = Pipelines.aqStage(spark,
    "/root/reference/ETL_Multi_Lvl_API/data/raw/*_raw_*.json").cache()

  test("summaryMetrics: three KPIs, argmax matches direct max") {
    val m = Analysis.summaryMetrics(aq).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.keySet == Set("city_highest_avg_pm2_5", "city_highest_severity", "hour_with_worst_avg_pm2_5"))
    // the committed raws give every city identical averages — the direct
    // query must apply the same deterministic tie-break as the operator
    val direct = aq.groupBy("city").agg(avg("pm2_5").as("m"))
      .orderBy(desc("m"), asc("city")).limit(1).collect()(0).getString(0)
    assert(m("city_highest_avg_pm2_5") == direct)
  }

  test("cityRiskDistribution: totals add up and percentages sum to 100") {
    val rows = Analysis.cityRiskDistribution(aq).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (h, mo, lo) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(h + mo + lo == r.getLong(4))
      assert(math.abs(r.getDouble(5) + r.getDouble(6) + r.getDouble(7) - 100.0) < 1e-9)
    }
  }

  test("histogram: bin counts cover all non-null values, bins in range") {
    val h = Analysis.histogram(aq, col("pm2_5"), 40).collect()
    assert(h.map(_.getLong(1)).sum == aq.where(col("pm2_5").isNotNull).count())
    assert(h.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 39))
  }

  test("ensureDerived recomputes severity/risk/aqi only when missing or all-null") {
    val stripped = aq.drop("severity", "risk_class", "aqi_pm25")
    val derived = Analysis.ensureDerived(stripped)
    assert(derived.schema.fieldNames.count(Set("severity", "risk_class", "aqi_pm25")) == 3)
    // schema untouched when the columns already carry values
    val kept = Analysis.ensureDerived(aq)
    assert(kept.schema.fieldNames.toSeq == aq.schema.fieldNames.toSeq)
    // recomputed severity equals the pipeline-staged one row-for-row
    val mismatches = derived.select(col("city"), col("time"), col("severity").as("s1"))
      .join(aq.select(col("city"), col("time"), col("severity").as("s2")), Seq("city", "time"))
      .where(abs(col("s1") - col("s2")) > 1e-9)
      .count()
    assert(mismatches == 0)
  }

  test("topCitiesHourlyPm25 keeps at most k cities") {
    val t = Analysis.topCitiesHourlyPm25(aq, k = 3)
    assert(t.select("city").distinct().count() <= 3)
  }

  test("full layered pipelines run end-to-end into temp dirs") {
    val out = Files.createTempDirectory("pipe").toString
    Pipeline.runWeather(spark, "/root/reference/ETL_Weather_API/data/raw/weather_*.json", s"$out/w")
    Pipeline.runAq(spark, "/root/reference/ETL_Multi_Lvl_API/data/raw/*_raw_*.json", s"$out/aq")
    assert(spark.read.parquet(s"$out/w/staged/weather").count() == 96)
    assert(spark.read.parquet(s"$out/aq/staged/air_quality").count() == 545)
    val rep = spark.read.option("header", true).csv(s"$out/aq/processed/summary_metrics")
    assert(rep.count() == 3)
    // rerun is idempotent thanks to the upsert merge
    Pipeline.runAq(spark, "/root/reference/ETL_Multi_Lvl_API/data/raw/*_raw_*.json", s"$out/aq")
    assert(spark.read.parquet(s"$out/aq/staged/air_quality").count() == 545)
  }
}
