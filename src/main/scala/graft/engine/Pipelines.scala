package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two transform stages re-expressed as single Catalyst
  * plans over landed raw JSON (SURVEY.md §3): scan -> flatten ->
  * normalize -> filter -> derive -> (caller writes staged layer).
  *
  * Both run against the reference's own committed raw files in the
  * golden tests (GoldenPipelineSpec), which diff the output against the
  * reference's committed staged CSVs — the de-facto correctness corpus
  * (SURVEY.md §5).
  */
object Pipelines {

  /** Read landed JSON with an explicit schema; a glob matching nothing
    * becomes a schema-stable empty DataFrame (the reference's
    * empty-input path writes a header-only CSV, S8 — schema stability is
    * the engine-side equivalent). */
  private def readJson(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
                       glob: String): DataFrame =
    try spark.read.schema(schema).option("multiLine", true).json(glob)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Weather: raw Open-Meteo JSON glob -> weather_staged rows
    * (ETL_Weather_API/transform.py:42-85). One row per hourly index;
    * naive timestamps kept as-is under the UTC session. */
  def weatherStage(spark: SparkSession, rawGlob: String): DataFrame = {
    val raw = readJson(spark, Schemas.weatherRaw, rawGlob)
    val flat = Restructure.flattenParallelArrays(raw, keep = Seq(),
      arrays = Seq(
        "time" -> col("hourly.time"),
        "temperature_c" -> col("hourly.temperature_2m"),
        "relative_humidity" -> col("hourly.relativehumidity_2m"),
        "wind_speed_kmh" -> col("hourly.windspeed_10m")))
    flat
      .withColumn("time", to_timestamp(col("time")))
      .withColumn("date", to_date(col("time")))
      .withColumn("hour", hour(col("time")))
      .withColumn("temp_category", Features.tempCategory(col("temperature_c")))
      .withColumn("feels_like_c", Features.feelsLike(col("temperature_c"), col("relative_humidity")))
      .na.drop("all", Seq("temperature_c", "relative_humidity", "wind_speed_kmh"))
      .select(Schemas.weatherStaged.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Filename city hint: first `_`-separated token of the file STEM, the
    * reference's `f.stem` + `filename_hint.split("_")[0]`
    * (ETL_Multi_Lvl_API/transform.py:224,106) — `new_york_raw_*.json`
    * yields "new", and `paris.json` yields "paris" (not "paris.json":
    * the extension is stripped first, like Path.stem — the lookbehind
    * keeps a leading-dot name from collapsing to empty). nullif keeps a
    * failed extract null (so coalesce can't accept regexp_extract's
    * empty-string no-match). */
  private def fileCityHint: org.apache.spark.sql.Column =
    nullif(regexp_extract(
      regexp_replace(regexp_extract(input_file_name(), "([^/]+)$", 1),
        "(?<=.)\\.[^.]*$", ""),
      "^([^_]+)", 1), lit(""))

  /** Air quality, hourly-array shape: raw glob -> air_quality staged rows
    * (ETL_Multi_Lvl_API/transform.py:89-130 + run_transform 242-271).
    * City falls back to the filename stem when the payload lacks it
    * (S5); duplicate (city,time) rows collapse by mean (A4) BEFORE the
    * derived features, preserving the reference's cost-ordering choice. */
  def aqStage(spark: SparkSession, rawGlob: String): DataFrame = {
    val raw = readJson(spark, Schemas.aqHourlyRaw, rawGlob)
      .withColumn("city", coalesce(col("city"), col("name"), fileCityHint))
    val hourly = raw.selectExpr("city", "hourly.*")
    val arrays = ("time" -> Restructure.firstPresent(hourly, Seq("time", "times"))) +:
      Schemas.pollutants.map(c => c ->
        Restructure.firstPresent(hourly, Seq(c, c.replace("_", "."), c.replace("_", ""))))
    val flat = Restructure.flattenParallelArrays(hourly, keep = Seq(col("city")), arrays = arrays)
    finishAq(flat
      .withColumn("time", to_timestamp(col("time")))
      .select(col("city") +: col("time") +: Schemas.pollutants.map(c => col(c).cast("double")): _*))
  }

  /** Air quality, OpenAQ measurement-list shape: results[] ->
    * parameters[]/measurements[]/latest[] long rows -> normalize ->
    * pivot wide -> same staged tail
    * (ETL_Multi_Lvl_API/transform.py:132-209). */
  def aqStageMeasurements(spark: SparkSession, rawGlob: String): DataFrame = {
    val raw = readJson(spark, Schemas.aqMeasurementRaw, rawGlob)
      .withColumn("file_city", fileCityHint)
    val loc = raw.select(col("file_city"), explode(col("results")).as("r"))
      .withColumn("city", coalesce(col("r.city"), col("r.name"), col("r.location"), col("file_city")))
      .withColumn("m", explode(coalesce(col("r.parameters"), col("r.measurements"), col("r.latest"))))
    val long = loc.select(
      col("city"),
      to_timestamp(coalesce(col("m.lastUpdated.utc"), col("m.lastUpdated.local"),
        col("m.date"), col("m.time"))).as("time"),
      Restructure.mapParam(coalesce(col("m.parameter"), col("m.param"), col("m.name"))).as("param_col"),
      coalesce(col("m.lastValue"), col("m.value"), col("m.avg")).cast("double").as("value"))
      .where(col("param_col").isNotNull)
    finishAq(Restructure.pivotParams(long))
  }

  /** Shared staged tail: any-pollutant filter, (city,time) mean-dedup,
    * derived hour/aqi/severity/risk, canonical column order
    * (ETL_Multi_Lvl_API/transform.py:250-271). */
  private def finishAq(flat: DataFrame): DataFrame = {
    val p = Schemas.pollutants
    flat
      .where(p.map(col(_).isNotNull).reduce(_ || _))
      .groupBy(col("city"), col("time"))
      .agg(p.map(c => avg(col(c)).as(c)).head, p.map(c => avg(col(c)).as(c)).tail: _*)
      .withColumn("hour", hour(col("time")))
      .withColumn("aqi_pm25", Features.aqiCategory(col("pm2_5")))
      .withColumn("severity", Features.severity(col("pm2_5"), col("pm10"),
        col("nitrogen_dioxide"), col("sulphur_dioxide"), col("carbon_monoxide"), col("ozone")))
      .withColumn("risk_class", Features.riskClass(col("severity")))
      .select(Schemas.aqStaged.fieldNames.map(col).toIndexedSeq: _*)
  }
}
