package graft.engine

import org.apache.spark.sql.types._

/** Explicit StructTypes for the raw/staged layers (SURVEY.md §1.3).
  *
  * The reference infers shapes at runtime and probes key variants
  * defensively; here every source gets a declared schema — JSON keys
  * absent from a file surface as null columns (exactly the reference's
  * "missing metric -> null column" behavior), and variant keys are
  * declared side-by-side so normalization is a deterministic coalesce,
  * not runtime probing (SURVEY.md §1.2 "dynamic probing becomes
  * deterministic schema mapping").
  */
object Schemas {

  private def arr(t: DataType) = ArrayType(t, containsNull = true)

  /** Open-Meteo weather forecast raw payload
    * (ETL_Weather_API/extract.py:23-35; parsed at transform.py:15-40). */
  val weatherRaw: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timezone", StringType),
    StructField("utc_offset_seconds", LongType),
    StructField("hourly", StructType(Seq(
      StructField("time", arr(StringType)),
      StructField("temperature_2m", arr(DoubleType)),
      StructField("relativehumidity_2m", arr(DoubleType)),
      StructField("windspeed_10m", arr(DoubleType)))))))

  /** Pollutant columns in canonical order
    * (ETL_Multi_Lvl_API/transform.py:30-38 POLLUTANT_COLS). */
  val pollutants: Seq[String] = Seq("pm10", "pm2_5", "carbon_monoxide",
    "nitrogen_dioxide", "sulphur_dioxide", "ozone", "uv_index")

  /** Air-quality hourly-array raw payload (Open-Meteo AQ shape,
    * ETL_Multi_Lvl_API/transform.py:89-130). Variant keys (`pm2.5`,
    * `pm25`) are declared alongside the canonical name; files carry at
    * most one and the others read as null. */
  val aqHourlyRaw: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("name", StringType),
    StructField("hourly", StructType(
      StructField("time", arr(StringType)) +:
        StructField("times", arr(StringType)) +:
        pollutants.flatMap(c => Seq(
          StructField(c, arr(DoubleType)),
          StructField(c.replace("_", "."), arr(DoubleType)),
          StructField(c.replace("_", ""), arr(DoubleType))))
          .distinctBy(_.name)))))

  /** One measurement entry in the OpenAQ-style measurement-list payload
    * (ETL_Multi_Lvl_API/transform.py:132-162): all observed field
    * variants declared, absent ones null. */
  private val measurement = StructType(Seq(
    StructField("parameter", StringType),
    StructField("param", StringType),
    StructField("name", StringType),
    StructField("lastValue", DoubleType),
    StructField("value", DoubleType),
    StructField("avg", DoubleType),
    StructField("lastUpdated", StructType(Seq(
      StructField("utc", StringType),
      StructField("local", StringType)))),
    StructField("date", StringType),
    StructField("time", StringType)))

  /** OpenAQ-style measurement-list raw payload. */
  val aqMeasurementRaw: StructType = StructType(Seq(
    StructField("results", arr(StructType(Seq(
      StructField("city", StringType),
      StructField("name", StringType),
      StructField("location", StringType),
      StructField("parameters", arr(measurement)),
      StructField("measurements", arr(measurement)),
      StructField("latest", arr(measurement))))))))

  /** weather_staged canonical schema (SURVEY.md §1.3). */
  val weatherStaged: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("temperature_c", DoubleType),
    StructField("relative_humidity", DoubleType),
    StructField("wind_speed_kmh", DoubleType),
    StructField("date", DateType),
    StructField("hour", IntegerType),
    StructField("temp_category", StringType),
    StructField("feels_like_c", DoubleType)))

  /** air_quality staged canonical schema (SURVEY.md §1.3). */
  val aqStaged: StructType = StructType(
    StructField("city", StringType) +:
      StructField("time", TimestampType) +:
      StructField("hour", IntegerType) +:
      pollutants.map(c => StructField(c, DoubleType)) :+
      StructField("aqi_pm25", StringType) :+
      StructField("severity", DoubleType) :+
      StructField("risk_class", StringType))
}
