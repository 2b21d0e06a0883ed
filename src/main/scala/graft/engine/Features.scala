package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-feature expressions re-expressing the reference's row-wise
  * Python functions as pure Column expressions — no UDFs, so whole-stage
  * codegen and Catalyst constant folding stay intact (the reference applies
  * these via `.apply(axis=1)`, row-at-a-time in the Python interpreter).
  *
  * Semantics traced to /root/reference (file:line in each scaladoc),
  * including the deliberate edge cases the oracle checks.
  */
object Features {

  /** AQI category from a pm2.5-like value.
    * Reference: ETL_Multi_Lvl_API/transform.py:42-59 (duplicated at
    * etl_analysis.py:85-102). The reference's integer-oriented thresholds
    * leave real gaps — e.g. 50 < v < 51 falls through every branch and
    * returns "Unknown" — replicated exactly here. Null -> "Unknown". */
  def aqiCategory(v: Column): Column =
    when(v.isNull, "Unknown")
      .when(v <= 50, "Good")
      .when(v >= 51 && v <= 100, "Moderate")
      .when(v >= 101 && v <= 200, "Unhealthy")
      .when(v >= 201 && v <= 300, "Very Unhealthy")
      .when(v > 300, "Hazardous")
      .otherwise("Unknown")

  /** Weighted severity score; null contributions count as 0 (the
    * reference's `safe()` coercion). Term order preserved so double
    * arithmetic is bit-identical with the oracle SQL.
    * Reference: ETL_Multi_Lvl_API/transform.py:62-73. */
  def severity(pm25: Column, pm10: Column, no2: Column, so2: Column,
               co: Column, o3: Column): Column =
    coalesce(pm25, lit(0.0)) * 5.0 + coalesce(pm10, lit(0.0)) * 3.0 +
      coalesce(no2, lit(0.0)) * 4.0 + coalesce(so2, lit(0.0)) * 4.0 +
      coalesce(co, lit(0.0)) * 2.0 + coalesce(o3, lit(0.0)) * 3.0

  /** Risk class from severity: >400 High, >200 Moderate, else Low.
    * Reference: ETL_Multi_Lvl_API/transform.py:75-80. */
  def riskClass(sev: Column): Column =
    when(sev > 400, "High Risk")
      .when(sev > 200, "Moderate Risk")
      .otherwise("Low Risk")

  /** pd.cut(t, bins=[-100,0,10,20,30,100], labels=[very_cold,cold,mild,
    * warm,hot]) — right-closed intervals, out-of-range and null -> null.
    * Reference: ETL_Weather_API/transform.py:75. */
  def tempCategory(t: Column): Column =
    when(t.isNull || t <= -100 || t > 100, lit(null).cast("string"))
      .when(t <= 0, "very_cold")
      .when(t <= 10, "cold")
      .when(t <= 20, "mild")
      .when(t <= 30, "warm")
      .otherwise("hot")

  /** feels_like proxy: temp adjusted by humidity.
    * Reference: ETL_Weather_API/transform.py:77. */
  def feelsLike(tempC: Column, relHumidity: Column): Column =
    tempC - (relHumidity / 100.0) * 2.0
}
