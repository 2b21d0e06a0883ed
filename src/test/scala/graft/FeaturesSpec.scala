package graft

import org.apache.spark.sql.functions._
import graft.engine.Features

/** Edge cases traced from the reference's row-wise Python functions
  * (SURVEY.md §5 "critical edge cases"). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def aqiOf(vs: Seq[Option[Double]]): Seq[String] =
    vs.toDF("v").select(Features.aqiCategory($"v")).as[String].collect().toSeq

  test("aqiCategory matches reference thresholds incl. gap intervals") {
    // transform.py:42-59 — gaps (50,51), (100,101), (200,201), (300,300]...
    val cases = Seq(
      Some(0.0) -> "Good", Some(50.0) -> "Good",
      Some(50.5) -> "Unknown", // falls through every branch
      Some(51.0) -> "Moderate", Some(100.0) -> "Moderate",
      Some(100.5) -> "Unknown",
      Some(101.0) -> "Unhealthy", Some(200.0) -> "Unhealthy",
      Some(200.5) -> "Unknown",
      Some(201.0) -> "Very Unhealthy", Some(300.0) -> "Very Unhealthy",
      Some(300.5) -> "Hazardous", Some(1e6) -> "Hazardous",
      Some(-5.0) -> "Good", // v <= 50 catches negatives, like the reference
      None -> "Unknown")
    assert(aqiOf(cases.map(_._1)) == cases.map(_._2))
  }

  test("severity treats nulls as zero, weighted sum order preserved") {
    // transform.py:62-73
    val df = Seq(
      (Some(10.0), Some(2.0), Some(1.0), Some(1.0), Some(5.0), Some(3.0)),
      (None, None, None, None, None, None),
      (Some(1.0), None, None, None, None, None)
    ).toDF("pm25", "pm10", "no2", "so2", "co", "o3")
    val got = df.select(Features.severity($"pm25", $"pm10", $"no2", $"so2", $"co", $"o3"))
      .as[Double].collect().toSeq
    assert(got == Seq(10 * 5.0 + 2 * 3.0 + 1 * 4.0 + 1 * 4.0 + 5 * 2.0 + 3 * 3.0, 0.0, 5.0))
  }

  test("riskClass thresholds are strict >") {
    // transform.py:75-80 — 400 and 200 exactly are NOT High/Moderate
    val got = Seq(401.0, 400.0, 201.0, 200.0, 0.0).toDF("s")
      .select(Features.riskClass($"s")).as[String].collect().toSeq
    assert(got == Seq("High Risk", "Moderate Risk", "Moderate Risk", "Low Risk", "Low Risk"))
  }

  test("tempCategory is right-closed pd.cut with out-of-range -> null") {
    // ETL_Weather_API/transform.py:75 — bins (-100,0],(0,10],(10,20],(20,30],(30,100]
    val got = Seq[Option[Double]](
      Some(-100.5), Some(-100.0), Some(0.0), Some(0.1), Some(10.0), Some(10.5),
      Some(20.0), Some(25.0), Some(30.0), Some(30.1), Some(100.0), Some(100.1), None)
      .toDF("t").select(Features.tempCategory($"t")).collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(None, None, Some("very_cold"), Some("cold"), Some("cold"),
      Some("mild"), Some("mild"), Some("warm"), Some("warm"), Some("hot"),
      Some("hot"), None, None))
  }

  test("feelsLike arithmetic") {
    val got = Seq((20.0, 50.0)).toDF("t", "h")
      .select(Features.feelsLike($"t", $"h")).as[Double].head()
    assert(got == 20.0 - (50.0 / 100.0) * 2.0)
  }
}
