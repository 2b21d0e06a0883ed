package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Restructure, Sources}

/** Unit coverage for the §2.2 restructuring operators' edge cases
  * (ragged arrays, null driver, variant keys, unknown params). */
class RestructureSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  private def df(rows: Seq[org.apache.spark.sql.Row], schema: StructType) =
    spark.createDataFrame(rows.asJava, schema)

  private val arrSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("t", ArrayType(StringType)),
    StructField("a", ArrayType(DoubleType)),
    StructField("b", ArrayType(DoubleType))))

  test("flattenParallelArrays: ragged metric arrays null-pad; driver sets row count") {
    val in = df(Seq(
      org.apache.spark.sql.Row(1, Seq("x", "y", "z"), Seq(1.0, 2.0), Seq(9.0, 8.0, 7.0, 6.0)),
      org.apache.spark.sql.Row(2, null, Seq(1.0), Seq(2.0)),
      org.apache.spark.sql.Row(3, Seq("only"), null, Seq(5.0))), arrSchema)
    val out = Restructure.flattenParallelArrays(in, Seq(col("id")),
      Seq("t" -> col("t"), "a" -> col("a"), "b" -> col("b")))
      .orderBy("id", "t").collect()
    // id=1: 3 rows (len(t)); a null-padded at i=3; b's 4th element dropped
    // id=2: 0 rows (null driver); id=3: 1 row with a=null
    assert(out.length == 4)
    assert(out.count(_.getInt(0) == 1) == 3)
    val z = out.find(r => r.getInt(0) == 1 && r.getString(1) == "z").get
    assert(z.isNullAt(2) && z.getDouble(3) == 7.0)
    val only = out.find(_.getInt(0) == 3).get
    assert(only.isNullAt(2) && only.getDouble(3) == 5.0)
  }

  test("firstPresent: picks first existing variant, null when none exist") {
    val in = df(Seq(org.apache.spark.sql.Row(1.5, 2.5)), StructType(Seq(
      StructField("pm2.5", DoubleType), StructField("pm10", DoubleType))))
    val out = in.select(
      Restructure.firstPresent(in, Seq("pm2_5", "pm2.5", "pm25")).as("pm2_5"),
      Restructure.firstPresent(in, Seq("ozone", "o3")).as("ozone"))
      .collect()(0)
    assert(out.getDouble(0) == 1.5)
    assert(out.isNullAt(1))
  }

  test("mapParam: variants normalize, unknown -> null, case/space-insensitive") {
    val in = spark.range(1).select(
      Restructure.mapParam(lit(" PM2.5 ")).as("a"),
      Restructure.mapParam(lit("co")).as("b"),
      Restructure.mapParam(lit("banana")).as("c"),
      Restructure.mapParam(lit(null).cast("string")).as("d"))
      .collect()(0)
    assert(in.getString(0) == "pm2_5" && in.getString(1) == "carbon_monoxide")
    assert(in.isNullAt(2) && in.isNullAt(3))
  }

  test("latestFile picks lexicographically-last match; None when no match") {
    val dir = java.nio.file.Files.createTempDirectory("latest")
    Seq("a_raw_1.json", "a_raw_3.json", "a_raw_2.json").foreach(n =>
      java.nio.file.Files.writeString(dir.resolve(n), "{}"))
    val got = Sources.latestFile(spark, s"$dir/a_raw_*.json")
    assert(got.exists(_.endsWith("a_raw_3.json")))
    assert(Sources.latestFile(spark, s"$dir/nope_*.json").isEmpty)
  }

  test("retry: backs off and rethrows after max attempts") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val got = Sources.retry(3, sleeps.append(_)) { calls += 1; if (calls < 3) sys.error("boom"); 42 }
    assert(got == 42 && calls == 3 && sleeps.toSeq == Seq(1000L, 2000L))
    intercept[RuntimeException] {
      Sources.retry(2, _ => ())(sys.error("always"))
    }
  }
}
