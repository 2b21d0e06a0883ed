package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.engine.Sources

/** S10/S12/S13 against embedded Derby (the JDBC engine shipped in
  * /opt/spark/jars): idempotent DDL, batched INSERT, SELECT-back with
  * predicate pushdown, and the partitioned parallel read — the full
  * warehouse round-trip the reference runs against Postgres
  * (ETL_Weather_API/load.py, etl_analysis.py:116-135). */
class JdbcSpec extends SparkSpec {

  // keep derby.log and the db files out of the repo working dir
  System.setProperty("derby.system.home", "/tmp/graft-derby")
  private val url = s"jdbc:derby:/tmp/graft-derby/db${System.nanoTime()};create=true"

  private def weather = {
    import spark.implicits._
    (1 to 500).map(i => (i.toLong, s"city${i % 7}", 10.0 + i % 30, i % 100))
      .toDF("id", "city", "temp_c", "humidity")
  }

  test("S13: ensureJdbcTable is idempotent; S10: batched insert; S12: select-back") {
    val ddl = "id BIGINT, city VARCHAR(32), temp_c DOUBLE, humidity INT"
    Sources.ensureJdbcTable(url, "weather_obs", ddl)
    Sources.ensureJdbcTable(url, "weather_obs", ddl) // re-run must be a no-op
    Sources.warehouseWrite(weather, url, "weather_obs", batchSize = 100)
    val back = Sources.warehouseRead(spark, url, "weather_obs")
    assert(back.count() == 500)
    // values survive the round-trip exactly (ints, doubles, strings)
    assert(back.exceptAll(weather).count() == 0 && weather.exceptAll(back).count() == 0)
    // append again: batch inserts accumulate, they don't replace
    Sources.warehouseWrite(weather.limit(10), url, "weather_obs", batchSize = 3)
    assert(Sources.warehouseRead(spark, url, "weather_obs").count() == 510)
  }

  test("S12: WHERE predicates push into the JDBC scan; dual-source switch reads the warehouse") {
    val ddl = "id BIGINT, city VARCHAR(32), temp_c DOUBLE, humidity INT"
    Sources.ensureJdbcTable(url, "weather_push", ddl)
    Sources.warehouseWrite(weather, url, "weather_push", batchSize = 200)
    val q = Sources.analysisInput(spark, useStaged = false, stagedPath = "",
      jdbcUrl = url, dbtable = "weather_push")
      .where(col("humidity") > 90)
    // the filter must reach the database as generated SQL, not run in Spark
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(HUMIDITY,90)"),
      s"humidity filter must push into the JDBC scan:\n$plan")
    assert(q.count() == weather.where(col("humidity") > 90).count())
  }

  test("S12: partitioned read parallelizes into one task per stride with identical rows") {
    val ddl = "id BIGINT, city VARCHAR(32), temp_c DOUBLE, humidity INT"
    Sources.ensureJdbcTable(url, "weather_part", ddl)
    Sources.warehouseWrite(weather, url, "weather_part", batchSize = 200)
    val par = Sources.warehouseRead(spark, url, "weather_part",
      partitioning = Some(("id", 1L, 501L, 4)))
    assert(par.rdd.getNumPartitions == 4, "expect one JDBC partition per stride")
    assert(par.count() == 500)
    assert(par.exceptAll(weather).count() == 0)
  }

  test("S13 catalog flavor: CREATE TABLE IF NOT EXISTS over a parquet location, idempotent") {
    val loc = s"/tmp/graft-ddl-${System.nanoTime()}"
    weather.write.mode(SaveMode.Overwrite).parquet(loc)
    val ddl = "id BIGINT, city STRING, temp_c DOUBLE, humidity INT"
    Sources.ensureCatalogTable(spark, "graft_ddl_tbl", ddl, loc)
    Sources.ensureCatalogTable(spark, "graft_ddl_tbl", ddl, loc) // no-op
    assert(spark.table("graft_ddl_tbl").count() == 500)
    spark.sql("DROP TABLE graft_ddl_tbl")
  }
}
