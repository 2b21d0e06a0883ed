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

  test("S11 wire flavor: upsertJdbc MERGE — insert arm, update arm, mixed batch, parallel partitions") {
    import graft.engine.{Sinks, UpsertDialect}
    val ddl = "id BIGINT NOT NULL, city VARCHAR(32), temp_c DOUBLE, humidity INT, PRIMARY KEY (id)"
    Sources.ensureJdbcTable(url, "weather_upsert", ddl)
    // insert arm: empty table → all 500 rows land (batched, 4 partitions)
    Sinks.upsertJdbc(weather.repartition(4), url, "weather_upsert",
      keys = Seq("id"), batchSize = 100, dialect = UpsertDialect.Merge)
    val afterInsert = Sources.warehouseRead(spark, url, "weather_upsert")
    assert(afterInsert.count() == 500)
    assert(afterInsert.exceptAll(weather).count() == 0)
    // update arm: same keys, changed measures → row count unchanged,
    // values replaced (the ON CONFLICT DO UPDATE semantics)
    val changed = weather.withColumn("temp_c", col("temp_c") + 100.0)
    Sinks.upsertJdbc(changed, url, "weather_upsert",
      keys = Seq("id"), batchSize = 64, dialect = UpsertDialect.Merge)
    val afterUpdate = Sources.warehouseRead(spark, url, "weather_upsert")
    assert(afterUpdate.count() == 500)
    assert(afterUpdate.exceptAll(changed).count() == 0 &&
      changed.exceptAll(afterUpdate).count() == 0)
    // mixed batch: 250 updates + 250 new keys → 750 rows, both arms right
    val mixed = weather.where(col("id") <= 250)
      .withColumn("humidity", col("humidity") + 1)
      .unionByName(weather.where(col("id") > 250)
        .withColumn("id", col("id") + 1000L))
    Sinks.upsertJdbc(mixed, url, "weather_upsert",
      keys = Seq("id"), dialect = UpsertDialect.Merge)
    val afterMixed = Sources.warehouseRead(spark, url, "weather_upsert")
    assert(afterMixed.count() == 750)
    assert(afterMixed.where(col("id") <= 250)
      .exceptAll(mixed.where(col("id") <= 250)).count() == 0)
    assert(afterMixed.where(col("id") > 1000)
      .exceptAll(mixed.where(col("id") > 1000)).count() == 0)
    // NULL measures upsert too (typed setNull — Derby rejects untyped)
    val withNull = weather.where(col("id") === 1)
      .withColumn("city", lit(null).cast("string"))
    Sinks.upsertJdbc(withNull, url, "weather_upsert",
      keys = Seq("id"), dialect = UpsertDialect.Merge)
    assert(Sources.warehouseRead(spark, url, "weather_upsert")
      .where(col("id") === 1 && col("city").isNull).count() == 1)
  }

  test("S11 wire flavor: ON CONFLICT statement shape and bind order (Postgres dialect)") {
    import graft.engine.UpsertDialect
    val cols = Seq("city", "time", "pm25", "aqi")
    val keys = Seq("city", "time")
    assert(UpsertDialect.OnConflict.statement("air_quality", cols, keys) ==
      "INSERT INTO air_quality (city, time, pm25, aqi) VALUES (?, ?, ?, ?) " +
        "ON CONFLICT (city, time) DO UPDATE SET pm25 = EXCLUDED.pm25, aqi = EXCLUDED.aqi")
    assert(UpsertDialect.OnConflict.bindOrder(cols, keys) == cols)
    assert(UpsertDialect.Merge.bindOrder(cols, keys) ==
      Seq("city", "time", "pm25", "aqi", "city", "time", "pm25", "aqi"))
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
