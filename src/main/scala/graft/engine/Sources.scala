package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source-side utilities (SURVEY.md §2.1): latest-artifact selection,
  * config-driven source switching, and the ingestion retry loop. The
  * HTTP extract itself is outside the engine boundary (landed JSON is
  * the contract, S1/S3); Spark tasks already retry internally, so the
  * retry helper exists for driver-side ingestion code (S2).
  */
object Sources {

  /** S6 — latest-file selection: lexicographically-last path matching
    * the glob (the reference's timestamped-name convention makes name
    * order == time order: ETL_Weather_API/transform.py:89-92,
    * ETL_Multi_Lvl_API/load.py:40-44). Driver-side listing, like the
    * reference. */
  def latestFile(spark: SparkSession, glob: String): Option[String] = {
    val p = new Path(glob)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).getOrElse(Array.empty)
    matches.map(_.getPath.toString).sorted.lastOption
  }

  /** S14 — dual-source switch: route the analysis input to the staged
    * layer or the warehouse by configuration
    * (ETL_Multi_Lvl_API/etl_analysis.py:41,138-142). The warehouse
    * reader is the standard JDBC source (S12), exercised against
    * embedded Derby in JdbcSpec. */
  def analysisInput(spark: SparkSession, useStaged: Boolean,
                    stagedPath: String, jdbcUrl: String = "",
                    dbtable: String = ""): DataFrame =
    if (useStaged) spark.read.parquet(stagedPath)
    else warehouseRead(spark, jdbcUrl, dbtable)

  /** S12 — warehouse SELECT source. `partitioning` turns the scan into
    * a PARALLEL read (one task per stride of the numeric column) — the
    * only JDBC shape that survives a large table; a single-connection
    * scan is the classic warehouse-ingest bottleneck. Spark pushes
    * WHERE predicates into the generated SQL (JdbcSpec asserts
    * PushedFilters reaches the scan). */
  def warehouseRead(spark: SparkSession, url: String, dbtable: String,
                    partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
    partitioning match {
      case Some((column, lower, upper, n)) =>
        r.option("partitionColumn", column)
          .option("lowerBound", lower).option("upperBound", upper)
          .option("numPartitions", n).load()
      case None => r.load()
    }
  }

  /** S10 — batched warehouse INSERT: one round-trip per `batchSize`
    * rows per task (the JDBC `batchsize` option == psycopg2's
    * execute_batch page_size, ETL_Weather_API/load.py:67-103). Append
    * into a pre-created table so the warehouse keeps its own types
    * (Derby/Postgres VARCHAR widths, not the dialect's CLOB default). */
  def warehouseWrite(df: DataFrame, url: String, dbtable: String,
                     batchSize: Int = 1000,
                     mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("batchsize", batchSize)
      .mode(mode).save()

  /** S13 (warehouse flavor) — idempotent CREATE TABLE
    * (ETL_Weather_API/load.py:24-52). Databases without IF NOT EXISTS
    * (Derby) get metadata-probe idempotence; a lost race to another
    * writer is also treated as "exists". */
  def ensureJdbcTable(url: String, table: String, columnsDdl: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(
        null, null, table.toUpperCase(java.util.Locale.ROOT), null)
      val exists = try rs.next() finally rs.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE TABLE $table ($columnsDdl)")
        catch { case e: java.sql.SQLException =>
          val again = conn.getMetaData.getTables(
            null, null, table.toUpperCase(java.util.Locale.ROOT), null)
          try { if (!again.next()) throw e } finally again.close()
        } finally st.close()
      }
    } finally conn.close()
  }

  /** S13 (catalog flavor) — idempotent CREATE TABLE in the Spark
    * catalog over an explicit parquet location. */
  def ensureCatalogTable(spark: SparkSession, name: String,
                         columnsDdl: String, location: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name ($columnsDdl) " +
      s"USING parquet LOCATION '$location'")

  /** S2 — bounded retry with exponential backoff (2^(n-1) seconds, like
    * ETL_Multi_Lvl_API/extract.py:76-106), for driver-side ingestion
    * calls. Sleeps are injectable so tests don't wait. */
  def retry[A](attempts: Int, sleep: Long => Unit = ms => Thread.sleep(ms))
              (body: => A): A = {
    var n = 0
    var last: Throwable = null
    while (n < attempts) {
      try return body
      catch {
        case e: Throwable =>
          last = e; n += 1
          if (n < attempts) sleep(1000L << (n - 1))
      }
    }
    throw last
  }
}
