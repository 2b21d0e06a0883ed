package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * reader is the standard JDBC source (S12); this container has no
    * database, so the JDBC branch is exercised only through its options
    * plumbing. */
  def analysisInput(spark: SparkSession, useStaged: Boolean,
                    stagedPath: String, jdbcUrl: String = "",
                    dbtable: String = ""): DataFrame =
    if (useStaged) spark.read.parquet(stagedPath)
    else spark.read.format("jdbc")
      .option("url", jdbcUrl).option("dbtable", dbtable).load()

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
