package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 S7-S11): layered staged/report writers and the
  * upsert-equivalent merge. Layer rules at scale: the staged layer is
  * partitioned parquet (never a single file); single-file CSV is
  * reserved for small report artifacts (the reference's processed CSVs,
  * a few rows each).
  */
object Sinks {

  /** Staged layer: partitioned parquet (S3/S7 upgraded for scale — the
    * reference's staged CSVs become columnar, partition-pruned files). */
  def stagedParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Report artifact: single header CSV (S7). Only for small outputs —
    * the coalesce(1) funnels everything through one task by design. */
  def reportCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", true).csv(path)

  /** Bucketed catalog table: pre-shuffles the data into `n` buckets on
    * the join/agg key at WRITE time, so every later co-bucketed join or
    * aggregation on that key runs with ZERO exchanges — the storage-side
    * answer to "this join shuffles 100 TB every night"
    * (BucketingSpec asserts the shuffle-free plan). */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** S11 — upsert semantics (INSERT .. ON CONFLICT (keys) DO UPDATE) as
    * a deterministic last-write-wins merge: union the incoming batch
    * with the existing table and keep, per key, the row with the highest
    * `orderCol` (ties broken toward the incoming batch). row_number over
    * an explicit order — NOT bare dropDuplicates, which is
    * nondeterministic under parallelism (SURVEY.md §7.4).
    * Reference: ETL_Multi_Lvl_API/load.py:117-163. */
  def upsertParquet(spark: SparkSession, batch: DataFrame, path: String,
                    keys: Seq[String], orderCol: Option[String] = None): Unit = {
    val existing =
      try spark.read.parquet(path).withColumn("_is_new", lit(0))
      catch { case _: Exception => null }
    val all =
      if (existing == null) batch.withColumn("_is_new", lit(1))
      else existing.unionByName(batch.withColumn("_is_new", lit(1)))
    // conflict winner: highest recency column if given, the incoming
    // batch on ties / by default (ON CONFLICT DO UPDATE semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCol.map(c => col(c).desc).toSeq :+ col("_is_new").desc: _*)
    val merged = all.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn", "_is_new")
    // parquet overwrite of the path being read requires a materialization
    // barrier; for the in-engine equivalent we stage through a temp view
    // collect-free by writing to a sibling then swapping
    val tmp = path + "_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
