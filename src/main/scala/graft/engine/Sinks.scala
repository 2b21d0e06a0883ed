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
    // FileSystem of the TARGET path's scheme, not the default FS — an
    // s3a:// or hdfs:// target must not resolve against file://
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(path + "_old")
    // crash recovery: a previous run that died between its two swap
    // renames leaves the table at _old and nothing at dst — restore it
    // BEFORE reading, or the merge below would see an absent table and
    // the _old cleanup would erase the only surviving copy
    if (!fs.exists(dst) && fs.exists(orphan) && !fs.rename(orphan, dst))
      throw new java.io.IOException(s"upsertParquet: cannot restore $orphan to $dst")
    // "table absent" is ONLY fs.exists == false. A transient read
    // failure (corrupt footer, FS hiccup) must propagate — treating it
    // as absent would silently replace the table with the batch alone.
    val existing =
      if (fs.exists(dst)) Some(spark.read.parquet(path).withColumn("_is_new", lit(0)))
      else None
    val all = existing match {
      case Some(e) => e.unionByName(batch.withColumn("_is_new", lit(1)))
      case None    => batch.withColumn("_is_new", lit(1))
    }
    // conflict winner: highest recency column if given, the incoming
    // batch on ties / by default (ON CONFLICT DO UPDATE semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCol.map(c => col(c).desc).toSeq :+ col("_is_new").desc: _*)
    val merged = all.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn", "_is_new")
    // parquet overwrite of the path being read requires a materialization
    // barrier: write to a sibling, then swap. The swap renames the old
    // dir ASIDE (not delete-then-rename) so a crash mid-swap leaves a
    // recoverable copy; old is deleted only after the new rename lands.
    val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(orphan, true) // leftover _old with dst present = stale copy
    val hadExisting = fs.exists(dst)
    if (hadExisting && !fs.rename(dst, orphan))
      throw new java.io.IOException(s"upsertParquet: cannot move $dst aside to $orphan")
    if (!fs.rename(tmp, dst)) {
      // restore the previous table before failing
      if (hadExisting) fs.rename(orphan, dst)
      throw new java.io.IOException(s"upsertParquet: cannot move $tmp into place at $dst")
    }
    fs.delete(orphan, true)
  }
}
