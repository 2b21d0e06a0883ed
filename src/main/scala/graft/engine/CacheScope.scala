package graft.engine

import org.apache.spark.sql.DataFrame

/** Deterministic release for caches a library function creates.
  *
  * Several library-surface functions ([[graft.queries.TextQueries.curatedDocs]],
  * [[graft.queries.TextQueries.ngramJaccardPairs]]) `.persist()` an
  * intermediate that multiple plan branches consume (exchange-reuse
  * cannot unify lambda-bearing subtrees, so without the cache the
  * expensive derivation runs once per branch). The DataFrame they
  * return is lazy, so the function itself can never unpersist — a
  * long-lived session calling them repeatedly would accumulate cached
  * blocks and slowly squeeze executor storage memory.
  *
  * A CacheScope makes the caller the owner of those blocks:
  *
  * {{{
  * val scope = new CacheScope
  * try {
  *   val kept = TextQueries.curatedDocs(spark, dir, scope)
  *   kept.write.parquet(out)        // actions run with the caches live
  * } finally scope.close()          // every tracked block released
  * }}}
  *
  * The default argument [[CacheScope.untracked]] preserves the
  * convenience behavior (persist and leave it to the caller's
  * `spark.catalog.clearCache()` — what Bench/Verify do between
  * queries). */
final class CacheScope private[engine] (track: Boolean) extends AutoCloseable {
  def this() = this(true)

  private val tracked = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private val stagedDirs = scala.collection.mutable.ListBuffer.empty[String]
  private val checkpointed = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]

  /** Persist `df` and, in a tracking scope, remember it for release. */
  def persist(df: DataFrame): DataFrame = {
    if (track) synchronized { tracked += df }
    df.persist()
  }

  /** [[persist]] at an explicit storage level — for tables a caller
    * KNOWS outgrow the storage fraction at its scale tier (e.g. the
    * positional-gram table of CurationQueries.dedupRepeatedSpans at
    * >=1000x corpora), where a DISK_ONLY/SER level trades re-read cost
    * for freeing execution memory that would otherwise thrash between
    * cached blocks and shuffle spill. */
  def persist(df: DataFrame, level: org.apache.spark.storage.StorageLevel): DataFrame = {
    if (track) synchronized { tracked += df }
    df.persist(level)
  }

  /** Locally checkpoint `df` (eager) — lineage truncates to the
    * materialized RDD, the in-memory analogue of a staged-layer parquet
    * boundary (see TextQueries.stageFrames) — and, in a tracking scope,
    * remember the checkpoint's persisted RDD for release. The RDD is
    * recovered DETERMINISTICALLY from the returned frame's plan (the
    * checkpointed Dataset is a `LogicalRDD` wrapping exactly the
    * persisted RDD), not by diffing the context's persistent-RDD
    * registry — a diff would sweep in any RDD another thread persisted
    * concurrently on the shared SparkContext and release a cache this
    * scope doesn't own. Two caveats for callers:
    *
    *  - `spark.catalog.clearCache()` does NOT release RDD-level
    *    checkpoint persists — checkpointing through an untracked scope
    *    leaks storage until the context dies; pass a tracking scope.
    *  - unlike [[persist]], the returned frame's lineage is TRUNCATED:
    *    after `close()` unpersists the blocks, an action on it fails
    *    hard ("cannot be recomputed") instead of silently recomputing.
    *    Use-after-close is a bug either way; here it is a loud one. */
  def localCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    if (track) {
      val rdd = cp.queryExecution.logical.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      synchronized { checkpointed ++= rdd }
    }
    cp
  }

  /** Remember a staged-layer directory (a stage boundary materialized
    * to parquet — see TextQueries.stageFrames) for deletion on close.
    * Untracked scopes leave the files in place: the callers that use
    * them (Bench/Verify) write to fixed paths that later runs
    * overwrite, so disk use stays bounded. */
  def trackStagedDir(path: String): Unit =
    if (track) synchronized { stagedDirs += path }

  /** Unpersist every tracked DataFrame (non-blocking), delete every
    * tracked staged directory, and forget both. Idempotent; the scope
    * can be reused afterwards. */
  override def close(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
    checkpointed.foreach(_.unpersist(blocking = false))
    checkpointed.clear()
    stagedDirs.foreach { p =>
      try {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(p))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    stagedDirs.clear()
  }
}

object CacheScope {
  /** Persists without tracking — the caller owns cleanup (clearCache). */
  val untracked: CacheScope = new CacheScope(false)
}
