package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over the driver's test tables; `oracleSql` carries the DuckDB
  * mirror for the t2 hash-compare. Column names and value semantics are
  * kept bit-identical between the two sides (see graft.engine.Parity).
  */
object SparkEntry {

  private val registry: Map[String, Q] =
    CoreQueries.defs ++ ExtQueries.defs ++ RelQueries.defs ++
      TextQueries.defs ++ EmbeddingQueries.defs ++ MultimodalQueries.defs ++
      CurationQueries.defs ++ StreamQueries.defs

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q01_worst_hour").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.run }

  /** DuckDB-runnable ANSI SQL per query (omitted for non-SQL-expressible
    * operators, which fall back to the driver's rows-only check). */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
