package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus its DuckDB oracle SQL (None when the operator
  * is not ANSI-SQL-expressible — the driver then records a weaker
  * rows-only check, see the contract in SparkEntry). */
final case class Q(run: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(run: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(run, Some(sql))
}
