package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus its DuckDB oracle SQL (None when the operator
  * is not ANSI-SQL-expressible — the driver then records a weaker
  * rows-only check, see the contract in SparkEntry). */
final case class Q(run: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(run: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(run, Some(sql))

  /** Run `body` with adaptive execution disabled, restoring the session
    * default after — the driver-loop entries' shared toggle (q103,
    * q107): when per-iteration state is node-/pack-scale, every AQE
    * stage materialization is a pure driver barrier on trivial data.
    * Scoped to ENTRIES, never operators: production-scale state wants
    * AQE's runtime re-planning. */
  def withAqeOff[A](s: SparkSession)(body: => A): A = {
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
