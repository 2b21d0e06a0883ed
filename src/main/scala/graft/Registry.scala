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

  /** Run `body` with `spark.sql.shuffle.partitions` set to `n`,
    * restoring the session value after — the batch analogue of the
    * streaming gates' withStatePartitions (guide §2.2: size reduce
    * partitions from the DATA, not the core count). For driver-loop
    * operators whose per-sweep exchanges carry state-scale rows (q103's
    * rank frame, q107's centroid sums): with AQE scoped off there
    * (every stage materialization is a barrier on trivial data), the
    * session's core-count default would run every one of those
    * exchanges at full width — 32 near-empty tasks per sweep × tens of
    * sweeps of pure scheduling overhead locally, and the same
    * mis-sizing inverted on a cluster. Callers derive `n` from the
    * state size they already know (rows / ~2M per partition), so the
    * setting scales with the data. */
  def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    require(n >= 1, s"shuffle partitions must be >= 1, got $n")
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.getOption(key)
    s.conf.set(key, n.toString)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
