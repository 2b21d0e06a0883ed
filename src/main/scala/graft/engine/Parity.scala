package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine numeric parity helpers.
  *
  * A `sum` over doubles is order-dependent: Spark's partial aggregation
  * across shuffle partitions and DuckDB's morsel-parallel aggregation add
  * the same doubles in different orders, so the last few ulps differ and a
  * bit-exact hash compare fails. Summing exact decimals removes the order
  * dependence: each input double casts to the same DECIMAL(27,6) in both
  * engines (a binary double is never exactly on a decimal rounding tie at
  * scale >= 1, so round-to-nearest agrees), decimal addition is
  * associative, and the final decimal->double cast is deterministic.
  *
  * SQL-side mirror: CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE).
  *
  * This also makes results independent of Spark's own partition count —
  * the same property you want on a 1000-executor cluster where partial
  * aggregation order is nondeterministic run-to-run.
  */
object Parity {
  private val D = DecimalType(27, 6)
  private val D12 = DecimalType(27, 12)

  /** Order-independent, cross-engine-exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Higher-precision variant (scale 12) for small-magnitude terms like
    * embedding dot-product components. */
  def dsum12(c: Column): Column = sum(c.cast(D12)).cast(DoubleType)

  /** Order-independent, cross-engine-exact mean (null-skipping, matching
    * pandas .mean() and SQL AVG null semantics). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Scale-12 mean for inputs whose doubles can land on a DECIMAL(27,6)
    * rounding tie (ratio-valued features like quality scores): at scale
    * 12 the Spark HALF_UP vs DuckDB round-to-nearest difference is out of
    * reach of any realistic input. */
  def davg12(c: Column): Column = dsum12(c) / count(c)

  /** Oracle-SQL equivalents (DuckDB). */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(27,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)} / COUNT($expr))"
  def sqlDsum12(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(27,12))) AS DOUBLE)"
  def sqlDavg12(expr: String): String =
    s"(${sqlDsum12(expr)} / COUNT($expr))"
}
