package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog registers over a key stream (Flajolet, Fusy, Gandouet &
  * Meunier, AofA 2007) as a typed Aggregator — the third mergeable
  * sketch next to [[CmsAgg]] (frequency) and [[BloomAgg]] (membership),
  * same fixed-buffer scale story: m = 2^b registers, map-side combined,
  * merged by elementwise MAX (registers are max-of-rho, and max is
  * associative/commutative/idempotent — unions of sketches are exact
  * sketch-of-unions, which is why per-partition HLLs compose at any
  * 100 TB partitioning).
  *
  * Hash layout: the repo's 60-bit md5 hash ([[TextHash.hash60]], salt
  * "hll") — top b bits select the register, the low (60−b) bits carry
  * the geometric observable rho = (leading zeros within the field) + 1
  * = (60−b) + 1 − bitlength(rest), with rest = 0 mapping to the field
  * width + 1. Everything downstream of the registers is EXACT integer
  * arithmetic: the q95 query folds Σ_j 2^(−M_j) in fixed point, scaled
  * by 2^(61−b) so every term 2^(61−b−M_j) is a lossless long, so the only
  * floating steps are one long→double conversion, one IEEE division,
  * and one multiply by the α_m literal — all bit-deterministic and
  * restated verbatim by the DuckDB oracle (which rebuilds every
  * register from the same hash via group-by MAX).
  *
  * This is the RAW HLL estimator, deliberately without the small- and
  * large-range corrections: linear counting needs ln(), and a
  * transcendental would break the engine-vs-oracle bit contract this
  * repo maintains (TextOps class doc). The registers themselves are
  * the complete sketch; a caller wanting corrected estimates applies
  * them on top.
  */
class HllAgg(b: Int) extends Aggregator[String, Array[Long], Array[Long]] {
  require(b >= 4 && b <= 16, s"register-index bits must be in [4, 16], got $b")
  private val m = 1 << b
  private val restBits = 60 - b

  override def zero: Array[Long] = new Array[Long](m)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    val h = graft.expressions.TextHash.hash60("hll", key)
    val bucket = (h >>> restBits).toInt
    val rest = h & ((1L << restBits) - 1)
    val rho =
      if (rest == 0L) restBits + 1
      else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    if (buf(bucket) < rho) buf(bucket) = rho.toLong
    buf
  }

  override def merge(a: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (a(i) < b2(i)) a(i) = b2(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
