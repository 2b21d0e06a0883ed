package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter over a key stream (Bloom, CACM 1970) as a typed
  * Aggregator — [[CmsAgg]]'s set-membership sibling, same fixed-buffer
  * scale story: the buffer is mBits/64 longs, map-side combined and
  * merged by elementwise OR (bit-setting is idempotent and
  * commutative), so building a filter over a benchmark's shingle set
  * moves one small array per partition. The payoff is on the PROBE
  * side: broadcast the one-row bitset and a 100 TB corpus pre-filters
  * its own shingles with pure column arithmetic — no join, no
  * shuffle — before the exact confirm join touches only the
  * survivors (true hits + the quantified false-positive tail).
  *
  * No false negatives, ever: a key that was added always probes true
  * (all of its k bits were set and OR never clears). False positives
  * are expected and the q94 contract ACCOUNTS for them instead of
  * hiding them: the confirm join reports candidates vs true hits.
  *
  * Bit j of key x for row s: [[CmsAgg.saltedHash]](s, decimal string
  * of x) mod mBits — the repo's one md5 hash family, so the Column
  * probe and the DuckDB oracle address the identical bit (the oracle
  * restates the bitset as the DISTINCT (salt, pos) set, which is the
  * same predicate: bit set ⟺ position present).
  */
class BloomAgg(mBits: Int, kSalts: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits >= 64 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")
  require(kSalts >= 1, s"need at least one hash row, got $kSalts")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val ks = key.toString
    var s = 0
    while (s < kSalts) {
      val pos = (CmsAgg.saltedHash(s, ks) % mBits).toInt
      buf(pos >> 6) |= 1L << (pos & 63)
      s += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
