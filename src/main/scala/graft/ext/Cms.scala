package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch over a token stream (Cormode & Muthukrishnan,
  * "An Improved Data Stream Summary: The Count-Min Sketch and its
  * Applications", J. Algorithms 2005) as a typed Aggregator — the
  * SURVEY.md §2.8 Aggregator path, like [[TopKAgg]].
  *
  * d independent salted hash rows × w buckets, flattened to ONE
  * d·w-long buffer: update adds 1 to bucket h_s(x) of every row s,
  * merge is elementwise add (counters are linear), and
  * estimate(x) = min over rows of x's buckets — always ≥ the true
  * count, within εN with the published (d, w) guarantees. The buffer
  * is FIXED-SIZE, so a 100 TB token stream aggregates map-side into
  * d·w·8 bytes per task and the exchange moves one array per
  * partition — the whole point vs shuffling the token multiset
  * (which the exact-count side of q93 must still do; the sketch side
  * is the scale path when only heavy hitters are needed).
  *
  * The row hash is [[TextOps.saltedHash]]'s exact semantics (first 8
  * hex chars of md5("salt:token") as a long) computed JVM-side, so
  * the Column form of the same hash — and therefore the DuckDB
  * oracle — addresses the identical bucket: CmsSpec pins
  * JVM-vs-Column bucket equality and the q93 oracle restates every
  * bucket sum. md5 is ~2× slower than a xxhash here and that is the
  * deliberate trade this repo makes everywhere: one hash family both
  * engines can state (TextOps class doc).
  */
class CmsAgg(d: Int, w: Int) extends Aggregator[String, Array[Long], Array[Long]] {
  require(d >= 1 && w >= 1, s"need d >= 1 rows and w >= 1 buckets, got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var s = 0
    while (s < d) {
      buf(s * w + CmsAgg.bucket(s, tok, w)) += 1L
      s += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CmsAgg {
  /** JVM-side [[TextOps.saltedHash]]: first 8 lowercase-hex chars of
    * md5(UTF-8 of "salt:tok") parsed base-16 — bit-identical to the
    * Column/DuckDB forms (32 bits, so it always fits a long
    * non-negatively). Delegates to [[graft.expressions.TextHash]]'s
    * ThreadLocal digest: this runs once per salt per input ROW of the
    * sketch builds, where a getInstance per call would be pure
    * provider-lookup and allocation overhead. */
  private[graft] def saltedHash(salt: Int, tok: String): Long =
    graft.expressions.TextHash.hash32(salt, tok)

  /** Row-s bucket of `tok` in a w-wide sketch. */
  private[graft] def bucket(s: Int, tok: String, w: Int): Int =
    (saltedHash(s, tok) % w).toInt
}
