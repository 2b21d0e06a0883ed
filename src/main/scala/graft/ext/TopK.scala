package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §2.8's Aggregator path):
  * keeps only the k best (sortKey, payload) pairs per group in the
  * aggregation buffer, so a "top 3 per group" over a 100 TB fact table
  * combines map-side to k rows per group per partition instead of
  * window-sorting every row of every group (the q26 formulation sorts;
  * this one never materializes a full partition order). Deterministic
  * tie-break: higher sortKey wins, then lower payload.
  *
  * Result equality with the window formulation is asserted in
  * TopKAggSpec and by the q39 oracle.
  */
class TopKAgg(k: Int) extends Aggregator[TopKAgg.Entry, TopKAgg.Buf, TopKAgg.Buf] {
  import TopKAgg.{Buf, Entry}

  private def better(a: Entry, b: Entry): Boolean =
    a.sortKey > b.sortKey || (a.sortKey == b.sortKey && a.payload < b.payload)

  private def trim(l: Seq[Entry]): Seq[Entry] = l.sortWith(better).take(k)

  override def zero: Buf = Buf(Vector.empty)
  override def reduce(buf: Buf, in: Entry): Buf = Buf(trim(in +: buf.items))
  override def merge(a: Buf, b: Buf): Buf = Buf(trim(a.items ++ b.items))
  override def finish(buf: Buf): Buf = buf
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
}

object TopKAgg {
  final case class Entry(sortKey: Double, payload: Long)
  final case class Buf(items: Seq[Entry])
}
