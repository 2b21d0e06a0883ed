package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Compiled candidate-pair expansion for the set-similarity (PPJoin
  * prefix-filter) join: posting list of (doc_id, n) -> all oriented
  * pairs (doc_a < doc_b) that pass the integer size-ratio prune
  * 5*min(na,nb) >= 4*max(na,nb) (Jaccard >= 0.8 is impossible outside
  * that band, so dropping them cannot change the result).
  *
  * The Column formulation — transform with index + slice + nested
  * transform + flatten — enumerates the same triangle but runs through
  * interpreted higher-order lambdas, re-slicing the list per element:
  * O(L^2) struct copies with per-element dispatch, which is exactly
  * where a hot shingle's posting list (L in the hundreds) burns CPU.
  * One compiled double loop emits only the surviving pairs and needs no
  * pre-sorted input (each pair is oriented on the fly), so the upstream
  * array_sort(collect_list(...)) shuffle stage drops its sort too.
  */
object PrefixPair {
  def expand(ds: ArrayData): GenericArrayData = {
    val l = ds.numElements()
    val ids = new Array[Long](l)
    val ns = new Array[Int](l)
    var i = 0
    while (i < l) {
      val r = ds.getStruct(i, 2)
      ids(i) = r.getLong(0)
      ns(i) = r.getInt(1)
      i += 1
    }
    val out = new java.util.ArrayList[InternalRow](l * 2)
    i = 0
    while (i < l) {
      var j = i + 1
      while (j < l) {
        val (na, nb) = (ns(i), ns(j))
        val (lo, hi) = if (na < nb) (na, nb) else (nb, na)
        if (5L * lo >= 4L * hi && ids(i) != ids(j)) {
          val aFirst = ids(i) < ids(j)
          out.add(new GenericInternalRow(Array[Any](
            if (aFirst) ids(i) else ids(j), if (aFirst) na else nb,
            if (aFirst) ids(j) else ids(i), if (aFirst) nb else na)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object CrossPair {
  /** All oriented, ratio-pruned pairs (x in a, y in b, x.id != y.id) —
    * the chunked form of [[PrefixPair.expand]]: splitting a hot posting
    * list into chunks and expanding chunk pairs (diagonal included)
    * yields the same pair set after orientation + distinct, but spreads
    * the quadratic work over many rows instead of one straggler task.
    * Diagonal chunk pairs emit each unordered pair twice (once per
    * operand order); orientation makes the copies identical and the
    * query's distinct() removes them. */
  def expand(a: ArrayData, b: ArrayData): GenericArrayData = {
    val (la, lb) = (a.numElements(), b.numElements())
    val out = new java.util.ArrayList[InternalRow](la)
    var i = 0
    while (i < la) {
      val ra = a.getStruct(i, 2)
      val (ida, na) = (ra.getLong(0), ra.getInt(1))
      var j = 0
      while (j < lb) {
        val rb = b.getStruct(j, 2)
        val (idb, nb) = (rb.getLong(0), rb.getInt(1))
        val (lo, hi) = if (na < nb) (na, nb) else (nb, na)
        if (5L * lo >= 4L * hi && ida != idb) {
          val aFirst = ida < idb
          out.add(new GenericInternalRow(Array[Any](
            if (aFirst) ida else idb, if (aFirst) na else nb,
            if (aFirst) idb else ida, if (aFirst) nb else na)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<struct<doc_a,na,doc_b,nb>> of ratio-pruned oriented pairs from
  * a posting list array<struct<doc_id: long, n: int>>. */
case class PrefixPairExpand(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("na", IntegerType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nb", IntegerType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PrefixPair.expand(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PrefixPair.expand($c);")
  override protected def withNewChildInternal(newChild: Expression): PrefixPairExpand =
    copy(child = newChild)
}

/** Binary chunk-pair form of [[PrefixPairExpand]] — see [[CrossPair]]. */
case class CrossPairExpand(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("na", IntegerType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nb", IntegerType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CrossPair.expand(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.CrossPair.expand($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CrossPairExpand =
    copy(left = l, right = r)
}
