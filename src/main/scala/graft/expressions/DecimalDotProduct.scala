package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact, order-independent dot product of two array<double> columns:
  * each elementwise product is rounded to DECIMAL(27,12) (HALF_UP via
  * BigDecimal.valueOf — the same path Spark's double->decimal cast
  * takes), partial sums stay at scale 12 (decimal addition at fixed
  * scale is exact), and the final value casts back to double.
  *
  * Bit-identical to the zip_with/aggregate Column formulation in
  * EmbeddingQueries (asserted by ExprEquivalenceSpec) and to the DuckDB
  * oracle's list_sum over DECIMAL(27,12) — but computed in one compiled
  * loop instead of per-element interpreted lambdas over Decimal
  * wrappers. Null semantics match the fold: mismatched lengths or any
  * null element poison the result to null.
  */
object DecimalDot {
  /** Spill threshold for the unscaled-long accumulator (half of Long
    * range — one more |element| <= 1e15-unscaled add cannot overflow). */
  private final val SpillAt = Long.MaxValue >> 1

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var accL = 0L              // unscaled partial sum at scale 12
    var accB: JBigDecimal = null // slow-path / spill partial sum
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getDouble(i) * b.getDouble(i)
      // Fast path for the common case, EXACTLY equal to
      // BigDecimal.valueOf(p).setScale(12, HALF_UP): that value is
      // sign(p) * floor(|shortest-repr(p)| * 1e12 + 0.5), and
      // |shortest(p) - p| <= ulp(p)/2, so when s = |p|*1e12 (two fp
      // roundings: the scale multiply and the shortest-repr gap, each
      // within 2 ulp of s) is farther from the floor boundary (t = s+0.5
      // at an integer) than an 8-ulp guard band, floor(t) is the same
      // integer for the true value — no string parse, no allocation.
      // NaN/Inf/near-boundary/huge values fail the check and take the
      // original BigDecimal path (NumberFormatException on NaN/Inf,
      // exactly as before).
      val s = Math.abs(p) * 1e12
      val t = s + 0.5
      if (s < 1e15 && Math.abs(t - Math.rint(t)) > Math.ulp(s) * 8) {
        val u = Math.floor(t).toLong
        accL += (if (p < 0) -u else u)
        if (accL > SpillAt || accL < -SpillAt) {
          val part = JBigDecimal.valueOf(accL, 12)
          accB = if (accB == null) part else accB.add(part)
          accL = 0L
        }
      } else {
        val d = JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
        accB = if (accB == null) d else accB.add(d)
      }
      i += 1
    }
    // decimal addition at fixed scale is associative, so folding the
    // long partials separately cannot change the total
    val total =
      if (accB == null) JBigDecimal.valueOf(accL, 12)
      else accB.add(JBigDecimal.valueOf(accL, 12))
    java.lang.Double.valueOf(total.doubleValue())
  }
}

case class DecimalDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  // Same contract as QuantDotProduct: declared array<double> inputs stop
  // the SQL surface (`decimal_dot`) from reading a float-backed array
  // with the wrong stride — analysis widens float->double (exact) or
  // rejects incompatible argument types outright
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""java.lang.Double $tmp = graft.expressions.DecimalDot.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalDotProduct =
    copy(left = l, right = r)
}
