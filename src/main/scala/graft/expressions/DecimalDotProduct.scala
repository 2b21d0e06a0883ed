package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getDouble(i) * b.getDouble(i)
      acc = acc.add(JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }
}

case class DecimalDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {
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
