package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Tie-free quantized dot product of two array<double> columns: every
  * elementwise product is floored onto the 1e-12 grid with pure IEEE
  * double arithmetic — q = floor(x·y·1e12 + 0.5) — summed as exact
  * longs, and the total divides back to double.
  *
  * This is q75's numeric contract (see EmbeddingQueries.qdotCol's
  * scaladoc): unlike [[DecimalDotProduct]]'s DECIMAL(27,12) cast, the
  * floor construction has NO half-quantum tie whose rounding direction
  * engines disagree on — every step (multiply, multiply, add, floor)
  * is a correctly-rounded IEEE-754 op computed identically by any
  * conforming engine, and floor itself is exact. Bit-identical to the
  * zip_with/aggregate Column formulation (ExprEquivalenceSpec) and to
  * the DuckDB oracle's list_sum over CAST(floor(...) AS BIGINT), but
  * computed in one compiled loop instead of per-element interpreted
  * lambdas.
  *
  * Null semantics match the fold: mismatched lengths or any null
  * element poison the result to null. NaN/Inf products follow the
  * same double→long cast the Column floor takes (NaN → 0,
  * ±Inf → ±Long.MaxValue) — out-of-contract inputs, but identical on
  * both paths. Overflow bound: |Σ q| ≤ dim·|x·y|max·1e12 must stay
  * under 2^63 — comfortable for unit-scale embeddings at any dim the
  * engine ships.
  */
object QuantDot {
  // THE quantization arithmetic, defined once: both fold loops (the
  // executor ArrayData path and the driver Array path) and both
  // finishers go through these two, so the grid/rounding cannot drift
  // between them
  @inline private def term(x: Double, y: Double): Long =
    Math.floor(x * y * 1e12 + 0.5).toLong
  @inline private def finish(acc: Long): Double = acc.toDouble / 1e12

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      // exactly the Column form: floor(x * y * 1e12 + 0.5) as long
      acc += term(a.getDouble(i), b.getDouble(i))
      i += 1
    }
    java.lang.Double.valueOf(finish(acc))
  }

  /** The same fold over plain arrays — for DRIVER-side consumers of the
    * numeric contract (kmeansConverge recomputes centroid norms on the
    * collected k·dim pack; [[term]]/[[finish]] keep the arithmetic
    * defined once, so the loop and the executor kernel cannot drift
    * bit-wise). */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length, s"length mismatch: ${a.length} vs ${b.length}")
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += term(a(i), b(i))
      i += 1
    }
    finish(acc)
  }
}

case class QuantDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  // Declared input types matter for the SQL surface (`quant_dot`): an
  // undeclared array<float> argument would make ArrayData.getDouble read
  // the float-backed array with the wrong element stride and silently
  // return garbage. With the declaration, analysis inserts a
  // float->double widening cast (exact) — or fails on incompatible types
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("qdot")
      s"""java.lang.Double $tmp = graft.expressions.QuantDot.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantDotProduct =
    copy(left = l, right = r)
}
