package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.Decimal

/** Native Catalyst expression for the order-independent decimal dot
  * product of two float vectors — the hot kernel of the similarity
  * operators (SURVEY steering: "a native Catalyst Expression beats a
  * Scala UDF").
  *
  * Bit-exact contract (must keep oracle parity with the composed form
  * `sum(cast(x*y as decimal(20,12)))`): each float pair multiplies in
  * double (exact: 24-bit × 24-bit mantissas fit 53), the product rounds
  * to 12 decimal places exactly the way Spark's double→decimal cast does
  * (shortest-repr BigDecimal, HALF_UP), and the scaled longs sum exactly.
  * Codegen emits one static call per row — no per-element lambda
  * dispatch like `aggregate(zip_with(...))` (observed ~3× faster on the
  * ANN scan).
  */
final case class DecimalDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DecimalType(30, 12)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.DecimalDotProduct.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_decimal_dot"
}

object DecimalDotProduct {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      // identical semantics to Cast(double -> decimal(20,12)):
      // shortest-repr BigDecimal, HALF_UP at scale 12
      acc += JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    Decimal(BigDecimal(JBigDecimal.valueOf(acc, 12)), 30, 12)
  }
}
