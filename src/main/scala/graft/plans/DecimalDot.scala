package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.Decimal

/** Native Catalyst expression for the order-independent decimal dot
  * product of two numeric vectors — the hot kernel of the similarity
  * operators (SURVEY steering: "a native Catalyst Expression beats a
  * Scala UDF").
  *
  * Accepts `array<float>` or `array<double>` on either side, so the same
  * kernel serves vec·vec scoring (float×float) and vec·hyperplane SRP
  * projections (float×double literal planes precomputed on the driver).
  *
  * Bit-exact contract (must keep oracle parity with the composed form
  * `sum(cast(x*y as decimal(20,12)))`): each pair multiplies in double
  * (for float×float this is exact: 24-bit × 24-bit mantissas fit 53; for
  * ×double it is the same IEEE-rounded product both engines compute), the
  * product rounds to 12 decimal places exactly the way Spark's
  * double→decimal cast does (shortest-repr BigDecimal, HALF_UP), and the
  * scaled longs sum exactly.  Codegen emits one static call per row — no
  * per-element lambda dispatch like `aggregate(zip_with(...))` (observed
  * ~3× faster on the ANN scan).
  */
final case class DecimalDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DecimalType(30, 12)
  override def nullIntolerant: Boolean = true

  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isDoubleArr(left), isDoubleArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.DecimalDotProduct.compute($a, $b, " +
        s"${isDoubleArr(left)}, ${isDoubleArr(right)});")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_decimal_dot"
}

object DecimalDotProduct {
  /** Static kernel shared by interpreted eval and generated code.
    * `aD`/`bD` select double vs float element access per side.
    */
  def compute(a: ArrayData, b: ArrayData, aD: Boolean, bD: Boolean): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aD) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bD) b.getDouble(i) else b.getFloat(i).toDouble
      val p = x * y
      // identical semantics to Cast(double -> decimal(20,12)):
      // shortest-repr BigDecimal, HALF_UP at scale 12
      acc += JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    Decimal(BigDecimal(JBigDecimal.valueOf(acc, 12)), 30, 12)
  }
}
