package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native dot product of two numeric array columns, accumulated left-to-right
  * in double — bit-identical to the declarative
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)`
  * chain it replaces (acc starts at 0.0; each step is one fused
  * multiply-then-add in IEEE order), but evaluated as one tight loop instead
  * of per-element Catalyst lambda dispatch. This is the similarity kernel's
  * hot path: candidate-pair scoring evaluates it millions of times per task.
  *
  * Null semantics mirror the zip_with chain: a null result when either array
  * is null (BinaryExpression nullSafeEval), when lengths differ (zip_with
  * pads with null), or when any element is null.
  */
object VecDot {

  /** Runtime kernel (also the codegen target — static call, no virtual
    * dispatch). Boxed return carries the null case.
    */
  def dot(a: ArrayData, b: ArrayData, aIsDouble: Boolean, bIsDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** `vecDot($"a", $"b")` — Column handle over the native expression. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(VecDotExpr(Bridge.expression(a), Bridge.expression(b)))
}

case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two ARRAY<FLOAT|DOUBLE> args, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true

  private lazy val aIsDouble = elemType(left).contains(DoubleType)
  private lazy val bIsDouble = elemType(right).contains(DoubleType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aIsDouble, bIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Double $boxed = graft.plans.VecDot.dot($a, $b, $aIsDouble, $bIsDouble);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}
