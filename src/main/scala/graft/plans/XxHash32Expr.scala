package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Seeded XXH32 as a native codegen expression: `xxh32(str, seed)` returns
  * the unsigned 32-bit hash widened to long — the engine's fingerprint
  * function (reference: hash.go:5-10) exposed to SQL/DataFrame pipelines.
  * Participates in whole-stage codegen via a static call (no UDF overhead).
  */
case class XxHash32Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"xxh32 expects (string, int), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(str: Any, seed: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    graft.core.XxHash32.hash(bytes, seed.asInstanceOf[Int]).toLong & 0xffffffffL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, seed) =>
      s"((long) graft.core.XxHash32.hash($s.getBytes(), (int) $seed)) & 0xFFFFFFFFL")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): XxHash32Expr =
    copy(left = newLeft, right = newRight)
}
