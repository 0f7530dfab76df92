package graft.functions

import graft.text.NearDup
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64(text)` as a native Catalyst expression WITH code generation —
  * the generated code is a static call, so the expression composes into
  * whole-stage codegen instead of breaking the pipeline into object-mode
  * islands the way a Scala UDF (or mapPartitions) would. Null-safe unary.
  *
  * Semantics match [[graft.text.NearDup.simhash64]] exactly (shared kernel).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64Expr {
  /** Static kernel target for both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = NearDup.simhash64(s.toString)

  def simhash64(c: Column): Column = Bridge.column(SimHash64Expr(Bridge.expression(c)))
}
