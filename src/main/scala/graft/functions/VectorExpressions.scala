package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst kernels for embedding math.
 *
 * The similarity/dedup operators score millions of candidate pairs; the
 * builtin higher-order functions (`zip_with` + `aggregate`) evaluate a
 * lambda per element with boxing and per-row array allocation — orders of
 * magnitude slower than a fused loop. These expressions generate a tight
 * primitive `for` loop inside whole-stage codegen instead.
 *
 * Contract: inputs are `array<double>`; nulls propagate (null-safe eval).
 */
object VectorKernels {
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  def norm(x: ArrayData): Double = math.sqrt(dot(x, x))
}

private[functions] trait RequiresDoubleArrays { self: Expression =>
  protected def arrayChildren: Seq[Expression]
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = arrayChildren.filterNot(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<double> inputs, got ${bad.map(_.dataType).mkString(", ")}")
  }
}

/** `vec_dot(a, b)` — dot product of two double vectors. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with RequiresDoubleArrays {
  override protected def arrayChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_norm(a)` — L2 norm. */
case class VecNorm(child: Expression)
    extends UnaryExpression with RequiresDoubleArrays {
  override protected def arrayChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm($a)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
