package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

  /** Deterministic ±1 hyperplane component for (plane i, dim j): a
    * splitmix64-style finalizer over the pair, identical on every executor
    * and every run — no RNG state, no plan-embedded literal arrays. */
  @inline def planeSign(i: Int, j: Int): Double = {
    var h = i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** `nBits`-bit sign-random-projection sketch of a double vector, computed
    * in one fused loop (bit i set iff dot(x, plane_i) > 0). */
  def signSketch(x: ArrayData, nBits: Int): Long = {
    val n = x.numElements()
    var sketch = 0L
    var i = 0
    while (i < nBits) {
      var s = 0.0
      var j = 0
      while (j < n) { s += x.getDouble(j) * planeSign(i, j); j += 1 }
      if (s > 0) sketch |= (1L << i)
      i += 1
    }
    sketch
  }
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

/**
 * `vec_sign_sketch(a, nBits)` — sign-random-projection LSH sketch as one
 * fused codegen loop. Replaces a plan of nBits `vec_dot`s against literal
 * hyperplane arrays (which bloated task binaries past the 1 MiB broadcast
 * warning and got re-evaluated per band reference); here the sketch is a
 * single cheap expression evaluated once per row.
 */
case class VecSignSketch(child: Expression, nBits: Int)
    extends UnaryExpression with RequiresDoubleArrays {
  override protected def arrayChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_sign_sketch"

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.signSketch(a.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.signSketch($a, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): VecSignSketch =
    copy(child = newChild)
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
