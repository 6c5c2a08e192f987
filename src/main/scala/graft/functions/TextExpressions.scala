package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst kernel for the exact repeated-span window hash
 * ([[graft.analytics.TextAnalysis.duplicateSpans]]).
 *
 * The declarative spelling — `transform(sequence(0, n-k), i =>
 * aggregate(slice(th, i+1, k), …))` — invokes an interpreted lambda per
 * window ELEMENT (O(n·k) boxed steps per document) because higher-order
 * functions are CodegenFallback. This kernel emits every window hash in
 * one O(n) primitive rolling loop: identical double polynomial folds mod
 * the coprime 31-bit primes, identical 62-bit packing
 * (`h1 * 2^31 + h2`), so the values — and therefore the DuckDB oracle,
 * which replays the per-window fold in SQL — are bit-exactly unchanged.
 *
 * Rolling form of the fold: the fold computes the window's polynomial
 * value mod M exactly at every step, so sliding by one token is
 * `h' = ((h - t_out·B^(k-1)) · B + t_in) mod M`, with every
 * intermediate bounded by 2^62 (h < 2^31, B^(k-1) mod M < 2^31,
 * t < 2^48 — the 48-bit md5 token prefix).
 */
object TextKernels {
  import graft.analytics.TextAnalysis.{SpanHashBase1, SpanHashBase2, SpanHashMod1, SpanHashMod2}

  def spanWindowHashes(th: ArrayData, k: Int): ArrayData = {
    val n = th.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // B^(k-1) mod M — the outgoing token's coefficient
    var p1 = 1L; var p2 = 1L
    var j = 1
    while (j < k) {
      p1 = p1 * SpanHashBase1 % SpanHashMod1
      p2 = p2 * SpanHashBase2 % SpanHashMod2
      j += 1
    }
    val out = new Array[Long](n - k + 1)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < k) {
      val t = th.getLong(i)
      h1 = (h1 * SpanHashBase1 + t) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + t) % SpanHashMod2
      i += 1
    }
    out(0) = h1 * 2147483648L + h2
    while (i < n) {
      val tOut = th.getLong(i - k)
      h1 = ((h1 - tOut % SpanHashMod1 * p1) % SpanHashMod1 + SpanHashMod1) % SpanHashMod1
      h2 = ((h2 - tOut % SpanHashMod2 * p2) % SpanHashMod2 + SpanHashMod2) % SpanHashMod2
      val tIn = th.getLong(i)
      h1 = (h1 * SpanHashBase1 + tIn) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + tIn) % SpanHashMod2
      out(i - k + 1) = h1 * 2147483648L + h2
      i += 1
    }
    new GenericArrayData(out)
  }

  def polyFingerprint(th: ArrayData): Long = {
    val n = th.numElements()
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < n) {
      val t = th.getLong(i)
      h1 = (h1 * SpanHashBase1 + t) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + t) % SpanHashMod2
      i += 1
    }
    h1 * 2147483648L + h2
  }
}

/** `poly_fingerprint(array<long>) -> long` — the whole-array packed
  * double polynomial fold (the k = n degenerate case of
  * [[SpanWindowHashes]]): an order-sensitive document fingerprint over
  * 48-bit token hashes that an external SQL engine replays exactly
  * (DuckDB: `list_reduce` with the same packed lambda). Empty array
  * folds to 0. */
case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprint requires array<long> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.polyFingerprint(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.polyFingerprint($a)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

/** `span_window_hashes(array<long>, k) -> array<long>` — every k-token
  * packed window hash of a token-hash array, one fused rolling loop. */
case class SpanWindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 1, "span length must exceed one token")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_window_hashes requires array<long> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.spanWindowHashes(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.spanWindowHashes($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanWindowHashes =
    copy(child = newChild)
}
