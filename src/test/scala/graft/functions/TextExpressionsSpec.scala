package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.TextAnalysis.{SpanHashBase1, SpanHashBase2, SpanHashMod1, SpanHashMod2}

/** The rolling kernel must reproduce the per-window polynomial fold
  * bit-exactly — the DuckDB oracle replays the fold in SQL. */
class TextExpressionsSpec extends AnyFunSuite {

  // the original spelling: fold each window independently
  private def foldWindow(w: Seq[Long]): Long = {
    var h1 = 0L; var h2 = 0L
    w.foreach { t =>
      h1 = (h1 * SpanHashBase1 + t) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + t) % SpanHashMod2
    }
    h1 * 2147483648L + h2
  }

  test("rolling window hashes equal the independent per-window folds") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(2, 3, 7, 50, 257); k <- Seq(2, 3, 5, 13) if k <= n) {
      // 48-bit token hashes, like the md5 prefix
      val th = Array.fill(n)(rnd.nextLong() & ((1L << 48) - 1))
      val got = TextKernels.spanWindowHashes(new GenericArrayData(th), k)
      val want = th.toSeq.sliding(k).map(foldWindow).toSeq
      assert(got.numElements() === n - k + 1, s"n=$n k=$k")
      assert(got.toLongArray().toSeq === want, s"n=$n k=$k")
    }
  }

  test("shorter-than-k input yields no windows") {
    val th = new GenericArrayData(Array(7L, 8L))
    assert(TextKernels.spanWindowHashes(th, 3).numElements() === 0)
  }
}
