package graft.wasm

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RecordBatchCodec.Rec
import TransformAbi._

class WasmMicroBench extends AnyFunSuite {
  test("micro: upperValue guest over 100k records") {
    def header(base: Long, n: Int): BatchHeader =
      BatchHeader(base, n, 0, 0, n - 1, 1700000000000L,
        1700000000000L + n - 1, -1L, -1, -1)
    val nRecs = 100000
    val perBatch = 1000
    def feed = (0 until nRecs / perBatch).iterator.map { b =>
      position(header(b * perBatch, perBatch),
        (0 until perBatch).map(i => Rec(i, i.toLong,
          s"key$i".getBytes("UTF-8"),
          s"some moderately sized value payload $i".getBytes("UTF-8"), Nil)))
    }
    // warmup
    TransformAbi.run(GuestModules.upperValue, feed)
    // min-of-3: single shots on this container swing ±40% with JIT/
    // neighbor pressure; the best run is the engine's actual speed
    var best = Double.MaxValue
    var outSize = 0
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      val (out, _) = TransformAbi.run(GuestModules.upperValue, feed)
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) best = sec
      outSize = out.size
    }
    println(f"WASM_MICRO upperValue: $nRecs records in $best%.3f s = ${nRecs / best}%.0f rec/s ($outSize out)")
    assert(outSize === nRecs)
  }
}
