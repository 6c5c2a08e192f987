package graft.wasm

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RecordBatchCodec.Rec
import TransformAbi._

class WasmMicroBench3 extends AnyFunSuite {
  test("micro: mirror guest over 200k records") {
    def header(base: Long, n: Int): BatchHeader =
      BatchHeader(base, n, 0, 0, n - 1, 1700000000000L,
        1700000000000L + n - 1, -1L, -1, -1)
    val nRecs = 200000
    val perBatch = 1000
    def feed = (0 until nRecs / perBatch).iterator.map { b =>
      position(header(b * perBatch, perBatch),
        (0 until perBatch).map(i => Rec(i, i.toLong,
          s"key$i".getBytes("UTF-8"),
          s"some moderately sized value payload $i".getBytes("UTF-8"), Nil)))
    }
    TransformAbi.run(GuestModules.mirror, feed) // warmup
    val t0 = System.nanoTime()
    val (out, _) = TransformAbi.run(GuestModules.mirror, feed)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"WASM_MICRO3 mirror: $nRecs records in $sec%.3f s = ${nRecs / sec}%.0f rec/s (${out.size} out)")
    assert(out.size === nRecs)
  }
}
