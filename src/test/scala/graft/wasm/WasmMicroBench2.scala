package graft.wasm

import org.scalatest.funsuite.AnyFunSuite
import WasmAssembler.{body, module, Func, Export}
import WasmInterp.{instantiate, HostFunc}
import WasmModule.I32

class WasmMicroBench2 extends AnyFunSuite {
  test("micro: pure-compute loop 10M iterations") {
    // acc=0; i=n; loop { acc = acc*3+i; i--; if i>0 continue }; acc
    val b = body()
      .i32Const(0).localSet(1)
      .block()
        .loop()
          .localGet(0).i32Eqz().brIf(1)
          .localGet(1).i32Const(3).i32Mul().localGet(0).i32Add().localSet(1)
          .localGet(0).i32Const(1).i32Sub().localSet(0)
          .br(0)
        .end()
      .end()
      .localGet(1)
    val inst = new WasmInterp.Instance(WasmModule.decode(module(
      types = Seq((Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 1, 0, b)),
      memPages = 1,
      exports = Seq(Export("f", 0)))), Map.empty[(String, String), HostFunc],
      maxFuel = Long.MaxValue)
    inst.invokeExport("f", Array(1000000L)) // warmup
    val n = 10000000L
    val t0 = System.nanoTime()
    val r = inst.invokeExport("f", Array(n)).head
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"WASM_MICRO2 loop: $n iters (x8 instrs) in $sec%.3f s = ${n * 8 / sec / 1e6}%.1f Minstr/s (acc=$r)")
  }
}
