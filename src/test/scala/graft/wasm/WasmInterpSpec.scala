package graft.wasm

import org.scalatest.funsuite.AnyFunSuite
import WasmAssembler.{body, module, Func, FuncImport, Export, Data}
import WasmInterp.{instantiate, WasmTrap, HostFunc, Instance}
import WasmModule.{I32, I64}

/** Golden-module tests for the wasm decoder + interpreter: every
  * module here is a genuine binary assembled byte-for-byte to the
  * wasm 1.0 spec layout, then decoded and executed. */
class WasmInterpSpec extends AnyFunSuite {

  private val noHost = Map.empty[(String, String), HostFunc]

  test("add: (i32, i32) -> i32") {
    val bytes = module(
      types = Seq((Seq(I32, I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, body().localGet(0).localGet(1).i32Add())),
      memPages = 1,
      exports = Seq(Export("add", 0)))
    val inst = instantiate(bytes, noHost)
    assert(inst.invokeExport("add", Array(2L, 40L)).head === 42L)
    assert(inst.invokeExport("add", Array(-1L, 1L)).head === 0L)
    // i32 wrap-around
    assert(inst.invokeExport("add", Array(Int.MaxValue.toLong, 1L)).head
      === Int.MinValue.toLong)
  }

  test("factorial via loop with branching") {
    // local0 = n (param), local1 = acc
    // acc = 1; loop { if n <= 1 break; acc *= n; n -= 1 }
    val b = body()
      .i32Const(1).localSet(1)
      .block()                     // depth 1 (the break target)
        .loop()                    // depth 0 inside = loop head
          .localGet(0).i32Const(1).i32LeS().brIf(1)   // break out of block
          .localGet(1).localGet(0).i32Mul().localSet(1)
          .localGet(0).i32Const(1).i32Sub().localSet(0)
          .br(0)                   // continue loop
        .end()
      .end()
      .localGet(1)
    val bytes = module(
      types = Seq((Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 1, 0, b)),
      memPages = 1,
      exports = Seq(Export("fact", 0)))
    val inst = instantiate(bytes, noHost)
    assert(inst.invokeExport("fact", Array(5L)).head === 120L)
    assert(inst.invokeExport("fact", Array(0L)).head === 1L)
    assert(inst.invokeExport("fact", Array(10L)).head === 3628800L)
  }

  test("branch past an intermediate block keeps the branch value") {
    // (func (result i32)
    //   (block (result i32)    ;; target, arity 1
    //     (block               ;; intermediate, arity 0
    //       i32.const 7  br 1) ;; branch value must survive the inner frame
    //     i32.const 99))
    val b = body()
      .block(0x7f)
        .block()
          .i32Const(7).br(1)
        .end()
        .i32Const(99)
      .end()
    val bytes = module(
      types = Seq((Seq.empty, Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, b)),
      memPages = 1,
      exports = Seq(Export("f", 0)))
    assert(instantiate(bytes, noHost).invokeExport("f", Array.empty).head === 7L)
  }

  test("memory: store/load, data segment, memory.copy/fill, grow") {
    // f(addr) = i32.load(addr)
    val load = body().localGet(0).i32Load()
    // g() = copy data seg bytes [0,4) to 100, fill [200,204) with 0xAB, return load(100)+load8u(200)
    val g = body()
      .i32Const(100).i32Const(0).i32Const(4).memoryCopy()
      .i32Const(200).i32Const(0xAB).i32Const(4).memoryFill()
      .i32Const(100).i32Load()
      .i32Const(200).i32Load8U()
      .i32Add()
    val growBody = body().i32Const(2).memoryGrow().drop().memorySize()
    val bytes = module(
      types = Seq((Seq(I32), Seq(I32)), (Seq.empty, Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, load), Func(1, 0, 0, g), Func(1, 0, 0, growBody)),
      memPages = 1,
      exports = Seq(Export("load", 0), Export("g", 1), Export("grow", 2)),
      datas = Seq(Data(0, Array[Byte](0x78, 0x56, 0x34, 0x12))))
    val inst = instantiate(bytes, noHost)
    assert(inst.invokeExport("load", Array(0L)).head === 0x12345678L)
    assert(inst.invokeExport("g", Array.empty).head === 0x12345678L + 0xAB)
    assert(inst.invokeExport("grow", Array.empty).head === 3L) // 1 + 2 pages
  }

  test("i64 and division semantics") {
    val div = body().localGet(0).localGet(1).op(0x7f) // i64.div_s
    val bytes = module(
      types = Seq((Seq(I64, I64), Seq(I64))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, div)),
      memPages = 1,
      exports = Seq(Export("div", 0)))
    val inst = instantiate(bytes, noHost)
    assert(inst.invokeExport("div", Array(-7L, 2L)).head === -3L)
    intercept[WasmTrap] { inst.invokeExport("div", Array(1L, 0L)) }
  }

  test("host import call and memory round trip through host") {
    var seen = -1L
    val host: HostFunc = new HostFunc {
      def invoke(inst: Instance, args: Array[Long]): Array[Long] = {
        seen = args(0)
        inst.memory.writeN(64, 4, 4242L)
        Array(args(0) * 2)
      }
    }
    // f(x) = host(x) + i32.load(64)
    val b = body().localGet(0).call(0).i32Const(64).i32Load().i32Add()
    val bytes = module(
      types = Seq((Seq(I32), Seq(I32))),
      imports = Seq(FuncImport("env", "double", 0)),
      funcs = Seq(Func(0, 0, 0, b)),
      memPages = 1,
      exports = Seq(Export("f", 1))) // func index 1 (import is 0)
    val inst = instantiate(bytes, Map(("env", "double") -> host))
    assert(inst.invokeExport("f", Array(21L)).head === 42L + 4242L)
    assert(seen === 21L)
  }

  test("runaway guests trap: fuel exhaustion and call-depth guard") {
    // infinite loop: loop { br 0 }
    val spin = module(
      types = Seq((Seq.empty, Seq.empty)),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, body().loop().br(0).end())),
      memPages = 1,
      exports = Seq(Export("spin", 0)))
    val inst = new WasmInterp.Instance(WasmModule.decode(spin), noHost,
      maxFuel = 10000)
    val t1 = intercept[WasmTrap] { inst.invokeExport("spin", Array.empty) }
    assert(t1.getMessage.contains("fuel"))
    // unbounded recursion: f() = call f
    val recur = module(
      types = Seq((Seq.empty, Seq.empty)),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, body().call(0))),
      memPages = 1,
      exports = Seq(Export("f", 0)))
    val t2 = intercept[WasmTrap] {
      new WasmInterp.Instance(WasmModule.decode(recur), noHost)
        .invokeExport("f", Array.empty)
    }
    assert(t2.getMessage.contains("call stack"))
  }

  test("unreachable traps; select and eqz behave") {
    val sel = body().localGet(0).localGet(1).localGet(2).select()
    val bytes = module(
      types = Seq((Seq(I32, I32, I32), Seq(I32)), (Seq.empty, Seq.empty)),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, sel), Func(1, 0, 0, body().unreachable())),
      memPages = 1,
      exports = Seq(Export("sel", 0), Export("boom", 1)))
    val inst = instantiate(bytes, noHost)
    assert(inst.invokeExport("sel", Array(10L, 20L, 1L)).head === 10L)
    assert(inst.invokeExport("sel", Array(10L, 20L, 0L)).head === 20L)
    intercept[WasmTrap] { inst.invokeExport("boom", Array.empty) }
  }

  test("memory-run superinstructions fuse the upperValue byte loop") {
    // the load→modify→store→advance shapes must stay single dispatches:
    // a regression here silently multiplies byte-loop cost. Pinned
    // opcodes (WasmInterp.Flat): 0x21f JCmpLL, 0x22d LdATosBinLS,
    // 0x222 LdLS, 0x230 JzRangeAnd (the fused a-z range check + if),
    // 0x22c StLBinLC, 0x218 BinLCS.
    val m = WasmModule.decode(GuestModules.upperValue)
    val main = WasmInterp.flatOpsOf(m, 0)
    for (op <- Seq(0x21f, 0x22d, 0x222, 0x230, 0x22c, 0x218))
      assert(main.contains(op), f"missing fused op 0x$op%x in ${
        main.map(o => f"0x$o%x").mkString(" ")}")
    // the whole inner byte loop is the 7-op window ending at its
    // backward jump: JCmpLL LdATosBinLS LdLS JzRangeAnd StLBinLC
    // BinLCS Jmp
    val window = Seq(0x21f, 0x22d, 0x222, 0x230, 0x22c, 0x218, 0x200)
    assert(main.sliding(window.size).exists(_.toSeq == window),
      main.map(o => f"0x$o%x").mkString(" "))
  }
}
