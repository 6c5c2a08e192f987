package graft.wasm

import org.scalatest.funsuite.AnyFunSuite

import WasmAssembler.{body, module, Func, Export, Body}
import WasmInterp.{instantiate, HostFunc}
import WasmModule.I64

/**
 * Property test for the flat-compiled interpreter: random expression
 * programs are built twice — once as a Scala evaluator, once as a
 * genuine wasm binary through the assembler — and every (program,
 * inputs) pair must agree. This drives the whole pipeline
 * (assemble → decode → FlatCompiler → dispatch loop) through shapes
 * no hand-written vector enumerates: deeply nested arithmetic,
 * value-carrying if/else, local get/set/tee chains, and the peephole
 * superinstruction fusions (local/local, local/const, fused branch
 * tests) interleaved at random.
 */
class WasmPropertySpec extends AnyFunSuite {

  private val noHost = Map.empty[(String, String), HostFunc]

  /** A random i64 expression over 2 params + 2 locals, emitted in
    * parallel into a Scala closure and the wasm body. Division is
    * excluded (trap semantics tested separately); shifts mask to 0-63
    * like wasm itself. */
  private final class Gen(rnd: scala.util.Random, b: Body) {
    // locals: 0,1 = params; 2,3 = scratch (written before any read)
    private var scratchWritten = 0

    def expr(depth: Int, env: Array[Long]): Long = {
      val choice = if (depth <= 0) rnd.nextInt(3) else rnd.nextInt(10)
      choice match {
        case 0 => // constant
          val c = rnd.nextLong() >> rnd.nextInt(40)
          b.i64Const(c); c
        case 1 => // param
          val i = rnd.nextInt(2)
          b.localGet(i); env(i)
        case 2 => // scratch local (written first if never set)
          if (scratchWritten == 0) { b.i64Const(7); b.localSet(2)
            env(2) = 7; scratchWritten = 1 }
          val i = 2 + rnd.nextInt(scratchWritten)
          b.localGet(i); env(i)
        case 3 => // tee into scratch
          val v = expr(depth - 1, env)
          val i = 2 + rnd.nextInt(2)
          b.localTee(i); env(i) = v
          if (i == 2 && scratchWritten == 0) scratchWritten = 1
          if (i == 3 && scratchWritten <= 1) scratchWritten = 2
          v
        case 4 => // if/else with i64 result
          val c = expr(depth - 1, env)
          // wasm brIf/if consume an I32 condition; compare the i64
          b.i64Const(0L); b.op(0x52) // i64.ne
          b.ifOp(0x7e)
          val snapshot = env.clone()
          val t = expr(depth - 1, env)
          val envT = env.clone()
          b.elseOp()
          // the untaken arm must not leak locals: restore for tracking
          Array.copy(snapshot, 0, env, 0, env.length)
          val e = expr(depth - 1, env)
          val envE = env.clone()
          b.end()
          val taken = c != 0L
          Array.copy(if (taken) envT else envE, 0, env, 0, env.length)
          if (taken) t else e
        case _ => // binary op
          val a = expr(depth - 1, env)
          val c = expr(depth - 1, env)
          rnd.nextInt(8) match {
            case 0 => b.op(0x7c); a + c
            case 1 => b.op(0x7d); a - c
            case 2 => b.op(0x7e); a * c
            case 3 => b.op(0x83); a & c
            case 4 => b.op(0x84); a | c
            case 5 => b.op(0x85); a ^ c
            case 6 => b.op(0x86); a << c
            case 7 => b.op(0x87); a >> c
          }
      }
    }
  }

  test("random expression programs agree with the Scala evaluator") {
    val rnd = new scala.util.Random(2026)
    var programs = 0
    while (programs < 60) {
      val inputs = Array(rnd.nextLong() >> rnd.nextInt(32),
        rnd.nextLong() >> rnd.nextInt(32))
      val bb = body()
      val env = Array(inputs(0), inputs(1), 0L, 0L)
      val gen = new Gen(rnd, bb)
      val want = gen.expr(depth = 5, env)
      val bytes = module(
        types = Seq((Seq(I64, I64), Seq(I64))),
        imports = Nil,
        funcs = Seq(Func(0, 0, 2, bb)),
        memPages = 1,
        exports = Seq(Export("f", 0)))
      val got = instantiate(bytes, noHost).invokeExport("f", inputs).head
      assert(got === want, s"program $programs inputs ${inputs.toList}")
      programs += 1
    }
  }

  test("random range-check programs: fused two-comparison tests agree") {
    // drives the RangeAnd/RangeOr superinstructions and their fused
    // conditional-jump forms (JzRangeAnd/Or): two i32 local-vs-const
    // comparisons combined by and/or, randomly either returned as a
    // value (Range* push path) or feeding an if (Jz* rewrite path)
    import WasmModule.I32
    val cmps: Seq[(Int, (Int, Int) => Boolean)] = Seq(
      (0x46, (a, b) => a == b), (0x47, (a, b) => a != b),
      (0x48, (a, b) => a < b), (0x4a, (a, b) => a > b),
      (0x4c, (a, b) => a <= b), (0x4e, (a, b) => a >= b),
      (0x49, (a, b) => java.lang.Integer.compareUnsigned(a, b) < 0),
      (0x4b, (a, b) => java.lang.Integer.compareUnsigned(a, b) > 0))
    val rnd = new scala.util.Random(414)
    for (trial <- 0 until 120) {
      val (op1, f1) = cmps(rnd.nextInt(cmps.size))
      val (op2, f2) = cmps(rnd.nextInt(cmps.size))
      val c1 = rnd.nextInt() >> rnd.nextInt(24)
      val c2 = rnd.nextInt() >> rnd.nextInt(24)
      val useAnd = rnd.nextBoolean()
      val viaIf = rnd.nextBoolean()
      val sameLocal = rnd.nextBoolean() // x in [c1, c2] vs two locals
      val b = body()
      b.localGet(0).i32Const(c1).op(op1)
      b.localGet(if (sameLocal) 0 else 1).i32Const(c2).op(op2)
      b.op(if (useAnd) 0x71 else 0x72)
      if (viaIf) {
        b.ifOp(0x7f)
        b.i32Const(17)
        b.elseOp()
        b.i32Const(-5)
        b.end()
      }
      val bytes = module(
        types = Seq((Seq(I32, I32), Seq(I32))),
        imports = Nil,
        funcs = Seq(Func(0, 0, 0, b)),
        memPages = 1,
        exports = Seq(Export("f", 0)))
      val x = rnd.nextInt() >> rnd.nextInt(24)
      val y = rnd.nextInt() >> rnd.nextInt(24)
      val t1 = if (f1(x, c1)) 1 else 0
      val t2 = if (f2(if (sameLocal) x else y, c2)) 1 else 0
      val comb = if (useAnd) t1 & t2 else t1 | t2
      val want = if (viaIf) { if (comb != 0) 17 else -5 } else comb
      val got = instantiate(bytes, noHost)
        .invokeExport("f", Array(x.toLong, y.toLong)).head.toInt
      assert(got === want,
        s"trial $trial x=$x y=$y c1=$c1 c2=$c2 op1=$op1%x op2=$op2%x " +
          s"and=$useAnd if=$viaIf same=$sameLocal")
    }
  }

  test("random float memory-run programs agree bit-exactly") {
    // drives f32/f64 load→modify→store runs through the memory-run
    // superinstruction window (LdA/LdL/TosBinC/store fusions) that the
    // integer property fleet and the hand-written vectors only
    // spot-check for floats: random slot tables are initialized with
    // const stores, then mutated by random add/sub/mul chains against
    // constants, addressed half the time by absolute const and half via
    // a base local + offset immediate (the two fusion shapes). The
    // result is read back via reinterpret so comparison is BIT-exact.
    // Constants are small integers, so no intermediate overflows to
    // inf/NaN (whose payload bits the Scala model could not mirror).
    import WasmModule.I64
    val rnd = new scala.util.Random(1515)
    def f64Const(b: Body, v: Double): Unit = {
      b.op(0x44)
      val bits = java.lang.Double.doubleToLongBits(v)
      b.raw(Array.tabulate(8)(i => ((bits >>> (8 * i)) & 0xff).toByte))
      ()
    }
    def f32Const(b: Body, v: Float): Unit = {
      b.op(0x43)
      val bits = java.lang.Float.floatToIntBits(v)
      b.raw(Array.tabulate(4)(i => ((bits >>> (8 * i)) & 0xff).toByte))
      ()
    }
    for (trial <- 0 until 60) {
      val wide = rnd.nextBoolean() // f64 vs f32
      val stride = if (wide) 8 else 4
      val slots = 2 + rnd.nextInt(6)
      val viaLocal = rnd.nextBoolean() // base-local+offset vs abs const
      val b = body()
      val model = Array.fill(slots)(0.0) // f32 modeled through Float
      def emitLoad(slot: Int): Unit = {
        if (viaLocal) { b.localGet(0); () } else { b.i32Const(slot * stride); () }
        b.op(if (wide) 0x2b else 0x2a)
        b.uleb(if (wide) 3 else 2)
        b.uleb(if (viaLocal) slot * stride else 0)
        ()
      }
      def emitStoreAddr(slot: Int): Unit = {
        if (viaLocal) { b.localGet(0); () } else { b.i32Const(slot * stride); () }
        ()
      }
      def emitStoreOp(slot: Int): Unit = {
        b.op(if (wide) 0x39 else 0x38)
        b.uleb(if (wide) 3 else 2)
        b.uleb(if (viaLocal) slot * stride else 0)
        ()
      }
      // init: const stores (the StAC fusion shape when abs-addressed)
      for (i <- 0 until slots) {
        val v = (rnd.nextInt(129) - 64).toDouble
        emitStoreAddr(i)
        if (wide) f64Const(b, v) else f32Const(b, v.toFloat)
        emitStoreOp(i)
        model(i) = if (wide) v else v.toFloat.toDouble
      }
      // modify run: slot op= const, random slot/op/const per step
      val steps = 1 + rnd.nextInt(16)
      for (_ <- 0 until steps) {
        val s = rnd.nextInt(slots)
        val c = (rnd.nextInt(17) - 8).toDouble
        val opi = rnd.nextInt(3) // add, sub, mul
        emitStoreAddr(s)
        emitLoad(s)
        if (wide) f64Const(b, c) else f32Const(b, c.toFloat)
        b.op(if (wide) 0xa0 + opi else 0x92 + opi)
        emitStoreOp(s)
        val cur = model(s)
        val next =
          if (wide) (opi: @unchecked) match {
            case 0 => cur + c; case 1 => cur - c; case 2 => cur * c
          } else {
            val cf = cur.toFloat; val ccf = c.toFloat
            ((opi: @unchecked) match {
              case 0 => cf + ccf; case 1 => cf - ccf; case 2 => cf * ccf
            }).toDouble
          }
        model(s) = next
      }
      // read one slot back, reinterpret to integer bits
      val out = rnd.nextInt(slots)
      emitLoad(out)
      if (wide) b.op(0xbd) // i64.reinterpret_f64
      else { b.op(0xbc); b.op(0xad) } // i32.reinterpret_f32; i64.extend_i32_u
      val bytes = module(
        types = Seq((Seq(I64, I64), Seq(I64))),
        imports = Nil,
        funcs = Seq(Func(0, 0, 0, b)),
        memPages = 1,
        exports = Seq(Export("f", 0)))
      val want =
        if (wide) java.lang.Double.doubleToLongBits(model(out))
        else java.lang.Float.floatToIntBits(model(out).toFloat).toLong & 0xffffffffL
      val got = instantiate(bytes, noHost).invokeExport("f", Array(0L, 0L)).head
      assert(got === want,
        s"trial $trial wide=$wide slots=$slots steps=$steps viaLocal=$viaLocal out=$out")
    }
  }

  test("random loop programs: iterated accumulator agrees") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 25) {
      val iters = 1 + rnd.nextInt(50)
      val mul = rnd.nextLong() >> 40
      val add = rnd.nextLong() >> 40
      // acc = p0; repeat iters: acc = acc * mul + add (wasm loop with
      // a counter in a local, fused compare-branch shapes)
      val b = body()
        .localGet(0).localSet(2)          // acc
        .i64Const(iters.toLong).localSet(3) // n
        .block()
          .loop()
            .localGet(3).op(0x50).brIf(1) // i64.eqz n -> exit
            .localGet(2).i64Const(mul).op(0x7e)
            .i64Const(add).op(0x7c).localSet(2)
            .localGet(3).i64Const(1L).op(0x7d).localSet(3)
            .br(0)
          .end()
        .end()
        .localGet(2)
      val bytes = module(
        types = Seq((Seq(I64, I64), Seq(I64))),
        imports = Nil,
        funcs = Seq(Func(0, 0, 2, b)),
        memPages = 1,
        exports = Seq(Export("f", 0)))
      val p0 = rnd.nextLong() >> 30
      var want = p0
      (0 until iters).foreach(_ => want = want * mul + add)
      val got = instantiate(bytes, noHost).invokeExport("f", Array(p0, 0L)).head
      assert(got === want, s"trial $trial iters=$iters")
    }
  }
}
