package graft.wasm

import org.scalatest.funsuite.AnyFunSuite

import WasmAssembler.{body, module, Func, Export, Data}
import WasmInterp.{instantiate, Instance, HostFunc, WasmTrap}
import WasmModule.{I32, I64, F32, F64}

/**
 * Assertion vectors ported from the official WebAssembly core test
 * suite (`test/core/{i32,i64,f32,f64,conversions,int_exprs,memory,
 * br_table,call_indirect}.wast` — public spec knowledge). Each
 * category assembles ONE genuine binary with one exported function
 * per opcode, decodes it, and drives the interpreter through the
 * spec's required results and traps — the instruction-set corners
 * the golden transform guests never reach (unsigned division edges,
 * shift masking, rotates, NaN propagation, signed-zero min/max,
 * trunc overflow traps, saturating trunc clamps, sign-extension ops,
 * reinterpret bit-exactness, br_table clamping, call_indirect type
 * checks).
 */
class WasmSpecVectorsSpec extends AnyFunSuite {

  private val noHost = Map.empty[(String, String), HostFunc]
  private def nm(op: Int) = f"x$op%02x"

  private def binInst(pt: Byte, rt: Byte, ops: Seq[Int]): Instance =
    instantiate(module(
      types = Seq((Seq(pt, pt), Seq(rt))),
      imports = Nil,
      funcs = ops.map(op => Func(0, 0, 0, body().localGet(0).localGet(1).op(op))),
      memPages = 1,
      exports = ops.zipWithIndex.map { case (op, i) => Export(nm(op), i) }), noHost)

  private def unInst(pt: Byte, rt: Byte, ops: Seq[Int]): Instance =
    instantiate(module(
      types = Seq((Seq(pt), Seq(rt))),
      imports = Nil,
      funcs = ops.map(op => Func(0, 0, 0, body().localGet(0).op(op))),
      memPages = 1,
      exports = ops.zipWithIndex.map { case (op, i) => Export(nm(op), i) }), noHost)

  private def chk(inst: Instance, op: Int, args: Seq[Long], want: Long): Unit = {
    val got = inst.invokeExport(nm(op), args.toArray).head
    assert(got === want, f"op 0x$op%02x(${args.mkString(",")}) = $got, want $want")
  }
  private def trapChk(inst: Instance, op: Int, args: Seq[Long], msg: String): Unit = {
    val t = intercept[WasmTrap] { inst.invokeExport(nm(op), args.toArray) }
    assert(t.getMessage.contains(msg), f"op 0x$op%02x: ${t.getMessage}")
  }

  private def fb(x: Float): Long = java.lang.Float.floatToRawIntBits(x).toLong
  private def db(x: Double): Long = java.lang.Double.doubleToRawLongBits(x)
  private def isNaN32(bits: Long): Boolean =
    java.lang.Float.intBitsToFloat(bits.toInt).isNaN
  private def isNaN64(bits: Long): Boolean =
    java.lang.Double.longBitsToDouble(bits).isNaN

  // ------------------------------------------------------------- i32

  test("i32 binary ops: add/sub/mul/div/rem/bitwise/shifts/rotates (i32.wast)") {
    val ops = Seq(0x6a, 0x6b, 0x6c, 0x6d, 0x6e, 0x6f, 0x70, 0x71, 0x72, 0x73,
      0x74, 0x75, 0x76, 0x77, 0x78)
    val m = binInst(I32, I32, ops)
    def i(x: Int): Long = x.toLong
    // add
    chk(m, 0x6a, Seq(i(1), i(1)), i(2))
    chk(m, 0x6a, Seq(i(-1), i(-1)), i(-2))
    chk(m, 0x6a, Seq(i(0x7fffffff), i(1)), i(0x80000000))
    chk(m, 0x6a, Seq(i(0x80000000), i(0x80000000)), i(0))
    // sub
    chk(m, 0x6b, Seq(i(1), i(1)), i(0))
    chk(m, 0x6b, Seq(i(0x80000000), i(1)), i(0x7fffffff))
    // mul
    chk(m, 0x6c, Seq(i(0x10000000), i(4096)), i(0))
    chk(m, 0x6c, Seq(i(0x7fffffff), i(-1)), i(0x80000001))
    chk(m, 0x6c, Seq(i(0x01234567), i(0x76543210)), i(0x358e7470))
    // div_s
    chk(m, 0x6d, Seq(i(7), i(3)), i(2))
    chk(m, 0x6d, Seq(i(-7), i(3)), i(-2))
    chk(m, 0x6d, Seq(i(7), i(-3)), i(-2))
    chk(m, 0x6d, Seq(i(0x80000000), i(2)), i(0xc0000000))
    trapChk(m, 0x6d, Seq(i(1), i(0)), "divide by zero")
    trapChk(m, 0x6d, Seq(i(0x80000000), i(-1)), "integer overflow")
    // div_u
    chk(m, 0x6e, Seq(i(7), i(3)), i(2))
    chk(m, 0x6e, Seq(i(0x80000000), i(2)), i(0x40000000))
    chk(m, 0x6e, Seq(i(-1), i(2)), i(0x7fffffff))
    chk(m, 0x6e, Seq(i(0x8ff00ff0), i(0x10001)), i(0x8fef))
    trapChk(m, 0x6e, Seq(i(1), i(0)), "divide by zero")
    // rem_s
    chk(m, 0x6f, Seq(i(7), i(3)), i(1))
    chk(m, 0x6f, Seq(i(-7), i(3)), i(-1))
    chk(m, 0x6f, Seq(i(7), i(-3)), i(1))
    chk(m, 0x6f, Seq(i(0x80000000), i(-1)), i(0)) // no trap per spec
    trapChk(m, 0x6f, Seq(i(1), i(0)), "divide by zero")
    // rem_u
    chk(m, 0x70, Seq(i(-1), i(2)), i(1))
    chk(m, 0x70, Seq(i(0x80000000), i(2)), i(0))
    chk(m, 0x70, Seq(i(0x8ff00ff0), i(0x10001)), i(0x8001))
    // and / or / xor
    chk(m, 0x71, Seq(i(0x7fffffff), i(0x80000000)), i(0))
    chk(m, 0x71, Seq(i(0xf0f0ffff), i(0xfffff0f0)), i(0xf0f0f0f0))
    chk(m, 0x72, Seq(i(0x7fffffff), i(0x80000000)), i(-1))
    chk(m, 0x72, Seq(i(0x80000000), i(0)), i(0x80000000))
    chk(m, 0x73, Seq(i(0xf0f0ffff), i(0xfffff0f0)), i(0x0f0f0f0f))
    chk(m, 0x73, Seq(i(-1), i(0x80000000)), i(0x7fffffff))
    // shl: the count is taken mod 32
    chk(m, 0x74, Seq(i(1), i(1)), i(2))
    chk(m, 0x74, Seq(i(0x7fffffff), i(1)), i(0xfffffffe))
    chk(m, 0x74, Seq(i(1), i(32)), i(1))
    chk(m, 0x74, Seq(i(1), i(31)), i(0x80000000))
    // shr_s
    chk(m, 0x75, Seq(i(-1), i(1)), i(-1))
    chk(m, 0x75, Seq(i(0x7fffffff), i(1)), i(0x3fffffff))
    chk(m, 0x75, Seq(i(0x80000000), i(1)), i(0xc0000000))
    chk(m, 0x75, Seq(i(1), i(32)), i(1))
    // shr_u
    chk(m, 0x76, Seq(i(-1), i(1)), i(0x7fffffff))
    chk(m, 0x76, Seq(i(0x80000000), i(31)), i(1))
    chk(m, 0x76, Seq(i(1), i(32)), i(1))
    // rotl / rotr
    chk(m, 0x77, Seq(i(0xabcd9876), i(1)), i(0x579b30ed))
    chk(m, 0x77, Seq(i(0xfe00dc00), i(4)), i(0xe00dc00f))
    chk(m, 0x77, Seq(i(1), i(32)), i(1))
    chk(m, 0x78, Seq(i(0xff00cc00), i(1)), i(0x7f806600))
    chk(m, 0x78, Seq(i(0x00080000), i(4)), i(0x00008000))
    chk(m, 0x78, Seq(i(1), i(1)), i(0x80000000))
  }

  test("i32 comparisons: signed vs unsigned orderings (i32.wast)") {
    val ops = Seq(0x46, 0x47, 0x48, 0x49, 0x4a, 0x4b, 0x4c, 0x4d, 0x4e, 0x4f)
    val m = binInst(I32, I32, ops)
    def i(x: Int): Long = x.toLong
    chk(m, 0x46, Seq(i(0), i(0)), 1); chk(m, 0x46, Seq(i(1), i(0)), 0)
    chk(m, 0x46, Seq(i(0x80000000), i(0x80000000)), 1)
    chk(m, 0x47, Seq(i(1), i(0)), 1); chk(m, 0x47, Seq(i(0), i(0)), 0)
    // lt_s vs lt_u disagree across the sign boundary
    chk(m, 0x48, Seq(i(-1), i(0)), 1); chk(m, 0x49, Seq(i(-1), i(0)), 0)
    chk(m, 0x48, Seq(i(0x80000000), i(0x7fffffff)), 1)
    chk(m, 0x49, Seq(i(0x80000000), i(0x7fffffff)), 0)
    chk(m, 0x4a, Seq(i(0), i(-1)), 1); chk(m, 0x4b, Seq(i(0), i(-1)), 0)
    chk(m, 0x4c, Seq(i(0x80000000), i(0x80000000)), 1)
    chk(m, 0x4d, Seq(i(-1), i(-1)), 1)
    chk(m, 0x4e, Seq(i(0x7fffffff), i(0x80000000)), 1)
    chk(m, 0x4f, Seq(i(0x80000000), i(0x7fffffff)), 1)
    chk(m, 0x4f, Seq(i(0), i(0x80000000)), 0)
  }

  test("i32 unary: eqz/clz/ctz/popcnt/extend8_s/extend16_s") {
    val m = unInst(I32, I32, Seq(0x45, 0x67, 0x68, 0x69, 0xc0, 0xc1))
    def i(x: Int): Long = x.toLong
    chk(m, 0x45, Seq(i(0)), 1); chk(m, 0x45, Seq(i(1)), 0)
    chk(m, 0x45, Seq(i(0x80000000)), 0)
    chk(m, 0x67, Seq(i(0xffffffff)), 0); chk(m, 0x67, Seq(i(0)), 32)
    chk(m, 0x67, Seq(i(0x00008000)), 16); chk(m, 0x67, Seq(i(1)), 31)
    chk(m, 0x68, Seq(i(-1)), 0); chk(m, 0x68, Seq(i(0)), 32)
    chk(m, 0x68, Seq(i(0x00008000)), 15); chk(m, 0x68, Seq(i(0x80000000)), 31)
    chk(m, 0x69, Seq(i(-1)), 32); chk(m, 0x69, Seq(i(0)), 0)
    chk(m, 0x69, Seq(i(0x55555555)), 16); chk(m, 0x69, Seq(i(0xdeadbeef)), 24)
    chk(m, 0xc0, Seq(i(0)), 0); chk(m, 0xc0, Seq(i(0x7f)), 127)
    chk(m, 0xc0, Seq(i(0x80)), -128); chk(m, 0xc0, Seq(i(0xff)), -1)
    chk(m, 0xc0, Seq(i(0x01234500)), 0)
    chk(m, 0xc1, Seq(i(0x8000)), -32768); chk(m, 0xc1, Seq(i(0x7fff)), 32767)
    chk(m, 0xc1, Seq(i(0xffff)), -1); chk(m, 0xc1, Seq(i(0x01230000)), 0)
  }

  // ------------------------------------------------------------- i64

  test("i64 binary ops (i64.wast)") {
    val ops = Seq(0x7c, 0x7d, 0x7e, 0x7f, 0x80, 0x81, 0x82, 0x83, 0x84, 0x85,
      0x86, 0x87, 0x88, 0x89, 0x8a)
    val m = binInst(I64, I64, ops)
    chk(m, 0x7c, Seq(1L, 1L), 2L)
    chk(m, 0x7c, Seq(0x7fffffffffffffffL, 1L), Long.MinValue)
    chk(m, 0x7d, Seq(Long.MinValue, 1L), 0x7fffffffffffffffL)
    chk(m, 0x7e, Seq(0x0123456789abcdefL, 0xfedcba9876543210L), 0x2236d88fe5618cf0L)
    chk(m, 0x7f, Seq(7L, 3L), 2L); chk(m, 0x7f, Seq(-7L, 3L), -2L)
    chk(m, 0x7f, Seq(Long.MinValue, 2L), 0xc000000000000000L)
    trapChk(m, 0x7f, Seq(1L, 0L), "divide by zero")
    trapChk(m, 0x7f, Seq(Long.MinValue, -1L), "integer overflow")
    chk(m, 0x80, Seq(-1L, 2L), 0x7fffffffffffffffL)
    chk(m, 0x80, Seq(Long.MinValue, 2L), 0x4000000000000000L)
    chk(m, 0x81, Seq(Long.MinValue, -1L), 0L)
    chk(m, 0x81, Seq(7L, -3L), 1L)
    chk(m, 0x82, Seq(-1L, 2L), 1L)
    chk(m, 0x83, Seq(0x7fffffffffffffffL, Long.MinValue), 0L)
    chk(m, 0x84, Seq(Long.MinValue, 0L), Long.MinValue)
    chk(m, 0x85, Seq(-1L, Long.MinValue), 0x7fffffffffffffffL)
    chk(m, 0x86, Seq(1L, 64L), 1L) // count mod 64
    chk(m, 0x86, Seq(1L, 63L), Long.MinValue)
    chk(m, 0x87, Seq(-1L, 1L), -1L)
    chk(m, 0x87, Seq(Long.MinValue, 1L), 0xc000000000000000L)
    chk(m, 0x88, Seq(-1L, 1L), 0x7fffffffffffffffL)
    chk(m, 0x88, Seq(1L, 64L), 1L)
    chk(m, 0x89, Seq(0xabcd987602468aceL, 1L), 0x579b30ec048d159dL)
    chk(m, 0x89, Seq(1L, 64L), 1L)
    chk(m, 0x8a, Seq(0xabcd987602468aceL, 1L), 0x55e6cc3b01234567L)
    chk(m, 0x8a, Seq(1L, 1L), Long.MinValue)
  }

  test("i64 comparisons and unary") {
    val cmp = binInst(I64, I32, Seq(0x51, 0x52, 0x53, 0x54, 0x55, 0x56, 0x57,
      0x58, 0x59, 0x5a))
    chk(cmp, 0x51, Seq(Long.MinValue, Long.MinValue), 1)
    chk(cmp, 0x52, Seq(Long.MinValue, 0x7fffffffffffffffL), 1)
    chk(cmp, 0x53, Seq(Long.MinValue, 0x7fffffffffffffffL), 1) // lt_s
    chk(cmp, 0x54, Seq(Long.MinValue, 0x7fffffffffffffffL), 0) // lt_u
    chk(cmp, 0x55, Seq(0L, -1L), 1)  // gt_s
    chk(cmp, 0x56, Seq(0L, -1L), 0)  // gt_u
    chk(cmp, 0x57, Seq(-1L, -1L), 1)
    chk(cmp, 0x58, Seq(-1L, 0L), 0)  // le_u: 2^64-1 <= 0 is false
    chk(cmp, 0x59, Seq(0x7fffffffffffffffL, Long.MinValue), 1)
    chk(cmp, 0x5a, Seq(Long.MinValue, 0x7fffffffffffffffL), 1) // ge_u
    val eqz = unInst(I64, I32, Seq(0x50))
    chk(eqz, 0x50, Seq(0L), 1); chk(eqz, 0x50, Seq(Long.MinValue), 0)
    val un = unInst(I64, I64, Seq(0x79, 0x7a, 0x7b, 0xc2, 0xc3, 0xc4))
    chk(un, 0x79, Seq(0xffffffffffffffffL), 0); chk(un, 0x79, Seq(0L), 64)
    chk(un, 0x79, Seq(0x8000L), 48); chk(un, 0x79, Seq(1L), 63)
    chk(un, 0x7a, Seq(-1L), 0); chk(un, 0x7a, Seq(0L), 64)
    chk(un, 0x7a, Seq(0x8000L), 15); chk(un, 0x7a, Seq(Long.MinValue), 63)
    chk(un, 0x7b, Seq(-1L), 64); chk(un, 0x7b, Seq(0x5555555555555555L), 32)
    chk(un, 0x7b, Seq(0xdeadbeefdeadbeefL), 48)
    chk(un, 0xc2, Seq(0x80L), -128); chk(un, 0xc2, Seq(0x7fL), 127)
    chk(un, 0xc3, Seq(0x8000L), -32768); chk(un, 0xc3, Seq(0x7fffL), 32767)
    chk(un, 0xc4, Seq(0x80000000L), -2147483648L)
    chk(un, 0xc4, Seq(0x7fffffffL), 2147483647L)
    chk(un, 0xc4, Seq(0x0123456700000000L), 0L)
  }

  // ------------------------------------------------------------- floats

  test("f32 arithmetic: signed zeros, NaN propagation, min/max (f32.wast)") {
    val m = binInst(F32, F32, Seq(0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98))
    chk(m, 0x92, Seq(fb(1.0f), fb(2.0f)), fb(3.0f))
    chk(m, 0x92, Seq(fb(-0.0f), fb(0.0f)), fb(0.0f))
    chk(m, 0x92, Seq(fb(-0.0f), fb(-0.0f)), fb(-0.0f))
    assert(isNaN32(m.invokeExport(nm(0x92),
      Array(fb(Float.PositiveInfinity), fb(Float.NegativeInfinity))).head))
    chk(m, 0x93, Seq(fb(1.0f), fb(1.0f)), fb(0.0f))
    chk(m, 0x94, Seq(fb(1.5f), fb(2.0f)), fb(3.0f))
    assert(isNaN32(m.invokeExport(nm(0x94),
      Array(fb(0.0f), fb(Float.PositiveInfinity))).head))
    chk(m, 0x95, Seq(fb(1.0f), fb(3.0f)), fb(1.0f / 3.0f))
    chk(m, 0x95, Seq(fb(1.0f), fb(0.0f)), fb(Float.PositiveInfinity))
    chk(m, 0x95, Seq(fb(-1.0f), fb(0.0f)), fb(Float.NegativeInfinity))
    assert(isNaN32(m.invokeExport(nm(0x95), Array(fb(0.0f), fb(0.0f))).head))
    // min/max: -0 orders below +0; NaN is sticky
    chk(m, 0x96, Seq(fb(-0.0f), fb(0.0f)), fb(-0.0f))
    chk(m, 0x96, Seq(fb(1.0f), fb(2.0f)), fb(1.0f))
    assert(isNaN32(m.invokeExport(nm(0x96), Array(fb(Float.NaN), fb(1.0f))).head))
    chk(m, 0x97, Seq(fb(-0.0f), fb(0.0f)), fb(0.0f))
    assert(isNaN32(m.invokeExport(nm(0x97), Array(fb(1.0f), fb(Float.NaN))).head))
    chk(m, 0x98, Seq(fb(1.0f), fb(-2.0f)), fb(-1.0f))
    chk(m, 0x98, Seq(fb(-1.0f), fb(2.0f)), fb(1.0f))
    chk(m, 0x98, Seq(fb(0.0f), fb(-0.0f)), fb(-0.0f))
  }

  test("f32 unary: abs/neg/ceil/floor/trunc/nearest/sqrt") {
    val m = unInst(F32, F32, Seq(0x8b, 0x8c, 0x8d, 0x8e, 0x8f, 0x90, 0x91))
    chk(m, 0x8b, Seq(fb(-1.0f)), fb(1.0f))
    chk(m, 0x8b, Seq(fb(-0.0f)), fb(0.0f))
    chk(m, 0x8c, Seq(fb(0.0f)), fb(-0.0f))
    chk(m, 0x8c, Seq(fb(Float.NegativeInfinity)), fb(Float.PositiveInfinity))
    chk(m, 0x8d, Seq(fb(1.5f)), fb(2.0f)); chk(m, 0x8d, Seq(fb(-1.5f)), fb(-1.0f))
    chk(m, 0x8d, Seq(fb(-0.5f)), fb(-0.0f))
    chk(m, 0x8e, Seq(fb(1.5f)), fb(1.0f)); chk(m, 0x8e, Seq(fb(-1.5f)), fb(-2.0f))
    chk(m, 0x8f, Seq(fb(1.9f)), fb(1.0f)); chk(m, 0x8f, Seq(fb(-1.9f)), fb(-1.0f))
    // nearest rounds half to even
    chk(m, 0x90, Seq(fb(2.5f)), fb(2.0f)); chk(m, 0x90, Seq(fb(3.5f)), fb(4.0f))
    chk(m, 0x90, Seq(fb(-0.5f)), fb(-0.0f)); chk(m, 0x90, Seq(fb(4.5f)), fb(4.0f))
    chk(m, 0x91, Seq(fb(4.0f)), fb(2.0f))
    chk(m, 0x91, Seq(fb(-0.0f)), fb(-0.0f))
    assert(isNaN32(m.invokeExport(nm(0x91), Array(fb(-1.0f))).head))
  }

  test("f64 arithmetic, comparisons, unary (f64.wast)") {
    val bin = binInst(F64, F64, Seq(0xa0, 0xa1, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6))
    chk(bin, 0xa0, Seq(db(0.1), db(0.2)), db(0.1 + 0.2))
    chk(bin, 0xa0, Seq(db(-0.0), db(-0.0)), db(-0.0))
    chk(bin, 0xa1, Seq(db(1.0), db(0.5)), db(0.5))
    chk(bin, 0xa2, Seq(db(1e200), db(1e200)), db(Double.PositiveInfinity))
    chk(bin, 0xa3, Seq(db(1.0), db(0.0)), db(Double.PositiveInfinity))
    assert(isNaN64(bin.invokeExport(nm(0xa3), Array(db(0.0), db(0.0))).head))
    chk(bin, 0xa4, Seq(db(-0.0), db(0.0)), db(-0.0))
    assert(isNaN64(bin.invokeExport(nm(0xa4), Array(db(Double.NaN), db(0.0))).head))
    chk(bin, 0xa5, Seq(db(-0.0), db(0.0)), db(0.0))
    chk(bin, 0xa6, Seq(db(1.0), db(-0.0)), db(-1.0))
    val cmp = binInst(F64, I32, Seq(0x61, 0x62, 0x63, 0x64, 0x65, 0x66))
    chk(cmp, 0x61, Seq(db(0.0), db(-0.0)), 1) // +0 == -0
    chk(cmp, 0x61, Seq(db(Double.NaN), db(Double.NaN)), 0)
    chk(cmp, 0x62, Seq(db(Double.NaN), db(Double.NaN)), 1)
    chk(cmp, 0x63, Seq(db(Double.NaN), db(0.0)), 0) // NaN compares false
    chk(cmp, 0x63, Seq(db(Double.NegativeInfinity), db(-1e308)), 1)
    chk(cmp, 0x64, Seq(db(Double.PositiveInfinity), db(1e308)), 1)
    chk(cmp, 0x65, Seq(db(0.0), db(-0.0)), 1)
    chk(cmp, 0x66, Seq(db(Double.NaN), db(Double.NaN)), 0)
    val un = unInst(F64, F64, Seq(0x99, 0x9a, 0x9b, 0x9c, 0x9d, 0x9e, 0x9f))
    chk(un, 0x99, Seq(db(-0.0)), db(0.0))
    chk(un, 0x9a, Seq(db(0.0)), db(-0.0))
    chk(un, 0x9b, Seq(db(-0.25)), db(-0.0))
    chk(un, 0x9c, Seq(db(0.25)), db(0.0))
    chk(un, 0x9d, Seq(db(-1.75)), db(-1.0))
    chk(un, 0x9e, Seq(db(2.5)), db(2.0)); chk(un, 0x9e, Seq(db(-3.5)), db(-4.0))
    chk(un, 0x9f, Seq(db(1e14)), db(1e7))
  }

  // ------------------------------------------------------- conversions

  test("integer/float conversions and reinterprets (conversions.wast)") {
    def i(x: Int): Long = x.toLong
    // i32.wrap_i64
    val wrap = unInst(I64, I32, Seq(0xa7))
    chk(wrap, 0xa7, Seq(-1L), i(-1))
    chk(wrap, 0xa7, Seq(0x100000000L), i(0))
    chk(wrap, 0xa7, Seq(0xfedcba9876543210L), i(0x76543210))
    // i64.extend_i32
    val ext = unInst(I32, I64, Seq(0xac, 0xad))
    chk(ext, 0xac, Seq(i(0x7fffffff)), 0x7fffffffL)
    chk(ext, 0xac, Seq(i(0x80000000)), 0xffffffff80000000L)
    chk(ext, 0xad, Seq(i(0x80000000)), 0x0000000080000000L)
    chk(ext, 0xad, Seq(i(-1)), 0xffffffffL)
    // i32.trunc_f32_s/u: truncation + range traps
    val t32f = unInst(F32, I32, Seq(0xa8, 0xa9))
    chk(t32f, 0xa8, Seq(fb(1.5f)), i(1)); chk(t32f, 0xa8, Seq(fb(-1.5f)), i(-1))
    chk(t32f, 0xa8, Seq(fb(-2147483648.0f)), i(0x80000000))
    trapChk(t32f, 0xa8, Seq(fb(2147483648.0f)), "integer overflow")
    trapChk(t32f, 0xa8, Seq(fb(Float.NaN)), "invalid conversion")
    chk(t32f, 0xa9, Seq(fb(4294967040.0f)), i(-256))
    trapChk(t32f, 0xa9, Seq(fb(-1.0f)), "integer overflow")
    trapChk(t32f, 0xa9, Seq(fb(4294967296.0f)), "integer overflow")
    // i32.trunc_f64
    val t32d = unInst(F64, I32, Seq(0xaa, 0xab))
    chk(t32d, 0xaa, Seq(db(-2147483648.9)), i(0x80000000))
    trapChk(t32d, 0xaa, Seq(db(2147483648.0)), "integer overflow")
    chk(t32d, 0xab, Seq(db(4294967295.9)), i(-1))
    trapChk(t32d, 0xab, Seq(db(-1.0)), "integer overflow")
    // i64.trunc_f64_s/u
    val t64 = unInst(F64, I64, Seq(0xb0, 0xb1))
    chk(t64, 0xb0, Seq(db(-9223372036854775808.0)), Long.MinValue)
    trapChk(t64, 0xb0, Seq(db(9223372036854775808.0)), "integer overflow")
    chk(t64, 0xb1, Seq(db(9223372036854775808.0)), Long.MinValue) // 2^63 as u64
    chk(t64, 0xb1, Seq(db(18446744073709549568.0)), -2048L)
    trapChk(t64, 0xb1, Seq(db(-1.0)), "integer overflow")
    // f32.convert / f64.convert
    val cf32 = unInst(I32, F32, Seq(0xb2, 0xb3))
    chk(cf32, 0xb2, Seq(i(-1)), fb(-1.0f))
    chk(cf32, 0xb2, Seq(i(0x80000000)), fb(-2147483648.0f))
    chk(cf32, 0xb3, Seq(i(-1)), fb(4294967296.0f))
    chk(cf32, 0xb3, Seq(i(0x80000000)), fb(2147483648.0f))
    val cf64 = unInst(I64, F64, Seq(0xb9, 0xba))
    chk(cf64, 0xb9, Seq(Long.MinValue), db(-9223372036854775808.0))
    chk(cf64, 0xba, Seq(-1L), db(18446744073709551616.0))
    chk(cf64, 0xba, Seq(Long.MinValue), db(9223372036854775808.0))
    val cf32l = unInst(I64, F32, Seq(0xb4, 0xb5))
    chk(cf32l, 0xb4, Seq(9223372036854775807L), fb(9223372036854775807.0f))
    chk(cf32l, 0xb5, Seq(-1L), fb(18446744073709551616.0f))
    // demote / promote
    val dem = unInst(F64, F32, Seq(0xb6))
    chk(dem, 0xb6, Seq(db(1e300)), fb(Float.PositiveInfinity))
    chk(dem, 0xb6, Seq(db(-0.0)), fb(-0.0f))
    val pro = unInst(F32, F64, Seq(0xbb))
    chk(pro, 0xbb, Seq(fb(0.5f)), db(0.5))
    // reinterprets are bit-exact
    val ri32 = unInst(F32, I32, Seq(0xbc))
    chk(ri32, 0xbc, Seq(fb(1.0f)), i(0x3f800000))
    chk(ri32, 0xbc, Seq(fb(-0.0f)), i(0x80000000))
    val ri64 = unInst(F64, I64, Seq(0xbd))
    chk(ri64, 0xbd, Seq(db(1.0)), 0x3ff0000000000000L)
    val rf32 = unInst(I32, F32, Seq(0xbe))
    chk(rf32, 0xbe, Seq(i(0x3f800000)), fb(1.0f))
    val rf64 = unInst(I64, F64, Seq(0xbf))
    chk(rf64, 0xbf, Seq(0x4045000000000000L), db(42.0))
  }

  test("saturating truncation clamps instead of trapping (trunc_sat)") {
    def ts(pt: Byte, rt: Byte, sub: Int): Instance =
      instantiate(module(
        types = Seq((Seq(pt), Seq(rt))),
        imports = Nil,
        funcs = Seq(Func(0, 0, 0, body().localGet(0).op(0xfc).uleb(sub))),
        memPages = 1,
        exports = Seq(Export("f", 0))), noHost)
    def run(inst: Instance, arg: Long): Long = inst.invokeExport("f", Array(arg)).head
    val s0 = ts(F32, I32, 0) // i32.trunc_sat_f32_s
    assert(run(s0, fb(Float.NaN)) === 0L)
    assert(run(s0, fb(2147483648.0f)) === 2147483647L)
    assert(run(s0, fb(-2147483904.0f)) === -2147483648L)
    assert(run(s0, fb(1.5f)) === 1L)
    val s1 = ts(F32, I32, 1) // i32.trunc_sat_f32_u
    assert(run(s1, fb(-1.0f)) === 0L)
    assert(run(s1, fb(4294967296.0f)) === -1L) // 0xffffffff sign-extended
    val s2 = ts(F64, I32, 2)
    assert(run(s2, db(1e100)) === 2147483647L)
    assert(run(s2, db(-1e100)) === -2147483648L)
    val s3 = ts(F64, I32, 3)
    assert(run(s3, db(4294967295.9)) === -1L)
    assert(run(s3, db(Double.NaN)) === 0L)
    val s6 = ts(F64, I64, 6)
    assert(run(s6, db(1e100)) === Long.MaxValue)
    assert(run(s6, db(-1e100)) === Long.MinValue)
    val s7 = ts(F64, I64, 7)
    assert(run(s7, db(-1.0)) === 0L)
    assert(run(s7, db(1e100)) === -1L) // u64 max
    val s4 = ts(F32, I64, 4)
    assert(run(s4, fb(-9223373136366403584.0f)) === Long.MinValue)
    val s5 = ts(F32, I64, 5)
    assert(run(s5, fb(18446744073709551616.0f)) === -1L)
  }

  // ----------------------------------------------------------- control

  test("br_table selects by index and clamps to default (br_table.wast)") {
    // f(i): br_table over 3 arms returning 10/20/30, default 99
    val b = body()
      .block(0x7f)               // result block (the value home)
        .block().block().block().block()
          .localGet(0).brTable(Seq(0, 1, 2), 3)
        .end().i32Const(10).br(3)
        .end().i32Const(20).br(2)
        .end().i32Const(30).br(1)
        .end().i32Const(99)
      .end()
    val inst = instantiate(module(
      types = Seq((Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, b)),
      memPages = 1,
      exports = Seq(Export("f", 0))), noHost)
    assert(inst.invokeExport("f", Array(0L)).head === 10L)
    assert(inst.invokeExport("f", Array(1L)).head === 20L)
    assert(inst.invokeExport("f", Array(2L)).head === 30L)
    assert(inst.invokeExport("f", Array(3L)).head === 99L)
    assert(inst.invokeExport("f", Array(1000L)).head === 99L)
    assert(inst.invokeExport("f", Array(-1L)).head === 99L) // u32 index clamps
  }

  test("br_table arm targeting a loop head re-enters the loop (backward arm)") {
    // f(n): acc = 0; loop { if n == 0 exit; acc += n; n--;
    //   br_table[loop, exit](n > 0 ? 0 : 1) } — arm 0 is BACKWARD to the
    // loop head, arm 1 forward out of the block; computes sum 1..n
    val b = body()
      .i32Const(0).localSet(1)
      .block()
        .loop()
          .localGet(0).i32Eqz().brIf(1)
          .localGet(1).localGet(0).i32Add().localSet(1)
          .localGet(0).i32Const(1).i32Sub().localSet(0)
          .localGet(0).i32Const(0).i32GtS()
          .ifOp(0x7f).i32Const(0).elseOp().i32Const(1).end()
          .brTable(Seq(0), 1)
        .end()
      .end()
      .localGet(1)
    val inst = instantiate(module(
      types = Seq((Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 1, 0, b)),
      memPages = 1,
      exports = Seq(Export("f", 0))), noHost)
    assert(inst.invokeExport("f", Array(10L)).head === 55L)
    assert(inst.invokeExport("f", Array(1L)).head === 1L)
    assert(inst.invokeExport("f", Array(0L)).head === 0L)
  }

  test("call_indirect dispatches through the table; type mismatch traps") {
    // table = [add, mul, bad]; f(i, a, b) = table[i](a, b)
    val add = body().localGet(0).localGet(1).i32Add()
    val mul = body().localGet(0).localGet(1).i32Mul()
    val bad = body().i32Const(7) // () -> i32: wrong type for the call
    val disp = body().localGet(1).localGet(2).localGet(0).callIndirect(0)
    val inst = instantiate(module(
      types = Seq((Seq(I32, I32), Seq(I32)), (Seq.empty, Seq(I32)),
        (Seq(I32, I32, I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, add), Func(0, 0, 0, mul), Func(1, 0, 0, bad),
        Func(2, 0, 0, disp)),
      memPages = 1,
      exports = Seq(Export("f", 3)),
      tableFuncs = Seq(0, 1, 2)), noHost)
    assert(inst.invokeExport("f", Array(0L, 3L, 4L)).head === 7L)
    assert(inst.invokeExport("f", Array(1L, 3L, 4L)).head === 12L)
    val t1 = intercept[WasmTrap] { inst.invokeExport("f", Array(2L, 3L, 4L)) }
    assert(t1.getMessage.contains("type mismatch"))
    val t2 = intercept[WasmTrap] { inst.invokeExport("f", Array(9L, 3L, 4L)) }
    assert(t2.getMessage.contains("undefined"))
  }

  test("nested loops and early return") {
    // sum of i*j for i,j in [1,n] computed with nested loops + return
    val b = body()
      .i32Const(0).localSet(3)     // acc
      .i32Const(1).localSet(1)     // i
      .block()
        .loop()
          .localGet(1).localGet(0).i32GtS().brIf(1)
          .i32Const(1).localSet(2) // j
          .block()
            .loop()
              .localGet(2).localGet(0).i32GtS().brIf(1)
              .localGet(3).localGet(1).localGet(2).i32Mul().i32Add().localSet(3)
              .localGet(2).i32Const(1).i32Add().localSet(2)
              .br(0)
            .end()
          .end()
          .localGet(1).i32Const(1).i32Add().localSet(1)
          .br(0)
        .end()
      .end()
      .localGet(3)
    val inst = instantiate(module(
      types = Seq((Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 3, 0, b)),
      memPages = 1,
      exports = Seq(Export("f", 0))), noHost)
    // sum_{i,j<=n} i*j = (n(n+1)/2)^2
    assert(inst.invokeExport("f", Array(4L)).head === 100L)
    assert(inst.invokeExport("f", Array(10L)).head === 3025L)
    assert(inst.invokeExport("f", Array(0L)).head === 0L)
  }

  // ------------------------------------------------------------ memory

  test("memory loads honor offsets, widths and signs; OOB traps (memory.wast)") {
    // little-endian data at 0: 00 01 02 ... 0f, plus ff at 16
    val data = (0 until 16).map(_.toByte).toArray ++ Array(0xff.toByte)
    def loadFn(op: Int, off: Int) =
      Func(0, 0, 0, body().localGet(0).op(op).uleb(0).uleb(off))
    val ops = Seq(
      (0x28, 0), (0x28, 1), (0x2c, 0), (0x2d, 0), (0x2e, 0), (0x2f, 0),
      (0x29, 0), (0x30, 0), (0x31, 0), (0x32, 0), (0x33, 0), (0x34, 0), (0x35, 0))
    val inst = instantiate(module(
      types = Seq((Seq(I32), Seq(I64))),
      imports = Nil,
      funcs = ops.map { case (op, off) => loadFn(op, off) } :+
        // i32 result loads are exercised through i64.extend in the same
        // slot width, so one (i32)->i64 type serves every function
        Func(0, 0, 0, body().localGet(0).op(0x28).uleb(0).uleb(0).op(0xac)),
      memPages = 1,
      exports = ops.zipWithIndex.map { case ((op, off), i) =>
        Export(s"${nm(op)}_$off", i)
      } :+ Export("ld32ext", ops.size),
      datas = Seq(Data(0, data))), noHost)
    def ld(name: String, addr: Long): Long =
      inst.invokeExport(name, Array(addr)).head
    assert(ld("x28_0", 0) === 0x03020100L)
    assert(ld("x28_1", 0) === 0x04030201L) // static offset folds in
    assert(ld("x2c_0", 16) === -1L)        // load8_s of 0xff
    assert(ld("x2d_0", 16) === 0xffL)      // load8_u
    assert(ld("x2e_0", 15) === 0xff0fL - 0x10000L) // load16_s of 0f ff = 0xff0f signed
    assert(ld("x2f_0", 15) === 0xff0fL)    // load16_u
    assert(ld("x29_0", 0) === 0x0706050403020100L)
    assert(ld("x30_0", 16) === -1L)
    assert(ld("x31_0", 16) === 0xffL)
    assert(ld("x32_0", 15) === 0xff0fL - 0x10000L)
    assert(ld("x33_0", 15) === 0xff0fL)
    assert(ld("x34_0", 13) === 0xff0f0e0dL - 0x100000000L)
    assert(ld("x35_0", 13) === 0xff0f0e0dL)
    assert(ld("ld32ext", 4) === 0x07060504L)
    // out-of-bounds: last valid i32.load address is 65532
    assert(ld("x28_0", 65532) === 0L)
    intercept[WasmTrap] { ld("x28_0", 65533) }
    intercept[WasmTrap] { ld("x29_0", 65529) }
    intercept[WasmTrap] { ld("x2d_0", 65536) }
    // effective address overflow: addr + offset past the page
    intercept[WasmTrap] { ld("x28_1", 65532) }
  }

  test("narrow stores wrap the value; store/load round-trips (memory.wast)") {
    def storeFn(store: Int, load: Int) = Func(0, 0, 0,
      body().localGet(0).localGet(1)
        .op(store).uleb(0).uleb(0)
        .localGet(0).op(load).uleb(0).uleb(0))
    val pairs = Seq((0x3a, 0x2d), (0x3b, 0x2f), (0x36, 0x35),
      (0x3c, 0x31), (0x3d, 0x33), (0x3e, 0x35), (0x37, 0x29))
    val inst = instantiate(module(
      types = Seq((Seq(I32, I64), Seq(I64))),
      imports = Nil,
      funcs = pairs.map { case (st, ld) => storeFn(st, ld) },
      memPages = 1,
      exports = pairs.zipWithIndex.map { case ((st, _), i) => Export(nm(st), i) }),
      noHost)
    def rt(op: Int, v: Long): Long =
      inst.invokeExport(nm(op), Array(64L, v)).head
    assert(rt(0x3a, -1L) === 0xffL)                // i32.store8 wraps
    assert(rt(0x3a, 0x123L) === 0x23L)
    assert(rt(0x3b, 0x12345L) === 0x2345L)         // i32.store16
    assert(rt(0x36, 0x1234567890L) === 0x34567890L) // i32.store reads back u32
    assert(rt(0x3c, -1L) === 0xffL)                // i64.store8
    assert(rt(0x3d, 0xabcdef12L) === 0xef12L)      // i64.store16
    assert(rt(0x3e, -1L) === 0xffffffffL)          // i64.store32
    assert(rt(0x37, -1L) === -1L)                  // i64.store full width
    intercept[WasmTrap] {
      inst.invokeExport(nm(0x37), Array(65529L, 1L))
    }
  }

  test("f32/f64 loads and stores round-trip raw IEEE bits") {
    // st32(addr, bits) = f32.store then f32.load; st64 likewise
    def fn(store: Int, load: Int) = Func(0, 0, 0,
      body().localGet(0).localGet(1)
        .op(store).uleb(0).uleb(0)
        .localGet(0).op(load).uleb(0).uleb(0))
    val inst = instantiate(module(
      types = Seq((Seq(I32, I64), Seq(I64))),
      imports = Nil,
      funcs = Seq(fn(0x38, 0x2a), fn(0x39, 0x2b)),
      memPages = 1,
      exports = Seq(Export("f32rt", 0), Export("f64rt", 1))), noHost)
    def rt32(x: Float): Long =
      inst.invokeExport("f32rt", Array(64L, fb(x))).head
    def rt64(x: Double): Long =
      inst.invokeExport("f64rt", Array(64L, db(x))).head
    assert(rt32(1.5f) === fb(1.5f))
    assert(rt32(-0.0f) === fb(-0.0f))
    assert(isNaN32(rt32(Float.NaN)))
    assert(rt64(math.Pi) === db(math.Pi))
    assert(rt64(Double.NegativeInfinity) === db(Double.NegativeInfinity))
    // f32 store narrows: only 4 bytes written (the neighbor survives)
    val probe = instantiate(module(
      types = Seq((Seq.empty, Seq(I64))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, body()
        .i32Const(64).i64Const(-1L).op(0x37).uleb(0).uleb(0) // i64.store -1
        .i32Const(64).i32Const(0).op(0x38).uleb(0).uleb(0)   // f32.store 0.0
        .i32Const(64).op(0x29).uleb(0).uleb(0))),            // i64.load
      memPages = 1,
      exports = Seq(Export("f", 0))), noHost)
    assert(probe.invokeExport("f", Array.empty).head === 0xffffffff00000000L)
  }

  test("if/else with a value-typed result on both arms") {
    // f(c, a, b) = if (c) result i32 { a*2 } else { b+1 }
    val b = body()
      .localGet(0)
      .ifOp(0x7f)
        .localGet(1).i32Const(2).i32Mul()
      .elseOp()
        .localGet(2).i32Const(1).i32Add()
      .end()
    val inst = instantiate(module(
      types = Seq((Seq(I32, I32, I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, b)),
      memPages = 1,
      exports = Seq(Export("f", 0))), noHost)
    assert(inst.invokeExport("f", Array(1L, 21L, 100L)).head === 42L)
    assert(inst.invokeExport("f", Array(0L, 21L, 100L)).head === 101L)
    // branch OUT of a valued if-arm to the function label
    val early = body()
      .localGet(0)
      .ifOp(0x7f)
        .i32Const(7).ret()
      .elseOp()
        .i32Const(9)
      .end()
      .i32Const(1).i32Add()
    val inst2 = instantiate(module(
      types = Seq((Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, early)),
      memPages = 1,
      exports = Seq(Export("f", 0))), noHost)
    assert(inst2.invokeExport("f", Array(1L)).head === 7L)
    assert(inst2.invokeExport("f", Array(0L)).head === 10L)
  }

  test("globals: mutable counter persists across calls; i64 init decodes") {
    import WasmAssembler.Global
    // bump() = { g0 = g0 + 1; return g0 }; big() = g1 (i64 const init)
    val bump = body().globalGet(0).i32Const(1).i32Add().globalSet(0).globalGet(0)
    val big = body().globalGet(1)
    val inst = instantiate(module(
      types = Seq((Seq.empty, Seq(I32)), (Seq.empty, Seq(I64))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, bump), Func(1, 0, 0, big)),
      memPages = 1,
      exports = Seq(Export("bump", 0), Export("big", 1)),
      globals = Seq(Global(I32, mutable = true, 10),
        Global(I64, mutable = false, 0x123456789abL))), noHost)
    assert(inst.invokeExport("bump", Array.empty).head === 11L)
    assert(inst.invokeExport("bump", Array.empty).head === 12L)
    assert(inst.invokeExport("bump", Array.empty).head === 13L)
    assert(inst.invokeExport("big", Array.empty).head === 0x123456789abL)
    // a second instance of the same module starts from the init value
    val inst2 = instantiate(module(
      types = Seq((Seq.empty, Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0,
        body().globalGet(0).i32Const(1).i32Add().globalSet(0).globalGet(0))),
      memPages = 1,
      exports = Seq(Export("bump", 0)),
      globals = Seq(Global(I32, mutable = true, 0))), noHost)
    assert(inst2.invokeExport("bump", Array.empty).head === 1L)
  }

  test("memory.grow observes the declared max and memory.size tracks it") {
    val grow = body().localGet(0).memoryGrow()
    val size = body().memorySize()
    val inst = instantiate(module(
      types = Seq((Seq(I32), Seq(I32)), (Seq.empty, Seq(I32))),
      imports = Nil,
      funcs = Seq(Func(0, 0, 0, grow), Func(1, 0, 0, size)),
      memPages = 1,
      exports = Seq(Export("grow", 0), Export("size", 1))), noHost)
    assert(inst.invokeExport("size", Array.empty).head === 1L)
    assert(inst.invokeExport("grow", Array(1L)).head === 1L)  // old size
    assert(inst.invokeExport("grow", Array(0L)).head === 2L)  // grow 0 = probe
    assert(inst.invokeExport("size", Array.empty).head === 2L)
    assert(inst.invokeExport("grow", Array(-1L)).head === -1L) // negative fails
  }
}
