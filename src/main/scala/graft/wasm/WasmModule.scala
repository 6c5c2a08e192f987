package graft.wasm

import java.nio.{ByteBuffer, ByteOrder}

/**
 * WebAssembly 1.0 binary-format model + decoder (with the bulk-memory
 * and sign-extension extensions TinyGo/Rust SDK builds rely on).
 *
 * This is the repo's answer to the reference's guest-VM gap: the
 * reference embeds wasmtime (`wasm/wasmtime.cc`) and runs user
 * transforms compiled to `.wasm` (`wasm/transform_module.h:137-158`
 * is the host ABI). Here the module format is decoded directly from
 * the spec'd binary layout (sections 1-12, LEB128 integers, structured
 * control instructions) into an executable AST for
 * [[WasmInterp]]. No part of wasmtime's machinery is mirrored — a
 * tree-walking interpreter is enough to run SDK-shaped guests at
 * test scale, and the Spark side treats the whole VM as a per-executor
 * black box (broadcast module bytes, mapPartitions execution).
 */
object WasmModule {

  final case class FuncType(params: IndexedSeq[Byte], results: IndexedSeq[Byte])

  /** Value types (binary encodings): i32 0x7f, i64 0x7e, f32 0x7d, f64 0x7c,
    * funcref 0x70. */
  val I32: Byte = 0x7f.toByte
  val I64: Byte = 0x7e.toByte
  val F32: Byte = 0x7d.toByte
  val F64: Byte = 0x7c.toByte

  final case class Import(module: String, name: String, kind: Int, idx: Int)
  final case class Export(name: String, kind: Int, idx: Int)
  final case class Global(valType: Byte, mutable: Boolean, init: Vector[Instr])
  final case class DataSeg(memIdx: Int, offsetExpr: Vector[Instr], bytes: Array[Byte])
  final case class ElemSeg(tableIdx: Int, offsetExpr: Vector[Instr], funcIdxs: Vector[Int])
  final case class Code(locals: IndexedSeq[Byte], body: Vector[Instr])
  final case class Limits(min: Int, max: Option[Int])

  final case class Module(
      types: IndexedSeq[FuncType],
      imports: IndexedSeq[Import],
      // type indices of module-defined functions (import funcs precede)
      funcTypeIdxs: IndexedSeq[Int],
      tables: IndexedSeq[Limits],
      memories: IndexedSeq[Limits],
      globals: IndexedSeq[Global],
      exports: IndexedSeq[Export],
      start: Option[Int],
      elems: IndexedSeq[ElemSeg],
      codes: IndexedSeq[Code],
      datas: IndexedSeq[DataSeg]) {
    val importedFuncs: IndexedSeq[Import] = imports.filter(_.kind == 0)
    def numImportedFuncs: Int = importedFuncs.size
    /** Type of function index `i` in the unified (imports-first) space. */
    def funcType(i: Int): FuncType =
      if (i < numImportedFuncs) types(importedFuncs(i).idx)
      else types(funcTypeIdxs(i - numImportedFuncs))
    def exportedFunc(name: String): Option[Int] =
      exports.find(e => e.kind == 0 && e.name == name).map(_.idx)
  }

  // ----------------------------------------------------------------- AST

  sealed trait Instr
  case object Unreachable extends Instr
  case object Nop extends Instr
  /** blocktype: -1 = empty, >=0 = type index, else value type byte as
    * (0x40 | valtype) single result encoded via `BlockType`. */
  final case class BlockType(params: Int, results: Int)
  final case class Block(bt: BlockType, body: Vector[Instr]) extends Instr
  final case class Loop(bt: BlockType, body: Vector[Instr]) extends Instr
  final case class If(bt: BlockType, thenB: Vector[Instr], elseB: Vector[Instr]) extends Instr
  final case class Br(depth: Int) extends Instr
  final case class BrIf(depth: Int) extends Instr
  final case class BrTable(depths: Vector[Int], default: Int) extends Instr
  case object Return extends Instr
  final case class Call(funcIdx: Int) extends Instr
  final case class CallIndirect(typeIdx: Int) extends Instr
  case object Drop extends Instr
  case object Select extends Instr
  final case class LocalGet(i: Int) extends Instr
  final case class LocalSet(i: Int) extends Instr
  final case class LocalTee(i: Int) extends Instr
  final case class GlobalGet(i: Int) extends Instr
  final case class GlobalSet(i: Int) extends Instr
  /** Unified load/store: `op` selects width/sign per the opcode table. */
  final case class Load(op: Int, offset: Long) extends Instr
  final case class Store(op: Int, offset: Long) extends Instr
  case object MemorySize extends Instr
  case object MemoryGrow extends Instr
  final case class MemoryCopy() extends Instr
  final case class MemoryFill() extends Instr
  final case class I32Const(v: Int) extends Instr
  final case class I64Const(v: Long) extends Instr
  final case class F32Const(v: Float) extends Instr
  final case class F64Const(v: Double) extends Instr
  /** All plain numeric/compare/convert ops dispatch on the raw opcode. */
  final case class Num(op: Int) extends Instr
  /** 0xFC-prefixed saturating truncations, dispatch on sub-opcode. */
  final case class TruncSat(op: Int) extends Instr

  // ----------------------------------------------------------- decoder

  final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def hasMore: Boolean = pos < bytes.length
    def bytesAt(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    def u32(): Int = { // unsigned LEB128, 32-bit
      var result = 0; var shift = 0; var b = 0
      do {
        b = u8()
        if (shift < 32) result |= (b & 0x7f) << shift
        shift += 7
        if (shift > 35) throw new WasmDecodeError("overlong u32 LEB128")
      } while ((b & 0x80) != 0)
      result
    }
    def s32(): Int = s64().toInt
    def s64(): Long = { // signed LEB128
      var result = 0L; var shift = 0; var b = 0
      do {
        b = u8()
        if (shift < 64) result |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 70) throw new WasmDecodeError("overlong s64 LEB128")
      } while ((b & 0x80) != 0)
      if (shift < 64 && (b & 0x40) != 0) result |= -1L << shift
      result
    }
    def name(): String = new String(bytesAt(u32()), "UTF-8")
    def f32(): Float = {
      val v = ByteBuffer.wrap(bytesAt(4)).order(ByteOrder.LITTLE_ENDIAN).getFloat; v
    }
    def f64(): Double = {
      val v = ByteBuffer.wrap(bytesAt(8)).order(ByteOrder.LITTLE_ENDIAN).getDouble; v
    }
  }

  final class WasmDecodeError(msg: String) extends RuntimeException(msg)

  private def valType(b: Int): Byte = b match {
    case 0x7f | 0x7e | 0x7d | 0x7c | 0x70 | 0x6f => b.toByte
    case other => throw new WasmDecodeError(f"bad value type 0x$other%02x")
  }

  def decode(bytes: Array[Byte]): Module = {
    val r = new Reader(bytes)
    require(r.u8() == 0 && r.u8() == 'a' && r.u8() == 's' && r.u8() == 'm',
      "not a wasm module (bad magic)")
    val version = r.u8() | (r.u8() << 8) | (r.u8() << 16) | (r.u8() << 24)
    require(version == 1, s"unsupported wasm version $version")

    var types = IndexedSeq.empty[FuncType]
    var imports = IndexedSeq.empty[Import]
    var funcTypeIdxs = IndexedSeq.empty[Int]
    var tables = IndexedSeq.empty[Limits]
    var memories = IndexedSeq.empty[Limits]
    var globals = IndexedSeq.empty[Global]
    var exports = IndexedSeq.empty[Export]
    var start: Option[Int] = None
    var elems = IndexedSeq.empty[ElemSeg]
    var codes = IndexedSeq.empty[Code]
    var datas = IndexedSeq.empty[DataSeg]

    def limits(): Limits = r.u8() match {
      case 0 => Limits(r.u32(), None)
      case 1 => Limits(r.u32(), Some(r.u32()))
      case f => throw new WasmDecodeError(s"bad limits flag $f")
    }

    def decodeBlockType(module: => IndexedSeq[FuncType]): BlockType = {
      // s33: 0x40 empty, valtype single-result, else type index
      val save = r.pos
      val b = r.u8()
      if (b == 0x40) BlockType(0, 0)
      else if (b == 0x7f || b == 0x7e || b == 0x7d || b == 0x7c || b == 0x70)
        BlockType(0, 1)
      else {
        r.pos = save
        val ti = r.s64().toInt
        val ft = module(ti)
        BlockType(ft.params.size, ft.results.size)
      }
    }

    def expr(endOps: Set[Int]): (Vector[Instr], Int) = {
      val out = Vector.newBuilder[Instr]
      while (true) {
        val op = r.u8()
        if (endOps(op)) return (out.result(), op)
        out += decodeInstr(op)
      }
      sys.error("unreachable")
    }

    def decodeInstr(op: Int): Instr = op match {
      case 0x00 => Unreachable
      case 0x01 => Nop
      case 0x02 =>
        val bt = decodeBlockType(types); val (b, _) = expr(Set(0x0b)); Block(bt, b)
      case 0x03 =>
        val bt = decodeBlockType(types); val (b, _) = expr(Set(0x0b)); Loop(bt, b)
      case 0x04 =>
        val bt = decodeBlockType(types)
        val (t, term) = expr(Set(0x0b, 0x05))
        val e = if (term == 0x05) expr(Set(0x0b))._1 else Vector.empty
        If(bt, t, e)
      case 0x0c => Br(r.u32())
      case 0x0d => BrIf(r.u32())
      case 0x0e =>
        val n = r.u32()
        val ds = Vector.fill(n)(r.u32())
        BrTable(ds, r.u32())
      case 0x0f => Return
      case 0x10 => Call(r.u32())
      case 0x11 =>
        val ti = r.u32()
        val tableIdx = r.u8()
        if (tableIdx != 0) throw new WasmDecodeError("call_indirect table != 0")
        CallIndirect(ti)
      case 0x1a => Drop
      case 0x1b => Select
      case 0x1c => // select with explicit types (one type)
        val n = r.u32(); (0 until n).foreach(_ => r.u8()); Select
      case 0x20 => LocalGet(r.u32())
      case 0x21 => LocalSet(r.u32())
      case 0x22 => LocalTee(r.u32())
      case 0x23 => GlobalGet(r.u32())
      case 0x24 => GlobalSet(r.u32())
      case ld if ld >= 0x28 && ld <= 0x35 =>
        val _align = r.u32(); Load(ld, r.u32().toLong & 0xffffffffL)
      case st if st >= 0x36 && st <= 0x3e =>
        val _align = r.u32(); Store(st, r.u32().toLong & 0xffffffffL)
      case 0x3f => r.u8(); MemorySize
      case 0x40 => r.u8(); MemoryGrow
      case 0x41 => I32Const(r.s32())
      case 0x42 => I64Const(r.s64())
      case 0x43 => F32Const(r.f32())
      case 0x44 => F64Const(r.f64())
      case n if n >= 0x45 && n <= 0xc4 => Num(n)
      case 0xfc =>
        val sub = r.u32()
        sub match {
          case s if s <= 7 => TruncSat(s)
          case 10 => r.u8(); r.u8(); MemoryCopy() // two mem idx bytes
          case 11 => r.u8(); MemoryFill()
          case other => throw new WasmDecodeError(s"unsupported 0xFC op $other")
        }
      case other => throw new WasmDecodeError(f"unsupported opcode 0x$other%02x")
    }

    while (r.hasMore) {
      val secId = r.u8()
      val size = r.u32()
      val end = r.pos + size
      secId match {
        case 1 => // types
          types = IndexedSeq.fill(r.u32()) {
            require(r.u8() == 0x60, "bad functype tag")
            val ps = IndexedSeq.fill(r.u32())(valType(r.u8()))
            val rs = IndexedSeq.fill(r.u32())(valType(r.u8()))
            FuncType(ps, rs)
          }
        case 2 => // imports
          imports = IndexedSeq.fill(r.u32()) {
            val m = r.name(); val n = r.name()
            r.u8() match {
              case 0 => Import(m, n, 0, r.u32())
              case 2 => val _l = limits(); Import(m, n, 2, 0) // memory import
              case k => throw new WasmDecodeError(s"unsupported import kind $k")
            }
          }
        case 3 => funcTypeIdxs = IndexedSeq.fill(r.u32())(r.u32())
        case 4 => tables = IndexedSeq.fill(r.u32()) { r.u8(); limits() } // elemtype byte
        case 5 => memories = IndexedSeq.fill(r.u32())(limits())
        case 6 =>
          globals = IndexedSeq.fill(r.u32()) {
            val vt = valType(r.u8()); val mut = r.u8() == 1
            Global(vt, mut, expr(Set(0x0b))._1)
          }
        case 7 =>
          exports = IndexedSeq.fill(r.u32()) {
            val n = r.name(); Export(n, r.u8(), r.u32())
          }
        case 8 => start = Some(r.u32())
        case 9 =>
          elems = IndexedSeq.fill(r.u32()) {
            val flags = r.u32()
            require(flags == 0, s"unsupported elem flags $flags")
            val off = expr(Set(0x0b))._1
            ElemSeg(0, off, Vector.fill(r.u32())(r.u32()))
          }
        case 10 =>
          codes = IndexedSeq.fill(r.u32()) {
            val _bodySize = r.u32()
            val locals = IndexedSeq.fill(r.u32()) {
              val cnt = r.u32(); val vt = valType(r.u8())
              IndexedSeq.fill(cnt)(vt)
            }.flatten
            Code(locals, expr(Set(0x0b))._1)
          }
        case 11 =>
          datas = IndexedSeq.fill(r.u32()) {
            val flags = r.u32()
            require(flags == 0, s"unsupported data flags $flags")
            val off = expr(Set(0x0b))._1
            DataSeg(0, off, r.bytesAt(r.u32()))
          }
        case _ => r.pos = end // custom/unknown sections skipped
      }
      require(r.pos == end, s"section $secId mis-sized: at ${r.pos}, want $end")
    }

    Module(types, imports, funcTypeIdxs, tables, memories, globals, exports,
      start, elems, codes, datas)
  }
}
