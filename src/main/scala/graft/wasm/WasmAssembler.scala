package graft.wasm

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal wasm 1.0 binary assembler — enough to author guest modules
 * (the SDK example transforms) as genuine `.wasm` artifacts. The
 * guests built with this are decoded by [[WasmModule.decode]] and run
 * by [[WasmInterp]] exactly as a user-compiled binary would be; the
 * assembler exists because this container has no TinyGo/Rust wasm
 * toolchain, not because the execution path is simulated.
 *
 * Only the constructs the golden guests need are exposed: func types,
 * function imports, one memory, exports, data segments, and a raw
 * instruction-byte body builder with LEB128 helpers.
 */
object WasmAssembler {

  final class Body {
    private[wasm] val out = new ArrayBuffer[Byte]()
    private def b(v: Int): Body = { out += v.toByte; this }
    def raw(bytes: Array[Byte]): Body = { out ++= bytes; this }
    def uleb(v: Long): Body = { out ++= ulebBytes(v); this }
    def sleb(v: Long): Body = { out ++= slebBytes(v); this }

    def unreachable(): Body = b(0x00)
    /** blocktype 0x40 = empty; or a valtype byte. */
    def block(bt: Int = 0x40): Body = { b(0x02); b(bt) }
    def loop(bt: Int = 0x40): Body = { b(0x03); b(bt) }
    def ifOp(bt: Int = 0x40): Body = { b(0x04); b(bt) }
    def elseOp(): Body = b(0x05)
    def end(): Body = b(0x0b)
    def br(d: Int): Body = { b(0x0c); uleb(d) }
    def brIf(d: Int): Body = { b(0x0d); uleb(d) }
    def brTable(ds: Seq[Int], dflt: Int): Body = {
      b(0x0e); uleb(ds.size); ds.foreach(uleb(_)); uleb(dflt)
    }
    def ret(): Body = b(0x0f)
    def call(f: Int): Body = { b(0x10); uleb(f) }
    def callIndirect(typeIdx: Int): Body = { b(0x11); uleb(typeIdx); b(0x00) }
    def drop(): Body = b(0x1a)
    def select(): Body = b(0x1b)
    def localGet(i: Int): Body = { b(0x20); uleb(i) }
    def localSet(i: Int): Body = { b(0x21); uleb(i) }
    def localTee(i: Int): Body = { b(0x22); uleb(i) }
    def globalGet(i: Int): Body = { b(0x23); uleb(i) }
    def globalSet(i: Int): Body = { b(0x24); uleb(i) }
    def i32Load(offset: Int = 0, align: Int = 2): Body = { b(0x28); uleb(align); uleb(offset) }
    def i64Load(offset: Int = 0, align: Int = 3): Body = { b(0x29); uleb(align); uleb(offset) }
    def i32Load8U(offset: Int = 0): Body = { b(0x2d); uleb(0); uleb(offset) }
    def i32Store(offset: Int = 0, align: Int = 2): Body = { b(0x36); uleb(align); uleb(offset) }
    def i64Store(offset: Int = 0, align: Int = 3): Body = { b(0x37); uleb(align); uleb(offset) }
    def i32Store8(offset: Int = 0): Body = { b(0x3a); uleb(0); uleb(offset) }
    def i32Const(v: Int): Body = { b(0x41); sleb(v) }
    def i64Const(v: Long): Body = { b(0x42); sleb(v) }
    def op(opcode: Int): Body = b(opcode)
    def i32Add(): Body = b(0x6a)
    def i32Sub(): Body = b(0x6b)
    def i32Mul(): Body = b(0x6c)
    def i32And(): Body = b(0x71)
    def i32Or(): Body = b(0x72)
    def i32Xor(): Body = b(0x73)
    def i32Shl(): Body = b(0x74)
    def i32ShrS(): Body = b(0x75)
    def i32ShrU(): Body = b(0x76)
    def i32Eqz(): Body = b(0x45)
    def i32Eq(): Body = b(0x46)
    def i32Ne(): Body = b(0x47)
    def i32LtS(): Body = b(0x48)
    def i32GtS(): Body = b(0x4a)
    def i32GeS(): Body = b(0x4e)
    def i32LeS(): Body = b(0x4c)
    def i64Add(): Body = b(0x7c)
    def memorySize(): Body = { b(0x3f); b(0x00) }
    def memoryGrow(): Body = { b(0x40); b(0x00) }
    def memoryCopy(): Body = { b(0xfc); uleb(10); b(0x00); b(0x00) }
    def memoryFill(): Body = { b(0xfc); uleb(11); b(0x00) }
    def bytes: Array[Byte] = out.toArray
  }

  def body(): Body = new Body

  def ulebBytes(v0: Long): Array[Byte] = {
    var v = v0
    val out = new ArrayBuffer[Byte]()
    do {
      var byte = (v & 0x7f).toInt
      v >>>= 7
      if (v != 0) byte |= 0x80
      out += byte.toByte
    } while (v != 0)
    out.toArray
  }

  def slebBytes(v0: Long): Array[Byte] = {
    var v = v0
    val out = new ArrayBuffer[Byte]()
    var more = true
    while (more) {
      var byte = (v & 0x7f).toInt
      v >>= 7
      if ((v == 0 && (byte & 0x40) == 0) || (v == -1 && (byte & 0x40) != 0))
        more = false
      else byte |= 0x80
      out += byte.toByte
    }
    out.toArray
  }

  final case class FuncImport(module: String, name: String, typeIdx: Int)
  final case class Func(typeIdx: Int, localI32s: Int, localI64s: Int, body: Body)
  final case class Export(name: String, funcIdx: Int)
  final case class Data(offset: Int, bytes: Array[Byte])
  /** (valtype byte, mutable, init value as an i32/i64 const). */
  final case class Global(valType: Byte, mutable: Boolean, init: Long)

  /** Assemble a module: types, imports, funcs (in order), memory pages,
    * exports, data segments, optional start function index. */
  def module(
      types: Seq[(Seq[Byte], Seq[Byte])],
      imports: Seq[FuncImport],
      funcs: Seq[Func],
      memPages: Int,
      exports: Seq[Export],
      datas: Seq[Data] = Nil,
      start: Option[Int] = None,
      exportMemory: Boolean = true,
      tableFuncs: Seq[Int] = Nil,
      globals: Seq[Global] = Nil): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out ++= Array[Byte](0, 'a', 's', 'm', 1, 0, 0, 0)

    def section(id: Int, content: Array[Byte]): Unit = {
      out += id.toByte
      out ++= ulebBytes(content.length)
      out ++= content
    }
    def vec(n: Int, items: Array[Byte]): Array[Byte] = ulebBytes(n) ++ items
    def str(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8"); ulebBytes(b.length) ++ b
    }

    // type section
    section(1, vec(types.size, types.flatMap { case (ps, rs) =>
      Array[Byte](0x60) ++ ulebBytes(ps.size) ++ ps ++ ulebBytes(rs.size) ++ rs
    }.toArray))
    // import section
    if (imports.nonEmpty)
      section(2, vec(imports.size, imports.flatMap { imp =>
        str(imp.module) ++ str(imp.name) ++ Array[Byte](0) ++ ulebBytes(imp.typeIdx)
      }.toArray))
    // function section
    section(3, vec(funcs.size, funcs.flatMap(f => ulebBytes(f.typeIdx)).toArray))
    // table section (funcref table sized to the elem vector)
    if (tableFuncs.nonEmpty)
      section(4, vec(1, Array[Byte](0x70, 0) ++ ulebBytes(tableFuncs.size)))
    // memory section
    section(5, vec(1, Array[Byte](0) ++ ulebBytes(memPages)))
    // global section (valtype, mut flag, const-init expr)
    if (globals.nonEmpty)
      section(6, vec(globals.size, globals.flatMap { g =>
        Array[Byte](g.valType, if (g.mutable) 1 else 0,
          if (g.valType == 0x7e.toByte) 0x42.toByte else 0x41.toByte) ++
          slebBytes(g.init) ++ Array[Byte](0x0b)
      }.toArray))
    // export section
    val memExport = if (exportMemory)
      Seq(str("memory") ++ Array[Byte](2) ++ ulebBytes(0)) else Nil
    section(7, vec(exports.size + memExport.size,
      (exports.map(e => str(e.name) ++ Array[Byte](0) ++ ulebBytes(e.funcIdx)) ++
        memExport).flatten.toArray))
    // start section
    start.foreach(s => section(8, ulebBytes(s)))
    // element section (active, table 0, offset 0)
    if (tableFuncs.nonEmpty)
      section(9, vec(1, Array[Byte](0, 0x41, 0, 0x0b) ++
        ulebBytes(tableFuncs.size) ++ tableFuncs.flatMap(ulebBytes(_)).toArray))
    // code section
    section(10, vec(funcs.size, funcs.flatMap { f =>
      val localDecls =
        (if (f.localI32s > 0) 1 else 0) + (if (f.localI64s > 0) 1 else 0)
      val bodyBytes =
        ulebBytes(localDecls) ++
          (if (f.localI32s > 0) ulebBytes(f.localI32s) ++ Array[Byte](0x7f) else Array.empty[Byte]) ++
          (if (f.localI64s > 0) ulebBytes(f.localI64s) ++ Array[Byte](0x7e.toByte) else Array.empty[Byte]) ++
          f.body.bytes ++ Array[Byte](0x0b)
      ulebBytes(bodyBytes.length) ++ bodyBytes
    }.toArray))
    // data section
    if (datas.nonEmpty)
      section(11, vec(datas.size, datas.flatMap { d =>
        ulebBytes(0) ++ Array[Byte](0x41) ++ slebBytes(d.offset) ++
          Array[Byte](0x0b) ++ ulebBytes(d.bytes.length) ++ d.bytes
      }.toArray))
    out.toArray
  }
}
