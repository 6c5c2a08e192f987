package graft.wasm

import WasmModule._

/**
 * Tree-walking WebAssembly interpreter over [[WasmModule.Module]].
 *
 * Values are carried as raw 64-bit longs (i32 sign-extended into the
 * low word, f32/f64 as their IEEE bit patterns); the static types in
 * the bytecode decide how each op reinterprets them, exactly as a
 * real wasm stack machine does. Control flow uses the structured
 * label discipline from the spec: every block records its operand-
 * stack base, a `br` unwinds to the target label keeping the label's
 * arity, a `loop` label re-enters its body.
 *
 * Host functions are plugged in per import (module, name) — the
 * redpanda transform ABI lives in [[TransformAbi]]; this file knows
 * nothing about Kafka. Traps surface as [[WasmTrap]]; a wasi
 * `proc_exit` surfaces as [[ProcExit]] for the runner to catch.
 */
object WasmInterp {

  final class WasmTrap(msg: String) extends RuntimeException(msg)
  final class ProcExit(val code: Int) extends RuntimeException(s"proc_exit($code)")

  /** A host import: receives raw arg longs + the instance (for memory
    * access), returns the result longs (0 or 1 for MVP signatures). */
  trait HostFunc {
    def invoke(inst: Instance, args: Array[Long]): Array[Long]
  }

  final val PageSize = 65536

  /** Linear memory with little-endian accessors; grows by whole pages. */
  final class Memory(initPages: Int, maxPages: Int) {
    private[wasm] var data = new Array[Byte](initPages * PageSize)
    def sizePages: Int = data.length / PageSize
    def grow(delta: Int): Int = {
      val old = sizePages
      val next = old + delta
      if (delta < 0 || next > maxPages) -1
      else {
        data = java.util.Arrays.copyOf(data, next * PageSize)
        old
      }
    }
    @inline private def ck(addr: Long, n: Int): Int = {
      if (addr < 0 || addr + n > data.length)
        throw new WasmTrap(s"out of bounds memory access at $addr+$n (size ${data.length})")
      addr.toInt
    }
    def readByte(a: Long): Int = data(ck(a, 1)) & 0xff
    def writeByte(a: Long, v: Int): Unit = data(ck(a, 1)) = v.toByte
    def readN(a: Long, n: Int): Long = {
      val p = ck(a, n); var v = 0L; var i = n - 1
      while (i >= 0) { v = (v << 8) | (data(p + i) & 0xffL); i -= 1 }
      v
    }
    def writeN(a: Long, n: Int, v: Long): Unit = {
      val p = ck(a, n); var i = 0
      while (i < n) { data(p + i) = (v >>> (8 * i)).toByte; i += 1 }
    }
    def readBytes(a: Long, n: Int): Array[Byte] = {
      val p = ck(a, n); java.util.Arrays.copyOfRange(data, p, p + n)
    }
    def writeBytes(a: Long, bytes: Array[Byte]): Unit = {
      val p = ck(a, bytes.length)
      System.arraycopy(bytes, 0, data, p, bytes.length)
    }
    def copy(dst: Long, src: Long, n: Long): Unit = {
      if (n > Int.MaxValue) throw new WasmTrap("memory.copy too large")
      val d = ck(dst, n.toInt); val s = ck(src, n.toInt)
      System.arraycopy(data, s, data, d, n.toInt)
    }
    def fill(dst: Long, v: Int, n: Long): Unit = {
      if (n > Int.MaxValue) throw new WasmTrap("memory.fill too large")
      val d = ck(dst, n.toInt)
      java.util.Arrays.fill(data, d, d + n.toInt, v.toByte)
    }
    def readCString(a: Long, n: Int): String = new String(readBytes(a, n), "UTF-8")
  }

  private final class Stack {
    private var arr = new Array[Long](256)
    var top = 0
    @inline def push(v: Long): Unit = {
      if (top == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(top) = v; top += 1
    }
    @inline def pop(): Long = { top -= 1; arr(top) }
    @inline def peek: Long = arr(top - 1)
    /** br unwinding: keep `arity` top values, truncate to `base`. */
    def unwind(base: Int, arity: Int): Unit = {
      if (top != base + arity) {
        var i = 0
        while (i < arity) { arr(base + i) = arr(top - arity + i); i += 1 }
        top = base + arity
      }
    }
  }

  /**
   * @param maxFuel instruction budget — the interpreter's stand-in for
   *   wasmtime's epoch interruption (`wasm/wasmtime.cc` arms an epoch
   *   deadline so a runaway guest cannot pin the reactor): a guest that
   *   exceeds it traps instead of hanging the executor task.
   * @param maxCallDepth guards guest recursion from killing the JVM
   *   thread with a StackOverflowError (wasmtime's stack limit).
   */
  final class Instance(val module: Module,
      hostFuncs: Map[(String, String), HostFunc],
      maxFuel: Long = 2_000_000_000L,
      maxCallDepth: Int = 250) {

    private var fuel = maxFuel
    private var callDepth = 0

    val memory: Memory = module.memories.headOption match {
      case Some(Limits(min, max)) => new Memory(min, max.getOrElse(65536))
      case None => new Memory(1, 65536) // host-provided scratch
    }
    private val globals: Array[Long] =
      module.globals.map(g => evalConstExpr(g.init)).toArray
    private val table: Array[Int] = {
      val size = module.tables.headOption.map(_.min).getOrElse(0)
      val t = Array.fill(size)(-1)
      module.elems.foreach { e =>
        val off = evalConstExpr(e.offsetExpr).toInt
        e.funcIdxs.zipWithIndex.foreach { case (f, i) => t(off + i) = f }
      }
      t
    }
    private val resolvedHosts: IndexedSeq[HostFunc] =
      module.importedFuncs.map { imp =>
        hostFuncs.getOrElse((imp.module, imp.name),
          throw new WasmTrap(s"unresolved import ${imp.module}.${imp.name}"))
      }

    { // data segments
      module.datas.foreach { d =>
        memory.writeBytes(evalConstExpr(d.offsetExpr), d.bytes)
      }
    }

    private def evalConstExpr(e: Vector[Instr]): Long = e match {
      case Vector(I32Const(v)) => v.toLong
      case Vector(I64Const(v)) => v
      case Vector(F32Const(v)) => java.lang.Float.floatToRawIntBits(v).toLong
      case Vector(F64Const(v)) => java.lang.Double.doubleToRawLongBits(v)
      case Vector(GlobalGet(i)) => globals(i)
      case other => throw new WasmTrap(s"unsupported const expr $other")
    }

    /** Run the module's start function / wasi `_start` if present. */
    def runStart(): Unit = {
      module.start.foreach(i => invoke(i, Array.empty))
      ()
    }

    def invokeExport(name: String, args: Array[Long]): Array[Long] =
      invoke(module.exportedFunc(name).getOrElse(
        throw new WasmTrap(s"no export '$name'")), args)

    def invoke(funcIdx: Int, args: Array[Long]): Array[Long] = {
      val n = module.numImportedFuncs
      if (funcIdx < n) return resolvedHosts(funcIdx).invoke(this, args)
      if (callDepth >= maxCallDepth)
        throw new WasmTrap(s"call stack exhausted (depth $maxCallDepth)")
      callDepth += 1
      try invokeGuest(funcIdx, args) finally callDepth -= 1
    }

    private def invokeGuest(funcIdx: Int, args: Array[Long]): Array[Long] = {
      val n = module.numImportedFuncs
      val ft = module.funcType(funcIdx)
      val code = module.codes(funcIdx - n)
      val locals = new Array[Long](ft.params.size + code.locals.size)
      System.arraycopy(args, 0, locals, 0, ft.params.size)
      val stack = new Stack
      // params live in locals; on Return or fallthrough the results sit
      // on top of the operand stack
      exec(code.body, stack, locals, 0, ft.results.size)
      val res = new Array[Long](ft.results.size)
      var i = ft.results.size - 1
      while (i >= 0) { res(i) = stack.pop(); i -= 1 }
      res
    }

    /** -1 = fallthrough/done, -2 = return, >=0 = branch depth remaining. */
    private def exec(body: Vector[Instr], stack: Stack, locals: Array[Long],
        depth: Int, funcArity: Int): Int = {
      var i = 0
      val n = body.size
      fuel -= n
      if (fuel < 0)
        throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)")
      while (i < n) {
        body(i) match {
          case Unreachable => throw new WasmTrap("unreachable executed")
          case Nop =>
          case Block(bt, inner) =>
            val base = stack.top - bt.params
            val r = exec(inner, stack, locals, depth + 1, funcArity)
            if (r == -2) return -2
            if (r == 0) stack.unwind(base, bt.results)     // br to this label
            // a branch past this block keeps the TARGET label's values on
            // top — the target's unwind discards everything below them, so
            // intermediate frames must not touch the stack
            else if (r > 0) return r - 1
            // fallthrough leaves results on stack naturally
          case Loop(bt, inner) =>
            var continue = true
            while (continue) {
              val base = stack.top - bt.params
              val r = exec(inner, stack, locals, depth + 1, funcArity)
              if (r == -2) return -2
              else if (r == 0) stack.unwind(base, bt.params) // br to loop head: re-enter
              else if (r > 0) return r - 1
              else continue = false
            }
          case If(bt, t, e) =>
            val cond = stack.pop().toInt
            val base = stack.top - bt.params
            val r = exec(if (cond != 0) t else e, stack, locals, depth + 1, funcArity)
            if (r == -2) return -2
            if (r == 0) stack.unwind(base, bt.results)
            else if (r > 0) return r - 1
          case Br(d) => return d
          case BrIf(d) => if (stack.pop().toInt != 0) return d
          case BrTable(ds, dflt) =>
            val idx = stack.pop().toInt
            return (if (idx >= 0 && idx < ds.size) ds(idx) else dflt)
          case Return => return -2
          case Call(f) =>
            val ft = module.funcType(f)
            val as = new Array[Long](ft.params.size)
            var j = ft.params.size - 1
            while (j >= 0) { as(j) = stack.pop(); j -= 1 }
            invoke(f, as).foreach(stack.push)
          case CallIndirect(ti) =>
            val elem = stack.pop().toInt
            if (elem < 0 || elem >= table.length || table(elem) < 0)
              throw new WasmTrap(s"undefined table element $elem")
            val f = table(elem)
            val want = module.types(ti)
            if (module.funcType(f) != want)
              throw new WasmTrap("indirect call type mismatch")
            val as = new Array[Long](want.params.size)
            var j = want.params.size - 1
            while (j >= 0) { as(j) = stack.pop(); j -= 1 }
            invoke(f, as).foreach(stack.push)
          case Drop => stack.pop()
          case Select =>
            val c = stack.pop().toInt; val b = stack.pop(); val a = stack.pop()
            stack.push(if (c != 0) a else b)
          case LocalGet(j) => stack.push(locals(j))
          case LocalSet(j) => locals(j) = stack.pop()
          case LocalTee(j) => locals(j) = stack.peek
          case GlobalGet(j) => stack.push(globals(j))
          case GlobalSet(j) => globals(j) = stack.pop()
          case Load(op, off) =>
            val a = (stack.pop() & 0xffffffffL) + off
            stack.push(op match {
              case 0x28 => memory.readN(a, 4).toInt.toLong            // i32.load
              case 0x29 => memory.readN(a, 8)                         // i64.load
              case 0x2a => memory.readN(a, 4).toInt.toLong            // f32.load (bits)
              case 0x2b => memory.readN(a, 8)                         // f64.load (bits)
              case 0x2c => memory.readByte(a).toByte.toLong           // i32.load8_s
              case 0x2d => memory.readByte(a).toLong                  // i32.load8_u
              case 0x2e => memory.readN(a, 2).toShort.toLong          // i32.load16_s
              case 0x2f => memory.readN(a, 2)                         // i32.load16_u
              case 0x30 => memory.readByte(a).toByte.toLong           // i64.load8_s
              case 0x31 => memory.readByte(a).toLong                  // i64.load8_u
              case 0x32 => memory.readN(a, 2).toShort.toLong          // i64.load16_s
              case 0x33 => memory.readN(a, 2)                         // i64.load16_u
              case 0x34 => memory.readN(a, 4).toInt.toLong            // i64.load32_s
              case 0x35 => memory.readN(a, 4)                         // i64.load32_u
            })
          case Store(op, off) =>
            val v = stack.pop()
            val a = (stack.pop() & 0xffffffffL) + off
            op match {
              case 0x36 => memory.writeN(a, 4, v)  // i32.store
              case 0x37 => memory.writeN(a, 8, v)  // i64.store
              case 0x38 => memory.writeN(a, 4, v)  // f32.store
              case 0x39 => memory.writeN(a, 8, v)  // f64.store
              case 0x3a => memory.writeByte(a, v.toInt)
              case 0x3b => memory.writeN(a, 2, v)
              case 0x3c => memory.writeByte(a, v.toInt) // i64.store8
              case 0x3d => memory.writeN(a, 2, v)       // i64.store16
              case 0x3e => memory.writeN(a, 4, v)       // i64.store32
            }
          case MemorySize => stack.push(memory.sizePages.toLong)
          case MemoryGrow => stack.push(memory.grow(stack.pop().toInt).toLong)
          case MemoryCopy() =>
            val cnt = stack.pop(); val src = stack.pop(); val dst = stack.pop()
            memory.copy(dst & 0xffffffffL, src & 0xffffffffL, cnt & 0xffffffffL)
          case MemoryFill() =>
            val cnt = stack.pop(); val v = stack.pop(); val dst = stack.pop()
            memory.fill(dst & 0xffffffffL, v.toInt, cnt & 0xffffffffL)
          case I32Const(v) => stack.push(v.toLong)
          case I64Const(v) => stack.push(v)
          case F32Const(v) => stack.push(java.lang.Float.floatToRawIntBits(v).toLong)
          case F64Const(v) => stack.push(java.lang.Double.doubleToRawLongBits(v))
          case Num(op) => numOp(op, stack)
          case TruncSat(op) => truncSat(op, stack)
        }
        i += 1
      }
      -1
    }

    @inline private def f32of(bits: Long): Float =
      java.lang.Float.intBitsToFloat(bits.toInt)
    @inline private def f64of(bits: Long): Double =
      java.lang.Double.longBitsToDouble(bits)
    @inline private def pf32(s: Stack, v: Float): Unit =
      s.push(java.lang.Float.floatToRawIntBits(v).toLong)
    @inline private def pf64(s: Stack, v: Double): Unit =
      s.push(java.lang.Double.doubleToRawLongBits(v))
    @inline private def b2l(b: Boolean): Long = if (b) 1L else 0L

    private def numOp(op: Int, s: Stack): Unit = op match {
      // ---- i32 compare
      case 0x45 => s.push(b2l(s.pop().toInt == 0))                       // i32.eqz
      case 0x46 => val b = s.pop().toInt; s.push(b2l(s.pop().toInt == b))
      case 0x47 => val b = s.pop().toInt; s.push(b2l(s.pop().toInt != b))
      case 0x48 => val b = s.pop().toInt; s.push(b2l(s.pop().toInt < b))
      case 0x49 => val b = s.pop().toInt; val a = s.pop().toInt
        s.push(b2l(java.lang.Integer.compareUnsigned(a, b) < 0))
      case 0x4a => val b = s.pop().toInt; s.push(b2l(s.pop().toInt > b))
      case 0x4b => val b = s.pop().toInt; val a = s.pop().toInt
        s.push(b2l(java.lang.Integer.compareUnsigned(a, b) > 0))
      case 0x4c => val b = s.pop().toInt; s.push(b2l(s.pop().toInt <= b))
      case 0x4d => val b = s.pop().toInt; val a = s.pop().toInt
        s.push(b2l(java.lang.Integer.compareUnsigned(a, b) <= 0))
      case 0x4e => val b = s.pop().toInt; s.push(b2l(s.pop().toInt >= b))
      case 0x4f => val b = s.pop().toInt; val a = s.pop().toInt
        s.push(b2l(java.lang.Integer.compareUnsigned(a, b) >= 0))
      // ---- i64 compare
      case 0x50 => s.push(b2l(s.pop() == 0L))
      case 0x51 => val b = s.pop(); s.push(b2l(s.pop() == b))
      case 0x52 => val b = s.pop(); s.push(b2l(s.pop() != b))
      case 0x53 => val b = s.pop(); s.push(b2l(s.pop() < b))
      case 0x54 => val b = s.pop(); val a = s.pop()
        s.push(b2l(java.lang.Long.compareUnsigned(a, b) < 0))
      case 0x55 => val b = s.pop(); s.push(b2l(s.pop() > b))
      case 0x56 => val b = s.pop(); val a = s.pop()
        s.push(b2l(java.lang.Long.compareUnsigned(a, b) > 0))
      case 0x57 => val b = s.pop(); s.push(b2l(s.pop() <= b))
      case 0x58 => val b = s.pop(); val a = s.pop()
        s.push(b2l(java.lang.Long.compareUnsigned(a, b) <= 0))
      case 0x59 => val b = s.pop(); s.push(b2l(s.pop() >= b))
      case 0x5a => val b = s.pop(); val a = s.pop()
        s.push(b2l(java.lang.Long.compareUnsigned(a, b) >= 0))
      // ---- f32 compare
      case 0x5b => val b = f32of(s.pop()); s.push(b2l(f32of(s.pop()) == b))
      case 0x5c => val b = f32of(s.pop()); s.push(b2l(f32of(s.pop()) != b))
      case 0x5d => val b = f32of(s.pop()); s.push(b2l(f32of(s.pop()) < b))
      case 0x5e => val b = f32of(s.pop()); s.push(b2l(f32of(s.pop()) > b))
      case 0x5f => val b = f32of(s.pop()); s.push(b2l(f32of(s.pop()) <= b))
      case 0x60 => val b = f32of(s.pop()); s.push(b2l(f32of(s.pop()) >= b))
      // ---- f64 compare
      case 0x61 => val b = f64of(s.pop()); s.push(b2l(f64of(s.pop()) == b))
      case 0x62 => val b = f64of(s.pop()); s.push(b2l(f64of(s.pop()) != b))
      case 0x63 => val b = f64of(s.pop()); s.push(b2l(f64of(s.pop()) < b))
      case 0x64 => val b = f64of(s.pop()); s.push(b2l(f64of(s.pop()) > b))
      case 0x65 => val b = f64of(s.pop()); s.push(b2l(f64of(s.pop()) <= b))
      case 0x66 => val b = f64of(s.pop()); s.push(b2l(f64of(s.pop()) >= b))
      // ---- i32 arithmetic
      case 0x67 => s.push(java.lang.Integer.numberOfLeadingZeros(s.pop().toInt).toLong)
      case 0x68 => s.push(java.lang.Integer.numberOfTrailingZeros(s.pop().toInt).toLong)
      case 0x69 => s.push(java.lang.Integer.bitCount(s.pop().toInt).toLong)
      case 0x6a => val b = s.pop().toInt; s.push((s.pop().toInt + b).toLong)
      case 0x6b => val b = s.pop().toInt; s.push((s.pop().toInt - b).toLong)
      case 0x6c => val b = s.pop().toInt; s.push((s.pop().toInt * b).toLong)
      case 0x6d => val b = s.pop().toInt; val a = s.pop().toInt
        if (b == 0) throw new WasmTrap("integer divide by zero")
        if (a == Int.MinValue && b == -1) throw new WasmTrap("integer overflow")
        s.push((a / b).toLong)
      case 0x6e => val b = s.pop().toInt; val a = s.pop().toInt
        if (b == 0) throw new WasmTrap("integer divide by zero")
        s.push(java.lang.Integer.divideUnsigned(a, b).toLong)
      case 0x6f => val b = s.pop().toInt; val a = s.pop().toInt
        if (b == 0) throw new WasmTrap("integer divide by zero")
        s.push((if (a == Int.MinValue && b == -1) 0 else a % b).toLong)
      case 0x70 => val b = s.pop().toInt; val a = s.pop().toInt
        if (b == 0) throw new WasmTrap("integer divide by zero")
        s.push(java.lang.Integer.remainderUnsigned(a, b).toLong)
      case 0x71 => val b = s.pop().toInt; s.push((s.pop().toInt & b).toLong)
      case 0x72 => val b = s.pop().toInt; s.push((s.pop().toInt | b).toLong)
      case 0x73 => val b = s.pop().toInt; s.push((s.pop().toInt ^ b).toLong)
      case 0x74 => val b = s.pop().toInt; s.push((s.pop().toInt << b).toLong)
      case 0x75 => val b = s.pop().toInt; s.push((s.pop().toInt >> b).toLong)
      case 0x76 => val b = s.pop().toInt; s.push((s.pop().toInt >>> b).toLong)
      case 0x77 => val b = s.pop().toInt; s.push(java.lang.Integer.rotateLeft(s.pop().toInt, b).toLong)
      case 0x78 => val b = s.pop().toInt; s.push(java.lang.Integer.rotateRight(s.pop().toInt, b).toLong)
      // ---- i64 arithmetic
      case 0x79 => s.push(java.lang.Long.numberOfLeadingZeros(s.pop()).toLong)
      case 0x7a => s.push(java.lang.Long.numberOfTrailingZeros(s.pop()).toLong)
      case 0x7b => s.push(java.lang.Long.bitCount(s.pop()).toLong)
      case 0x7c => val b = s.pop(); s.push(s.pop() + b)
      case 0x7d => val b = s.pop(); s.push(s.pop() - b)
      case 0x7e => val b = s.pop(); s.push(s.pop() * b)
      case 0x7f => val b = s.pop(); val a = s.pop()
        if (b == 0) throw new WasmTrap("integer divide by zero")
        if (a == Long.MinValue && b == -1) throw new WasmTrap("integer overflow")
        s.push(a / b)
      case 0x80 => val b = s.pop(); val a = s.pop()
        if (b == 0) throw new WasmTrap("integer divide by zero")
        s.push(java.lang.Long.divideUnsigned(a, b))
      case 0x81 => val b = s.pop(); val a = s.pop()
        if (b == 0) throw new WasmTrap("integer divide by zero")
        s.push(if (a == Long.MinValue && b == -1) 0L else a % b)
      case 0x82 => val b = s.pop(); val a = s.pop()
        if (b == 0) throw new WasmTrap("integer divide by zero")
        s.push(java.lang.Long.remainderUnsigned(a, b))
      case 0x83 => val b = s.pop(); s.push(s.pop() & b)
      case 0x84 => val b = s.pop(); s.push(s.pop() | b)
      case 0x85 => val b = s.pop(); s.push(s.pop() ^ b)
      case 0x86 => val b = s.pop(); s.push(s.pop() << b)
      case 0x87 => val b = s.pop(); s.push(s.pop() >> b)
      case 0x88 => val b = s.pop(); s.push(s.pop() >>> b)
      case 0x89 => val b = s.pop(); s.push(java.lang.Long.rotateLeft(s.pop(), b.toInt))
      case 0x8a => val b = s.pop(); s.push(java.lang.Long.rotateRight(s.pop(), b.toInt))
      // ---- f32 arithmetic
      case 0x8b => pf32(s, math.abs(f32of(s.pop())))
      case 0x8c => pf32(s, -f32of(s.pop()))
      case 0x8d => pf32(s, math.ceil(f32of(s.pop()).toDouble).toFloat)
      case 0x8e => pf32(s, math.floor(f32of(s.pop()).toDouble).toFloat)
      case 0x8f => val v = f32of(s.pop()); pf32(s, (if (v < 0) math.ceil(v.toDouble) else math.floor(v.toDouble)).toFloat)
      case 0x90 => pf32(s, math.rint(f32of(s.pop()).toDouble).toFloat)
      case 0x91 => pf32(s, math.sqrt(f32of(s.pop()).toDouble).toFloat)
      case 0x92 => val b = f32of(s.pop()); pf32(s, f32of(s.pop()) + b)
      case 0x93 => val b = f32of(s.pop()); pf32(s, f32of(s.pop()) - b)
      case 0x94 => val b = f32of(s.pop()); pf32(s, f32of(s.pop()) * b)
      case 0x95 => val b = f32of(s.pop()); pf32(s, f32of(s.pop()) / b)
      case 0x96 => val b = f32of(s.pop()); pf32(s, math.min(f32of(s.pop()), b))
      case 0x97 => val b = f32of(s.pop()); pf32(s, math.max(f32of(s.pop()), b))
      case 0x98 => val b = f32of(s.pop()); pf32(s, java.lang.Math.copySign(f32of(s.pop()), b))
      // ---- f64 arithmetic
      case 0x99 => pf64(s, math.abs(f64of(s.pop())))
      case 0x9a => pf64(s, -f64of(s.pop()))
      case 0x9b => pf64(s, math.ceil(f64of(s.pop())))
      case 0x9c => pf64(s, math.floor(f64of(s.pop())))
      case 0x9d => val v = f64of(s.pop()); pf64(s, if (v < 0) math.ceil(v) else math.floor(v))
      case 0x9e => pf64(s, math.rint(f64of(s.pop())))
      case 0x9f => pf64(s, math.sqrt(f64of(s.pop())))
      case 0xa0 => val b = f64of(s.pop()); pf64(s, f64of(s.pop()) + b)
      case 0xa1 => val b = f64of(s.pop()); pf64(s, f64of(s.pop()) - b)
      case 0xa2 => val b = f64of(s.pop()); pf64(s, f64of(s.pop()) * b)
      case 0xa3 => val b = f64of(s.pop()); pf64(s, f64of(s.pop()) / b)
      case 0xa4 => val b = f64of(s.pop()); pf64(s, math.min(f64of(s.pop()), b))
      case 0xa5 => val b = f64of(s.pop()); pf64(s, math.max(f64of(s.pop()), b))
      case 0xa6 => val b = f64of(s.pop()); pf64(s, java.lang.Math.copySign(f64of(s.pop()), b))
      // ---- conversions
      case 0xa7 => s.push(s.pop().toInt.toLong)                        // i32.wrap_i64
      case 0xa8 => s.push(truncToI32(f32of(s.pop()).toDouble, signed = true))
      case 0xa9 => s.push(truncToI32(f32of(s.pop()).toDouble, signed = false))
      case 0xaa => s.push(truncToI32(f64of(s.pop()), signed = true))
      case 0xab => s.push(truncToI32(f64of(s.pop()), signed = false))
      case 0xac => s.push(s.pop().toInt.toLong)                        // i64.extend_i32_s
      case 0xad => s.push(s.pop() & 0xffffffffL)                       // i64.extend_i32_u
      case 0xae => s.push(truncToI64(f32of(s.pop()).toDouble, signed = true))
      case 0xaf => s.push(truncToI64(f32of(s.pop()).toDouble, signed = false))
      case 0xb0 => s.push(truncToI64(f64of(s.pop()), signed = true))
      case 0xb1 => s.push(truncToI64(f64of(s.pop()), signed = false))
      case 0xb2 => pf32(s, s.pop().toInt.toFloat)                      // f32.convert_i32_s
      case 0xb3 => pf32(s, (s.pop() & 0xffffffffL).toFloat)
      case 0xb4 => pf32(s, s.pop().toFloat)
      case 0xb5 => val v = s.pop()
        pf32(s, if (v >= 0) v.toFloat else ((v >>> 1) | (v & 1)).toFloat * 2.0f)
      case 0xb6 => pf32(s, f64of(s.pop()).toFloat)                     // f32.demote
      case 0xb7 => pf64(s, s.pop().toInt.toDouble)
      case 0xb8 => pf64(s, (s.pop() & 0xffffffffL).toDouble)
      case 0xb9 => pf64(s, s.pop().toDouble)
      case 0xba => val v = s.pop()
        pf64(s, if (v >= 0) v.toDouble else ((v >>> 1) | (v & 1)).toDouble * 2.0)
      case 0xbb => pf64(s, f32of(s.pop()).toDouble)                    // f64.promote
      // reinterprets are no-ops up to the canonical sign-extended i32 form
      case 0xbc => s.push(s.pop().toInt.toLong)  // i32.reinterpret_f32
      case 0xbd =>                               // i64.reinterpret_f64 — raw bits
      case 0xbe => s.push(s.pop().toInt.toLong)  // f32.reinterpret_i32
      case 0xbf =>                               // f64.reinterpret_i64 — raw bits
      // ---- sign extension
      case 0xc0 => s.push(s.pop().toByte.toLong)                       // i32.extend8_s
      case 0xc1 => s.push(s.pop().toShort.toLong)                      // i32.extend16_s
      case 0xc2 => s.push(s.pop().toByte.toLong)                       // i64.extend8_s
      case 0xc3 => s.push(s.pop().toShort.toLong)                      // i64.extend16_s
      case 0xc4 => s.push(s.pop().toInt.toLong)                        // i64.extend32_s
      case other => throw new WasmTrap(f"unsupported numeric op 0x$other%02x")
    }

    private def truncToI32(v: Double, signed: Boolean): Long = {
      if (v.isNaN) throw new WasmTrap("invalid conversion to integer")
      val t = if (v < 0) math.ceil(v) else math.floor(v)
      if (signed) {
        if (t < Int.MinValue.toDouble || t > Int.MaxValue.toDouble)
          throw new WasmTrap("integer overflow")
        t.toInt.toLong
      } else {
        if (t < 0 || t > 4294967295.0) throw new WasmTrap("integer overflow")
        t.toLong.toInt.toLong
      }
    }
    private def truncToI64(v: Double, signed: Boolean): Long = {
      if (v.isNaN) throw new WasmTrap("invalid conversion to integer")
      val t = if (v < 0) math.ceil(v) else math.floor(v)
      if (signed) {
        if (t < -9.223372036854776e18 || t >= 9.223372036854776e18)
          throw new WasmTrap("integer overflow")
        t.toLong
      } else {
        if (t < 0 || t >= 1.8446744073709552e19)
          throw new WasmTrap("integer overflow")
        if (t >= 9.223372036854776e18) (t - 1.8446744073709552e19).toLong else t.toLong
      }
    }

    private def truncSat(op: Int, s: Stack): Unit = op match {
      case 0 => s.push(satI32(f32of(s.pop()).toDouble, signed = true))
      case 1 => s.push(satI32(f32of(s.pop()).toDouble, signed = false))
      case 2 => s.push(satI32(f64of(s.pop()), signed = true))
      case 3 => s.push(satI32(f64of(s.pop()), signed = false))
      case 4 => s.push(satI64(f32of(s.pop()).toDouble, signed = true))
      case 5 => s.push(satI64(f32of(s.pop()).toDouble, signed = false))
      case 6 => s.push(satI64(f64of(s.pop()), signed = true))
      case 7 => s.push(satI64(f64of(s.pop()), signed = false))
    }
    private def satI32(v: Double, signed: Boolean): Long =
      if (v.isNaN) 0L
      else if (signed) math.max(Int.MinValue.toDouble, math.min(Int.MaxValue.toDouble, v)).toInt.toLong
      else math.max(0.0, math.min(4294967295.0, v)).toLong.toInt.toLong
    private def satI64(v: Double, signed: Boolean): Long =
      if (v.isNaN) 0L
      else if (signed) (if (v <= Long.MinValue.toDouble) Long.MinValue
        else if (v >= Long.MaxValue.toDouble) Long.MaxValue else v.toLong)
      else (if (v <= 0) 0L else if (v >= 1.8446744073709552e19) -1L else v.toLong)
  }

  def instantiate(moduleBytes: Array[Byte],
      hostFuncs: Map[(String, String), HostFunc]): Instance =
    new Instance(WasmModule.decode(moduleBytes), hostFuncs)
}
