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
    // little-endian view over `data` so the 2/4/8-byte accessors are
    // single intrinsified reads instead of per-byte assembly loops
    private var bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def sizePages: Int = data.length / PageSize
    def grow(delta: Int): Int = {
      val old = sizePages
      val next = old + delta
      if (delta < 0 || next > maxPages) -1
      else {
        data = java.util.Arrays.copyOf(data, next * PageSize)
        bb = java.nio.ByteBuffer.wrap(data)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
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
      val p = ck(a, n)
      n match {
        case 4 => bb.getInt(p).toLong & 0xffffffffL
        case 8 => bb.getLong(p)
        case 2 => bb.getShort(p).toLong & 0xffffL
        case 1 => (data(p) & 0xff).toLong
        case _ =>
          var v = 0L; var i = n - 1
          while (i >= 0) { v = (v << 8) | (data(p + i) & 0xffL); i -= 1 }
          v
      }
    }
    def writeN(a: Long, n: Int, v: Long): Unit = {
      val p = ck(a, n)
      n match {
        case 4 => bb.putInt(p, v.toInt)
        case 8 => bb.putLong(p, v)
        case 2 => bb.putShort(p, v.toShort)
        case 1 => data(p) = v.toByte
        case _ =>
          var i = 0
          while (i < n) { data(p + i) = (v >>> (8 * i)).toByte; i += 1 }
      }
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

    // Compiled (flat) function bodies, one per guest function, built on
    // first call — see [[FlatCompiler]]. The instruction TREE from the
    // decoder is the source of truth; the flat program is a pure
    // performance representation (no per-step case-class dispatch, no
    // recursion through nested blocks). Shared across Instances of the
    // same Module (WasmTransform spins one VM per partition per run —
    // the module is compiled once, not once per run).
    private val flatCache = WasmInterp.flatCacheFor(module)

    // Per-depth frame pools: calls nest strictly, so depth-indexed
    // reuse is safe and turns the per-call Stack (2 KB) and locals
    // allocations into plain resets — the dominant cost of call-heavy
    // guests (a varint helper called per record allocated ~4 KB/rec).
    private val stackPool = new Array[Stack](maxCallDepth + 2)
    private val localsPool = new Array[Array[Long]](maxCallDepth + 2)

    private def invokeGuest(funcIdx: Int, args: Array[Long]): Array[Long] = {
      val n = module.numImportedFuncs
      val ft = module.funcType(funcIdx)
      val code = module.codes(funcIdx - n)
      var fn = flatCache(funcIdx - n)
      if (fn == null) {
        fn = FlatCompiler.compile(module, code.body, ft.results.size)
        flatCache(funcIdx - n) = fn
      }
      val nLoc = ft.params.size + code.locals.size
      var locals = localsPool(callDepth)
      if (locals == null || locals.length < nLoc) {
        locals = new Array[Long](math.max(nLoc, 16))
        localsPool(callDepth) = locals
      } else java.util.Arrays.fill(locals, ft.params.size, nLoc, 0L)
      System.arraycopy(args, 0, locals, 0, ft.params.size)
      var stack = stackPool(callDepth)
      if (stack == null) { stack = new Stack; stackPool(callDepth) = stack }
      stack.top = 0
      execFlat(fn, stack, locals)
      val res = new Array[Long](ft.results.size)
      var i = ft.results.size - 1
      while (i >= 0) { res(i) = stack.pop(); i -= 1 }
      res
    }

    /** The dispatch loop: a single Int-switched walk over the flat
      * program. Jump ops carry their unwind (base, arity) packed in the
      * long operand (-1 = structural jump, no unwind); a negative jump
      * target means "return" (a branch to the function label). */
    private def execFlat(fn: FlatFunc, stack: Stack, locals: Array[Long]): Unit = {
      import Flat._
      val ops = fn.ops; val xs = fn.xs; val ys = fn.ys; val zs = fn.zs
      val n = ops.length
      // Fuel is charged ONCE per straight-line stretch: the body length
      // on entry plus the span of every backward branch taken (= the
      // loop body just executed) and 1 per call — the same budget
      // semantics as per-instruction metering without the per-step
      // field traffic. Runaway execution is always a backward branch or
      // a call, so it still traps.
      fuel -= n
      if (fuel < 0)
        throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)")
      var pc = 0
      while (pc < n) {
        val op = ops(pc)
        op match {
          case LocalGetOp => stack.push(locals(xs(pc))); pc += 1
          case LocalSetOp => locals(xs(pc)) = stack.pop(); pc += 1
          case LocalTeeOp => locals(xs(pc)) = stack.peek; pc += 1
          case ConstOp => stack.push(ys(pc)); pc += 1
          case BinLLOp =>
            stack.push(binOp(ys(pc).toInt, locals(xs(pc)), locals(zs(pc))))
            pc += 1
          case BinLLSOp =>
            val z = zs(pc)
            locals(z >>> 16) = binOp(ys(pc).toInt, locals(xs(pc)), locals(z & 0xffff))
            pc += 1
          case BinLCOp =>
            stack.push(binOp(zs(pc), locals(xs(pc)), ys(pc))); pc += 1
          case BinLCSOp =>
            val z = zs(pc)
            locals(z & 0xffff) = binOp(z >>> 16, locals(xs(pc)), ys(pc))
            pc += 1
          case LdLOp =>
            stack.push(loadVal(zs(pc),
              (locals(xs(pc)) & 0xffffffffL) + ys(pc)))
            pc += 1
          case StLLOp =>
            val z = zs(pc)
            storeVal(z >>> 16, (locals(xs(pc)) & 0xffffffffL) + ys(pc),
              locals(z & 0xffff))
            pc += 1
          case TosBinLOp =>
            stack.push(binOp(ys(pc).toInt, stack.pop(), locals(xs(pc))))
            pc += 1
          case TosBinLSOp =>
            locals(zs(pc)) = binOp(ys(pc).toInt, stack.pop(), locals(xs(pc)))
            pc += 1
          case JCmpLLOp =>
            val z = zs(pc)
            if (binOp(z >>> 24, locals((z >> 12) & 0xfff),
                locals(z & 0xfff)).toInt != 0) {
              val y = ys(pc)
              if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case LdAOp => stack.push(loadVal(zs(pc), ys(pc))); pc += 1
          case ConstSetOp => locals(xs(pc)) = ys(pc); pc += 1
          case LdLSOp =>
            val z = zs(pc)
            locals(z & 0xffff) =
              loadVal(z >>> 16, (locals(xs(pc)) & 0xffffffffL) + ys(pc))
            pc += 1
          case LdASOp => locals(xs(pc)) = loadVal(zs(pc), ys(pc)); pc += 1
          case LdTosSOp =>
            locals(xs(pc)) =
              loadVal(zs(pc), (stack.pop() & 0xffffffffL) + ys(pc))
            pc += 1
          case StACOp =>
            storeVal(zs(pc), xs(pc).toLong & 0xffffffffL, ys(pc)); pc += 1
          case TosBinCOp =>
            stack.push(binOp(zs(pc), stack.pop(), ys(pc))); pc += 1
          case TosBinCSOp =>
            locals(xs(pc)) = binOp(zs(pc), stack.pop(), ys(pc)); pc += 1
          case BinSSSOp =>
            val b = stack.pop()
            locals(xs(pc)) = binOp(ys(pc).toInt, stack.pop(), b); pc += 1
          case JzBinOp =>
            val b = stack.pop(); val a = stack.pop()
            if (binOp(zs(pc), a, b).toInt == 0) {
              val y = ys(pc)
              if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case JnzBinOp =>
            val b = stack.pop(); val a = stack.pop()
            if (binOp(zs(pc), a, b).toInt != 0) {
              val y = ys(pc)
              if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case JzBinLCOp =>
            val z = zs(pc)
            if (binOp(z >>> 16, locals(z & 0xffff), ys(pc)).toInt == 0) {
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case StLBinLCOp =>
            val z = zs(pc); val y = ys(pc)
            storeVal((z >>> 16) & 0xff,
              (locals(xs(pc)) & 0xffffffffL) + (y >>> 32),
              binOp(z >>> 24, locals(z & 0xffff), y.toInt.toLong))
            pc += 1
          case LdATosBinLSOp =>
            val z = zs(pc)
            locals(xs(pc)) = binOp((z >>> 16) & 0xff,
              loadVal(z >>> 24, ys(pc)), locals(z & 0xffff))
            pc += 1
          case RangeAndOp =>
            val z = zs(pc); val y = ys(pc)
            stack.push(binOp(z >>> 24, locals((z >>> 8) & 0xff),
              (y >>> 32).toInt.toLong) &
              binOp((z >>> 16) & 0xff, locals(z & 0xff), y.toInt.toLong))
            pc += 1
          case RangeOrOp =>
            val z = zs(pc); val y = ys(pc)
            stack.push(binOp(z >>> 24, locals((z >>> 8) & 0xff),
              (y >>> 32).toInt.toLong) |
              binOp((z >>> 16) & 0xff, locals(z & 0xff), y.toInt.toLong))
            pc += 1
          case JzRangeAndOp =>
            val z = zs(pc); val y = ys(pc)
            if ((binOp(z >>> 24, locals((z >>> 8) & 0xff),
                (y >>> 32).toInt.toLong) &
                binOp((z >>> 16) & 0xff, locals(z & 0xff),
                  y.toInt.toLong)).toInt == 0) {
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case JzRangeOrOp =>
            val z = zs(pc); val y = ys(pc)
            if ((binOp(z >>> 24, locals((z >>> 8) & 0xff),
                (y >>> 32).toInt.toLong) |
                binOp((z >>> 16) & 0xff, locals(z & 0xff),
                  y.toInt.toLong)).toInt == 0) {
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case JzLOp =>
            if (locals(zs(pc)).toInt == 0) {
              val y = ys(pc)
              if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case JnzLOp =>
            if (locals(zs(pc)).toInt != 0) {
              val y = ys(pc)
              if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case JmpOp =>
            val y = ys(pc)
            if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
            val t = xs(pc)
            if (t < 0) return
            if (t <= pc) { fuel -= pc - t + 1
              if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
            pc = t
          case JzOp =>
            if (stack.pop().toInt == 0) {
              val y = ys(pc)
              if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case JnzOp =>
            if (stack.pop().toInt != 0) {
              val y = ys(pc)
              if (y >= 0) stack.unwind((y >>> 32).toInt, y.toInt)
              val t = xs(pc)
              if (t < 0) return
              if (t <= pc) { fuel -= pc - t + 1
                if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
              pc = t
            } else pc += 1
          case BrTableOp =>
            val t = fn.tables(xs(pc))
            val arms = t.length / 3 - 1
            val idx = stack.pop().toInt
            val row = (if (idx >= 0 && idx < arms) idx else arms) * 3
            stack.unwind(t(row + 1), t(row + 2))
            val tgt = t(row)
            if (tgt < 0) return
            if (tgt <= pc) { fuel -= pc - tgt + 1
              if (fuel < 0) throw new WasmTrap(s"fuel exhausted ($maxFuel instructions)") }
            pc = tgt
          case ReturnOp => return
          case CallOp =>
            fuel -= 1
            val f = xs(pc)
            val ft = module.funcType(f)
            val as = new Array[Long](ft.params.size)
            var j = ft.params.size - 1
            while (j >= 0) { as(j) = stack.pop(); j -= 1 }
            val r = invoke(f, as)
            var k = 0
            while (k < r.length) { stack.push(r(k)); k += 1 }
            pc += 1
          case CallIndOp =>
            fuel -= 1
            val elem = stack.pop().toInt
            if (elem < 0 || elem >= table.length || table(elem) < 0)
              throw new WasmTrap(s"undefined table element $elem")
            val f = table(elem)
            val want = module.types(xs(pc))
            if (module.funcType(f) != want)
              throw new WasmTrap("indirect call type mismatch")
            val as = new Array[Long](want.params.size)
            var j = want.params.size - 1
            while (j >= 0) { as(j) = stack.pop(); j -= 1 }
            val r = invoke(f, as)
            var k = 0
            while (k < r.length) { stack.push(r(k)); k += 1 }
            pc += 1
          case DropOp => stack.pop(); pc += 1
          case SelectOp =>
            val c = stack.pop().toInt; val b = stack.pop(); val a = stack.pop()
            stack.push(if (c != 0) a else b); pc += 1
          case GlobalGetOp => stack.push(globals(xs(pc))); pc += 1
          case GlobalSetOp => globals(xs(pc)) = stack.pop(); pc += 1
          case MemSizeOp => stack.push(memory.sizePages.toLong); pc += 1
          case MemGrowOp =>
            stack.push(memory.grow(stack.pop().toInt).toLong); pc += 1
          case MemCopyOp =>
            val cnt = stack.pop(); val src = stack.pop(); val dst = stack.pop()
            memory.copy(dst & 0xffffffffL, src & 0xffffffffL, cnt & 0xffffffffL)
            pc += 1
          case MemFillOp =>
            val cnt = stack.pop(); val v = stack.pop(); val dst = stack.pop()
            memory.fill(dst & 0xffffffffL, v.toInt, cnt & 0xffffffffL)
            pc += 1
          case UnreachOp => throw new WasmTrap("unreachable executed")
          case TruncSatOp => truncSat(xs(pc), stack); pc += 1
          case _ =>
            if (op >= 0x28 && op <= 0x35) loadOp(op, ys(pc), stack)
            else if (op >= 0x36 && op <= 0x3e) storeOp(op, ys(pc), stack)
            else if (Flat.isBinary(op)) {
              val b = stack.pop()
              stack.push(binOp(op, stack.pop(), b))
            } else stack.push(unOp(op, stack.pop()))
            pc += 1
        }
      }
    }

    private def loadOp(op: Int, off: Long, stack: Stack): Unit =
      stack.push(loadVal(op, (stack.pop() & 0xffffffffL) + off))

    private def loadVal(op: Int, a: Long): Long = {
      (op match {
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
    }

    private def storeOp(op: Int, off: Long, stack: Stack): Unit = {
      val v = stack.pop()
      storeVal(op, (stack.pop() & 0xffffffffL) + off, v)
    }

    private def storeVal(op: Int, a: Long, v: Long): Unit = {
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
    }

    @inline private def f32of(bits: Long): Float =
      java.lang.Float.intBitsToFloat(bits.toInt)
    @inline private def f64of(bits: Long): Double =
      java.lang.Double.longBitsToDouble(bits)
    @inline private def b2l(b: Boolean): Long = if (b) 1L else 0L

    @inline private def f32r(v: Float): Long =
      java.lang.Float.floatToRawIntBits(v).toLong
    @inline private def f64r(v: Double): Long =
      java.lang.Double.doubleToRawLongBits(v)

    /** Every BINARY numeric op as a pure (a, b) -> value function —
      * superinstructions feed it straight from locals/consts with no
      * operand-stack traffic. */
    private def binOp(op: Int, av: Long, bv: Long): Long = op match {
      // ---- i32 compare
      case 0x46 => b2l(av.toInt == bv.toInt)
      case 0x47 => b2l(av.toInt != bv.toInt)
      case 0x48 => b2l(av.toInt < bv.toInt)
      case 0x49 => b2l(java.lang.Integer.compareUnsigned(av.toInt, bv.toInt) < 0)
      case 0x4a => b2l(av.toInt > bv.toInt)
      case 0x4b => b2l(java.lang.Integer.compareUnsigned(av.toInt, bv.toInt) > 0)
      case 0x4c => b2l(av.toInt <= bv.toInt)
      case 0x4d => b2l(java.lang.Integer.compareUnsigned(av.toInt, bv.toInt) <= 0)
      case 0x4e => b2l(av.toInt >= bv.toInt)
      case 0x4f => b2l(java.lang.Integer.compareUnsigned(av.toInt, bv.toInt) >= 0)
      // ---- i64 compare
      case 0x51 => b2l(av == bv)
      case 0x52 => b2l(av != bv)
      case 0x53 => b2l(av < bv)
      case 0x54 => b2l(java.lang.Long.compareUnsigned(av, bv) < 0)
      case 0x55 => b2l(av > bv)
      case 0x56 => b2l(java.lang.Long.compareUnsigned(av, bv) > 0)
      case 0x57 => b2l(av <= bv)
      case 0x58 => b2l(java.lang.Long.compareUnsigned(av, bv) <= 0)
      case 0x59 => b2l(av >= bv)
      case 0x5a => b2l(java.lang.Long.compareUnsigned(av, bv) >= 0)
      // ---- f32 compare
      case 0x5b => b2l(f32of(av) == f32of(bv))
      case 0x5c => b2l(f32of(av) != f32of(bv))
      case 0x5d => b2l(f32of(av) < f32of(bv))
      case 0x5e => b2l(f32of(av) > f32of(bv))
      case 0x5f => b2l(f32of(av) <= f32of(bv))
      case 0x60 => b2l(f32of(av) >= f32of(bv))
      // ---- f64 compare
      case 0x61 => b2l(f64of(av) == f64of(bv))
      case 0x62 => b2l(f64of(av) != f64of(bv))
      case 0x63 => b2l(f64of(av) < f64of(bv))
      case 0x64 => b2l(f64of(av) > f64of(bv))
      case 0x65 => b2l(f64of(av) <= f64of(bv))
      case 0x66 => b2l(f64of(av) >= f64of(bv))
      // ---- i32 arithmetic
      case 0x6a => (av.toInt + bv.toInt).toLong
      case 0x6b => (av.toInt - bv.toInt).toLong
      case 0x6c => (av.toInt * bv.toInt).toLong
      case 0x6d =>
        val a = av.toInt; val b = bv.toInt
        if (b == 0) throw new WasmTrap("integer divide by zero")
        if (a == Int.MinValue && b == -1) throw new WasmTrap("integer overflow")
        (a / b).toLong
      case 0x6e =>
        if (bv.toInt == 0) throw new WasmTrap("integer divide by zero")
        java.lang.Integer.divideUnsigned(av.toInt, bv.toInt).toLong
      case 0x6f =>
        val a = av.toInt; val b = bv.toInt
        if (b == 0) throw new WasmTrap("integer divide by zero")
        (if (a == Int.MinValue && b == -1) 0 else a % b).toLong
      case 0x70 =>
        if (bv.toInt == 0) throw new WasmTrap("integer divide by zero")
        java.lang.Integer.remainderUnsigned(av.toInt, bv.toInt).toLong
      case 0x71 => (av.toInt & bv.toInt).toLong
      case 0x72 => (av.toInt | bv.toInt).toLong
      case 0x73 => (av.toInt ^ bv.toInt).toLong
      case 0x74 => (av.toInt << bv.toInt).toLong
      case 0x75 => (av.toInt >> bv.toInt).toLong
      case 0x76 => (av.toInt >>> bv.toInt).toLong
      case 0x77 => java.lang.Integer.rotateLeft(av.toInt, bv.toInt).toLong
      case 0x78 => java.lang.Integer.rotateRight(av.toInt, bv.toInt).toLong
      // ---- i64 arithmetic
      case 0x7c => av + bv
      case 0x7d => av - bv
      case 0x7e => av * bv
      case 0x7f =>
        if (bv == 0) throw new WasmTrap("integer divide by zero")
        if (av == Long.MinValue && bv == -1) throw new WasmTrap("integer overflow")
        av / bv
      case 0x80 =>
        if (bv == 0) throw new WasmTrap("integer divide by zero")
        java.lang.Long.divideUnsigned(av, bv)
      case 0x81 =>
        if (bv == 0) throw new WasmTrap("integer divide by zero")
        if (av == Long.MinValue && bv == -1) 0L else av % bv
      case 0x82 =>
        if (bv == 0) throw new WasmTrap("integer divide by zero")
        java.lang.Long.remainderUnsigned(av, bv)
      case 0x83 => av & bv
      case 0x84 => av | bv
      case 0x85 => av ^ bv
      case 0x86 => av << bv
      case 0x87 => av >> bv
      case 0x88 => av >>> bv
      case 0x89 => java.lang.Long.rotateLeft(av, bv.toInt)
      case 0x8a => java.lang.Long.rotateRight(av, bv.toInt)
      // ---- f32 arithmetic
      case 0x92 => f32r(f32of(av) + f32of(bv))
      case 0x93 => f32r(f32of(av) - f32of(bv))
      case 0x94 => f32r(f32of(av) * f32of(bv))
      case 0x95 => f32r(f32of(av) / f32of(bv))
      case 0x96 => f32r(math.min(f32of(av), f32of(bv)))
      case 0x97 => f32r(math.max(f32of(av), f32of(bv)))
      case 0x98 => f32r(java.lang.Math.copySign(f32of(av), f32of(bv)))
      // ---- f64 arithmetic
      case 0xa0 => f64r(f64of(av) + f64of(bv))
      case 0xa1 => f64r(f64of(av) - f64of(bv))
      case 0xa2 => f64r(f64of(av) * f64of(bv))
      case 0xa3 => f64r(f64of(av) / f64of(bv))
      case 0xa4 => f64r(math.min(f64of(av), f64of(bv)))
      case 0xa5 => f64r(math.max(f64of(av), f64of(bv)))
      case 0xa6 => f64r(java.lang.Math.copySign(f64of(av), f64of(bv)))
      case other => throw new WasmTrap(f"unsupported binary op 0x$other%02x")
    }

    /** Every UNARY numeric op as a pure value -> value function. */
    private def unOp(op: Int, v: Long): Long = op match {
      case 0x45 => b2l(v.toInt == 0)                       // i32.eqz
      case 0x50 => b2l(v == 0L)                            // i64.eqz
      case 0x67 => java.lang.Integer.numberOfLeadingZeros(v.toInt).toLong
      case 0x68 => java.lang.Integer.numberOfTrailingZeros(v.toInt).toLong
      case 0x69 => java.lang.Integer.bitCount(v.toInt).toLong
      case 0x79 => java.lang.Long.numberOfLeadingZeros(v).toLong
      case 0x7a => java.lang.Long.numberOfTrailingZeros(v).toLong
      case 0x7b => java.lang.Long.bitCount(v).toLong
      // ---- f32 unary
      case 0x8b => f32r(math.abs(f32of(v)))
      case 0x8c => f32r(-f32of(v))
      case 0x8d => f32r(math.ceil(f32of(v).toDouble).toFloat)
      case 0x8e => f32r(math.floor(f32of(v).toDouble).toFloat)
      case 0x8f =>
        val x = f32of(v)
        f32r((if (x < 0) math.ceil(x.toDouble) else math.floor(x.toDouble)).toFloat)
      case 0x90 => f32r(math.rint(f32of(v).toDouble).toFloat)
      case 0x91 => f32r(math.sqrt(f32of(v).toDouble).toFloat)
      // ---- f64 unary
      case 0x99 => f64r(math.abs(f64of(v)))
      case 0x9a => f64r(-f64of(v))
      case 0x9b => f64r(math.ceil(f64of(v)))
      case 0x9c => f64r(math.floor(f64of(v)))
      case 0x9d => val x = f64of(v); f64r(if (x < 0) math.ceil(x) else math.floor(x))
      case 0x9e => f64r(math.rint(f64of(v)))
      case 0x9f => f64r(math.sqrt(f64of(v)))
      // ---- conversions
      case 0xa7 => v.toInt.toLong                          // i32.wrap_i64
      case 0xa8 => truncToI32(f32of(v).toDouble, signed = true)
      case 0xa9 => truncToI32(f32of(v).toDouble, signed = false)
      case 0xaa => truncToI32(f64of(v), signed = true)
      case 0xab => truncToI32(f64of(v), signed = false)
      case 0xac => v.toInt.toLong                          // i64.extend_i32_s
      case 0xad => v & 0xffffffffL                         // i64.extend_i32_u
      case 0xae => truncToI64(f32of(v).toDouble, signed = true)
      case 0xaf => truncToI64(f32of(v).toDouble, signed = false)
      case 0xb0 => truncToI64(f64of(v), signed = true)
      case 0xb1 => truncToI64(f64of(v), signed = false)
      case 0xb2 => f32r(v.toInt.toFloat)                   // f32.convert_i32_s
      case 0xb3 => f32r((v & 0xffffffffL).toFloat)
      case 0xb4 => f32r(v.toFloat)
      case 0xb5 => f32r(if (v >= 0) v.toFloat else ((v >>> 1) | (v & 1)).toFloat * 2.0f)
      case 0xb6 => f32r(f64of(v).toFloat)                  // f32.demote
      case 0xb7 => f64r(v.toInt.toDouble)
      case 0xb8 => f64r((v & 0xffffffffL).toDouble)
      case 0xb9 => f64r(v.toDouble)
      case 0xba => f64r(if (v >= 0) v.toDouble else ((v >>> 1) | (v & 1)).toDouble * 2.0)
      case 0xbb => f64r(f32of(v).toDouble)                 // f64.promote
      // reinterprets are no-ops up to the canonical sign-extended i32 form
      case 0xbc => v.toInt.toLong  // i32.reinterpret_f32
      case 0xbd => v               // i64.reinterpret_f64 — raw bits
      case 0xbe => v.toInt.toLong  // f32.reinterpret_i32
      case 0xbf => v               // f64.reinterpret_i64 — raw bits
      // ---- sign extension
      case 0xc0 => v.toByte.toLong                         // i32.extend8_s
      case 0xc1 => v.toShort.toLong                        // i32.extend16_s
      case 0xc2 => v.toByte.toLong                         // i64.extend8_s
      case 0xc3 => v.toShort.toLong                        // i64.extend16_s
      case 0xc4 => v.toInt.toLong                          // i64.extend32_s
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

  // One compiled-function array per live Module (weak: dropping the
  // module drops its compiled form). compile() is deterministic, so a
  // benign race at most compiles a body twice.
  private val flatCaches =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Module, Array[FlatFunc]]())
  private def flatCacheFor(module: Module): Array[FlatFunc] = {
    val got = flatCaches.get(module)
    if (got != null) got
    else {
      val fresh = new Array[FlatFunc](module.codes.size)
      val prev = flatCaches.putIfAbsent(module, fresh)
      if (prev != null) prev else fresh
    }
  }

  /** Test hook: the flat opcode stream of one guest function (by
    * body index), for pinning which superinstructions fire. */
  private[wasm] def flatOpsOf(module: Module, bodyIdx: Int): Array[Int] = {
    val ft = module.funcType(module.numImportedFuncs + bodyIdx)
    FlatCompiler.compile(module, module.codes(bodyIdx).body,
      ft.results.size).ops
  }

  // -------------------------------------------------- flat compilation

  /** Synthetic opcodes for the flat program; real wasm opcodes
    * (loads 0x28-0x35, stores 0x36-0x3e, numeric 0x45-0xc4) pass
    * through unchanged, so they never collide with this 0x200 range. */
  private object Flat {
    final val JmpOp = 0x200
    final val JzOp = 0x201
    final val JnzOp = 0x202
    final val BrTableOp = 0x203
    final val ReturnOp = 0x204
    final val CallOp = 0x205
    final val CallIndOp = 0x206
    final val LocalGetOp = 0x207
    final val LocalSetOp = 0x208
    final val LocalTeeOp = 0x209
    final val GlobalGetOp = 0x20a
    final val GlobalSetOp = 0x20b
    final val ConstOp = 0x20c
    final val DropOp = 0x20d
    final val SelectOp = 0x20e
    final val MemSizeOp = 0x20f
    final val MemGrowOp = 0x210
    final val MemCopyOp = 0x211
    final val MemFillOp = 0x212
    final val UnreachOp = 0x213
    final val TruncSatOp = 0x214
    // superinstructions (peephole-fused local/const/arith/branch runs)
    final val BinLLOp = 0x215   // push(binop(l[x], l[z]))            y=op
    final val BinLLSOp = 0x216  // l[dst]=binop(l[x], l[z&ffff])      y=op, dst=z>>>16
    final val BinLCOp = 0x217   // push(binop(l[x], const))           y=const, z=op
    final val BinLCSOp = 0x218  // l[z&ffff]=binop(l[x], const)       y=const, z=op<<16|dst
    final val JzLOp = 0x219     // if (l[z].toInt == 0) branch        x=target, y=unwind
    final val JnzLOp = 0x21a    // if (l[z].toInt != 0) branch
    final val LdLOp = 0x21b     // push(load(z, l[x] + off))          y=off
    final val StLLOp = 0x21c    // store(z>>>16, l[x] + off, l[z&ffff]) y=off
    final val TosBinLOp = 0x21d // push(binop(pop, l[x]))             y=op
    final val TosBinLSOp = 0x21e // l[z] = binop(pop, l[x])           y=op
    final val JCmpLLOp = 0x21f  // if (binop(z>>>24, l[z>>12&fff], l[z&fff])) br
    final val LdAOp = 0x220     // push(load(z, y))                   y=abs addr
    final val ConstSetOp = 0x221 // l[x] = y
    // memory-run superinstructions (round 14): the load→modify→store→
    // advance shapes of byte-looping guests collapse to one dispatch
    final val LdLSOp = 0x222    // l[z&ffff] = load(z>>>16, l[x]+y)
    final val LdASOp = 0x223    // l[x] = load(z, y)                  y=abs addr
    final val LdTosSOp = 0x224  // l[x] = load(z, pop+y)
    final val StACOp = 0x225    // store(z, x, y)                     x=abs addr
    final val TosBinCOp = 0x226 // push(binop(z, pop, y))             y=const
    final val TosBinCSOp = 0x227 // l[x] = binop(z, pop, y)
    final val BinSSSOp = 0x228  // b=pop; l[x] = binop(y, pop, b)
    final val JzBinOp = 0x229   // b=pop; if (binop(z, pop, b)==0) br x (y=unwind)
    final val JnzBinOp = 0x22a  // b=pop; if (binop(z, pop, b)!=0) br x
    final val JzBinLCOp = 0x22b // if (binop(z>>>16, l[z&ffff], y)==0) br x
    final val StLBinLCOp = 0x22c // store((z>>>16)&ff, l[x]+(y>>>32), binop(z>>>24, l[z&ffff], y.toInt))
    final val LdATosBinLSOp = 0x22d // l[x] = binop((z>>>16)&ff, load(z>>>24, y), l[z&ffff])
    // combined two-comparison tests (the range-check shape):
    //   push(binop(op1, l[a], c1) <&/|> binop(op2, l[b], c2))
    // ys = (c1<<32)|c2, zs = (op1<<24)|(op2<<16)|(a<<8)|b
    final val RangeAndOp = 0x22e
    final val RangeOrOp = 0x22f
    final val JzRangeAndOp = 0x230 // ...== 0 -> jump xs (structural)
    final val JzRangeOrOp = 0x231

    def isBinary(op: Int): Boolean =
      (op >= 0x46 && op <= 0x66 && op != 0x50) ||
        (op >= 0x6a && op <= 0x78) || (op >= 0x7c && op <= 0x8a) ||
        (op >= 0x92 && op <= 0x98) || (op >= 0xa0 && op <= 0xa6)
  }

  /** One compiled function: parallel opcode/operand arrays plus the
    * br_table rows ([target, unwindBase, keepArity] per arm; the last
    * row is the default; target -1 = return). */
  final class FlatFunc(val ops: Array[Int], val xs: Array[Int],
      val ys: Array[Long], val zs: Array[Int], val tables: Array[Array[Int]])

  /**
   * Compiles a decoded instruction tree into a flat jump-threaded
   * program. Wasm validation makes the operand-stack height at every
   * instruction STATIC, so each branch's unwind (the label's stack
   * base and arity) is computed here once instead of being tracked by
   * runtime block frames; statically dead code after an unconditional
   * terminator is simply not emitted (it is unreachable by
   * construction in validated modules).
   */
  private object FlatCompiler {
    import Flat._
    import scala.collection.mutable.ArrayBuffer

    private final class Frame(val isLoop: Boolean, val base: Int,
        val arity: Int, val loopStart: Int) {
      val insPatches = new ArrayBuffer[Int]()   // xs(pc) to point at end
      val tblPatches = new ArrayBuffer[(Int, Int)]() // (tableIdx, row offset)
    }

    def compile(module: Module, body: Vector[Instr], funcResults: Int): FlatFunc = {
      val ops = new ArrayBuffer[Int]()
      val xs = new ArrayBuffer[Int]()
      val ys = new ArrayBuffer[Long]()
      val zs = new ArrayBuffer[Int]()
      val tables = new ArrayBuffer[Array[Int]]()

      def emit(op: Int, x: Int = 0, y: Long = 0L, z: Int = 0): Int = {
        ops += op; xs += x; ys += y; zs += z; ops.size - 1
      }
      def pack(base: Int, arity: Int): Long =
        (base.toLong << 32) | (arity.toLong & 0xffffffffL)

      /** Stack delta of a numeric opcode (binary -1, unary 0). */
      def numDelta(op: Int): Int =
        if (op == 0x45 || op == 0x50) 0
        else if (op >= 0x46 && op <= 0x66) -1
        else if (op >= 0x67 && op <= 0x69) 0
        else if (op >= 0x6a && op <= 0x78) -1
        else if (op >= 0x79 && op <= 0x7b) 0
        else if (op >= 0x7c && op <= 0x8a) -1
        else if (op >= 0x8b && op <= 0x91) 0
        else if (op >= 0x92 && op <= 0x98) -1
        else if (op >= 0x99 && op <= 0x9f) 0
        else if (op >= 0xa0 && op <= 0xa6) -1
        else 0 // conversions / sign extensions

      /** Emits a branch to label depth `d`; frames.head is innermost,
        * the function label is past the end of `frames`. `z` carries a
        * fused local index for JzL/JnzL shapes. */
      def emitBr(kind: Int, d: Int, frames: List[Frame], z: Int = 0): Unit = {
        if (d >= frames.size) {
          // branch to the function label: results already on top
          if (kind == JmpOp) { emit(ReturnOp); () }
          else { emit(kind, -1, pack(0, funcResults), z); () }
        } else {
          val f = frames(d)
          if (f.isLoop) { emit(kind, f.loopStart, pack(f.base, f.arity), z); () }
          else f.insPatches += emit(kind, 0, pack(f.base, f.arity), z)
        }
      }

      /** Compiles one instruction sequence at entry height `h0`;
        * returns true when the sequence ends in an unconditional
        * terminator (the rest of the enclosing block is dead). */
      def seq(instrs: Vector[Instr], frames: List[Frame], h0: Int): Boolean = {
        var h = h0
        var i = 0
        val n = instrs.size
        // condition-fusion bookkeeping: when the op emitted by the
        // PREVIOUS step of this sequence produced the value an `if`
        // is about to test, the If rewrites that slot into a fused
        // conditional jump. Only same-sequence adjacency is safe —
        // a label can never target the interior of the pair.
        var condPc = -1   // pc of the rewritable condition producer
        var condKind = 0  // 1 = raw stack binop, 2 = BinLC (local op const)
        while (i < n) {
          val prevCondPc = if (condPc == ops.size - 1) condPc else -1
          val prevCondKind = condKind
          condPc = -1; condKind = 0
          // peephole superinstructions: local/const/arith runs and fused
          // branch tests collapse to one dispatch with no stack traffic
          // (labels can only target block boundaries, never a fused
          // interior, so fusion inside one sequence is always safe)
          val fused = instrs(i) match {
            case LocalGet(a) if a <= 0xffff && i + 2 < n =>
              (instrs(i + 1), instrs(i + 2)) match {
                case (LocalGet(b), Num(op)) if b <= 0xffff && isBinary(op) =>
                  (if (i + 3 < n) instrs(i + 3) else Nop) match {
                    case LocalSet(d) if d <= 0xffff =>
                      emit(BinLLSOp, a, op.toLong, (d << 16) | b); 4
                    case BrIf(d) if a <= 0xfff && b <= 0xfff =>
                      emitBr(JCmpLLOp, d, frames,
                        (op << 24) | (a << 12) | b); 4
                    case _ => emit(BinLLOp, a, op.toLong, b); h += 1; 3
                  }
                // two local-vs-const comparisons combined by and/or — the
                // range-check shape — collapse to ONE dispatch (and fuse
                // into the following `if` when there is one)
                case (I32Const(c1), Num(op1)) if a <= 0xff && isBinary(op1) &&
                    i + 6 < n &&
                    (instrs(i + 3) match {
                      case LocalGet(b) => b <= 0xff; case _ => false
                    }) && instrs(i + 4).isInstanceOf[I32Const] &&
                    (instrs(i + 5) match {
                      case Num(op2) => isBinary(op2); case _ => false
                    }) &&
                    (instrs(i + 6) match {
                      case Num(0x71) | Num(0x72) => true; case _ => false
                    }) =>
                  val b2 = instrs(i + 3).asInstanceOf[LocalGet].i
                  val c2 = instrs(i + 4).asInstanceOf[I32Const].v
                  val op2 = instrs(i + 5).asInstanceOf[Num].op
                  val comb = instrs(i + 6).asInstanceOf[Num].op
                  condPc = emit(if (comb == 0x71) RangeAndOp else RangeOrOp, 0,
                    ((c1.toLong & 0xffffffffL) << 32) | (c2.toLong & 0xffffffffL),
                    (op1 << 24) | (op2 << 16) | (a << 8) | b2)
                  condKind = 3
                  h += 1; 7
                case (I32Const(c), Num(op)) if isBinary(op) =>
                  (if (i + 3 < n) instrs(i + 3) else Nop) match {
                    case LocalSet(d) if d <= 0xffff =>
                      emit(BinLCSOp, a, c.toLong, (op << 16) | d); 4
                    case _ =>
                      condPc = emit(BinLCOp, a, c.toLong, op); condKind = 2
                      h += 1; 3
                  }
                case (I64Const(c), Num(op)) if isBinary(op) =>
                  (if (i + 3 < n) instrs(i + 3) else Nop) match {
                    case LocalSet(d) if d <= 0xffff =>
                      emit(BinLCSOp, a, c, (op << 16) | d); 4
                    case _ =>
                      condPc = emit(BinLCOp, a, c, op); condKind = 2
                      h += 1; 3
                  }
                case (Num(0x45), BrIf(d)) => emitBr(JzLOp, d, frames, a); 3
                case (BrIf(d), _) => emitBr(JnzLOp, d, frames, a); 2
                // read-modify-write of a guest memory cell in one
                // dispatch: store(sop, l[a]+off, binop(op, l[b], c))
                case (LocalGet(b), I32Const(c)) if b <= 0xffff && i + 4 < n &&
                    (instrs(i + 3) match {
                      case Num(op) if isBinary(op) => true; case _ => false
                    }) && instrs(i + 4).isInstanceOf[Store] =>
                  val op = instrs(i + 3).asInstanceOf[Num].op
                  val st = instrs(i + 4).asInstanceOf[Store]
                  emit(StLBinLCOp, a,
                    ((st.offset & 0xffffffffL) << 32) | (c.toLong & 0xffffffffL),
                    (op << 24) | (st.op << 16) | b)
                  5
                case (LocalGet(b), Store(sop, off)) if b <= 0xffff =>
                  emit(StLLOp, a, off.toLong, (sop << 16) | b); 3
                case (Load(lop, off), LocalSet(d)) if d <= 0xffff =>
                  emit(LdLSOp, a, off.toLong, (lop << 16) | d); 3
                case (Load(lop, off), _) =>
                  emit(LdLOp, a, off.toLong, lop); h += 1; 2
                case (Num(op), LocalSet(d)) if isBinary(op) && d <= 0xffff =>
                  emit(TosBinLSOp, a, op.toLong, d); h -= 1; 3
                case (Num(op), _) if isBinary(op) =>
                  emit(TosBinLOp, a, op.toLong); 2
                case _ => 0
              }
            case LocalGet(a) if a <= 0xffff && i + 1 < n =>
              instrs(i + 1) match {
                case BrIf(d) => emitBr(JnzLOp, d, frames, a); 2
                case Load(lop, off) => emit(LdLOp, a, off.toLong, lop); h += 1; 2
                case Num(op) if isBinary(op) => emit(TosBinLOp, a, op.toLong); 2
                case _ => 0
              }
            case I32Const(c) if i + 1 < n =>
              instrs(i + 1) match {
                case Load(lop, off) =>
                  val abs = (c.toLong & 0xffffffffL) + off
                  (if (i + 2 < n) instrs(i + 2) else Nop) match {
                    case LocalSet(d) => emit(LdASOp, d, abs, lop); 3
                    case LocalGet(b) if b <= 0xffff && i + 4 < n &&
                        (instrs(i + 3) match {
                          case Num(op) if isBinary(op) => true; case _ => false
                        }) && instrs(i + 4).isInstanceOf[LocalSet] =>
                      // l[d] = binop(op, load(lop, abs), l[b]) — the
                      // cursor+index address computation of byte loops
                      val op = instrs(i + 3).asInstanceOf[Num].op
                      val d = instrs(i + 4).asInstanceOf[LocalSet].i
                      emit(LdATosBinLSOp, d, abs, (lop << 24) | (op << 16) | b)
                      5
                    case _ => emit(LdAOp, 0, abs, lop); h += 1; 2
                  }
                case I32Const(v) if i + 2 < n && c >= 0 &&
                    instrs(i + 2).isInstanceOf[Store] &&
                    c.toLong + instrs(i + 2).asInstanceOf[Store].offset <= 0x7fffffffL =>
                  val st = instrs(i + 2).asInstanceOf[Store]
                  emit(StACOp, (c.toLong + st.offset).toInt, v.toLong, st.op); 3
                case Num(op) if isBinary(op) =>
                  (if (i + 2 < n) instrs(i + 2) else Nop) match {
                    case LocalSet(d) =>
                      emit(TosBinCSOp, d, c.toLong, op); h -= 1; 3
                    case _ => emit(TosBinCOp, 0, c.toLong, op); 2
                  }
                case LocalSet(d) => emit(ConstSetOp, d, c.toLong); 2
                case _ => 0
              }
            case I64Const(c) if i + 1 < n =>
              instrs(i + 1) match {
                case Num(op) if isBinary(op) =>
                  (if (i + 2 < n) instrs(i + 2) else Nop) match {
                    case LocalSet(d) => emit(TosBinCSOp, d, c, op); h -= 1; 3
                    case _ => emit(TosBinCOp, 0, c, op); 2
                  }
                case LocalSet(d) => emit(ConstSetOp, d, c); 2
                case _ => 0
              }
            // raw stack shapes: binop feeding a local/branch, load into
            // a local — each one dispatch instead of two
            case Num(op) if isBinary(op) && i + 1 < n =>
              instrs(i + 1) match {
                case LocalSet(d) => emit(BinSSSOp, d, op.toLong); h -= 2; 2
                case BrIf(d) => emitBr(JnzBinOp, d, frames, op); h -= 2; 2
                case _ => 0
              }
            case Load(lop, off) if i + 1 < n =>
              instrs(i + 1) match {
                case LocalSet(d) => emit(LdTosSOp, d, off, lop); h -= 1; 2
                case _ => 0
              }
            case _ => 0
          }
          if (fused > 0) { i += fused }
          else {
          instrs(i) match {
            case Nop =>
            case Unreachable => emit(UnreachOp); return true
            case Block(bt, inner) =>
              val f = new Frame(false, h - bt.params, bt.results, -1)
              seq(inner, f :: frames, h)
              val endPc = ops.size
              f.insPatches.foreach(pc => xs(pc) = endPc)
              f.tblPatches.foreach { case (t, r) => tables(t)(r) = endPc }
              h = f.base + bt.results
            case Loop(bt, inner) =>
              val start = ops.size
              val f = new Frame(true, h - bt.params, bt.params, start)
              seq(inner, f :: frames, h)
              h = (h - bt.params) + bt.results
            case If(bt, t, e) =>
              val hIn = h - 1 // condition popped by the jump
              val entryBase = hIn - bt.params
              val f = new Frame(false, entryBase, bt.results, -1)
              // condition fusion: if the previous step of THIS sequence
              // emitted the compare/and that produced the condition,
              // fold the test into the jump itself (one dispatch)
              val jz =
                if (prevCondPc >= 0 && prevCondKind == 1) {
                  val k = prevCondPc
                  zs(k) = ops(k); ops(k) = JzBinOp; xs(k) = 0; ys(k) = -1L
                  k
                } else if (prevCondPc >= 0 && prevCondKind == 2) {
                  val k = prevCondPc
                  zs(k) = (zs(k) << 16) | xs(k); ops(k) = JzBinLCOp; xs(k) = 0
                  k
                } else if (prevCondPc >= 0 && prevCondKind == 3) {
                  val k = prevCondPc
                  ops(k) = if (ops(k) == RangeAndOp) JzRangeAndOp
                           else JzRangeOrOp
                  xs(k) = 0
                  k
                } else emit(JzOp, 0, -1L) // structural: no unwind
              val tTerm = seq(t, f :: frames, hIn)
              if (e.nonEmpty) {
                val skip = if (!tTerm) Some(emit(JmpOp, 0, -1L)) else None
                xs(jz) = ops.size
                seq(e, f :: frames, hIn)
                skip.foreach(xs(_) = ops.size)
              } else xs(jz) = ops.size
              val endPc = ops.size
              f.insPatches.foreach(pc => xs(pc) = endPc)
              f.tblPatches.foreach { case (ti, r) => tables(ti)(r) = endPc }
              h = entryBase + bt.results
            case Br(d) => emitBr(JmpOp, d, frames); return true
            case BrIf(d) => emitBr(JnzOp, d, frames); h -= 1
            case BrTable(ds, dflt) =>
              val all = ds :+ dflt
              val rows = new Array[Int](all.size * 3)
              val ti = tables.size
              tables += rows
              val pc = emit(BrTableOp, ti)
              all.zipWithIndex.foreach { case (d, k) =>
                val off = k * 3
                if (d >= frames.size) {
                  rows(off) = -1; rows(off + 1) = 0; rows(off + 2) = funcResults
                } else {
                  val f = frames(d)
                  rows(off + 1) = f.base; rows(off + 2) = f.arity
                  if (f.isLoop) rows(off) = f.loopStart
                  else f.tblPatches += ((ti, off))
                }
              }
              val _ = pc
              return true
            case Return => emit(ReturnOp); return true
            case Call(fi) =>
              val ft = module.funcType(fi)
              emit(CallOp, fi)
              h += ft.results.size - ft.params.size
            case CallIndirect(ti) =>
              val ft = module.types(ti)
              emit(CallIndOp, ti)
              h += ft.results.size - ft.params.size - 1
            case Drop => emit(DropOp); h -= 1
            case Select => emit(SelectOp); h -= 2
            case LocalGet(j) => emit(LocalGetOp, j); h += 1
            case LocalSet(j) => emit(LocalSetOp, j); h -= 1
            case LocalTee(j) => emit(LocalTeeOp, j)
            case GlobalGet(j) => emit(GlobalGetOp, j); h += 1
            case GlobalSet(j) => emit(GlobalSetOp, j); h -= 1
            case Load(op, off) => emit(op, 0, off.toLong)
            case Store(op, off) => emit(op, 0, off.toLong); h -= 2
            case MemorySize => emit(MemSizeOp); h += 1
            case MemoryGrow => emit(MemGrowOp)
            case MemoryCopy() => emit(MemCopyOp); h -= 3
            case MemoryFill() => emit(MemFillOp); h -= 3
            case I32Const(v) => emit(ConstOp, 0, v.toLong); h += 1
            case I64Const(v) => emit(ConstOp, 0, v); h += 1
            case F32Const(v) =>
              emit(ConstOp, 0, java.lang.Float.floatToRawIntBits(v).toLong); h += 1
            case F64Const(v) =>
              emit(ConstOp, 0, java.lang.Double.doubleToRawLongBits(v)); h += 1
            case Num(op) =>
              val pcN = emit(op)
              if (isBinary(op)) { condPc = pcN; condKind = 1 }
              h += numDelta(op)
            case TruncSat(op) => emit(TruncSatOp, op)
          }
          i += 1
          }
        }
        false
      }

      seq(body, Nil, 0)
      new FlatFunc(ops.toArray, xs.toArray, ys.toArray, zs.toArray,
        tables.toArray)
    }
  }
}
