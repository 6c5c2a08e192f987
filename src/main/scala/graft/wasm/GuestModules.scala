package graft.wasm

import WasmAssembler._
import WasmModule.I32

/**
 * Golden guest transforms as genuine `.wasm` binaries, assembled
 * deterministically (no toolchain in this container). Each follows the
 * SDK's processing loop (`transform-sdk/go/transform/processor.go`):
 * `check_abi_version_2`, then per batch `read_batch_header` →
 * `read_next_record`* → `write_record`*, exiting via wasi `proc_exit`
 * once the host hands back NO_ACTIVE_TRANSFORM.
 *
 * Shared guest memory layout (all scratch below the 1 KiB line):
 *   0 base_offset i64 · 8 record_count i32 · 12 leader_epoch i32 ·
 *   16 attrs i16 · 20 last_offset_delta i32 · 24 base_ts i64 ·
 *   32 max_ts i64 · 40 producer_id i64 · 48 producer_epoch i16 ·
 *   52 base_seq i32 · 56 rec_attrs u8 · 64 rec_ts i64 · 72 rec_off i64 ·
 *   120 varint cursor i32 · 128 write-options bytes · 1024 payload buf
 */
object GuestModules {

  // function types, shared across guests
  private val types = Seq(
    (Seq.empty[Byte], Seq.empty[Byte]),                 // 0: () -> ()
    (Seq.fill[Byte](10)(I32), Seq(I32)),                // 1: read_batch_header
    (Seq.fill[Byte](5)(I32), Seq(I32)),                 // 2: read_next_record
    (Seq[Byte](I32, I32), Seq(I32)),                    // 3: write_record
    (Seq.fill[Byte](4)(I32), Seq(I32)),                 // 4: write_record_with_options
    (Seq[Byte](I32), Seq.empty[Byte]),                  // 5: proc_exit
    (Seq.empty[Byte], Seq(I32)))                        // 6: () -> i32 (varint)

  private val abiImports = Seq(
    FuncImport("redpanda_transform", "check_abi_version_2", 0),  // 0
    FuncImport("redpanda_transform", "read_batch_header", 1),    // 1
    FuncImport("redpanda_transform", "read_next_record", 2),     // 2
    FuncImport("redpanda_transform", "write_record", 3),         // 3
    FuncImport("redpanda_transform", "write_record_with_options", 4), // 4
    FuncImport("wasi_snapshot_preview1", "proc_exit", 5))        // 5

  /** `read_batch_header` call with the standard scratch pointers. */
  private def callReadBatchHeader(b: Body): Body = {
    Seq(0, 8, 12, 16, 20, 24, 32, 40, 48, 52).foreach(p => b.i32Const(p))
    b.call(1)
  }

  /**
   * The batch/record double loop shared by every guest, with
   * `perRecord` splicing the guest's own logic between read and
   * advance. Locals: 0 = bufSize, 1 = record index, 2 = payload size.
   */
  private def processingLoop(perRecord: Body => Unit, extraLocals: Int,
      prologue: Body => Unit = _ => ()): Func = {
    val b = body()
    b.call(0)                                    // check_abi_version_2
    prologue(b)
    b.block()                                    //   L_EXIT
    b.loop()                                     //     L_BATCH
    callReadBatchHeader(b)
    b.localTee(0).i32Const(0).i32LtS().brIf(1)   // no more batches → exit
    b.i32Const(0).localSet(1)                    // i = 0
    b.block()                                    //     L_RECS_DONE
    b.loop()                                     //       L_REC
    b.localGet(1).i32Const(8).i32Load().i32GeS().brIf(1) // i >= record_count
    b.i32Const(56).i32Const(64).i32Const(72).i32Const(1024).localGet(0)
    b.call(2).localSet(2)                        // n = read_next_record
    b.localGet(2).i32Const(0).i32LtS().brIf(1)   // defensive: host says done
    perRecord(b)
    b.localGet(1).i32Const(1).i32Add().localSet(1)
    b.br(0)                                      // next record
    b.end().end()                                // L_REC, L_RECS_DONE
    b.br(0)                                      // next batch
    b.end().end()                                // L_BATCH, L_EXIT
    b.i32Const(0).call(5)                        // proc_exit(0)
    Func(0, 3 + extraLocals, 0, b)
  }

  /** Identity transform: every payload written back unchanged
    * (`example_mirror_test.go`). */
  lazy val mirror: Array[Byte] = module(
    types = types,
    imports = abiImports,
    funcs = Seq(processingLoop(b => {
      b.i32Const(1024).localGet(2).call(3).drop()
    }, extraLocals = 0)),
    memPages = 4,
    exports = Seq(Export("_start", 6)))

  /**
   * Uppercase transcoder: parses the payload's key/value varint
   * framing IN GUEST CODE and uppercases ASCII a-z in the value
   * bytes in place, leaving key and headers untouched.
   * Locals (beyond the loop's 0-2): 3 = key len, 4 = value len,
   * 5 = j, 6 = addr, 7 = byte.
   */
  lazy val upperValue: Array[Byte] = {
    // varint helper (type 6): zigzag-decode an i32 at *cursor, advance
    // cursor. Locals: 0 = u, 1 = byte, 2 = shift.
    val v = body()
    v.i32Const(0).localSet(0)
    v.i32Const(0).localSet(2)
    v.loop()
    v.i32Const(120).i32Load().i32Load8U().localSet(1)        // b = *cursor
    v.i32Const(120).i32Const(120).i32Load().i32Const(1).i32Add().i32Store()
    v.localGet(0)
    v.localGet(1).i32Const(0x7f).i32And()
    v.localGet(2).i32Shl()
    v.i32Or().localSet(0)                                    // u |= (b&0x7f)<<shift
    v.localGet(2).i32Const(7).i32Add().localSet(2)
    v.localGet(1).i32Const(0x80).i32And().brIf(0)            // continuation bit
    v.end()
    v.localGet(0).i32Const(1).i32ShrU()                      // u >>> 1
    v.i32Const(0).localGet(0).i32Const(1).i32And().i32Sub()  // -(u & 1)
    v.i32Xor()
    val varintFunc = Func(6, 3, 0, v)

    val main = processingLoop(b => {
      b.i32Const(120).i32Const(1024).i32Store()              // cursor = buf
      b.call(7).localSet(3)                                  // key len
      b.localGet(3).i32Const(0).i32GtS()
      b.ifOp()                                               // skip key bytes
      b.i32Const(120).i32Const(120).i32Load().localGet(3).i32Add().i32Store()
      b.end()
      b.call(7).localSet(4)                                  // value len
      b.i32Const(0).localSet(5)                              // j = 0
      b.block().loop()
      b.localGet(5).localGet(4).i32GeS().brIf(1)             // j >= len (null = -1 skips)
      b.i32Const(120).i32Load().localGet(5).i32Add().localSet(6)
      b.localGet(6).i32Load8U().localSet(7)
      b.localGet(7).i32Const('a'.toInt).i32GeS()
      b.localGet(7).i32Const('z'.toInt).i32LeS().i32And()
      b.ifOp()
      b.localGet(6).localGet(7).i32Const(32).i32Sub().i32Store8()
      b.end()
      b.localGet(5).i32Const(1).i32Add().localSet(5)
      b.br(0)
      b.end().end()
      b.i32Const(1024).localGet(2).call(3).drop()            // write_record
    }, extraLocals = 5)

    module(
      types = types,
      imports = abiImports,
      funcs = Seq(main, varintFunc),                         // 6 = _start, 7 = varint
      memPages = 4,
      exports = Seq(Export("_start", 6)))
  }

  /**
   * Stateful sampler: a counter in guest linear memory (cell 116)
   * persists across records AND batches within a VM run — the guest
   * emits every 3rd record it sees. Distinguishes a real long-lived VM
   * from per-batch re-instantiation: the modulo runs straight through
   * batch boundaries.
   */
  lazy val everyThird: Array[Byte] = module(
    types = types,
    imports = abiImports,
    funcs = Seq(processingLoop(b => {
      b.i32Const(116).i32Load()                    // cnt
      b.i32Const(3).op(0x6f)                       // i32.rem_s
      b.i32Eqz()
      b.ifOp()
      b.i32Const(1024).localGet(2).call(3).drop()  // write_record
      b.end()
      b.i32Const(116).i32Const(116).i32Load().i32Const(1).i32Add().i32Store()
    }, extraLocals = 0)),
    memPages = 4,
    exports = Seq(Export("_start", 6)))

  /**
   * Schema-registry client IN GUEST CODE: at startup the guest fetches
   * schema id 1 through the `redpanda_schema_registry` ABI
   * (`wasm/schema_registry_module.h:37-44`), parses the encoded-def
   * framing (vint type + vint-sized raw — `schema_registry_module.cc:
   * 55-66`) with its own varint reader, and then emits one record per
   * input whose value IS the raw schema definition — payload varints
   * encoded by guest bytecode too. Demonstrates U5 as an actual guest
   * capability, not a host-side convenience.
   *
   * Extra memory cells: 200 size_out, 208 schema ptr; encoded def at
   * 4096, output payload staged at 8192. Locals beyond the loop's 3:
   * 3 = schema len.
   */
  lazy val schemaEcho: Array[Byte] = {
    val srImports = abiImports ++ Seq(
      FuncImport("redpanda_schema_registry", "check_abi_version_0", 0), // 6
      FuncImport("redpanda_schema_registry", "get_schema_definition_len", 7), // 7
      FuncImport("redpanda_schema_registry", "get_schema_definition", 8)) // 8
    // func indices: 9 = _start, 10 = varint parse, 11 = varint encode

    // zigzag-varint reader at *cursor (cell 120) — same as upperValue's
    val vparse = body()
    vparse.i32Const(0).localSet(0)
    vparse.i32Const(0).localSet(2)
    vparse.loop()
    vparse.i32Const(120).i32Load().i32Load8U().localSet(1)
    vparse.i32Const(120).i32Const(120).i32Load().i32Const(1).i32Add().i32Store()
    vparse.localGet(0)
    vparse.localGet(1).i32Const(0x7f).i32And()
    vparse.localGet(2).i32Shl()
    vparse.i32Or().localSet(0)
    vparse.localGet(2).i32Const(7).i32Add().localSet(2)
    vparse.localGet(1).i32Const(0x80).i32And().brIf(0)
    vparse.end()
    vparse.localGet(0).i32Const(1).i32ShrU()
    vparse.i32Const(0).localGet(0).i32Const(1).i32And().i32Sub()
    vparse.i32Xor()
    val vparseFunc = Func(6, 3, 0, vparse)

    // zigzag-varint writer at *cursor: param 0 = value; locals 1 = u, 2 = low7
    val venc = body()
    venc.localGet(0).i32Const(1).i32Shl()
    venc.localGet(0).i32Const(31).i32ShrS()
    venc.i32Xor().localSet(1)
    venc.loop()
    venc.localGet(1).i32Const(0x7f).i32And().localSet(2)
    venc.localGet(1).i32Const(7).i32ShrU().localSet(1)
    venc.i32Const(120).i32Load()
    venc.localGet(2)                                  // plain low7 if done
    venc.localGet(2).i32Const(0x80).i32Or()           // else continuation
    venc.localGet(1).i32Eqz()
    venc.select()
    venc.i32Store8()
    venc.i32Const(120).i32Const(120).i32Load().i32Const(1).i32Add().i32Store()
    venc.localGet(1).brIf(0)
    venc.end()
    val vencFunc = Func(5, 2, 0, venc)

    val main = processingLoop(
      perRecord = b => {
        // stage payload at 8192: null key, schema value, no headers
        b.i32Const(8192).i32Const(1).i32Store8()          // varint(-1) key
        b.i32Const(120).i32Const(8193).i32Store()         // cursor
        b.i32Const(212).i32Load().localSet(3)             // schema len
        b.localGet(3).call(11)                            // varint(value len)
        b.i32Const(120).i32Load()
        b.i32Const(208).i32Load()
        b.localGet(3).memoryCopy()                        // schema bytes
        b.i32Const(120).i32Const(120).i32Load().localGet(3).i32Add().i32Store()
        b.i32Const(120).i32Load().i32Const(0).i32Store8() // headers: varint 0
        b.i32Const(120).i32Const(120).i32Load().i32Const(1).i32Add().i32Store()
        b.i32Const(8192)
        b.i32Const(120).i32Load().i32Const(8192).i32Sub()
        b.call(3).drop()                                  // write_record
      },
      extraLocals = 1,
      prologue = b => {
        b.call(6)                                         // check_abi_version_0
        b.i32Const(1).i32Const(200).call(7).drop()        // len(id=1)
        b.i32Const(1).i32Const(4096)
        b.i32Const(200).i32Load().call(8).drop()          // fetch encoded def
        b.i32Const(120).i32Const(4096).i32Store()         // cursor = def
        b.call(10).drop()                                 // type vint
        b.call(10).localSet(3)                            // raw len
        b.i32Const(208).i32Const(120).i32Load().i32Store() // raw ptr
        b.i32Const(212).localGet(3).i32Store()            // raw len cell
      })

    module(
      types = types ++ Seq(
        (Seq[Byte](I32, I32), Seq(I32)),        // 7: get_schema_definition_len
        (Seq[Byte](I32, I32, I32), Seq(I32))),  // 8: get_schema_definition
      imports = srImports.map {
        case f if f.name == "get_schema_definition_len" => f.copy(typeIdx = 7)
        case f if f.name == "get_schema_definition" => f.copy(typeIdx = 8)
        case f => f
      },
      funcs = Seq(main, vparseFunc, vencFunc),
      memPages = 4,
      exports = Seq(Export("_start", 9)))
  }

  /**
   * WASI-startup guest: performs the exact wasi_snapshot_preview1
   * startup sequence a TinyGo-built SDK binary's runtime emits before
   * `main` (`transform-sdk/go` builds link wasi libc init) —
   * args_sizes_get/args_get, environ_sizes_get/environ_get, TWO
   * monotonic clock_time_get reads, random_get — then REPORTS what it
   * saw through fd_write to fd 2 (multi-iovec, landing in the
   * transform-log path) and runs a mirror transform loop. The guest
   * echoes arg0 and the first environ string byte-for-byte from the
   * pointers the host serialized, asserts the monotonic clock
   * advanced between reads, and that random_get filled its buffer —
   * closing the WASI ABI-surface risk without a toolchain.
   *
   * Memory: 160/168/176/192/200 data strings; 300 argc, 304 args
   * size, 308 arg ptr table, 324 envc, 328 env size, 332 env ptr
   * table, 368/376 clock reads (i64), 384 random bytes, 392
   * nwritten, 400 iovec array; args buf 512, env buf 640.
   */
  lazy val wasiStartup: Array[Byte] = {
    val wasiImports = abiImports ++ Seq(
      FuncImport("wasi_snapshot_preview1", "args_sizes_get", 3),     // 6
      FuncImport("wasi_snapshot_preview1", "args_get", 3),           // 7
      FuncImport("wasi_snapshot_preview1", "environ_sizes_get", 3),  // 8
      FuncImport("wasi_snapshot_preview1", "environ_get", 3),        // 9
      FuncImport("wasi_snapshot_preview1", "clock_time_get", 8),     // 10
      FuncImport("wasi_snapshot_preview1", "random_get", 3),         // 11
      FuncImport("wasi_snapshot_preview1", "fd_write", 4))           // 12
    // func indices: 13 = _start, 14 = strlen

    // strlen(ptr) -> i32: scan for the serializer's NUL terminator
    val sl = body()
    sl.i32Const(0).localSet(1)
    sl.block().loop()
    sl.localGet(0).localGet(1).i32Add().i32Load8U().i32Eqz().brIf(1)
    sl.localGet(1).i32Const(1).i32Add().localSet(1)
    sl.br(0)
    sl.end().end()
    sl.localGet(1)
    val strlenFunc = Func(7, 1, 0, sl)

    val main = processingLoop(
      perRecord = b => {
        b.i32Const(1024).localGet(2).call(3).drop() // mirror
      },
      extraLocals = 0,
      prologue = b => {
        // --- TinyGo runtime startup sequence
        b.i32Const(300).i32Const(304).call(6).drop()   // args_sizes_get
        b.i32Const(308).i32Const(512).call(7).drop()   // args_get
        b.i32Const(324).i32Const(328).call(8).drop()   // environ_sizes_get
        b.i32Const(332).i32Const(640).call(9).drop()   // environ_get
        b.i32Const(1).i64Const(0L).i32Const(368).call(10).drop() // monotonic
        b.i32Const(1).i64Const(0L).i32Const(376).call(10).drop() // again
        b.i32Const(384).i32Const(8).call(11).drop()    // random_get
        // --- "init " + arg0 + "\n" via a 3-iovec fd_write to fd 2
        b.i32Const(400).i32Const(160).i32Store()
        b.i32Const(404).i32Const(5).i32Store()
        b.i32Const(408).i32Const(308).i32Load().i32Store()
        b.i32Const(412).i32Const(308).i32Load().call(14).i32Store()
        b.i32Const(416).i32Const(200).i32Store()
        b.i32Const(420).i32Const(1).i32Store()
        b.i32Const(2).i32Const(400).i32Const(3).i32Const(392).call(12).drop()
        // --- "env " + environ[0] + "\n" when the host passed any
        b.i32Const(324).i32Load().i32Const(0).i32GtS()
        b.ifOp()
        b.i32Const(400).i32Const(168).i32Store()
        b.i32Const(404).i32Const(4).i32Store()
        b.i32Const(408).i32Const(332).i32Load().i32Store()
        b.i32Const(412).i32Const(332).i32Load().call(14).i32Store()
        b.i32Const(2).i32Const(400).i32Const(3).i32Const(392).call(12).drop()
        b.end()
        // --- monotonic clock advanced between the two reads?
        b.i32Const(376).i64Load()
        b.i32Const(368).i64Load()
        b.op(0x55)                                     // i64.gt_s
        b.ifOp()
        b.i32Const(400).i32Const(176).i32Store()
        b.i32Const(404).i32Const(9).i32Store()
        b.i32Const(2).i32Const(400).i32Const(1).i32Const(392).call(12).drop()
        b.end()
        // --- random_get filled the 8-byte buffer with entropy?
        b.i32Const(384).i64Load()
        b.i64Const(0L)
        b.op(0x52)                                     // i64.ne
        b.ifOp()
        b.i32Const(400).i32Const(192).i32Store()
        b.i32Const(404).i32Const(8).i32Store()
        b.i32Const(2).i32Const(400).i32Const(1).i32Const(392).call(12).drop()
        b.end()
      })

    module(
      types = types ++ Seq(
        (Seq[Byte](I32), Seq(I32)),                     // 7: strlen
        (Seq[Byte](I32, WasmModule.I64, I32), Seq(I32))), // 8: clock_time_get
      imports = wasiImports,
      funcs = Seq(main, strlenFunc),
      memPages = 4,
      exports = Seq(Export("_start", 13)),
      datas = Seq(
        Data(160, "init ".getBytes("UTF-8")),
        Data(168, "env ".getBytes("UTF-8")),
        Data(176, "clock ok\n".getBytes("UTF-8")),
        Data(192, "rand ok\n".getBytes("UTF-8")),
        Data(200, "\n".getBytes("UTF-8"))))
  }

  /**
   * Topic router: odd record offsets are written with options routing
   * them to topic "odd" (`write_record_with_options`, options layout
   * per `write_options::parse`: 0x01 + vint-sized name), even offsets
   * to the default output.
   */
  lazy val oddEvenRouter: Array[Byte] = module(
    types = types,
    imports = abiImports,
    funcs = Seq(processingLoop(b => {
      b.i32Const(72).i64Load().i64Const(1L).op(0x83) // i64.and
      b.op(0xa7)                                     // i32.wrap_i64
      b.ifOp()
      b.i32Const(1024).localGet(2).i32Const(128).i32Const(5).call(4).drop()
      b.elseOp()
      b.i32Const(1024).localGet(2).call(3).drop()
      b.end()
    }, extraLocals = 0)),
    memPages = 4,
    exports = Seq(Export("_start", 6)),
    datas = Seq(Data(128, Array[Byte](0x01, 0x06, 'o', 'd', 'd'))))
}
