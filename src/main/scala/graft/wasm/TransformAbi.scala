package graft.wasm

import scala.collection.mutable.ArrayBuffer
import graft.functions.RecordBatchCodec.{zigzag, unzigzag}
import WasmInterp.{HostFunc, Instance, ProcExit}

/**
 * The reference's `redpanda_transform` guest ABI
 * (`wasm/transform_module.h:137-158`, `wasm/transform_module.cc:124-258`)
 * plus the slice of `wasi_snapshot_preview1` its guests touch
 * (`wasm/wasi.cc`): the host side of a data-plane transform VM.
 *
 * Flow per `transform_module::for_each_record_async`:
 *  - `read_batch_header` hands the guest the next batch's header and
 *    returns the max payload size (or NO_ACTIVE_TRANSFORM = -1 when the
 *    feed is done);
 *  - `read_next_record` pops one record: attributes/timestamp/offset go
 *    to guest pointers, the payload (key/value/headers in Kafka record
 *    wire layout, `transform.cc:375-383`) is copied into the guest
 *    buffer, its size returned (INVALID_BUFFER = -2 when the buffer is
 *    too small);
 *  - `write_record[_with_options]` validates the guest's payload
 *    exactly like `transformed_data::create_validated`
 *    (`model/transform.cc:324-333`, `validate_record_payload:58-73`)
 *    and emits it (optionally routed to another topic, options format
 *    per `write_options::parse`: 0x01 key + vint-sized topic name).
 *
 * Record timestamps follow the batch's timestamp type: CreateTime →
 * first_timestamp + delta, AppendTime → max_timestamp for every record
 * (`transform_module.cc:84-89`); the wasi wallclock is pinned to the
 * record being processed (`set_walltime`), so guest `clock_time_get`
 * is deterministic under replay.
 */
object TransformAbi {

  val NoActiveTransform: Int = -1
  val InvalidBuffer: Int = -2
  val InvalidWrite: Int = -3

  final case class BatchHeader(
      baseOffset: Long, recordCount: Int, partitionLeaderEpoch: Int,
      attributes: Short, lastOffsetDelta: Int, firstTimestamp: Long,
      maxTimestamp: Long, producerId: Long, producerEpoch: Short,
      baseSequence: Int)

  /** One input record, already positioned: absolute timestamp/offset per
    * the batch's timestamp-type rules. */
  final case class RecordIn(attributes: Int, timestamp: Long, offset: Long,
      payload: Array[Byte])

  final case class BatchIn(header: BatchHeader, records: Seq[RecordIn])

  /** A record the guest wrote: `topic` None = the default output. */
  final case class Emitted(batchIndex: Int, seq: Int, topic: Option[String],
      payload: Array[Byte])

  // ------------------------------------------------------ payload codec

  private def varintSize(v: Long): Int = {
    var u = zigzag(v); var n = 1
    while ((u & ~0x7fL) != 0) { u >>>= 7; n += 1 }
    n
  }

  /** key/value/headers → the ABI payload (Kafka record wire layout
    * minus length/attrs/deltas — `transform.cc:from_record`). Sized
    * exactly up front and filled in place: this runs once per input
    * record on the transform data path. */
  def encodePayload(key: Array[Byte], value: Array[Byte],
      headers: Seq[(Array[Byte], Array[Byte])] = Nil): Array[Byte] = {
    def kvSize(b: Array[Byte]): Int =
      if (b == null) varintSize(-1L) else varintSize(b.length.toLong) + b.length
    val size = kvSize(key) + kvSize(value) + varintSize(headers.size.toLong) +
      headers.iterator.map { case (k, v) => kvSize(k) + kvSize(v) }.sum
    val out = new Array[Byte](size)
    var pos = 0
    def putVarint(v: Long): Unit = {
      var u = zigzag(v)
      do {
        var b = (u & 0x7f).toInt
        u >>>= 7
        if (u != 0) b |= 0x80
        out(pos) = b.toByte; pos += 1
      } while (u != 0)
    }
    def kv(bytes: Array[Byte]): Unit =
      if (bytes == null) putVarint(-1L)
      else {
        putVarint(bytes.length.toLong)
        System.arraycopy(bytes, 0, out, pos, bytes.length)
        pos += bytes.length
      }
    kv(key); kv(value)
    putVarint(headers.size.toLong)
    headers.foreach { case (k, v) => kv(k); kv(v) }
    out
  }

  /** Allocation-free `validate_record_payload` walk: structure checks
    * only, no key/value copies — the write_record fast path. */
  def validatePayload(bytes: Array[Byte]): Boolean = {
    var pos = 0
    var bad = false
    def varint(): Long = {
      var u = 0L; var shift = 0; var b = 0x80
      while ((b & 0x80) != 0 && !bad) {
        if (pos >= bytes.length || shift >= 70) bad = true
        else {
          b = bytes(pos) & 0xff; pos += 1
          if (shift < 64) u |= (b & 0x7fL) << shift
          shift += 7
        }
      }
      unzigzag(u)
    }
    def kv(): Unit = {
      val n = varint()
      if (bad || n < -1 || n > bytes.length - pos) bad = true
      else if (n > 0) pos += n.toInt
    }
    kv(); kv()
    val hc = varint()
    if (hc < 0) bad = true
    var i = 0L
    while (i < hc && !bad) { kv(); kv(); i += 1 }
    !bad && pos == bytes.length
  }

  /** Parse-or-reject, mirroring `validate_record_payload`: sizes < -1
    * invalid, trailing bytes invalid. Returns (key, value, headers). */
  def parsePayload(bytes: Array[Byte])
      : Option[(Array[Byte], Array[Byte], Seq[(Array[Byte], Array[Byte])])] = {
    var pos = 0
    def varint(): Long = {
      var u = 0L; var shift = 0; var b = 0
      do {
        if (pos >= bytes.length) throw new IndexOutOfBoundsException
        b = bytes(pos) & 0xff; pos += 1
        if (shift >= 70) throw new IndexOutOfBoundsException
        if (shift < 64) u |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      unzigzag(u)
    }
    def kv(): Option[Array[Byte]] = {
      val n = varint()
      if (n < -1 || n > bytes.length - pos) throw new IndexOutOfBoundsException
      if (n == -1) None
      else {
        val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)
        pos += n.toInt
        Some(a)
      }
    }
    try {
      val k = kv(); val v = kv()
      val hc = varint()
      if (hc < 0) return None
      val hs = (0L until hc).map { _ =>
        (kv().getOrElse(null: Array[Byte]), kv().getOrElse(null: Array[Byte]))
      }
      if (pos != bytes.length) None
      else Some((k.orNull, v.orNull, hs))
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** `write_options::parse`: empty = default topic; else 0x01 followed by
    * a vint-sized topic name, nothing trailing. */
  def parseWriteOptions(bytes: Array[Byte]): Option[Option[String]] = {
    if (bytes.isEmpty) return Some(None)
    if (bytes(0) != 0x01) return None
    var pos = 1
    var u = 0L; var shift = 0; var b = 0
    do {
      if (pos >= bytes.length) return None
      b = bytes(pos) & 0xff; pos += 1
      if (shift < 64) u |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    val n = unzigzag(u)
    if (n < 0 || pos + n != bytes.length) return None
    Some(Some(new String(bytes, pos, n.toInt, "UTF-8")))
  }

  /** Position a decoded batch's records: timestamp-type rules from
    * `for_each_record_async` (`transform_module.cc:84-97`). Attribute
    * bit 3 of the batch = LogAppendTime, matching the record-batch
    * spec. */
  def position(header: BatchHeader,
      recs: Seq[graft.functions.RecordBatchCodec.Rec]): BatchIn = {
    val appendTime = (header.attributes & 0x8) != 0
    BatchIn(header, recs.map { r =>
      val ts = if (appendTime) header.maxTimestamp
               else header.firstTimestamp + r.tsDelta
      RecordIn(0, ts, header.baseOffset + r.offsetDelta,
        encodePayload(r.key, r.value, r.headers.map { case (k, v) =>
          (k.getBytes("UTF-8"), v) }))
    })
  }

  // ------------------------------------------------------------ engine

  /**
   * One VM's host state: a pull-based inversion of the reference's
   * condvar handshake — `read_batch_header` pulls the next batch from
   * the iterator instead of blocking on a host signal; observable guest
   * behavior is identical.
   */
  final class Engine(batches: Iterator[BatchIn],
      args: Seq[String] = Nil, environ: Seq[String] = Nil) {
    private var current: BatchIn = _
    private var remaining: List[RecordIn] = Nil
    private var batchIndex = -1
    private var seq = 0
    private var walltimeMs = 0L
    // monotonic clock: 1 ms resolution, bumped per read so guest busy
    // loops on CLOCK_MONOTONIC make progress (`wasi.cc:114-117`)
    private var monotonicMs = 0L
    val emitted = new ArrayBuffer[Emitted]()
    val logLines = new ArrayBuffer[String]()
    private val logBuf = new StringBuilder

    private def hf(f: (Instance, Array[Long]) => Array[Long]): HostFunc =
      new HostFunc {
        def invoke(inst: Instance, args: Array[Long]): Array[Long] =
          f(inst, args)
      }

    private val readBatchHeader = hf { (inst, a) =>
      if (!batches.hasNext) {
        current = null
        Array(NoActiveTransform.toLong)
      } else {
        current = batches.next()
        batchIndex += 1
        remaining = current.records.toList
        val h = current.header
        val m = inst.memory
        m.writeN(a(0), 8, h.baseOffset)
        m.writeN(a(1), 4, h.recordCount.toLong)
        m.writeN(a(2), 4, h.partitionLeaderEpoch.toLong)
        m.writeN(a(3), 2, h.attributes.toLong)
        m.writeN(a(4), 4, h.lastOffsetDelta.toLong)
        m.writeN(a(5), 8, h.firstTimestamp)
        m.writeN(a(6), 8, h.maxTimestamp)
        m.writeN(a(7), 8, h.producerId)
        m.writeN(a(8), 2, h.producerEpoch.toLong)
        m.writeN(a(9), 4, h.baseSequence.toLong)
        walltimeMs = if ((h.attributes & 0x8) != 0) h.maxTimestamp
                     else h.firstTimestamp
        val maxSize = if (current.records.isEmpty) 0
                      else current.records.map(_.payload.length).max
        Array(maxSize.toLong)
      }
    }

    private val readNextRecord = hf { (inst, a) =>
      if (current == null || remaining.isEmpty) Array(NoActiveTransform.toLong)
      else {
        val r = remaining.head
        val bufLen = a(4).toInt
        if (bufLen < r.payload.length) Array(InvalidBuffer.toLong)
        else {
          remaining = remaining.tail
          val m = inst.memory
          m.writeByte(a(0), r.attributes)
          m.writeN(a(1), 8, r.timestamp)
          m.writeN(a(2), 8, r.offset)
          m.writeBytes(a(3), r.payload)
          walltimeMs = r.timestamp
          Array(r.payload.length.toLong)
        }
      }
    }

    private def doWrite(inst: Instance, ptr: Long, len: Int,
        topic: Option[String]): Long = {
      val bytes = inst.memory.readBytes(ptr, len)
      if (!validatePayload(bytes)) InvalidBuffer.toLong
      else {
        emitted += Emitted(batchIndex, seq, topic, bytes)
        seq += 1
        len.toLong
      }
    }

    private val writeRecord = hf { (inst, a) =>
      if (current == null) Array(NoActiveTransform.toLong)
      else Array(doWrite(inst, a(0), a(1).toInt, None))
    }

    private val writeRecordWithOptions = hf { (inst, a) =>
      if (current == null) Array(NoActiveTransform.toLong)
      else {
        val opts = inst.memory.readBytes(a(2), a(3).toInt)
        parseWriteOptions(opts) match {
          case None => Array(InvalidBuffer.toLong)
          case Some(topic) => Array(doWrite(inst, a(0), a(1).toInt, topic))
        }
      }
    }

    private val noop = hf((_, _) => Array.empty)

    // --- wasi_snapshot_preview1 subset (wasm/wasi.cc behaviors)
    private val procExit = hf((_, a) => throw new ProcExit(a(0).toInt))
    private val fdWrite = hf { (inst, a) =>
      // (fd, iovs_ptr, iovs_len, nwritten_ptr) — capture to the log
      val m = inst.memory
      var total = 0L
      var i = 0L
      while (i < a(2)) {
        val base = m.readN(a(1) + i * 8, 4)
        val len = m.readN(a(1) + i * 8 + 4, 4)
        logBuf.append(new String(m.readBytes(base, len.toInt), "UTF-8"))
        total += len
        i += 1
      }
      // split captured text into lines like the reference's wasi logger
      var idx = logBuf.indexOf("\n")
      while (idx >= 0) {
        logLines += logBuf.substring(0, idx)
        logBuf.delete(0, idx + 1)
        idx = logBuf.indexOf("\n")
      }
      m.writeN(a(3), 4, total)
      Array(0L)
    }
    private val clockTimeGet = hf { (inst, a) =>
      // REALTIME (0) is the record-pinned walltime (wasi.cc
      // set_walltime); MONOTONIC/CPUTIME (1-3) read a 1 ms-resolution
      // counter bumped per read; unknown ids are EINVAL (28)
      a(0).toInt match {
        case 0 =>
          inst.memory.writeN(a(2), 8, walltimeMs * 1000000L); Array(0L)
        case 1 | 2 | 3 =>
          inst.memory.writeN(a(2), 8, monotonicMs * 1000000L)
          monotonicMs += 1
          Array(0L)
        case _ => Array(28L)
      }
    }
    // args/environ per `wasi.cc:125-148`: sizes = (count, Σ len+1);
    // get = u32 pointer table + NUL-terminated strings packed at the
    // guest-supplied buffer. The reference passes [transform name] as
    // args and the deployment env (+REDPANDA_INPUT_TOPIC/
    // REDPANDA_OUTPUT_TOPIC_n) as environ (`wasmtime.cc:465-492`).
    private def sizesOf(xs: Seq[String]) = hf { (inst, a) =>
      inst.memory.writeN(a(0), 4, xs.size.toLong)
      inst.memory.writeN(a(1), 4,
        xs.map(_.getBytes("UTF-8").length + 1L).sum)
      Array(0L)
    }
    private def listOf(xs: Seq[String]) = hf { (inst, a) =>
      val m = inst.memory
      var ptr = a(1)
      xs.zipWithIndex.foreach { case (s, i) =>
        m.writeN(a(0) + i * 4L, 4, ptr)
        val bytes = s.getBytes("UTF-8")
        m.writeBytes(ptr, bytes)
        m.writeByte(ptr + bytes.length, 0)
        ptr += bytes.length + 1
      }
      Array(0L)
    }
    private val ok = hf((_, _) => Array(0L))
    private val randomGet = hf { (inst, a) =>
      // deterministic splitmix over the record clock — replay-stable
      var x = walltimeMs ^ 0x9e3779b97f4a7c15L
      var i = 0L
      while (i < a(1)) {
        x ^= x >>> 27; x *= 0x94d049bb133111ebL; x ^= x >>> 31
        inst.memory.writeByte(a(0) + i, (x & 0xff).toInt)
        i += 1
      }
      Array(0L)
    }

    val hostFuncs: Map[(String, String), HostFunc] = Map(
      ("redpanda_transform", "check_abi_version_1") -> noop,
      ("redpanda_transform", "check_abi_version_2") -> noop,
      ("redpanda_transform", "read_batch_header") -> readBatchHeader,
      ("redpanda_transform", "read_next_record") -> readNextRecord,
      ("redpanda_transform", "write_record") -> writeRecord,
      ("redpanda_transform", "write_record_with_options") -> writeRecordWithOptions,
      ("wasi_snapshot_preview1", "proc_exit") -> procExit,
      ("wasi_snapshot_preview1", "fd_write") -> fdWrite,
      ("wasi_snapshot_preview1", "clock_time_get") -> clockTimeGet,
      ("wasi_snapshot_preview1", "environ_sizes_get") -> sizesOf(environ),
      ("wasi_snapshot_preview1", "environ_get") -> listOf(environ),
      ("wasi_snapshot_preview1", "args_sizes_get") -> sizesOf(args),
      ("wasi_snapshot_preview1", "args_get") -> listOf(args),
      ("wasi_snapshot_preview1", "random_get") -> randomGet,
      ("wasi_snapshot_preview1", "sched_yield") -> ok)
  }

  /**
   * Run a guest module over a feed of batches and collect what it
   * emitted. The guest drives via its `_start` export (wasi command
   * model) and finishes by `proc_exit` or by returning once
   * `read_batch_header` hands back NO_ACTIVE_TRANSFORM.
   */
  def run(moduleBytes: Array[Byte], batches: Iterator[BatchIn],
      args: Seq[String] = Nil, environ: Seq[String] = Nil)
      : (Vector[Emitted], Vector[String]) =
    runModule(WasmModule.decode(moduleBytes), batches, args = args,
      environ = environ)

  /** As [[run]], over an already-decoded module (executor-side caches
    * decode once and instantiate per run). `extraHost` adds further
    * host modules (e.g. the [[SchemaRegistryAbi]] functions);
    * `args`/`environ` seed the wasi program arguments and environment
    * strings ("K=V") the reference passes to every guest. */
  def runModule(module: WasmModule.Module, batches: Iterator[BatchIn],
      extraHost: Map[(String, String), WasmInterp.HostFunc] = Map.empty,
      args: Seq[String] = Nil, environ: Seq[String] = Nil)
      : (Vector[Emitted], Vector[String]) = {
    val engine = new Engine(batches, args, environ)
    val inst = new WasmInterp.Instance(module, engine.hostFuncs ++ extraHost)
    try {
      inst.runStart()
      inst.module.exportedFunc("_start")
        .foreach(i => inst.invoke(i, Array.empty))
    } catch {
      case e: ProcExit if e.code == 0 => // clean wasi exit
    }
    (engine.emitted.toVector, engine.logLines.toVector)
  }
}
