package graft.wasm

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RecordBatchCodec.Rec
import TransformAbi._

/** End-to-end guest-VM tests: genuine wasm binaries ([[GuestModules]])
  * executed by [[WasmInterp]] against the redpanda_transform host ABI,
  * with payload/validation semantics pinned to model/transform.cc. */
class TransformAbiSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = if (s == null) null else s.getBytes("UTF-8")
  private def str(b: Array[Byte]): String = if (b == null) null else new String(b, "UTF-8")

  private def header(base: Long, n: Int, attrs: Short = 0): BatchHeader =
    BatchHeader(base, n, 0, attrs, n - 1, 1700000000000L,
      1700000000000L + n - 1, -1L, -1, -1)

  private def batch(base: Long, kvs: (String, String)*): BatchIn =
    position(header(base, kvs.size),
      kvs.zipWithIndex.map { case ((k, v), i) =>
        Rec(i, i.toLong, bytes(k), bytes(v), Nil) }.toSeq)

  test("payload codec round trip + validation rejects") {
    val p = encodePayload(bytes("k"), bytes("vvv"),
      Seq((bytes("h1"), bytes("x")), (bytes("h2"), null)))
    val Some((k, v, hs)) = parsePayload(p)
    assert(str(k) === "k" && str(v) === "vvv")
    assert(hs.map { case (a, b) => (str(a), str(b)) } === Seq(("h1", "x"), ("h2", null)))
    // null key/value and empty distinguishable
    val Some((nk, ev, _)) = parsePayload(encodePayload(null, Array.empty[Byte]))
    assert(nk === null && ev.length === 0)
    // trailing garbage / negative header count / truncation rejected
    assert(parsePayload(p ++ Array[Byte](0)) === None)
    assert(parsePayload(Array[Byte](3)) === None)     // varint -2 key size
    assert(parsePayload(p.dropRight(1)) === None)
  }

  test("write options parse") {
    assert(parseWriteOptions(Array.empty) === Some(None))
    assert(parseWriteOptions(Array[Byte](0x01, 0x06, 'o', 'd', 'd')) === Some(Some("odd")))
    assert(parseWriteOptions(Array[Byte](0x02, 0x06, 'o', 'd', 'd')) === None)
    assert(parseWriteOptions(Array[Byte](0x01, 0x06, 'o')) === None)
  }

  test("mirror guest: every record echoed, across multiple batches") {
    val in = Seq(
      batch(100L, ("k1", "v1"), (null, "v2"), ("k3", null)),
      batch(200L, ("a", "b")))
    val (out, _) = TransformAbi.run(GuestModules.mirror, in.iterator)
    assert(out.size === 4)
    assert(out.map(_.batchIndex) === Vector(0, 0, 0, 1))
    assert(out.forall(_.topic.isEmpty))
    val kvs = out.map(e => { val Some((k, v, _)) = parsePayload(e.payload); (str(k), str(v)) })
    assert(kvs === Vector(("k1", "v1"), (null, "v2"), ("k3", null), ("a", "b")))
  }

  test("upperValue guest: value ASCII-uppercased in guest code, key intact") {
    val in = Seq(batch(0L, ("Key1", "hello, World-42!"), (null, "abc"), ("k", null)))
    val (out, _) = TransformAbi.run(GuestModules.upperValue, in.iterator)
    val kvs = out.map(e => { val Some((k, v, _)) = parsePayload(e.payload); (str(k), str(v)) })
    assert(kvs === Vector(("Key1", "HELLO, WORLD-42!"), (null, "ABC"), ("k", null)))
  }

  test("router guest: odd offsets rerouted via write_record_with_options") {
    val in = Seq(batch(10L, ("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")))
    val (out, _) = TransformAbi.run(GuestModules.oddEvenRouter, in.iterator)
    assert(out.map(_.topic) === Vector(None, Some("odd"), None, Some("odd")))
  }

  test("everyThird guest: counter survives batch boundaries") {
    // 7 records split over 3 batches: kept indices 0, 3, 6 — index 3
    // sits in batch 2 and index 6 in batch 3, so a per-batch re-init
    // would keep the wrong set.
    val in = Seq(
      batch(0L, ("a", "0"), ("b", "1"), ("c", "2")),
      batch(10L, ("d", "3"), ("e", "4")),
      batch(20L, ("f", "5"), ("g", "6")))
    val (out, _) = TransformAbi.run(GuestModules.everyThird, in.iterator)
    val kvs = out.map(e => { val Some((k, _, _)) = parsePayload(e.payload); str(k) })
    assert(kvs === Vector("a", "d", "g"))
  }

  test("append-time batches pin record timestamp to max_timestamp") {
    val h = header(0L, 2, attrs = 0x8)
    val b = position(h, Seq(Rec(0, 0L, bytes("k"), bytes("v"), Nil),
      Rec(1, 1L, bytes("k"), bytes("v"), Nil)))
    assert(b.records.map(_.timestamp).distinct === Seq(h.maxTimestamp))
    // create-time: first + delta
    val c = position(header(0L, 2), Seq(Rec(0, 0L, null, null, Nil),
      Rec(1, 5L, null, null, Nil)))
    assert(c.records.map(_.timestamp) ===
      Seq(1700000000000L, 1700000000005L))
  }

  test("schemaEcho guest: fetches schema id 1 via the SR ABI, emits it per record") {
    val mapperQ = new com.fasterxml.jackson.databind.ObjectMapper()
    val raw = """{"type":"record","name":"Ev","fields":[{"name":"a","type":"string"}]}"""
    val srv = new graft.registry.RestApi.Server()
    val body = mapperQ.createObjectNode(); body.put("schema", raw)
    assert(srv.handle("POST", "/subjects/ev/versions",
      Some(mapperQ.writeValueAsString(body))).body === """{"id":1}""")
    // run with BOTH host modules wired to the same nodes
    val in = Seq(batch(0L, ("k1", "v1"), ("k2", "v2")))
    val engine = new Engine(in.iterator)
    val inst = new WasmInterp.Instance(
      WasmModule.decode(GuestModules.schemaEcho),
      engine.hostFuncs ++ SchemaRegistryAbi.hostFuncs(srv))
    try inst.runStart() catch { case e: WasmInterp.ProcExit if e.code == 0 => }
    try inst.module.exportedFunc("_start").foreach(i => inst.invoke(i, Array.empty))
    catch { case e: WasmInterp.ProcExit if e.code == 0 => }
    val out = engine.emitted.toVector
    assert(out.size === 2)
    out.foreach { e =>
      val Some((k, v, hs)) = parsePayload(e.payload)
      assert(k === null)
      // the RestApi store serves the SANITIZED definition by id
      assert(str(v) === graft.registry.AvroCanonical.sanitize(raw))
      assert(hs.isEmpty)
    }
  }

  test("SR ABI: encoded-def round trip and create_subject_schema parse") {
    val raw = """{"type":"string"}"""
    assert(SchemaRegistryAbi.parseEncodedDef(
      SchemaRegistryAbi.encodeDef(raw)) === Some(raw))
    assert(SchemaRegistryAbi.parseEncodedDef(Array[Byte](9, 9)) === None)
  }

  test("wasiStartup guest: TinyGo-style startup sequence over the full WASI surface") {
    val in = Seq(batch(0L, ("k1", "v1"), ("k2", "v2")), batch(10L, ("k3", "v3")))
    val (out, logs) = TransformAbi.run(GuestModules.wasiStartup, in.iterator,
      args = Seq("wasi-demo"),
      environ = Seq("REDPANDA_INPUT_TOPIC=events", "MODE=mirror"))
    // the transform loop still ran: every record mirrored
    assert(out.size === 3)
    val kvs = out.map(e => { val Some((k, v, _)) = parsePayload(e.payload); (str(k), str(v)) })
    assert(kvs === Vector(("k1", "v1"), ("k2", "v2"), ("k3", "v3")))
    // the guest echoed arg0 and environ[0] byte-for-byte from the
    // host-serialized NUL-terminated tables, verified the monotonic
    // clock advanced between two reads, and that random_get wrote
    // entropy — each as an fd_write(2) line through the log path
    assert(logs === Vector(
      "init wasi-demo",
      "env REDPANDA_INPUT_TOPIC=events",
      "clock ok",
      "rand ok"))
    // without environ the env line is skipped, the rest still runs
    val (_, logs2) = TransformAbi.run(GuestModules.wasiStartup,
      Seq(batch(0L, ("k", "v"))).iterator, args = Seq("t2"))
    assert(logs2 === Vector("init t2", "clock ok", "rand ok"))
  }

  test("empty feed: guest exits cleanly with nothing emitted") {
    val (out, _) = TransformAbi.run(GuestModules.mirror, Iterator.empty)
    assert(out.isEmpty)
  }
}
