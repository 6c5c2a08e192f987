package graft.registry

import org.apache.spark.sql.functions._

import graft.SparkSpec
import SchemaRefs.{SchemaRef, StoredSchema}
import SchemaRegistry.{Backward, Forward, FullTransitive, None_}

/** Cross-subject schema references (protobuf imports, Avro named types)
  * and the per-subject compatibility-level store. */
class SchemaRefsSpec extends SparkSpec {
  import spark.implicits._

  private val commonProto =
    "message Common { optional int64 tag = 1; optional string label = 2; }"
  private val evProtoV1 =
    """import "common.proto";
      |message Ev { optional int64 event_id = 1; optional string event_type = 2;
      |  optional Common meta = 3; }""".stripMargin
  private val evProtoV2 =
    """import "common.proto";
      |message Ev { optional int64 event_id = 1; optional string event_type = 2;
      |  optional Common meta = 3; optional string note = 4; }""".stripMargin

  private val protoStore: SchemaRefs.Store = Map(
    ("common-proto", 1) -> StoredSchema("common-proto", 1, "PROTOBUF", commonProto, Nil),
    ("events-proto", 1) -> StoredSchema("events-proto", 1, "PROTOBUF", evProtoV1,
      Seq(SchemaRef("common.proto", "common-proto", 1))),
    ("events-proto", 2) -> StoredSchema("events-proto", 2, "PROTOBUF", evProtoV2,
      Seq(SchemaRef("common.proto", "common-proto", 1))))

  test("protobuf: imports resolve through refs; encode/decode round-trips nested type") {
    val writer = SchemaRefs.resolveProtobuf(protoStore, "events-proto", 1)
    val reader = SchemaRefs.resolveProtobuf(protoStore, "events-proto", 2)
    assert(writer._2.contains("Common") && writer._1.name == "Ev")
    val rows = Seq((7L, "click", (70L, "l7")), (8L, "view", (80L, "l8")))
      .toDF("event_id", "event_type", "meta")
    val framed = ProtobufDecode.encodeResolved(rows, "vb", writer, schemaId = 21)
    val dec = ProtobufDecode.decodeResolved(framed.select("vb"), "vb",
      Map(21 -> writer), reader)
    val got = dec.select(col("decoded.event_id"), col("decoded.meta.tag"),
        col("decoded.meta.label"), col("decoded.note"))
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((7L, 70L, "l7", ""), (8L, 80L, "l8", "")))
  }

  test("protobuf: refs-aware compat; unresolved env makes the nested field unreadable") {
    assert(SchemaRefs.protobufCanRead(protoStore, ("events-proto", 2), ("events-proto", 1)))
    // without the resolved env the Common reference dangles on both sides
    val (r, _) = ProtobufCompat.parse(evProtoV2)
    val (w, _) = ProtobufCompat.parse(evProtoV1)
    assert(!ProtobufCompat.canRead(r, w))
  }

  test("refs: unknown reference and cycles are errors") {
    intercept[NoSuchElementException] {
      SchemaRefs.collect(protoStore +
        (("loose", 1) -> StoredSchema("loose", 1, "PROTOBUF", commonProto,
          Seq(SchemaRef("nope.proto", "nope", 1)))), "loose", 1)
    }
    val cyclic: SchemaRefs.Store = Map(
      ("a", 1) -> StoredSchema("a", 1, "AVRO", "x", Seq(SchemaRef("b", "b", 1))),
      ("b", 1) -> StoredSchema("b", 1, "AVRO", "y", Seq(SchemaRef("a", "a", 1))))
    intercept[IllegalArgumentException] { SchemaRefs.collect(cyclic, "a", 1) }
  }

  test("avro: cross-subject named type resolves; result is self-contained") {
    val store: SchemaRefs.Store = Map(
      ("common-types", 1) -> StoredSchema("common-types", 1, "AVRO",
        """{"type":"record","name":"CommonMeta","fields":[
          |{"name":"tag","type":"long"},{"name":"label","type":"string"}]}""".stripMargin, Nil),
      ("orders-avro", 1) -> StoredSchema("orders-avro", 1, "AVRO",
        """{"type":"record","name":"Ev","fields":[
          |{"name":"event_id","type":"long"},{"name":"meta","type":"CommonMeta"}]}""".stripMargin,
        Seq(SchemaRef("CommonMeta", "common-types", 1))))
    val resolved = SchemaRefs.resolveAvro(store, "orders-avro", 1)
    assert(resolved.getField("meta").schema().getFullName == "CommonMeta")
    // self-contained: re-parses without the store
    val again = new org.apache.avro.Schema.Parser().parse(resolved.toString)
    assert(again.getField("meta").schema().getField("tag") != null)
    // the unresolved text alone does NOT parse
    intercept[RuntimeException] {
      new org.apache.avro.Schema.Parser().parse(store(("orders-avro", 1)).schema)
    }
  }

  test("json: $ref substitutes the referenced subject's schema, transitively") {
    val store: SchemaRefs.Store = Map(
      ("addr", 1) -> StoredSchema("addr", 1, "JSON",
        """{"type":"object","properties":{"city":{"type":"string"}}}""", Nil),
      ("person", 1) -> StoredSchema("person", 1, "JSON",
        """{"type":"object","properties":{"name":{"type":"string"},
          |"home":{"$ref":"addr.json"}}}""".stripMargin,
        Seq(SchemaRef("addr.json", "addr", 1))),
      ("team", 1) -> StoredSchema("team", 1, "JSON",
        """{"type":"object","properties":{"lead":{"$ref":"person.json"}}}""",
        Seq(SchemaRef("person.json", "person", 1))))
    val out = SchemaRefs.resolveJson(store, "team", 1)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    // two levels of substitution: team -> person -> addr
    assert(node.path("properties").path("lead").path("properties")
      .path("home").path("properties").path("city").path("type").asText == "string")
    // an unreferenced $ref is left alone
    val loose = SchemaRefs.resolveJson(store +
      (("x", 1) -> StoredSchema("x", 1, "JSON",
        """{"$ref":"http://example/external"}""", Nil)), "x", 1)
    assert(loose.contains("example/external"))
  }

  test("mode gate: read_only refuses before compatibility; import admits") {
    import SchemaRegistry.structChecker
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("a", LongType, nullable = false)))
    val modes = SchemaRegistry.modeConfigs(Seq(
      (1L, "frozen", "READONLY"),
      (2L, "importing", "IMPORT"),
      (5L, "frozen", null.asInstanceOf[String])  // clear → global READWRITE
    ).toDF("seq", "subject", "mode"))
    assert(SchemaRegistry.modeAt(modes, "anything") == "READWRITE")
    assert(SchemaRegistry.modeAt(modes, "frozen", 4L) == "READONLY")
    assert(SchemaRegistry.modeAt(modes, "frozen", 10L) == "READWRITE")
    val out = SchemaRegistry.registerChainWithModes(Nil, modes, Seq(
      (3L, "frozen", st), (3L, "importing", st), (10L, "frozen", st)))
    assert(out.map(o => (o._2, o._5)) === Seq(
      ("frozen", "readonly"), ("importing", "accepted"), ("frozen", "accepted")))
    intercept[IllegalArgumentException] {
      SchemaRegistry.modeConfigs(Seq((1L, "s", "SIDEWAYS")).toDF("seq", "subject", "mode"))
    }
  }

  test("per-subject levels: override, clear-falls-back, default BACKWARD") {
    val configs = SchemaRegistry.compatibilityConfigs(Seq(
      (1L, null, "FULL_TRANSITIVE"),          // global
      (2L, "b-value", "NONE"),                // subject override
      (5L, "b-value", null)                   // clear → global
    ).toDF("seq", "subject", "level"))
    assert(SchemaRegistry.levelAt(configs, "a-value", 10L) == FullTransitive)
    assert(SchemaRegistry.levelAt(configs, "b-value", 4L) == None_)
    assert(SchemaRegistry.levelAt(configs, "b-value", 10L) == FullTransitive)
    assert(SchemaRegistry.levelAt(Nil, "any") == Backward)
  }

  test("registerChain: rejected schemas never enter the history") {
    import SchemaRegistry.structChecker
    import org.apache.spark.sql.types._
    def st(fs: (String, DataType)*): StructType =
      StructType(fs.map { case (n, t) => StructField(n, t, nullable = false) })
    val nullable = StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val configs = Seq((1L, Option.empty[String], Some(Backward: SchemaRegistry.CompatibilityLevel)),
      (2L, Some("f"), Some(Forward: SchemaRegistry.CompatibilityLevel)))
    val out = SchemaRegistry.registerChain(configs, Seq(
      (10L, "s", st("a" -> LongType)),
      (11L, "s", st("a" -> StringType)),   // breaking → reject
      (12L, "s", nullable),                // nullable add vs v1 → accept (v2)
      (13L, "f", st("a" -> LongType)),
      (14L, "f", st("a" -> LongType, "b" -> StringType)) // forward: old reads new → accept
    ))
    assert(out.map(o => (o._2, o._4, o._5)) === Seq(
      ("s", true, Some(1)), ("s", false, None), ("s", true, Some(2)),
      ("f", true, Some(1)), ("f", true, Some(2))))
  }
}
