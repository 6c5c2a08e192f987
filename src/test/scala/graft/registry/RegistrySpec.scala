package graft.registry

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import SchemaRegistry._

/** Compatibility-algebra scenarios from the reference's registry tests
  * (compatibility levels types.h:481-488, avro/json checker rules). */
class CompatSpec extends AnyFunSuite {

  private val v1 = parseAvro(
    """{"type":"record","name":"r","fields":[{"name":"a","type":"int"}]}""")
  private val v2 = parseAvro( // adds a defaulted field: backward compatible
    """{"type":"record","name":"r","fields":[
      |{"name":"a","type":"int"},{"name":"b","type":"string","default":""}]}""".stripMargin)
  private val v3 = parseAvro( // drops field a entirely
    """{"type":"record","name":"r","fields":[{"name":"b","type":"string","default":""}]}""")

  test("avro: adding a defaulted field is backward compatible") {
    assert(isCompatible(v2, Seq(v1), Backward))
    assert(isCompatible(v3, Seq(v1, v2), Backward)) // reads latest (v2) fine
  }

  test("avro: forward compatibility = previous version reads the proposed") {
    assert(isCompatible(v2, Seq(v1), Forward)) // v1 reads v2 data, ignoring field b
    // a reader missing a defaulted field is fine; missing a non-defaulted one is not
    val noDefault = parseAvro(
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":"int"},{"name":"c","type":"long"}]}""".stripMargin)
    assert(isCompatible(noDefault, Seq(v1), Backward) === false) // c lacks a default
  }

  test("validateChain flags the first incompatible version") {
    val incompatible = parseAvro(
      """{"type":"record","name":"r","fields":[{"name":"z","type":"long"}]}""")
    // v1 -> v2 ok; v2 -> incompatible lacks defaults for a? z has no default
    assert(validateChain(Seq(v1, v2, incompatible), BackwardTransitive) === 2)
    assert(validateChain(Seq(v1, v2), BackwardTransitive) === -1)
  }

  test("struct checker: promotions and nullable-as-default") {
    val w = StructType(Seq(StructField("a", IntegerType, nullable = false)))
    val rPromoted = StructType(Seq(StructField("a", LongType, nullable = false)))
    val rExtra = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val rLossy = StructType(Seq(StructField("a", StringType, nullable = false)))
    assert(StructChecker.canRead(rPromoted, w))
    assert(StructChecker.canRead(rExtra, w))
    assert(!StructChecker.canRead(rLossy, w))
  }

  test("json: numeric widening, enum narrowing, required/properties rules") {
    val wInt = """{"type":"integer"}"""
    val rNum = """{"type":"number"}"""
    assert(JsonChecker.canRead(rNum, wInt))
    assert(!JsonChecker.canRead(wInt, rNum)) // number -> integer narrows

    val wEnum = """{"type":"string","enum":["a","b"]}"""
    val rEnum = """{"type":"string","enum":["a","b","c"]}"""
    assert(JsonChecker.canRead(rEnum, wEnum))
    assert(!JsonChecker.canRead(wEnum, rEnum))
    assert(!JsonChecker.canRead(wEnum, """{"type":"string"}""")) // open writer

    val wObj = """{"type":"object","properties":{"x":{"type":"integer"}},"required":["x"]}"""
    val rObjOk = """{"type":"object","properties":{"x":{"type":"number"}},"required":["x"]}"""
    val rObjMoreReq = """{"type":"object","properties":{"x":{"type":"integer"},"y":{"type":"string"}},"required":["x","y"]}"""
    assert(JsonChecker.canRead(rObjOk, wObj))
    // json.cc is_object_required_superset:1623-1630 examines only
    // properties declared on BOTH sides: reader-required y is unknown to
    // the writer's properties, so the reference does NOT flag it
    assert(JsonChecker.canRead(rObjMoreReq, wObj))
    // ... but a both-sides property the reader newly requires DOES break,
    // unless the reader's property carries a default (json.cc:1636-1646)
    val wXY = """{"type":"object","properties":{"x":{"type":"integer"},"y":{"type":"string"}},"required":["x"]}"""
    assert(!JsonChecker.canRead(rObjMoreReq, wXY)) // required_attribute_added
    val rDefaulted = """{"type":"object","properties":{"x":{"type":"integer"},"y":{"type":"string","default":"z"}},"required":["x","y"]}"""
    assert(JsonChecker.canRead(rDefaulted, wXY))

    val rClosed = """{"type":"object","properties":{"x":{"type":"integer"}},"additionalProperties":false}"""
    val wClosed = """{"type":"object","properties":{"x":{"type":"integer"}},"additionalProperties":false}"""
    assert(JsonChecker.canRead(rClosed, wClosed))
    assert(!JsonChecker.canRead(rClosed, wObj)) // writer allows extras

    val wArr = """{"type":"array","items":{"type":"integer"}}"""
    val rArr = """{"type":"array","items":{"type":"number"}}"""
    assert(JsonChecker.canRead(rArr, wArr))
    assert(!JsonChecker.canRead(wArr, rArr))

    // full = backward && forward: only identical-ish schemas pass
    assert(isCompatible(wEnum, Seq(wEnum), Full)(JsonChecker))
    assert(!isCompatible(rEnum, Seq(wEnum), Full)(JsonChecker))
  }

  test("json: constraint bounds may only relax (json.cc is_*_superset)") {
    // string length: reader may widen, never tighten or add
    val wLen = """{"type":"string","minLength":2,"maxLength":10}"""
    assert(JsonChecker.canRead("""{"type":"string","minLength":1,"maxLength":20}""", wLen))
    assert(!JsonChecker.canRead("""{"type":"string","minLength":3}""", wLen))
    assert(!JsonChecker.canRead("""{"type":"string","maxLength":5}""", wLen))
    assert(!JsonChecker.canRead("""{"type":"string","maxLength":10}""",
      """{"type":"string"}""")) // max_length_added
    assert(JsonChecker.canRead("""{"type":"string"}""", wLen))
    // pattern: absent or string-identical
    val wPat = """{"type":"string","pattern":"^a+$"}"""
    assert(JsonChecker.canRead(wPat, wPat))
    assert(!JsonChecker.canRead("""{"type":"string","pattern":"^b+$"}""", wPat))
    assert(!JsonChecker.canRead(wPat, """{"type":"string"}""")) // pattern_added
    // numeric bounds + multipleOf
    val wNum = """{"type":"integer","minimum":0,"maximum":100,"multipleOf":4}"""
    assert(JsonChecker.canRead("""{"type":"integer","minimum":-5,"maximum":200,"multipleOf":2}""", wNum))
    assert(!JsonChecker.canRead("""{"type":"integer","minimum":1}""", wNum))
    assert(!JsonChecker.canRead("""{"type":"integer","maximum":50}""", wNum))
    assert(!JsonChecker.canRead("""{"type":"integer","multipleOf":3}""", wNum))
    assert(!JsonChecker.canRead("""{"type":"integer","minimum":0}""",
      """{"type":"integer"}""")) // minimum_added
    // array bounds + uniqueItems
    val wArrB = """{"type":"array","items":{"type":"integer"},"minItems":1,"maxItems":5,"uniqueItems":true}"""
    assert(JsonChecker.canRead("""{"type":"array","items":{"type":"integer"},"maxItems":10,"uniqueItems":true}""", wArrB))
    assert(!JsonChecker.canRead("""{"type":"array","items":{"type":"integer"},"minItems":2}""", wArrB))
    assert(!JsonChecker.canRead("""{"type":"array","items":{"type":"integer"},"uniqueItems":true}""",
      """{"type":"array","items":{"type":"integer"}}"""))
  }
}

/** Descriptor-driven protobuf wire decode (schema_protobuf.cc subset). */
class ProtobufDecodeSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private val writerProto =
    """message M {
      |  optional int64 a = 1;
      |  optional string s = 2;
      |  optional sint32 z = 3;
      |  repeated int32 xs = 4;
      |  repeated string tags = 5;
      |  optional Inner inner = 6;
      |  optional double d = 7;
      |  message Inner { optional int32 k = 1; optional string v = 2; }
      |}""".stripMargin

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("s", StringType), StructField("z", IntegerType),
    StructField("xs", ArrayType(IntegerType)), StructField("tags", ArrayType(StringType)),
    StructField("inner", StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))),
    StructField("d", DoubleType)))

  test("round-trip: scalars, zigzag negatives, packed repeated, nested message, defaults") {
    val rows = Seq(
      Row(1L, "hello", -7, Seq(1, 2, 300), Seq("x", "y"), Row(5, "in"), 1.25),
      Row(2L, "", 0, Seq.empty[Int], Seq.empty[String], null, -0.5))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val framed = ProtobufDecode.encode(df, "bin", writerProto, 1)
    val dec = ProtobufDecode.decode(framed.select("bin"), "bin",
      Map(1 -> writerProto), writerProto)
    val got = dec.select("decoded.*").orderBy("a").collect()
    assert(got(0) === Row(1L, "hello", -7, Seq(1, 2, 300), Seq("x", "y"), Row(5, "in"), 1.25))
    assert(got(1) === Row(2L, "", 0, Seq.empty, Seq.empty, null, -0.5))
  }

  test("reader projection: rename by number, skip unknown, default absent, reject incompatible/unknown ids") {
    import spark.implicits._
    val writer = "message E { optional int64 a = 1; optional string b = 2; optional sint64 c = 3; }"
    val reader = "message E { optional int64 renamed = 1; optional int32 extra = 9; }"
    val badWriter = "message E { optional string a = 1; }" // wire-family change on field 1
    val df = Seq((10L, "x", -3L), (20L, "y", 4L)).toDF("a", "b", "c")
    val ok = ProtobufDecode.encode(df, "bin", writer, 1).select("bin")
    val unknownId = ProtobufDecode.encode(df.limit(1), "bin", writer, 99).select("bin")
    val incompat = ProtobufDecode.encode(Seq(Tuple1("zz")).toDF("a"), "bin", badWriter, 2).select("bin")
    val corrupt = Seq(Tuple1(Array[Byte](0, 0, 0))).toDF("bin")
    val dec = ProtobufDecode.decode(
      ok.unionByName(unknownId).unionByName(incompat).unionByName(corrupt),
      "bin", Map(1 -> writer, 2 -> badWriter), reader)
    val got = dec.select("decoded.renamed", "decoded.extra").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    // writer fields b/c skipped as unknown; reader field 9 defaults to 0
    assert(got.count(_ == ((Some(10L), Some(0)))) === 1)
    assert(got.count(_ == ((Some(20L), Some(0)))) === 1)
    // unregistered id, unreadable writer, and corrupt frame → null struct
    assert(got.count(_ == ((None, None))) === 3)
  }
}

/** P5/P6 ingest validation over real wire-format bytes. */
/** Registry-driven JSON decode: schema→StructType conversion, evolution
  * nulls, frame validation (json.cc leg of §1.3). */
class JsonDecodeSpec extends SparkSpec {

  private val reader =
    """{"type":"object","properties":{
      |  "id":{"type":"integer"},
      |  "name":{"type":"string"},
      |  "score":{"type":"number"},
      |  "ok":{"type":"boolean"},
      |  "tags":{"type":"array","items":{"type":"string"}},
      |  "inner":{"type":"object","properties":{"k":{"type":"integer"}}}}}""".stripMargin

  test("JSON Schema subset converts to the declared StructType") {
    val t = JsonDecode.schemaToDataType(reader).asInstanceOf[StructType]
    assert(t.fieldNames.toSeq === Seq("id", "name", "score", "ok", "tags", "inner"))
    assert(t("id").dataType === LongType)
    assert(t("score").dataType === DoubleType)
    assert(t("tags").dataType === ArrayType(StringType))
    assert(t("inner").dataType === StructType(Seq(StructField("k", LongType))))
  }

  test("decode: typed round-trip, evolution null for absent fields, bad frames null out") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val full = JsonDecode.encode(
      Seq((1L, "a", 1.5, true)).toDF("id", "name", "score", "ok"),
      "bin", 7, col("id"), col("name"), col("score"), col("ok"))
    val v1 = JsonDecode.encode( // older writer: no score/ok
      Seq((2L, "b")).toDF("id", "name"), "bin", 6, col("id"), col("name"))
    val unreg = JsonDecode.encode(
      Seq((3L, "c")).toDF("id", "name"), "bin", 99, col("id"), col("name"))
    val corrupt = Seq(Tuple1("{not-framed-json}".getBytes("UTF-8"))).toDF("bin")
    val dec = JsonDecode.decode(
      full.select("bin").unionByName(v1.select("bin"))
        .unionByName(unreg.select("bin")).unionByName(corrupt),
      "bin", Seq(6, 7), reader)
    val got = dec.select("schema_id", "decoded.id", "decoded.name", "decoded.score")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    assert(got.count(_ == ((Some(7), Some(1L), Some("a"), Some(1.5)))) === 1)
    assert(got.count(_ == ((Some(6), Some(2L), Some("b"), None))) === 1)
    assert(got.count(_ == ((None, None, None, None))) === 2)
  }
}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("schema-id wire format parses and routes by registered set") {
    val rows = Seq(
      (1L, 3), (2L, 7), (3L, 9))  // ids 0-7 registered; 9 is not
      .toDF("id", "sid")
      .withColumn("value",
        concat(unhex(lit("00")), unhex(lpad(hex(col("sid")), 8, "0")),
          encode(lit("payload"), "UTF-8")))
    val badMagic = Seq((4L, 0)).toDF("id", "sid")
      .withColumn("value", encode(lit("no-magic-here"), "UTF-8"))
    val routed = Ingest.validateSchemaIds(rows.unionByName(badMagic), col("value"), 0 to 7)
    val got = routed.select("id", "schema_id", "route")
      .as[(Long, Option[Int], String)].collect().toSet
    assert(got === Set(
      (1L, Some(3), "valid"), (2L, Some(7), "valid"),
      (3L, Some(9), "invalid_schema_id"), (4L, None, "invalid_magic")))
    assert(Ingest.accepted(routed).count() === 2)
    assert(Ingest.rejected(routed).count() === 2)
  }

  test("crc validation routes corrupted payloads to dead-letter") {
    val rows = Seq((1L, "ok", false), (2L, "bad", true), (3L, "ok2", false))
      .toDF("id", "payload", "corrupt")
      .withColumn("value", encode(col("payload"), "UTF-8"))
      .withColumn("stored_crc",
        crc32(col("value")) + when(col("corrupt"), 1L).otherwise(0L))
    val got = Ingest.validateCrc(rows, col("value"), col("stored_crc"))
      .select("id", "route").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "valid"), (2L, "corrupt"), (3L, "valid")))
  }
}

/** SR subject/version soft-vs-hard delete semantics (types.h:33-35,475). */
class SubjectDeleteSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("soft delete hides from default listing; hard removes; re-register resurrects") {
    val regs = Seq(
      (1L, "s", 1, "a"), (2L, "s", 2, "b"), (3L, "t", 1, "c"), (7L, "t", 1, "c2"))
      .toDF("seq", "subject", "version", "schema")
    val dels = Seq(
      (4L, "s", Some(2), false),            // soft delete s v2
      (6L, "t", None: Option[Int], true))   // hard delete subject t (pre-7)
      .toDF("seq", "subject", "version", "hard")
    val all = graft.registry.SchemaRegistry.subjectVersions(regs, dels,
        includeDeleted = true)
      .select("subject", "version", "is_deleted")
      .as[(String, Int, Boolean)].collect().toSet
    assert(all === Set(("s", 1, false), ("s", 2, true), ("t", 1, false)))
    // default listing hides the soft-deleted version
    val visible = graft.registry.SchemaRegistry.subjectVersions(regs, dels)
      .select("subject", "version").as[(String, Int)].collect().toSet
    assert(visible === Set(("s", 1), ("t", 1)))
  }
}
