package graft.registry

import org.scalatest.funsuite.AnyFunSuite
import graft.registry.{SchemaRegistry => SR}

/** Normalize-on-register (`types.h:38`): per-format normal forms and
  * the flag's effect on global-id identity. */
class NormalizeSpec extends AnyFunSuite {

  test("json normal form sorts keys recursively and compacts") {
    val a = """{"type":"object","properties":{"a":{"type":"integer"},"b":{"type":"string"}}}"""
    val b = """{ "properties": { "b": {"type":"string"}, "a": {"type":"integer"} }, "type": "object" }"""
    assert(Normalize.jsonNormalForm(a) === Normalize.jsonNormalForm(b))
    // arrays keep element order — only object members are unordered
    assert(Normalize.jsonNormalForm("""{"enum":["b","a"]}""") ===
      """{"enum":["b","a"]}""")
  }

  test("protobuf normal form orders fields by number and drops comments") {
    val a = """syntax = "proto3"; message Ev { int64 id = 1; string who = 2; }"""
    val b = "syntax = \"proto3\";\nmessage Ev { string who = 2; // renamed later\n int64 id = 1; }"
    assert(Normalize.protobufNormalForm(a) === Normalize.protobufNormalForm(b))
    // a genuinely different wire contract stays different
    val c = """syntax = "proto3"; message Ev { int64 id = 3; string who = 2; }"""
    assert(Normalize.protobufNormalForm(a) !== Normalize.protobufNormalForm(c))
  }

  test("protobuf normal form preserves the (defaulted) syntax declaration") {
    // proto2 and proto3 files with identical bodies are different
    // contracts (field presence) and must not collapse to one identity
    val p3 = """syntax = "proto3"; message Ev { int64 id = 1; }"""
    val p2 = """syntax = "proto2"; message Ev { int64 id = 1; }"""
    val undeclared = """message Ev { int64 id = 1; }"""
    assert(Normalize.protobufNormalForm(p3) !== Normalize.protobufNormalForm(p2))
    // undeclared syntax defaults to proto2, per the language spec
    assert(Normalize.protobufNormalForm(undeclared) ===
      Normalize.protobufNormalForm(p2))
    assert(Normalize.protobufNormalForm(p3).startsWith("syntax = \"proto3\";"))
  }

  test("nested messages render name-sorted in the normal form") {
    val a = """message Ev { message B { int32 x = 1; } message A { int32 y = 1; } int64 id = 1; }"""
    val b = """message Ev { int64 id = 1; message A { int32 y = 1; } message B { int32 x = 1; } }"""
    assert(Normalize.protobufNormalForm(a) === Normalize.protobufNormalForm(b))
  }

  test("the flag gates id sharing for json/protobuf; avro always sanitizes") {
    val j1 = """{"a":1,"b":2}"""
    val j2 = """{"b":2,"a":1}"""
    val got = Normalize.projectIds(Seq(
      (1L, "s1", SR.JsonType, j1, true),
      (2L, "s2", SR.JsonType, j2, true),   // normalized: shares id 1
      (3L, "s3", SR.JsonType, j2, false),  // raw spelling: new id
      (4L, "s4", SR.AvroType,
        """{"type":"record","name":"com.ex.Ev","fields":[{"name":"id","type":"long"}]}""",
        false),
      (5L, "s5", SR.AvroType,
        """{"fields":[{"name":"id","type":"long"}],"namespace":"com.ex","name":"Ev","type":"record"}""",
        false)))                           // sanitize subsumes: shares id 3
    assert(got.map(r => (r._1, r._3)) ===
      Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 3L)))
  }
}
