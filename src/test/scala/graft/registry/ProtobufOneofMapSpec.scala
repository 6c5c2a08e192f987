package graft.registry

import org.scalatest.funsuite.AnyFunSuite

import graft.registry.ProtobufCompat.ProtobufChecker

/** Oneof and map compatibility (`protobuf.cc:553-645` oneof rule pair;
  * map fields as structural entry types) plus their normal forms. */
class ProtobufOneofMapSpec extends AnyFunSuite {

  private def can(reader: String, writer: String): Boolean =
    ProtobufChecker.canRead(reader, writer)

  test("one field moved into a reader oneof is compatible; two are not") {
    val writer = "message E { int32 a = 1; string b = 2; }"
    assert(can("message E { oneof alt { int32 a = 1; } string b = 2; }", writer))
    // two independently-settable writer fields collapsing into one
    // reader oneof -> multiple_fields_moved_to_oneof
    assert(!can("message E { oneof alt { int32 a = 1; string b = 2; } }", writer))
  }

  test("a writer-oneof member missing from the reader's same-named oneof breaks") {
    val writer = "message E { oneof alt { int32 a = 1; string b = 2; } }"
    // reader keeps the oneof name but dropped member 2 -> oneof_field_removed
    assert(!can("message E { oneof alt { int32 a = 1; } }", writer))
    // reader dropped the WHOLE oneof name: no oneof check applies
    assert(can("message E { int32 a = 1; string b = 2; }", writer))
    // identical oneofs are compatible
    assert(can(writer, writer))
    // member moved to a DIFFERENT-named oneof: name lookup misses, and
    // the reader-oneof rule sees the writer field inside a oneof
    assert(can("message E { oneof other { int32 a = 1; } oneof alt2 { string b = 2; } }", writer))
  }

  test("map fields: value widening OK, key family change or kind change breaks") {
    val writer = "message E { map<string, int32> m = 1; }"
    assert(can("message E { map<string, int64> m = 1; }", writer))
    assert(!can("message E { map<int32, int32> m = 1; }", writer))
    assert(!can("message E { optional string m = 1; }", writer))
    assert(!can(writer, "message E { optional string m = 1; }"))
  }

  test("enum fields compare as the varint wire family; symbols are normal-form contract") {
    val withEnum =
      "message E { enum Lvl { LOW = 0; HIGH = 1; } Lvl level = 1; }"
    // enum <-> int32/int64: same varint family (the reference's kind model)
    assert(can("message E { int32 level = 1; }", withEnum))
    assert(can(withEnum, "message E { int64 level = 1; }"))
    // but not a length-delimited kind
    assert(!can("message E { string level = 1; }", withEnum))
    // symbol sets don't affect wire compat...
    val moreSyms =
      "message E { enum Lvl { LOW = 0; HIGH = 1; EXTRA = 2; } Lvl level = 1; }"
    assert(can(withEnum, moreSyms) && can(moreSyms, withEnum))
    // ...but they ARE registration contract: normal forms differ
    assert(Normalize.protobufNormalForm(withEnum) !==
      Normalize.protobufNormalForm(moreSyms))
    assert(Normalize.protobufNormalForm(withEnum).contains("enum Lvl {"))
    // and an enum defined AFTER its use still resolves (two-pass)
    val lateEnum = "message E { Lvl level = 1; enum Lvl { LOW = 0; } }"
    assert(can("message E { int32 level = 1; }", lateEnum))
  }

  test("enum names survive typing: shadowed messages and distinct enums stay distinct") {
    // a message named like an enum elsewhere in the file must stay a
    // message type — int32 cannot read it (field_kind_changed)
    val shadowed = "message A { enum Status { OK = 0; } Status s = 1; }\n" +
      "message B { message Status { int32 code = 1; } Status st = 1; }"
    val readerB = "message B { int32 st = 1; }"
    assert(!ProtobufCompat.parseFile(shadowed)._1.exists { m =>
      m.name == "B" && m.fields.exists(_.tpe == ProtobufCompat.Scalar("enum"))
    })
    // two enum types with different names render distinctly in the
    // normal form even with identical field numbers
    val fieldOfA = "message E { enum A { X = 0; } enum B { Y = 0; } A f = 1; }"
    val fieldOfB = "message E { enum A { X = 0; } enum B { Y = 0; } B f = 1; }"
    assert(Normalize.protobufNormalForm(fieldOfA) !==
      Normalize.protobufNormalForm(fieldOfB))
    assert(can(readerB, readerB))
  }

  test("a commented-out syntax line does not set the registration identity") {
    val commented = "// legacy: syntax = \"proto3\"\nmessage Ev { int64 id = 1; }"
    val p2 = """syntax = "proto2"; message Ev { int64 id = 1; }"""
    assert(Normalize.protobufNormalForm(commented) ===
      Normalize.protobufNormalForm(p2))
    assert(Normalize.protobufNormalForm(commented).startsWith("syntax = \"proto2\";"))
  }

  test("normal form renders oneof blocks and map types stably") {
    val a = "message E { oneof alt { string b = 2; int32 a = 1; } map<string, int64> m = 3; }"
    val b = "message E { map<string, int64> m = 3; oneof alt { int32 a = 1; string b = 2; } }"
    assert(Normalize.protobufNormalForm(a) === Normalize.protobufNormalForm(b))
    assert(Normalize.protobufNormalForm(a).contains("oneof alt {"))
    assert(Normalize.protobufNormalForm(a).contains("map<string, int64> m = 3;"))
    // oneof membership is contract: the same fields OUTSIDE the oneof
    // normal-form differently
    val c = "message E { int32 a = 1; string b = 2; map<string, int64> m = 3; }"
    assert(Normalize.protobufNormalForm(a) !== Normalize.protobufNormalForm(c))
  }
}
