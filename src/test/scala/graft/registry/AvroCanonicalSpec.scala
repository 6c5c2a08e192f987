package graft.registry

import org.scalatest.funsuite.AnyFunSuite

class AvroCanonicalSpec extends AnyFunSuite {

  test("whitespace and member order normalize away") {
    val a = """{"type":"record","name":"Ev","fields":[{"name":"id","type":"long"}]}"""
    val b = """{
      "fields": [ {"type": "long", "name": "id"} ],
      "name": "Ev",
      "type": "record"
    }"""
    assert(AvroCanonical.sanitize(a) === AvroCanonical.sanitize(b))
    assert(AvroCanonical.sanitize(a) ===
      """{"type":"record","name":"Ev","fields":[{"name":"id","type":"long"}]}""")
  }

  test("a dotted fullname splits into simple name + namespace at the last dot") {
    val s = AvroCanonical.sanitize(
      """{"type":"record","name":"com.ex.Ev","fields":[]}""")
    assert(s ===
      """{"type":"record","name":"Ev","namespace":"com.ex","fields":[]}""")
    // equivalent to the already-split spelling
    assert(s === AvroCanonical.sanitize(
      """{"namespace":"com.ex","name":"Ev","type":"record","fields":[]}"""))
  }

  test("a namespace equal to the inherited one is redundant and removed") {
    val s = AvroCanonical.sanitize(
      """{"type":"record","name":"a.b.Outer","fields":[
        |  {"name":"inner","type":
        |    {"type":"record","name":"a.b.Inner","fields":[]}}]}""".stripMargin)
    // Inner inherits a.b from Outer: its namespace member disappears
    assert(s.contains(""""name":"Inner","fields""""), s)
    assert(!s.contains(""""name":"Inner","namespace""""), s)
    // a DIFFERENT nested namespace is kept
    val d = AvroCanonical.sanitize(
      """{"type":"record","name":"a.b.Outer","fields":[
        |  {"name":"inner","type":
        |    {"type":"record","name":"a.c.Inner","fields":[]}}]}""".stripMargin)
    assert(d.contains(""""name":"Inner","namespace":"a.c""""), d)
  }

  test("a union reference strips only a single leading dot") {
    val s = AvroCanonical.sanitize(
      """{"type":"record","name":"R","fields":[
        |  {"name":"x","type":[".T","null"]},
        |  {"name":"y","type":[".ns.T","null"]}]}""".stripMargin)
    assert(s.contains("""["T","null"]"""), s)       // .T -> T
    assert(s.contains("""[".ns.T","null"]"""), s)   // multi-dot untouched
  }

  test("projectIds: one global id per sanitized definition, across subjects") {
    val a1 = """{"type":"record","name":"Ev","fields":[{"name":"id","type":"long"}]}"""
    val a2 = """{ "fields":[{"type":"long","name":"id"}], "name":"Ev", "type":"record" }"""
    val b = """{"type":"record","name":"Ev","fields":[{"name":"id","type":"string"}]}"""
    val got = AvroCanonical.projectIds(Seq(
      (1L, "events-value", a1),
      (2L, "orders-value", a2),  // same canonical: id 1 reused, new version for orders
      (3L, "events-value", a2),  // same subject+def: existing version, no growth
      (4L, "events-value", b),   // new def: id 2, version 2
      (5L, "orders-value", b)))
    assert(got === Seq(
      (1L, "events-value", 1L, 1, true, true),
      (2L, "orders-value", 1L, 1, false, true),
      (3L, "events-value", 1L, 1, false, false),
      (4L, "events-value", 2L, 2, true, true),
      (5L, "orders-value", 2L, 2, false, true)))
  }
}
