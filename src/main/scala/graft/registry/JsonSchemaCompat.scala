package graft.registry

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * JSON-schema compatibility — the read-compatibility subset of the
 * reference's checker (`pandaproxy/schema_registry/json.cc`, 2.4k LoC).
 *
 * `canRead(reader, writer)` decides whether data valid under `writer` is
 * also valid under `reader` (backward compatibility when the proposed
 * schema is the reader). Rules implemented, mirroring json.cc's
 * is_superset checks:
 *
 *  - **type**: every writer type must be accepted by the reader's type
 *    set; a reader `number` accepts a writer `integer` (numeric
 *    widening), never the reverse. An absent `type` accepts anything —
 *    so a constrained reader cannot read an unconstrained writer.
 *  - **enum**: if the reader enumerates values, the writer must enumerate
 *    a subset (an open writer could produce values outside the enum).
 *  - **object properties**: recursively check shared properties; a
 *    property the reader requires must be required by the writer; if the
 *    reader forbids additionalProperties, every writer property must be
 *    known to the reader and the writer must forbid extras too.
 *  - **array items**: recursive on the `items` schema.
 *
 * Anything outside this subset (conditionals, pattern properties,
 * numeric bounds tightening) is treated conservatively as incompatible
 * only when expressible above; the unit tests pin the supported corpus.
 */
object JsonSchemaCompat {

  private val mapper = new ObjectMapper()

  def canRead(readerJson: String, writerJson: String): Boolean =
    canRead(mapper.readTree(readerJson), mapper.readTree(writerJson))

  private def typesOf(n: JsonNode): Set[String] = {
    val t = n.get("type")
    if (t == null) Set.empty
    else if (t.isArray) t.elements().asScala.map(_.asText()).toSet
    else Set(t.asText())
  }

  private def enumOf(n: JsonNode): Option[Set[String]] = {
    val e = n.get("enum")
    if (e == null) None else Some(e.elements().asScala.map(_.toString).toSet)
  }

  private def requiredOf(n: JsonNode): Set[String] = {
    val r = n.get("required")
    if (r == null) Set.empty else r.elements().asScala.map(_.asText()).toSet
  }

  private def propsOf(n: JsonNode): Map[String, JsonNode] = {
    val p = n.get("properties")
    if (p == null) Map.empty
    else p.fieldNames().asScala.map(k => k -> p.get(k)).toMap
  }

  private def additionalAllowed(n: JsonNode): Boolean = {
    val a = n.get("additionalProperties")
    a == null || !a.isBoolean || a.asBoolean()
  }

  private def canRead(r: JsonNode, w: JsonNode): Boolean = {
    val rt = typesOf(r)
    val wt = typesOf(w)
    // type acceptance with integer->number widening
    if (rt.nonEmpty) {
      if (wt.isEmpty) return false
      val accepted = rt ++ (if (rt.contains("number")) Set("integer") else Set.empty)
      if (!wt.subsetOf(accepted)) return false
    }
    // enum narrowing
    enumOf(r) match {
      case Some(re) =>
        enumOf(w) match {
          case Some(we) => if (!we.subsetOf(re)) return false
          case None     => return false // open writer vs enumerated reader
        }
      case None => ()
    }
    // object properties
    if (rt.contains("object") || wt.contains("object")) {
      val rp = propsOf(r)
      val wp = propsOf(w)
      val shared = rp.keySet intersect wp.keySet
      if (!shared.forall(k => canRead(rp(k), wp(k)))) return false
      if (!requiredOf(r).subsetOf(requiredOf(w))) return false
      if (!additionalAllowed(r)) {
        if (!wp.keySet.subsetOf(rp.keySet)) return false
        if (additionalAllowed(w)) return false
      }
    }
    // array items
    if (rt.contains("array") || wt.contains("array")) {
      val ri = r.get("items")
      val wi = w.get("items")
      if (ri != null && wi == null) return false
      if (ri != null && wi != null && !canRead(ri, wi)) return false
    }
    boundsOk(r, w)
  }

  private def numOf(n: JsonNode, field: String): Option[Double] = {
    val v = n.get(field)
    if (v == null || !v.isNumber) None else Some(v.asDouble())
  }

  /**
   * Constraint-bound superset checks (`json.cc:1124-1320`
   * `is_string_superset` / `is_numeric_superset` / array bounds): a
   * reader bound may only RELAX what the writer guarantees —
   *
   *  - `minLength`/`minItems` (default 0) must not increase and
   *    `maxLength`/`maxItems`/`minimum`/`maximum`/`exclusive*` must not
   *    tighten; a reader adding a bound the writer lacks is
   *    `*_added` (the unconstrained writer can exceed it);
   *  - `pattern` must be absent in the reader or string-identical
   *    (`pattern_changed` — regex implication is undecidable, json.cc
   *    compares the source text);
   *  - `multipleOf`: every writer multiple must be a reader multiple —
   *    the writer's factor must be an integer multiple of the reader's
   *    (`multiple_of_changed`/`_added`);
   *  - `uniqueItems: true` on the reader requires the writer to
   *    guarantee it too.
   */
  private def boundsOk(r: JsonNode, w: JsonNode): Boolean = {
    // lower bounds with a spec default of 0: absent writer = 0
    def lowerZeroDefault(field: String): Boolean =
      numOf(r, field).forall(rv => rv <= numOf(w, field).getOrElse(0.0))
    // lower bounds with no default: reader bound needs a writer bound
    def lower(field: String): Boolean = numOf(r, field).forall(rv =>
      numOf(w, field).exists(wv => rv <= wv))
    def upper(field: String): Boolean = numOf(r, field).forall(rv =>
      numOf(w, field).exists(wv => rv >= wv))
    val patternOk = {
      val rp = r.get("pattern")
      rp == null || (w.get("pattern") != null &&
        rp.asText() == w.get("pattern").asText())
    }
    val multipleOk = numOf(r, "multipleOf").forall(rm =>
      numOf(w, "multipleOf").exists { wm =>
        val q = wm / rm
        math.abs(q - math.rint(q)) < 1e-9
      })
    val uniqueOk = {
      val ru = r.get("uniqueItems")
      ru == null || !ru.asBoolean(false) ||
        (w.get("uniqueItems") != null && w.get("uniqueItems").asBoolean(false))
    }
    lowerZeroDefault("minLength") && upper("maxLength") &&
      lowerZeroDefault("minItems") && upper("maxItems") &&
      lower("minimum") && upper("maximum") &&
      lower("exclusiveMinimum") && upper("exclusiveMaximum") &&
      patternOk && multipleOk && uniqueOk
  }
}
