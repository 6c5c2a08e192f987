package graft.registry

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/**
 * JSON-schema compatibility — the read-compatibility subset of the
 * reference's checker (`pandaproxy/schema_registry/json.cc`, 2.4k LoC).
 *
 * `canRead(reader, writer)` decides whether data valid under `writer` is
 * also valid under `reader` — i.e. the reader is a SUPERSET of the
 * writer, exactly the reference's `is_superset(older = reader,
 * newer = writer)` orientation (backward compatibility when the
 * proposed schema is the reader). Rules implemented, mirroring
 * json.cc's is_superset checks:
 *
 *  - **true/false schemas** (`json.cc:563-614`): `true`/`{}` read
 *    anything; anything reads `false`/`{"not":{}}`; bool schemas map to
 *    those forms everywhere a subschema is expected (`:868-886`).
 *  - **type**: every writer type must be accepted by the reader's type
 *    set; a reader `number` accepts a writer `integer` (numeric
 *    widening), never the reverse. An absent `type` accepts anything —
 *    so a constrained reader cannot read an unconstrained writer.
 *  - **enum**: if the reader enumerates values, the writer must enumerate
 *    a subset (an open writer could produce values outside the enum).
 *  - **not** (`:1852-1884`): exactly one side carrying `not` is
 *    incompatible; both carrying it flips the polarity — the WRITER's
 *    `not` subschema must be a superset of the reader's (`newer`
 *    validating less data than `older` under negation).
 *  - **oneOf/allOf/anyOf** (`:1895-2085`): at most one combinator per
 *    side; a reader without one is free; a reader with one requires one
 *    of the writer. Mixed combinators allow the reference's three
 *    special cases (1-vs-1 direct, 1-vs-allOf any-branch,
 *    oneOf-vs-1 any-branch) unless the reader is `anyOf` (accepts any
 *    shape). Same-combinator (or reader-anyOf) compares sizes — a
 *    reader `allOf` may not grow, a writer `anyOf`/`oneOf` may not
 *    grow — then requires a perfect bipartite matching pairing each
 *    subschema of the smaller list with a distinct compatible partner
 *    (the reference runs Edmonds maximum-cardinality matching).
 *  - **object properties** (`:1511-1610`): each writer property checks
 *    against the reader's same-name property, else against EVERY
 *    matching reader `patternProperties` entry (unanchored regex
 *    search), else against the reader's `additionalProperties` schema —
 *    a false-schema there is a closed content model. Reader-required
 *    properties must be writer-required unless the reader supplies a
 *    default (`:1611-1650`). `additionalProperties` themselves compare
 *    as schemas via the bool→true/false-schema table (`:1011-1122`).
 *  - **dependencies** (`:1653-1743`): every reader dependency key must
 *    survive in the writer with the same shape — schema-form
 *    dependencies recurse, array-form require the reader's property
 *    list to be a subset of the writer's.
 *  - **array/tuple items** (`:1324-1509`): a tuple (array-form `items`)
 *    never reads a plain array or vice versa; plain arrays recurse on
 *    `items`; tuples first compare `additionalItems` via the bool table,
 *    then pairwise prefix, then excess entries on either side against
 *    the other side's `additionalItems` schema.
 *  - **bounds** (`:1124-1320`): a reader bound may only relax; pattern
 *    string-identical; writer multipleOf divisible by the reader's
 *    (exact BigDecimal remainder); uniqueItems:true on the reader
 *    requires the writer's guarantee; min/maxProperties follow the
 *    min/max rules with a 0 default for the lower bound.
 *
 * Dialect handling: the draft-4/6/7 keyword family (`items` array form
 * for tuples, `additionalItems` for the tuple tail) — the repo's
 * registry does not track `$schema` dialects per subject.
 */
object JsonSchemaCompat {

  private val mapper = new ObjectMapper()
  private val TrueSchema: JsonNode = JsonNodeFactory.instance.objectNode()
  private val FalseSchema: JsonNode =
    JsonNodeFactory.instance.objectNode().set("not", JsonNodeFactory.instance.objectNode())

  def canRead(readerJson: String, writerJson: String): Boolean =
    canRead(mapper.readTree(readerJson), mapper.readTree(writerJson))

  /** `is_true_schema` (json.cc:563): literal `true` or `{}`. */
  private def isTrueSchema(n: JsonNode): Boolean =
    (n.isBoolean && n.asBoolean()) || (n.isObject && n.size() == 0)

  /** `is_false_schema` (json.cc:598): literal `false` or `{"not": {}}`. */
  private def isFalseSchema(n: JsonNode): Boolean =
    (n.isBoolean && !n.asBoolean()) ||
      (n.isObject && n.get("not") != null && isTrueSchema(n.get("not")))

  /** `get_object_or_empty` (json.cc:868): absent/true → `{}`, false →
    * `{"not":{}}`, object → itself. */
  private def schemaOrEmpty(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    if (v == null) TrueSchema
    else if (v.isBoolean) { if (v.asBoolean()) TrueSchema else FalseSchema }
    else v
  }

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

  private def canRead(r: JsonNode, w: JsonNode): Boolean = {
    // recursion base cases (json.cc:2101-2107)
    if (isTrueSchema(r) || isFalseSchema(w)) return true
    if (r.isBoolean) return false // reader `false` reads only false-schemas
    if (w.isBoolean) {            // writer `true` ≡ {}: unconstrained
      return canRead(r, TrueSchema)
    }
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
    if (!notOk(r, w)) return false
    if (!combinatorOk(r, w)) return false
    // object properties
    if (rt.contains("object") || wt.contains("object")) {
      if (!propertiesOk(r, w)) return false
      if (!requiredOk(r, w)) return false
      if (!dependenciesOk(r, w)) return false
      // additionalProperties as schemas (bool table folds into canRead
      // via the true/false-schema base cases — json.cc:1077-1122)
      if (!canRead(schemaOrEmpty(r, "additionalProperties"),
          schemaOrEmpty(w, "additionalProperties"))) return false
    }
    // array / tuple items
    if (rt.contains("array") || wt.contains("array")) {
      if (!itemsOk(r, w)) return false
    }
    boundsOk(r, w)
  }

  /** `is_not_combinator_superset` (json.cc:1852): presence must agree;
    * with both present the polarity flips — the writer's `not` must be
    * a superset of the reader's. */
  private def notOk(r: JsonNode, w: JsonNode): Boolean = {
    val rn = r.get("not"); val wn = w.get("not")
    if ((rn == null) != (wn == null)) false
    else if (rn == null) true
    else canRead(wn, rn)
  }

  private val Combinators = Seq("oneOf", "allOf", "anyOf")

  /** `is_positive_combinator_superset` (json.cc:1903-2085). */
  private def combinatorOk(r: JsonNode, w: JsonNode): Boolean = {
    def combOf(n: JsonNode): Option[Seq[String]] = {
      val present = Combinators.filter(n.get(_) != null)
      if (present.isEmpty) None else Some(present)
    }
    (combOf(r), combOf(w)) match {
      case (None, _) => true // reader unconstrained by combinators
      case (Some(rc), _) if rc.size > 1 => false // invalid_schema in the ref
      case (Some(_), None) => false // combined_type_changed
      case (Some(_), Some(wc)) if wc.size > 1 => false
      case (Some(Seq(rc)), Some(Seq(wc))) =>
        val rs = r.get(rc).elements().asScala.toIndexedSeq
        val ws = w.get(wc).elements().asScala.toIndexedSeq
        if (rc != "anyOf" && rc != wc) {
          // mixed combinators: the three special cases (json.cc:1954-2008)
          if (rs.size == 1 && ws.size == 1) canRead(rs.head, ws.head)
          else if (rs.size == 1 && wc == "allOf") ws.exists(canRead(rs.head, _))
          else if (rc == "oneOf" && ws.size == 1) rs.exists(canRead(_, ws.head))
          else false // combined_type_changed
        } else {
          // same combinator, or reader anyOf (json.cc:2015-2085)
          if (rs.size > ws.size && rc == "allOf") false // product_type_extended
          else if (rs.size < ws.size && (wc == "anyOf" || wc == "oneOf"))
            false // sum_type_narrowed
          else {
            // each subschema of the smaller list needs a DISTINCT
            // compatible partner: maximum bipartite matching over the
            // canRead(reader_i, writer_j) edge set
            val edges = Array.tabulate(rs.size, ws.size)((i, j) => canRead(rs(i), ws(j)))
            bipartiteMatching(edges) == math.min(rs.size, ws.size)
          }
        }
      case _ => false
    }
  }

  /** Maximum bipartite matching size (augmenting paths — subschema
    * lists are tiny; the reference runs Edmonds on the same graph). */
  private def bipartiteMatching(edges: Array[Array[Boolean]]): Int = {
    val nL = edges.length
    val nR = if (nL == 0) 0 else edges(0).length
    val matchR = Array.fill(nR)(-1)
    def augment(i: Int, seen: Array[Boolean]): Boolean = {
      var j = 0
      while (j < nR) {
        if (edges(i)(j) && !seen(j)) {
          seen(j) = true
          if (matchR(j) < 0 || augment(matchR(j), seen)) {
            matchR(j) = i
            return true
          }
        }
        j += 1
      }
      false
    }
    (0 until nL).count(i => augment(i, Array.fill(nR)(false)))
  }

  /** `is_object_properties_superset` (json.cc:1511-1610): every writer
    * property resolves against the reader's property, else all matching
    * patternProperties, else additionalProperties (false = closed). */
  private def propertiesOk(r: JsonNode, w: JsonNode): Boolean = {
    val wp = propsOf(w)
    if (wp.isEmpty) return true
    val rp = propsOf(r)
    val rPatterns: Seq[(java.util.regex.Pattern, JsonNode)] = {
      val pp = r.get("patternProperties")
      if (pp == null) Seq.empty
      else pp.fieldNames().asScala.map(k =>
        java.util.regex.Pattern.compile(k) -> pp.get(k)).toSeq
    }
    val rAdditional = schemaOrEmpty(r, "additionalProperties")
    wp.forall { case (name, wSchema) =>
      rp.get(name) match {
        case Some(rSchema) => canRead(rSchema, wSchema)
        case None =>
          // unanchored search, as the reference's RE2::PartialMatch
          val matching = rPatterns.filter(_._1.matcher(name).find())
          if (matching.nonEmpty) matching.forall(p => canRead(p._2, wSchema))
          else if (isFalseSchema(rAdditional)) false // closed content model
          else canRead(rAdditional, wSchema)
      }
    }
  }

  /** `is_object_required_superset` (json.cc:1611): a property required
    * by the reader but not the writer breaks unless the reader supplies
    * a default; only properties declared on both sides are examined. */
  private def requiredOk(r: JsonNode, w: JsonNode): Boolean = {
    val rp = propsOf(r); val wp = propsOf(w)
    val wReq = requiredOf(w)
    requiredOf(r).forall(k =>
      !(rp.contains(k) && wp.contains(k)) || wReq.contains(k) ||
        rp(k).get("default") != null)
  }

  /** `is_object_dependencies_superset` (json.cc:1653): reader
    * dependencies must carry over to the writer, same shape, schema-form
    * compatible / array-form subset. */
  private def dependenciesOk(r: JsonNode, w: JsonNode): Boolean = {
    val rd = r.get("dependencies")
    if (rd == null) return true
    val wd = w.get("dependencies")
    rd.fieldNames().asScala.forall { k =>
      val o = rd.get(k)
      val n = if (wd == null) null else wd.get(k)
      if (o.isObject)
        n != null && n.isObject && canRead(o, n) // dependency_schema_added
      else if (o.isArray) {
        if (n == null || !n.isArray) false // dependency_array_added
        else {
          val os = o.elements().asScala.map(_.asText()).toSet
          val ns = n.elements().asScala.map(_.asText()).toSet
          os.subsetOf(ns) // else array_extended / array_changed
        }
      } else false // invalid schema shape
    }
  }

  /** `is_array_superset` items handling (json.cc:1324-1509): tuples
    * (array-form `items`) vs plain arrays never mix; arrays recurse;
    * tuples compare additionalItems, prefix pairs, then excess. */
  private def itemsOk(r: JsonNode, w: JsonNode): Boolean = {
    def tupleOf(n: JsonNode): Option[IndexedSeq[JsonNode]] = {
      val it = n.get("items")
      if (it != null && it.isArray) Some(it.elements().asScala.toIndexedSeq)
      else None
    }
    (tupleOf(r), tupleOf(w)) match {
      case (None, None) =>
        canRead(schemaOrEmpty(r, "items"), schemaOrEmpty(w, "items"))
      case (Some(rItems), Some(wItems)) =>
        val rAdd = schemaOrEmpty(r, "additionalItems")
        val wAdd = schemaOrEmpty(w, "additionalItems")
        if (!canRead(rAdd, wAdd)) false
        else if (!rItems.zip(wItems).forall { case (o, n) => canRead(o, n) }) false
        else if (wItems.size > rItems.size)
          wItems.drop(rItems.size).forall(canRead(rAdd, _))
        else rItems.drop(wItems.size).forall(canRead(_, wAdd))
      case _ => false // tuple vs array: incompatible (json.cc:1424-1430)
    }
  }

  private def numOf(n: JsonNode, field: String): Option[Double] = {
    val v = n.get(field)
    if (v == null || !v.isNumber) None else Some(v.asDouble())
  }

  private def decOf(n: JsonNode, field: String): Option[BigDecimal] = {
    val v = n.get(field)
    if (v == null || !v.isNumber) None else Some(BigDecimal(v.decimalValue()))
  }

  /**
   * Constraint-bound superset checks (`json.cc:1124-1320`
   * `is_string_superset` / `is_numeric_superset` / array bounds,
   * `:1754-1800` object counts): a reader bound may only RELAX what the
   * writer guarantees —
   *
   *  - `minLength`/`minItems`/`minProperties` (default 0) must not
   *    increase and `maxLength`/`maxItems`/`maxProperties`/`minimum`/
   *    `maximum`/`exclusive*` must not tighten; a reader adding a bound
   *    the writer lacks is `*_added` (the unconstrained writer can
   *    exceed it);
   *  - `pattern` must be absent in the reader or string-identical
   *    (`pattern_changed` — regex implication is undecidable, json.cc
   *    compares the source text);
   *  - `multipleOf`: every writer multiple must be a reader multiple —
   *    exact BigDecimal remainder, so fractional factors (reader 0.1,
   *    writer 0.3) don't ride a floating-point epsilon
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
    val multipleOk = decOf(r, "multipleOf").forall(rm =>
      decOf(w, "multipleOf").exists(wm =>
        rm.signum != 0 && (wm remainder rm).signum == 0))
    val uniqueOk = {
      val ru = r.get("uniqueItems")
      ru == null || !ru.asBoolean(false) ||
        (w.get("uniqueItems") != null && w.get("uniqueItems").asBoolean(false))
    }
    lowerZeroDefault("minLength") && upper("maxLength") &&
      lowerZeroDefault("minItems") && upper("maxItems") &&
      lowerZeroDefault("minProperties") && upper("maxProperties") &&
      lower("minimum") && upper("maximum") &&
      lower("exclusiveMinimum") && upper("exclusiveMaximum") &&
      patternOk && multipleOk && uniqueOk
  }
}
