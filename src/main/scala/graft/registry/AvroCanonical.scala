package graft.registry

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}

/**
 * Avro schema canonicalization + global-id projection (reference
 * `pandaproxy/schema_registry/avro.cc:596`
 * `sanitize_avro_schema_definition`, `sharded_store.cc:135`
 * `get_schema_version`): registering a schema stores its SANITIZED
 * definition, and two registrations with the same sanitized definition
 * — across any subjects — share one global schema id.
 *
 * Sanitize (NOT Avro Parsing Canonical Form — the reference's own
 * richer normal form, `avro.cc:302-470`):
 *  - compact re-serialization (whitespace insignificant);
 *  - member ordering: complex types (record/enum/array/map/fixed) sort
 *    `type,name,namespace,doc,fields,order,symbols,items,values,
 *    default,size,aliases` first, field-like objects the same but with
 *    `name` before `type` (`member_sorter`, `avro.cc:243-269`);
 *  - fullname splitting: a dotted `name` splits at the LAST dot into a
 *    simple name + `namespace`; a `namespace` equal to the inherited
 *    one is REDUNDANT and removed, a new one is recorded (and inherited
 *    by nested types via the namespace stack, `avro.cc:386-448`);
 *  - union type references strip a single LEADING dot (the null
 *    namespace marker, `sanitize_union_symbol_name`, `avro.cc:282-299`).
 *
 * Divergence note: for members outside the priority table the reference
 * uses `std::sort` (unspecified tie order); this port uses a STABLE
 * sort, preserving author order among unknown attributes.
 */
object AvroCanonical {

  private val mapper = new ObjectMapper()

  private def priority(name: String, complex: Boolean): Int = name match {
    case "type"      => if (complex) 0 else 1
    case "name"      => if (complex) 1 else 0
    case "namespace" => 2
    case "doc"       => 3
    case "fields"    => 4
    case "order"     => 5
    case "symbols"   => 6
    case "items"     => 7
    case "values"    => 8
    case "default"   => 9
    case "size"      => 10
    case "aliases"   => 11
    case _           => Int.MaxValue
  }

  private def sortMembers(o: ObjectNode, complex: Boolean): Unit = {
    val entries = o.fields().asScala.toSeq.map(e => e.getKey -> e.getValue)
    val sorted = entries.sortBy { case (k, _) => priority(k, complex) } // stable
    o.removeAll()
    sorted.foreach { case (k, v) => o.set[JsonNode](k, v) }
  }

  private def sanitizeValue(v: JsonNode, ns: List[String]): Unit = v match {
    case o: ObjectNode => sanitizeObject(o, ns)
    case a: ArrayNode  => a.elements().asScala.foreach(sanitizeValue(_, ns))
    case _             =>
  }

  private def sanitizeObject(o: ObjectNode, ns0: List[String]): Unit = {
    var ns = ns0
    // name/namespace normalization (avro.cc:386-448)
    Option(o.get("name")).foreach { nameNode =>
      require(nameNode.isTextual && nameNode.asText.nonEmpty,
        "Invalid JSON Field \"name\"")
      val full = nameNode.asText
      val lastDot = full.lastIndexOf('.')
      var newNs: Option[String] = None
      if (lastDot >= 0) {
        o.set[JsonNode]("name", TextNode.valueOf(full.substring(lastDot + 1)))
        newNs = Some(full.substring(0, math.max(lastDot, 0)))
      } else {
        newNs = Option(o.get("namespace")).map { n =>
          require(n.isTextual, "Invalid JSON Field \"namespace\"")
          n.asText
        }
      }
      newNs match {
        case Some(n) if ns.head != n =>
          ns = n :: ns
          o.set[JsonNode]("namespace", TextNode.valueOf(n))
        case _ =>
          o.remove("namespace")
      }
    }
    Option(o.get("type")).foreach { t =>
      sanitizeValue(t, ns)
      if (t.isTextual) sanitizeType(o, t.asText, ns)
      else if (t.isArray) {
        // union: strip the single leading dot off string type refs
        val a = t.asInstanceOf[ArrayNode]
        (0 until a.size()).foreach { i =>
          val m = a.get(i)
          if (m.isTextual) {
            val s = m.asText
            require(s.nonEmpty, "Invalid JSON Field \"name\"")
            if (s.lastIndexOf('.') == 0)
              a.set(i, TextNode.valueOf(s.substring(1)))
          }
        }
        sanitizeType(o, "field", ns)
      } else if (t.isObject) sanitizeType(o, "field", ns)
    }
  }

  /** `sanitize_avro_type` (`avro.cc:314-349`). */
  private def sanitizeType(o: ObjectNode, tpe: String, ns: List[String]): Unit =
    tpe match {
      case "record" =>
        val f = o.get("fields")
        require(f != null, "Missing JSON field \"fields\"")
        require(f.isArray, "JSON field \"fields\" is not an array")
        sanitizeValue(f, ns)
        sortMembers(o, complex = true)
      case "array" | "enum" | "map" | "fixed" =>
        sortMembers(o, complex = true)
        o.fields().asScala.foreach(e => sanitizeValue(e.getValue, ns))
      case _ =>
        sortMembers(o, complex = false)
    }

  /** The full `sanitize_avro_schema_definition`: parse, normalize,
    * re-serialize compact. Throws on invalid schema JSON. */
  def sanitize(json: String): String = {
    require(json.trim.nonEmpty, "schema_empty")
    val root = mapper.readTree(json)
    sanitizeValue(root, List(""))
    mapper.writeValueAsString(root)
  }

  /**
   * Global schema-id projection over accepted registrations in log
   * order (`sharded_store::get_schema_version`): an identical sanitized
   * definition anywhere reuses its id; re-registering a definition the
   * subject already has returns the existing version without growing
   * the chain. Returns `(seq, subject, schema_id, version, new_id,
   * new_version)`.
   */
  def projectIds(attempts: Seq[(Long, String, String)]): Seq[(Long, String, Long, Int, Boolean, Boolean)] = {
    val byDef = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val subVersions = scala.collection.mutable.Map.empty[String, Vector[Long]]
    attempts.sortBy(_._1).map { case (seq, sub, raw) =>
      val canon = sanitize(raw)
      val newId = !byDef.contains(canon)
      val id = byDef.getOrElseUpdate(canon, byDef.size + 1L)
      val vers = subVersions.getOrElse(sub, Vector.empty)
      val existing = vers.indexOf(id)
      if (existing >= 0) (seq, sub, id, existing + 1, newId, false)
      else {
        subVersions(sub) = vers :+ id
        (seq, sub, id, vers.size + 1, newId, true)
      }
    }
  }
}
