package graft.registry

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/**
 * Normalize-on-register (reference `pandaproxy/schema_registry/types.h:38`
 * `normalize = ss::bool_class<...>`): a client may ask the registry to
 * canonicalize a schema definition BEFORE identity assignment, so two
 * spellings of the same logical schema register once and share one
 * global id. Per format:
 *
 *  - AVRO: the always-on sanitize ([[AvroCanonical.sanitize]],
 *    `avro.cc:596`) already subsumes normalization — member order,
 *    fullname splitting, and whitespace are normal-formed on every
 *    registration, flag or not (the reference sanitizes every Avro
 *    registration unconditionally).
 *  - JSON schema: recursive key-order sort + compact re-serialization
 *    (JSON object member order is semantically void).
 *  - PROTOBUF: re-render from the parsed descriptor — fields in field-
 *    NUMBER order (the wire contract's identity, not author order),
 *    nested messages name-sorted, comments and whitespace dropped.
 *
 * Without the flag the registry stores the spelling as given (Avro
 * excepted), and a re-spelling mints a NEW id — exactly the upstream
 * behavior the flag exists to avoid.
 */
object Normalize {

  private val mapper = new ObjectMapper()

  private def sortNode(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val m = mapper.createObjectNode()
      o.fields().asScala.toSeq.sortBy(_.getKey)
        .foreach(e => m.set[JsonNode](e.getKey, sortNode(e.getValue)))
      m
    case a: ArrayNode =>
      val r = mapper.createArrayNode()
      a.elements().asScala.foreach(e => r.add(sortNode(e)))
      r
    case other => other
  }

  /** JSON-schema normal form: sorted keys, compact. */
  def jsonNormalForm(json: String): String =
    mapper.writeValueAsString(sortNode(mapper.readTree(json)))

  private def tpeName(t: ProtobufCompat.PType): String = t match {
    case ProtobufCompat.Scalar(n)     => n
    case ProtobufCompat.MessageRef(n) => n
    case ProtobufCompat.EnumRef(n)    => n
    case ProtobufCompat.PMap(k, v)    => s"map<$k, ${tpeName(v)}>"
  }

  private def renderMessage(m: ProtobufCompat.PMessage, indent: String): String = {
    // oneof membership is part of the contract (field presence), so the
    // normal form renders oneof blocks (name-sorted, members by number)
    // separately from plain fields
    val oneofNums = m.oneofs.values.flatten.toSet
    val fs = m.fields.filterNot(f => oneofNums(f.number)).sortBy(_.number).map { f =>
      val label =
        if (f.repeated) "repeated " else if (f.required) "required " else ""
      s"$indent  $label${tpeName(f.tpe)} ${f.name} = ${f.number};"
    }
    val os = m.oneofs.toSeq.sortBy(_._1).map { case (oname, nums) =>
      val members = m.fields.filter(f => nums(f.number)).sortBy(_.number)
        .map(f => s"$indent    ${tpeName(f.tpe)} ${f.name} = ${f.number};")
      (s"$indent  oneof $oname {" +: members :+ s"$indent  }").mkString("\n")
    }
    // enum symbol sets are contract (symbol meanings; proto3 default =
    // first symbol), so nested enums render name-sorted, symbols in
    // declaration order
    val es = m.enums.toSeq.sortBy(_._1).map { case (ename, syms) =>
      val lines = syms.map { case (sym, n) => s"$indent    $sym = $n;" }
      (s"$indent  enum $ename {" +: lines :+ s"$indent  }").mkString("\n")
    }
    val ns = m.nested.toSeq.sortBy(_._1).map { case (_, n) =>
      renderMessage(n, indent + "  ")
    }
    (s"${indent}message ${m.name} {" +: (fs ++ os ++ es ++ ns) :+ s"$indent}").mkString("\n")
  }

  /** Protobuf normal form: descriptor-ordered canonical rendering.
    * The (defaulted) `syntax` declaration leads the normal form:
    * proto2 and proto3 files with identical message bodies are
    * DIFFERENT contracts (field-presence semantics differ), so they
    * must not collapse to one registration identity — upstream
    * protobuf normalization preserves syntax likewise. An undeclared
    * syntax defaults to proto2, per the language spec. */
  def protobufNormalForm(proto: String): String = {
    // comments are stripped BEFORE the syntax scan — a commented-out
    // syntax line must not determine the registration identity
    val effective = proto.replaceAll("//.*", " ")
    val syntax = """syntax\s*=\s*"(proto[23])"""".r
      .findFirstMatchIn(effective).map(_.group(1)).getOrElse("proto2")
    val (msgs, _) = ProtobufCompat.parseFile(proto)
    (s"""syntax = "$syntax";""" +: msgs.map(renderMessage(_, ""))).mkString("\n")
  }

  /** The registration identity of a definition under the flag. */
  def identity(format: SchemaRegistry.SchemaType, definition: String,
      normalize: Boolean): String = format match {
    case SchemaRegistry.AvroType => AvroCanonical.sanitize(definition)
    case SchemaRegistry.JsonType =>
      if (normalize) jsonNormalForm(definition) else definition.trim
    case SchemaRegistry.ProtobufType =>
      if (normalize) protobufNormalForm(definition) else definition.trim
  }

  /**
   * [[AvroCanonical.projectIds]] generalized across formats with a
   * per-attempt normalize flag: identical identities — (format, normal
   * or raw form) — share one global id; re-registering a subject's
   * existing identity returns the existing version without growing the
   * chain. Attempts: (seq, subject, format, definition, normalize).
   * Returns (seq, subject, schema_id, version, new_id, new_version).
   */
  def projectIds(
      attempts: Seq[(Long, String, SchemaRegistry.SchemaType, String, Boolean)])
      : Seq[(Long, String, Long, Int, Boolean, Boolean)] = {
    val byDef = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
    val subVersions = scala.collection.mutable.Map.empty[String, Vector[Long]]
    attempts.sortBy(_._1).map { case (seq, sub, fmt, raw, norm) =>
      val key = (fmt.toString, identity(fmt, raw, norm))
      val newId = !byDef.contains(key)
      val id = byDef.getOrElseUpdate(key, byDef.size + 1L)
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
