package graft.registry

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.spark.sql.{DataFrame, Row}

import graft.log.Compaction
import ProtobufCompat.PMessage

/**
 * Cross-subject schema references (SURVEY §1.3) — the registry's
 * `schema_reference` model: a schema may depend on other subjects'
 * schemas, each dependency named by the string the schema text uses to
 * refer to it (a protobuf import path, an Avro/JSON type name) and
 * pinned to a (subject, version).
 *
 * Reference: `pandaproxy/schema_registry/types.h:105-133`
 * (`schema_reference{name, sub, version}`, `references` vector carried
 * by every `typed_schema_definition`); resolution in
 * `protobuf.cc:290-317` (`build_file_with_refs` — recursively import
 * refs into the DescriptorPool, each file built once, root built last)
 * and `avro.cc:558-581` (`collect_schema` — depth-first collection
 * deduped by ref name, flattened so named types from refs are in scope
 * when the root compiles).
 *
 * Spark-first shape: the registry store is control-plane metadata (a
 * compacted log of at most thousands of rows), so resolution is a
 * driver-side fold over a collected map — exactly the reference's
 * in-memory `sharded_store`. The resolved, self-contained artifact
 * (an Avro [[Schema]] or a protobuf root + message environment) is
 * what ships to executors, closed over by the decode kernels; data-
 * plane rows never join against the store.
 */
object SchemaRefs {

  /** types.h:105 — `name` is how the depending schema text spells the
    * dependency (import path / type name); (subject, version) is where
    * the registry stores it. */
  final case class SchemaRef(name: String, subject: String, version: Int)

  final case class StoredSchema(subject: String, version: Int,
      schemaType: String, schema: String, refs: Seq[SchemaRef])

  /** The collected store view: (subject, version) → schema. */
  type Store = Map[(String, Int), StoredSchema]

  /**
   * Build the store from the compacted `_schemas`-style log. Columns:
   * `seq, subject, version, schema_type, schema, refs` where `refs` is
   * `array<struct<name string, subject string, version int>>` (nullable
   * — absent means no references). Latest registration per
   * (subject, version) wins, same LWW read path as topic compaction.
   */
  def storeFromLog(schemaLog: DataFrame): Store =
    Compaction.compact(schemaLog, Seq("subject", "version"), "seq")
      .collect().map { r =>
        val refs = Option(r.getAs[scala.collection.Seq[Row]]("refs"))
          .map(_.map(x =>
            SchemaRef(x.getString(0), x.getString(1), x.getInt(2))).toSeq)
          .getOrElse(Nil)
        val s = StoredSchema(r.getAs[String]("subject"), r.getAs[Int]("version"),
          r.getAs[String]("schema_type"), r.getAs[String]("schema"), refs)
        (s.subject, s.version) -> s
      }.toMap

  /**
   * Collect the root and its transitive references, dependencies first,
   * each distinct ref NAME once (avro.cc:563 `collected.contains`),
   * root last — the shared traversal under both resolvers. Throws on an
   * unknown (subject, version) or a reference cycle.
   */
  def collect(store: Store, subject: String, version: Int): Seq[StoredSchema] =
    collectNamed(store, subject, version).map(_._2)

  /** [[collect]] keeping each entry's reference NAME (the root under its
    * subject) — the key both the protobuf import table and the JSON
    * `$ref` substitution address dependencies by. */
  def collectNamed(store: Store, subject: String, version: Int): Seq[(String, StoredSchema)] = {
    val out = mutable.LinkedHashMap.empty[String, StoredSchema]
    def go(name: String, sub: String, ver: Int, path: Set[(String, Int)]): Unit = {
      if (!out.contains(name)) {
        val key = (sub, ver)
        require(!path.contains(key), s"schema reference cycle at $sub v$ver")
        val s = store.getOrElse(key,
          throw new NoSuchElementException(s"unknown referenced schema $sub v$ver"))
        s.refs.foreach(r => go(r.name, r.subject, r.version, path + key))
        out += name -> s
      }
    }
    go(subject, subject, version, Set.empty)
    out.toSeq
  }

  /**
   * Resolve an Avro schema whose text references named types defined in
   * other subjects: one [[Schema.Parser]] parses every dependency first
   * (named types accumulate in the parser, `avro.cc`'s flatten-then-
   * compile), then the root. The returned [[Schema]] is self-contained
   * (`toString` inlines every named type at first use), so it feeds the
   * existing [[AvroDecode]] kernels unchanged.
   */
  def resolveAvro(store: Store, subject: String, version: Int): Schema = {
    val parser = new Schema.Parser()
    collect(store, subject, version).map(s => parser.parse(s.schema)).last
  }

  /**
   * Resolve a protobuf schema with imports: each collected file's
   * top-level messages (and their nested definitions) enter the message
   * environment — `build_file_with_refs`' DescriptorPool, built deps-
   * first. Returns the root file's first top-level message plus the full
   * environment, the pair [[ProtobufDecode]]'s resolved kernels take.
   */
  def resolveProtobuf(store: Store, subject: String, version: Int):
      (PMessage, Map[String, PMessage]) = {
    val files = collect(store, subject, version)
    var env = Map.empty[String, PMessage]
    var root: PMessage = null
    files.foreach { s =>
      val (msgs, fileEnv) = ProtobufCompat.parseFile(s.schema)
      env ++= fileEnv
      root = msgs.head
    }
    (root, env)
  }

  /** Read-compatibility of two protobuf (subject, version)s under their
    * resolved environments — [[ProtobufCompat.canRead]] with imports in
    * scope on both sides. */
  def protobufCanRead(store: Store, reader: (String, Int), writer: (String, Int)): Boolean = {
    val (rm, rEnv) = resolveProtobuf(store, reader._1, reader._2)
    val (wm, wEnv) = resolveProtobuf(store, writer._1, writer._2)
    ProtobufCompat.canRead(rm, wm, rEnv, wEnv)
  }

  /** Avro read-compatibility of two (subject, version)s after reference
    * resolution (cross-subject named types in scope on both sides). */
  def avroCanRead(store: Store, reader: (String, Int), writer: (String, Int)): Boolean =
    SchemaRegistry.AvroChecker.canRead(
      resolveAvro(store, reader._1, reader._2),
      resolveAvro(store, writer._1, writer._2))

  /**
   * Resolve a JSON schema whose `$ref`s point at other subjects'
   * schemas (`json.cc:2300-2340` — refs are normalized then resolved
   * through the bundled-schema map; here the bundle IS the reference
   * list): every `{"$ref": "<name>"}` node whose name matches a
   * reference is replaced by that subject's schema, itself resolved
   * first (deps-first, cycle-checked by [[collect]]). The result is one
   * self-contained schema string that feeds the existing
   * [[JsonDecode]]/[[JsonSchemaCompat]] kernels unchanged.
   */
  def resolveJson(store: Store, subject: String, version: Int): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val resolved = mutable.LinkedHashMap.empty[String, com.fasterxml.jackson.databind.JsonNode]
    def subst(node: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode = node match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode =>
        val ref = o.path("$ref")
        if (ref.isTextual && resolved.contains(ref.asText)) resolved(ref.asText).deepCopy()
        else {
          val out = o.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          o.fields().asScala.foreach(e => out.replace(e.getKey, subst(e.getValue)))
          out
        }
      case a: com.fasterxml.jackson.databind.node.ArrayNode =>
        val out = a.deepCopy[com.fasterxml.jackson.databind.node.ArrayNode]()
        out.removeAll()
        a.elements().asScala.foreach(e => out.add(subst(e)))
        out
      case other => other
    }
    // collectNamed returns deps first — by the time a schema
    // substitutes, every schema it can name is already fully resolved
    collectNamed(store, subject, version).foreach { case (name, s) =>
      resolved(name) = subst(mapper.readTree(s.schema))
    }
    mapper.writeValueAsString(resolved.last._2)
  }
}
