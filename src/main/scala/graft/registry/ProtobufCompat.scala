package graft.registry

/**
 * Protobuf read-compatibility subset (SURVEY §1.3), completing the
 * registry's checker family (Avro / JSON / Struct / Protobuf).
 *
 * Reference: `pandaproxy/schema_registry/protobuf.cc` — compatibility is
 * decided on the wire contract, field NUMBERS not names:
 *  - a field number present in both schemas must keep a wire-compatible
 *    type (the varint / zigzag / fixed32 / fixed64 / length-delimited
 *    families below; message fields recurse) and the same cardinality
 *    (singular vs repeated);
 *  - a writer field the reader lacks is skipped (unknown-field
 *    semantics) — compatible;
 *  - a reader field the writer lacks takes its default — compatible
 *    unless the reader marks it `required` (proto2);
 *  - renames are compatible (numbers carry identity), number reuse with
 *    an incompatible type is not.
 *
 * Schemas are modeled structurally plus a parser for the (proto2/proto3)
 * message-definition subset the tests and registry scenarios use.
 */
object ProtobufCompat {

  sealed trait PType
  final case class Scalar(name: String) extends PType
  final case class MessageRef(name: String) extends PType
  /** A named enum type: wire-compat as the varint family (symbol sets
    * are not a wire input), but the NAME survives so the normal form
    * distinguishes fields of different enum types. */
  final case class EnumRef(name: String) extends PType
  /** `map<key, value>` — on the wire a repeated entry message (key=1,
    * value=2), modeled structurally; compat compares map to map. */
  final case class PMap(key: String, value: PType) extends PType

  final case class PField(number: Int, name: String, tpe: PType,
      repeated: Boolean = false, required: Boolean = false)
  /** `oneofs` maps each real oneof's name to the member field numbers;
    * the member fields also appear in `fields` (as protoc's descriptor
    * does — oneof members are regular fields with a containing-oneof).
    * `enums` holds nested enum definitions (name → symbols in
    * declaration order): fields of an enum type compare as the varint
    * wire family (the reference's kind model — symbol sets are NOT a
    * wire-compat input), but the symbols ARE contract for the
    * registration normal form. */
  final case class PMessage(name: String, fields: Seq[PField],
      nested: Map[String, PMessage] = Map.empty,
      oneofs: Map[String, Set[Int]] = Map.empty,
      enums: Map[String, Seq[(String, Int)]] = Map.empty)

  /** Wire families: types in one family decode each other's bytes
    * (int64 reading int32 etc. — the widening the reference accepts). */
  private val families: Seq[Set[String]] = Seq(
    Set("int32", "int64", "uint32", "uint64", "bool", "enum"), // varint
    Set("sint32", "sint64"),                                   // zigzag varint
    Set("fixed32", "sfixed32", "float"),                       // fixed 32-bit
    Set("fixed64", "sfixed64", "double"),                      // fixed 64-bit
    Set("string", "bytes"))                                    // length-delimited

  private def sameFamily(a: String, b: String): Boolean =
    a == b || families.exists(f => f.contains(a) && f.contains(b))

  private def typeCompatible(reader: PType, writer: PType,
      readerMsgs: Map[String, PMessage], writerMsgs: Map[String, PMessage]): Boolean =
    (reader, writer) match {
      case (Scalar(a), Scalar(b)) => sameFamily(a, b)
      // enum fields are varint-family on the wire, whatever their name
      case (EnumRef(_), EnumRef(_)) => true
      case (EnumRef(_), Scalar(b))  => sameFamily("enum", b)
      case (Scalar(a), EnumRef(_))  => sameFamily(a, "enum")
      case (MessageRef(a), MessageRef(b)) =>
        (readerMsgs.get(a), writerMsgs.get(b)) match {
          case (Some(rm), Some(wm)) => canRead(rm, wm, readerMsgs, writerMsgs)
          case _                    => false // unresolvable reference
        }
      // map decodes map: key and value follow the entry message's field
      // rules (key wire family; value family or message recursion)
      case (PMap(rk, rv), PMap(wk, wv)) =>
        sameFamily(rk, wk) && typeCompatible(rv, wv, readerMsgs, writerMsgs)
      // a message field and a scalar share a wire type only for
      // length-delimited scalars, but the reference rejects that switch
      // (field_kind_changed); likewise map vs non-map
      case _ => false
    }

  /** Can `reader` decode bytes written with `writer`? */
  def canRead(reader: PMessage, writer: PMessage,
      readerMsgs: Map[String, PMessage] = Map.empty,
      writerMsgs: Map[String, PMessage] = Map.empty): Boolean = {
    val rEnv = readerMsgs ++ reader.nested
    val wEnv = writerMsgs ++ writer.nested
    val writerByNum = writer.fields.map(f => f.number -> f).toMap
    val readerNums = reader.fields.map(_.number).toSet
    val fieldsOk = reader.fields.forall { rf =>
      writerByNum.get(rf.number) match {
        case Some(wf) =>
          rf.repeated == wf.repeated && typeCompatible(rf.tpe, wf.tpe, rEnv, wEnv)
        case None => !rf.required // absent in writer: default, unless required
      }
    }
    // oneof rules (`protobuf.cc:553-560` driving `:604-645`):
    //  1. for each WRITER oneof whose NAME the reader also declares,
    //     every member field must exist in the reader inside SOME real
    //     oneof — else oneof_field_removed (a reader that dropped the
    //     whole oneof name skips the check entirely);
    val writerOneofsOk = writer.oneofs.forall { case (name, wNums) =>
      !reader.oneofs.contains(name) ||
        wNums.forall(n =>
          readerNums.contains(n) && reader.oneofs.values.exists(_.contains(n)))
    }
    //  2. at most ONE member of each reader oneof may exist in the
    //     writer OUTSIDE any oneof — two independently-settable writer
    //     fields collapsing into one reader oneof would silently drop
    //     data (multiple_fields_moved_to_oneof)
    val readerOneofsOk = reader.oneofs.forall { case (_, rNums) =>
      rNums.count(n => writerByNum.contains(n) &&
        !writer.oneofs.values.exists(_.contains(n))) <= 1
    }
    fieldsOk && writerOneofsOk && readerOneofsOk
  }

  /** Registry checker over .proto message-definition strings. */
  object ProtobufChecker extends SchemaRegistry.Checker[String] {
    def canRead(reader: String, writer: String): Boolean = {
      val (rm, rEnv) = parse(reader)
      val (wm, wEnv) = parse(writer)
      ProtobufCompat.canRead(rm, wm, rEnv, wEnv)
    }
  }

  private val scalarNames = families.flatten.toSet - "enum"

  /**
   * Parse the message-definition subset: one top-level message, optional
   * nested `message` blocks, fields of the form
   * `[required|optional|repeated] <type> <name> = <number>;`.
   */
  def parse(proto: String): (PMessage, Map[String, PMessage]) = {
    val tokens = proto
      .replaceAll("//.*", " ")
      .replaceAll("[{};=<>,]", " $0 ")
      .split("\\s+").filter(_.nonEmpty).toList
    // skip syntax/package preamble if present
    val body = tokens.dropWhile(_ != "message")
    val (msg, _) = parseMessageAt(body, enumNamesOf(tokens))
    val resolved = resolveScopes(msg, Set.empty)
    (resolved, resolved.nested)
  }

  /** Enum and message declaration names anywhere in the token stream —
    * resolved BEFORE field typing so a field may reference a type
    * defined later in the file (protoc's two-pass behavior). A name
    * declared as BOTH an enum and a message (in different scopes —
    * protoc rejects the ambiguity within one) defaults to the message
    * here; [[resolveScopes]] then re-types fields per enclosing scope,
    * innermost first, so the enum-declaring scope still sees its enum. */
  private def enumNamesOf(tokens: List[String]): Set[String] = {
    val enums = tokens.sliding(2).collect { case List("enum", n) => n }.toSet
    val msgs = tokens.sliding(2).collect { case List("message", n) => n }.toSet
    enums -- msgs
  }

  /** Protoc scoping pass: a field naming a type declared as an enum in
    * its own or an enclosing scope resolves to that enum (innermost
    * wins; a local nested MESSAGE of the same name shadows an inherited
    * enum), even when an unrelated scope declares a message of the same
    * name — without this, the global default above would leave such
    * fields as unresolvable MessageRefs that fail compat against an
    * identical schema. */
  private def resolveScopes(m: PMessage, inheritedEnums: Set[String]): PMessage = {
    val scopeEnums = m.enums.keySet ++ (inheritedEnums -- m.nested.keySet)
    def retype(t: PType): PType = t match {
      case MessageRef(n) if scopeEnums.contains(n) => EnumRef(n)
      case PMap(k, v)                              => PMap(k, retype(v))
      case other                                   => other
    }
    m.copy(
      fields = m.fields.map(f => f.copy(tpe = retype(f.tpe))),
      nested = m.nested.map { case (k, v) => k -> resolveScopes(v, scopeEnums) })
  }

  private def parseMessageAt(ts: List[String],
      enumNames: Set[String] = Set.empty): (PMessage, List[String]) = ts match {
    case "message" :: name :: "{" :: rest =>
      var cur = rest
      var fields = Vector.empty[PField]
      var nested = Map.empty[String, PMessage]
      var oneofs = Map.empty[String, Set[Int]]
      var enums = Map.empty[String, Seq[(String, Int)]]
      def fieldType(tpe: String): PType =
        if (scalarNames.contains(tpe)) Scalar(tpe)
        else if (enumNames.contains(tpe)) EnumRef(tpe)
        else MessageRef(tpe)
      while (cur.headOption.exists(_ != "}")) {
        cur match {
          case "message" :: _ =>
            val (m, after) = parseMessageAt(cur, enumNames)
            nested += (m.name -> m); cur = after
          case "enum" :: ename :: "{" :: r0 =>
            var cur2 = r0
            var syms = Vector.empty[(String, Int)]
            while (cur2.headOption.exists(_ != "}")) {
              cur2 match {
                case sym :: "=" :: num :: ";" :: r =>
                  syms :+= (sym -> num.toInt); cur2 = r
                case bad => sys.error(s"unparseable enum entry at: ${bad.take(4).mkString(" ")}")
              }
            }
            enums += (ename -> syms)
            cur = cur2.drop(1)
          case "oneof" :: oname :: "{" :: r0 =>
            // oneof members are label-less singular fields; protoc's
            // descriptor keeps them as regular fields with a
            // containing-oneof, mirrored here
            var cur2 = r0
            var nums = Set.empty[Int]
            while (cur2.headOption.exists(_ != "}")) {
              cur2 match {
                case tpe :: fname :: "=" :: num :: ";" :: r =>
                  fields :+= PField(num.toInt, fname, fieldType(tpe))
                  nums += num.toInt
                  cur2 = r
                case bad => sys.error(s"unparseable oneof field at: ${bad.take(6).mkString(" ")}")
              }
            }
            oneofs += (oname -> nums)
            cur = cur2.drop(1)
          case "map" :: "<" :: k :: "," :: v :: ">" :: fname :: "=" :: num :: ";" :: r =>
            fields :+= PField(num.toInt, fname, PMap(k, fieldType(v)))
            cur = r
          case _ =>
            val (label, rest1) = cur match {
              case ("required" | "optional" | "repeated") :: r => (cur.head, r)
              case _ => ("", cur)
            }
            rest1 match {
              case tpe :: fname :: "=" :: num :: ";" :: r =>
                fields :+= PField(num.toInt, fname, fieldType(tpe),
                  repeated = label == "repeated", required = label == "required")
                cur = r
              case bad => sys.error(s"unparseable field at: ${bad.take(6).mkString(" ")}")
            }
        }
      }
      (PMessage(name, fields, nested, oneofs, enums), cur.drop(1))
    case bad => sys.error(s"expected 'message <name> {' at: ${bad.take(4).mkString(" ")}")
  }

  /** A message plus all transitively nested definitions, name-keyed —
    * the env contribution of one file to a DescriptorPool. */
  def flatten(m: PMessage): Map[String, PMessage] =
    m.nested.values.foldLeft(Map(m.name -> m)) { (acc, n) => acc ++ flatten(n) }

  /**
   * Parse a whole `.proto` file: any number of top-level messages,
   * `syntax`/`package`/`import` lines skipped (imports are resolved by
   * the registry's reference list, not by path — `schema_reference.name`
   * is the import string, `protobuf.cc:294` `build_file_with_refs`).
   * Returns the top-level messages in file order plus the file's full
   * name→message environment.
   */
  def parseFile(proto: String): (Seq[PMessage], Map[String, PMessage]) = {
    val tokens = proto
      .replaceAll("//.*", " ")
      .replaceAll("[{};=<>,]", " $0 ")
      .split("\\s+").filter(_.nonEmpty).toList
    val enumNames = enumNamesOf(tokens)
    var cur = tokens.dropWhile(_ != "message")
    var msgs = Vector.empty[PMessage]
    while (cur.nonEmpty) {
      val (m, after) = parseMessageAt(cur, enumNames)
      msgs :+= m
      cur = after.dropWhile(_ != "message")
    }
    require(msgs.nonEmpty, "no message definition in file")
    (msgs, msgs.foldLeft(Map.empty[String, PMessage])((acc, m) => acc ++ flatten(m)))
  }

  implicit val protobufChecker: SchemaRegistry.Checker[String] = ProtobufChecker
}
