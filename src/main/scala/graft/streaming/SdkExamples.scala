package graft.streaming

/**
 * The reference transform-SDK example corpus, re-expressed as record
 * functions with the EXACT semantics of the SDK's own example tests
 * (`src/transform-sdk/go/transform/example_mirror_test.go`,
 * `example_regexp_filter_test.go`, `example_transcoding_test.go`,
 * `example_validation_test.go`). These are the behaviors a user's
 * deployed transform artifact exercises; the golden spec replays each
 * through [[Transforms.deploy]]/[[Transforms.deployMulti]] and pins
 * byte-level outputs.
 *
 * Byte fidelity notes:
 *  - the transcoding example runs records through Go `encoding/csv`
 *    (RFC-4180 quoting, `\r\n` folded to `\n`, blank lines skipped) and
 *    `encoding/json` `Marshal`, which HTML-escapes angle brackets and
 *    ampersands to `\u003c`/`\u003e`/`\u0026` — the JSON writer
 *    here reproduces that;
 *  - the validation example's `json.Valid` accepts exactly one
 *    complete JSON value (trailing garbage invalid);
 *  - the regexp example matches UNANCHORED (`regexp.Match` scans for a
 *    leftmost match) on the key by default, the value under
 *    `MATCH_VALUE=1`, and DROPS records whose matched field is nil.
 */
object SdkExamples {

  /** The SDK's record shape (key/value byte slices; either nullable). */
  final case class Rec(key: Array[Byte], value: Array[Byte])

  // ------------------------------------------------------------- mirror

  /** `example_mirror_test.go` — copy every record through unchanged. */
  def mirror(r: Rec): Seq[Rec] = Seq(r)

  // ------------------------------------------------------ regexp filter

  /** `example_regexp_filter_test.go` — pass records whose key (or value
    * under `matchValue`) contains a match of `pattern`; nil field drops
    * the record without erroring. */
  def regexFilter(pattern: String, matchValue: Boolean)(r: Rec): Seq[Rec] = {
    val b = if (matchValue) r.value else r.key
    if (b == null) Seq.empty
    else if (java.util.regex.Pattern.compile(pattern)
      .matcher(new String(b, "UTF-8")).find()) Seq(r)
    else Seq.empty
  }

  // --------------------------------------------------------- transcoding

  /** Go `encoding/csv` row split: RFC-4180 fields (quoted fields may
    * contain commas/newlines, `""` escapes a quote), records separated
    * by `\n` with `\r\n` normalized. Malformed input (unterminated
    * quote) throws — the example's transform returns the error. */
  private[streaming] def parseCsv(text: String): Seq[Seq[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    val field = new StringBuilder
    var i = 0; var inQuotes = false; var sawAny = false
    def endField(): Unit = { row += field.result(); field.clear() }
    def endRow(): Unit = { endField(); rows += row.toSeq; row.clear(); sawAny = false }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field += '"'; i += 1 }
          else inQuotes = false
        } else field += c
      } else c match {
        case '"' if field.isEmpty => inQuotes = true; sawAny = true
        case ','  => endField(); sawAny = true
        // blank lines are not records in Go's csv reader
        case '\n' => if (sawAny || row.nonEmpty) endRow()
        case '\r' if i + 1 < text.length && text.charAt(i + 1) == '\n' =>
          if (sawAny || row.nonEmpty) endRow(); i += 1
        case other => field += other; sawAny = true
      }
      i += 1
    }
    if (inQuotes) throw new IllegalArgumentException("unterminated quoted field")
    if (sawAny || field.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq
  }

  /** Go `json.Marshal` string escaping: control chars, quote and
    * backslash, PLUS the HTML-safe escapes (`<` `>` `&`) and the JS
    * line separators U+2028/U+2029. */
  private[streaming] def goJsonString(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b ++= "\\\""
      case '\\' => b ++= "\\\\"
      case '\n' => b ++= "\\n"
      case '\r' => b ++= "\\r"
      case '\t' => b ++= "\\t"
      case '<'  => b ++= "\\u003c"
      case '>'  => b ++= "\\u003e"
      case '&'  => b ++= "\\u0026"
      case c if c == 0x2028.toChar => b ++= "\\u2028"
      case c if c == 0x2029.toChar => b ++= "\\u2029"
      case c if c < 0x20 => b ++= f"\\u${c.toInt}%04x"
      case c => b += c
    }
    (b += '"').result()
  }

  /** `example_transcoding_test.go` — the value is a headerless CSV of
    * `key, a, b` rows; each row emits one record keyed by column 0 with
    * value `{"a":<col1>,"b":<col2 as int>}` (Go field order, Marshal
    * escaping). A row with the wrong arity or a non-integer `b` is the
    * example's error path and throws. */
  def csvToJson(r: Rec): Seq[Rec] =
    parseCsv(new String(r.value, "UTF-8")).map { row =>
      require(row.size == 3, s"unexpected number of rows: ${row.size}")
      // strconv.Atoi: optional sign, digits, NO surrounding whitespace —
      // Integer.parseInt has the same domain
      val b = Integer.parseInt(row(2))
      Rec(row.head.getBytes("UTF-8"),
        s"""{"a":${goJsonString(row(1))},"b":$b}""".getBytes("UTF-8"))
    }

  // ---------------------------------------------------------- validation

  private val strictMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  /** Go `json.Valid`: exactly one complete JSON value (object, array,
    * string, number, bool or null), nothing trailing. */
  private[streaming] def jsonValid(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.nonEmpty && {
      // readTree of pure whitespace yields MissingNode, not an error —
      // Go's json.Valid requires an actual value
      try !strictMapper.readTree(bytes).isMissingNode
      catch { case _: java.io.IOException => false }
    }

  /** `example_validation_test.go` — valid-JSON values route to the
    * default output topic, everything else to the `invalid_json` DLQ. */
  def jsonValidate(r: Rec): Seq[(String, Rec)] =
    Seq((if (jsonValid(r.value)) "output" else "invalid_json", r))
}
