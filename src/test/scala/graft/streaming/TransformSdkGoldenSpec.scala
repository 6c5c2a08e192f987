package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.streaming.SdkExamples.Rec

/**
 * Golden vectors for the reference transform-SDK example corpus — one
 * spec per example (`example_mirror_test.go`,
 * `example_regexp_filter_test.go`, `example_transcoding_test.go`,
 * `example_validation_test.go`), each replayed through the deploy
 * surface ([[Transforms.deploy]] / [[Transforms.deployMulti]]) and
 * pinned at the byte level: these certify BEHAVIOR (what a user's
 * SDK-built transform computes), not just output shape.
 */
class TransformSdkGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def str(b: Array[Byte]): String = if (b == null) null else new String(b, "UTF-8")

  /** Stage records as a parquet-backed stream, deploy `fn`, read back. */
  private def runDeploy(name: String, recs: Seq[(Array[Byte], Array[Byte])],
      fn: Rec => Seq[Rec]): Seq[(String, String)] = {
    val tmp = Files.createTempDirectory(s"sdk_$name").toString
    recs.toDF("key", "value").coalesce(1).write.parquet(s"$tmp/in")
    val input = Transforms.PathInput(s"$tmp/in", spark.read.parquet(s"$tmp/in").schema)
    val spec = Transforms.TransformSpec[Rec](name, input,
      (row: Row) => fn(Rec(row.getAs[Array[Byte]]("key"), row.getAs[Array[Byte]]("value"))))
    Transforms.deploy(spark, spec, s"$tmp/ckpt", s"$tmp/out").awaitTermination()
    spark.read.parquet(s"$tmp/out").collect().toSeq
      .map(r => (str(r.getAs[Array[Byte]]("key")), str(r.getAs[Array[Byte]]("value"))))
      .sortBy(p => (Option(p._1).getOrElse(""), Option(p._2).getOrElse("")))
  }

  test("mirror example: every record copied verbatim, null key/value included") {
    val in = Seq[(Array[Byte], Array[Byte])](
      ("k1".getBytes, "v1".getBytes),
      (null, "v2".getBytes),
      ("k3".getBytes, null),
      ("k4".getBytes, Array[Byte](0, -1, 127)))
    val out = runDeploy("mirror", in, SdkExamples.mirror)
    assert(out.size === 4)
    assert(out.contains(("k1", "v1")))
    assert(out.contains((null, "v2")))
    assert(out.contains(("k3", null)))
    assert(out.contains(("k4", new String(Array[Byte](0, -1, 127), "UTF-8"))))
  }

  test("regexp filter example: unanchored key match; nil key drops; MATCH_VALUE=1 flips field") {
    val in = Seq[(Array[Byte], Array[Byte])](
      ("order-17".getBytes, "a".getBytes),      // pass: full match
      ("xx order-9 yy".getBytes, "b".getBytes), // pass: regexp.Match scans
      ("ORDER-17".getBytes, "c".getBytes),      // drop: case-sensitive
      ("order-".getBytes, "d".getBytes),        // drop: \d+ needs a digit
      (null, "order-3".getBytes))               // drop: nil key (b == nil -> return nil)
    val byKey = runDeploy("refilter", in,
      SdkExamples.regexFilter("order-\\d+", matchValue = false))
    assert(byKey.map(_._2) === Seq("a", "b"))
    // MATCH_VALUE=1: the same corpus judged on values
    val byValue = runDeploy("refilter_v", in,
      SdkExamples.regexFilter("order-\\d+", matchValue = true))
    assert(byValue.map(_._2) === Seq("order-3"))
  }

  test("transcoding example: CSV rows fan out as records with Go-Marshal JSON bytes") {
    val in = Seq[(Array[Byte], Array[Byte])](
      ("r1".getBytes, "k1,hello,42\n".getBytes),
      // quoted field with a comma, two rows, no trailing newline
      ("r2".getBytes, "k2,\"x,y\",3\nk3,z,7".getBytes),
      // HTML-escaped character and a negative int, CRLF row ending
      ("r3".getBytes, "k4,a<b,-5\r\n".getBytes))
    val out = runDeploy("transcode", in, SdkExamples.csvToJson)
    assert(out === Seq(
      ("k1", """{"a":"hello","b":42}"""),
      ("k2", """{"a":"x,y","b":3}"""),
      ("k3", """{"a":"z","b":7}"""),
      ("k4", "{\"a\":\"a\\u003cb\",\"b\":-5}"))) // Go Marshal HTML-escapes '<'
  }

  test("transcoding example error paths: wrong arity and non-integer b throw") {
    assertThrows[IllegalArgumentException](
      SdkExamples.csvToJson(Rec("k".getBytes, "a,b\n".getBytes)))
    assertThrows[NumberFormatException](
      SdkExamples.csvToJson(Rec("k".getBytes, "a,b,notanint\n".getBytes)))
  }

  test("validation example: valid JSON to default output, the rest to invalid_json") {
    val tmp = Files.createTempDirectory("sdk_validate").toString
    val in = Seq[(Array[Byte], Array[Byte])](
      ("a".getBytes, """{"x": 1}""".getBytes),
      ("b".getBytes, "[1, 2]".getBytes),
      ("c".getBytes, "123".getBytes),     // bare values are valid JSON
      ("d".getBytes, "null".getBytes),
      ("e".getBytes, "{x: 1}".getBytes),  // unquoted field name
      ("f".getBytes, """{"x": 1} extra""".getBytes), // trailing garbage
      ("g".getBytes, "nul".getBytes),
      ("h".getBytes, "".getBytes))
    in.toDF("key", "value").coalesce(1).write.parquet(s"$tmp/in")
    val input = Transforms.PathInput(s"$tmp/in", spark.read.parquet(s"$tmp/in").schema)
    val spec = Transforms.TransformSpec[(String, Rec)]("validate", input,
      (row: Row) => SdkExamples.jsonValidate(
        Rec(row.getAs[Array[Byte]]("key"), row.getAs[Array[Byte]]("value"))))
    Transforms.deployMulti(spark, spec, s"$tmp/ckpt", s"$tmp/topics")(
      org.apache.spark.sql.Encoders.product[Rec]).awaitTermination()
    def keysOf(topic: String): Seq[String] =
      spark.read.parquet(s"$tmp/topics/$topic").collect().toSeq
        .map(r => str(r.getAs[Array[Byte]]("key"))).sorted
    assert(keysOf("output") === Seq("a", "b", "c", "d"))
    assert(keysOf("invalid_json") === Seq("e", "f", "g", "h"))
  }
}
