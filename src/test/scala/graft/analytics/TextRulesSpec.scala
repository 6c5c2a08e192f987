package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Gopher rule battery, tokenizer fertility, and Luhn card PII. */
class TextRulesSpec extends SparkSpec {
  import spark.implicits._

  test("rank-profile language id: out-of-place measure picks the right profile") {
    val train = Seq(
      (0L, "aa", "aaa aab aac aaa aab aaa"),
      (2L, "bb", "bbb bba bbc bbb bba bbb"))
      .toDF("doc_id", "lang", "text")
    val profiles = TextAnalysis.languageProfiles(train, col("lang"), col("text"), n = 3, topK = 10)
    // profiles rank by (count desc, gram asc); grams slide over the
    // whole normalized string, so the boundary gram " aa" (5 hits)
    // outranks the tripled letter (3 hits) — exactly C-T's profiles,
    // where space-padded grams carry word-boundary signal
    val top = profiles.where(col("rank") === 1)
      .select("lang", "gram").as[(String, String)].collect().toMap
    assert(top("aa") === " aa" && top("bb") === " bb")
    val got = TextAnalysis.classifyByProfile(
        Seq((1L, "aab aaa aac aaa"), (3L, "bba bbb bbc bbb"), (5L, "zzz zzy zzx"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), profiles, n = 3, topK = 10)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) === "aa")
    assert(got(3L) === "bb")
    // an out-of-vocabulary doc still resolves deterministically (lang asc tie)
    assert(got(5L) === "aa")
  }

  test("compression ratio: repetition compresses far below prose, noise barely") {
    val docs = Seq(
      (1L, "spam ham " * 200),
      (2L, "the quick brown fox jumps over a lazy dog while rain falls on the quiet hills and birds return home " * 3),
      (3L, (0 until 20).map(i => java.util.UUID.nameUUIDFromBytes(Array(i.toByte)).toString).mkString),
      (4L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(docs, col("doc_id"), col("text"))
      .select("doc_id", "ratio_ppm").as[(Long, Long)].collect().toMap
    assert(r(1L) < r(2L), r.toString)   // repetition << prose
    assert(r(2L) < r(3L), r.toString)   // prose << high-entropy noise
    assert(r(4L) === 1000000L)          // empty text: neutral ratio
    // determinism: identical inputs give identical byte counts
    val again = TextAnalysis.compressionRatio(docs.repartition(5), col("doc_id"), col("text"))
      .select("doc_id", "ratio_ppm").as[(Long, Long)].collect().toMap
    assert(again === r)
  }

  test("gopher rules: each planted degenerate fails its rule") {
    val docs = Seq(
      (0L, ("the cat sat upon the mat with dogs and that was all fine " * 5).trim), // passes
      (1L, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n- nine\n- ten\n- end"),
      (2L, "trails off...\nagain...\nmore...\nyes...\nstill...\nend..."),
      (3L, ("# " * 80).trim),
      (4L, "1 2 3 4 5 6 7 8 9 10 " * 6 + "the of and that be to have with more here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Boolean]("keep"))
    // bullet plant: every line bullet-started → bullet_frac 1.0 > 0.9
    assert(got(1).getAs[Double]("bullet_frac") === 1.0 && !got(1).getAs[Boolean]("keep"))
    // ellipsis plant: every line ends in "..." → frac 1.0 > 0.3
    assert(got(2).getAs[Double]("ellipsis_frac") === 1.0 && !got(2).getAs[Boolean]("keep"))
    // symbol plant: 80 '#' over 80 words → ratio 1.0 > 0.1
    assert(got(3).getAs[Double]("symbol_ratio") === 1.0 && !got(3).getAs[Boolean]("keep"))
    // digit plant: 60 digit words + 10 alpha → alpha_frac < 0.8
    assert(got(4).getAs[Double]("alpha_frac") < 0.8 && !got(4).getAs[Boolean]("keep"))
  }

  test("gopher stop-word rule needs two distinct stop words") {
    val docs = Seq(
      (0L, ("the " * 60).trim),               // only one distinct stop word
      (1L, ("the of cat dog bird " * 12).trim)) // two distinct
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("stop_hits") === 1 && !got(0).getAs[Boolean]("keep"))
    assert(got(1).getAs[Int]("stop_hits") === 2)
  }

  test("fertility: subtokens per word and bytes per subtoken by language") {
    val docs = Seq(
      ("en", "cat dog"),        // 2 words, 2 subtokens, 7 bytes
      ("en", "don't stop"),     // 2 words, 4 subtokens (don ' t stop), 10 bytes
      ("de", "straße"))         // 1 word, 3 subtokens (stra, ß non-ascii mark, e), 7 bytes
      .toDF("lang", "text")
    val got = TextAnalysis.tokenizerFertility(docs, col("lang"), col("text"))
      .orderBy("lang").collect()
    val en = got.find(_.getString(0) == "en").get
    assert(en.getAs[Long]("n_words") === 4L)
    assert(en.getAs[Long]("n_subtokens") === 6L)
    assert(en.getAs[Long]("n_bytes") === 17L)
    assert(en.getAs[Double]("fertility") === 6.0 / 4.0)
    val de = got.find(_.getString(0) == "de").get
    assert(de.getAs[Long]("n_bytes") === 7L) // ß is 2 UTF-8 bytes
  }

  test("luhn validation separates valid cards from matching-but-invalid runs") {
    val docs = Seq(
      (0L, "pay 4111111111111111 now"),            // valid
      (1L, "ref 1234567890123456 thing"),          // 16 digits, invalid
      (2L, "card 5500 0000 0000 0004 okay"),       // valid with spaces
      (3L, "phone 555-123-4567 short 12345 safe")) // no 13+ digit run
      .toDF("doc_id", "text")
    val got = TextAnalysis.cardPiiFeatures(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(got.toSeq === Seq((1, 1, true), (1, 0, false), (1, 1, true), (0, 0, false)))
  }

  test("repetition signals: dup lines, top-gram mass, and dup-gram mass are exact") {
    val docs = Seq(
      (0L, "one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen " +
        "nineteen twenty alpha beta gamma delta epsilon"), // clean & long enough
      (1L, "same\nsame\nsame\nother"),                           // 2/4 dup lines
      (2L, "a b a b a b a b c"))                                 // "a b" dominates
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Boolean]("keep"))
    // doc 1: 4 lines, 2 distinct → dup_line_frac = 0.5; dup chars =
    // 2 extra "same" occurrences (8) over 17 total line chars
    assert(got(1).getAs[Double]("dup_line_frac_r") === 0.5)
    assert(got(1).getAs[Double]("dup_line_char_frac_r") ===
      math.rint(8.0 / 17.0 * 100000) / 100000)
    // doc 2: "a b" appears 4x of 8 bigrams → top mass 4*3=12 over 17 chars
    assert(got(2).getAs[Double]("top_2gram_char_frac_r") ===
      math.rint(12.0 / 17.0 * 100000) / 100000)
    assert(!got(2).getAs[Boolean]("keep"))
  }

  test("token-budget plan: downsample rate and repeat epochs are exact") {
    val docs = Seq(("a", 100L), ("a", 100L), ("b", 50L))
      .toDF("source", "n_tok")
    val weights = Seq(("a", 50000L), ("b", 400000L)).toDF("source", "weight_ppm")
    val got = Sampling.tokenBudgetPlan(docs, col("source"), col("n_tok"),
        weights, budgetTokens = 1000L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    // a: avail 200, target 50 → 0 epochs, rate 250000 ppm
    // b: avail 50, target 400 → 8 full epochs, remainder 0
    assert(got.toSeq === Seq(("a", 200L, 50L, 0L, 250000L),
      ("b", 50L, 400L, 8L, 0L)))
  }

  test("codeQuality: each StarCoder rule fires independently with exact ppm stats") {
    import spark.implicits._
    val files = Seq(
      (0L, "def f(x):\n  return x\n"),                 // clean: keep
      (1L, "short\n" + "y" * 1001),                    // max-line violation
      (2L, "z" * 200),                                 // one long line: mean violation
      (3L, "a\n" + "0;\n" * 40),                       // alpha fraction < 25%
      (4L, "// AUTO-GENERATED file\nok\n"),            // header marker (case-folded)
      (5L, "a\nb\nc\nd\ne\nthe tool emits do not edit headers\n"))
      .toDF("doc_id", "text")                          // mid-body mention: NOT autogen
    val got = TextAnalysis.codeQuality(files, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)].collect()
    assert(got.map(_._7).toSeq === Seq(true, false, false, false, false, true))
    // splitlines semantics: the trailing newline adds no phantom line
    val clean = got(0) // "def f(x):" (9) / "  return x" (10)
    assert(clean._2 === 2L && clean._3 === 10L && clean._4 === 19L * 1000000L / 2L)
    assert(got(1)._3 === 1001L)
    assert(got(2)._4 === 200000000L)
    assert(got(3)._5 < 250000L && !got(3)._6)
    assert(got(4)._6)
    assert(!got(5)._6) // marker beyond line 5 is a mention, not a header
  }

  test("licenseDetect: SPDX beats prose markers; copyleft beats permissive") {
    import spark.implicits._
    val docs = Seq(
      (0L, "code SPDX-License-Identifier: Apache-2.0 under the GNU General Public License"),
      (1L, "this file is under the MIT License"),
      (2L, "GNU General Public License and also the MIT License text"),
      (3L, "SPDX-License-Identifier: LGPL-2.1-only"),
      (4L, "SPDX-License-Identifier: WTFPL"),
      (5L, "no license information at all"),
      (6L, "SPDX-License-Identifier: MIT. See LICENSE for details"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.licenseDetect(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, String, String)].collect()
    assert(got.toSeq === Seq(
      (0L, "Apache-2.0", "permissive"), // SPDX wins over the prose GPL marker
      (1L, "", "permissive"),
      (2L, "", "copyleft"),             // copyleft marker beats permissive
      (3L, "LGPL-2.1-only", "copyleft"),
      (4L, "WTFPL", "unknown"),
      (5L, "", "unknown"),
      (6L, "MIT", "permissive")))       // sentence-final period stripped
  }

  test("redaction only touches luhn-valid candidates") {
    val docs = Seq(
      (0L, "a 4111111111111111 b 1234567890123456 c"),
      (1L, "a <CARD> b 1234567890123456 c"))
      .toDF("doc_id", "text")
    val md5s = TextAnalysis.cardPiiFeatures(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().map(_.getString(4))
    // doc 0 redacts its valid card to exactly doc 1's literal text
    assert(md5s(0) === md5s(1))
  }
}
