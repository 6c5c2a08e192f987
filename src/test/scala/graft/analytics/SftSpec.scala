package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SftSpec extends SparkSpec {
  import spark.implicits._

  private def turns(rows: (Long, Int, String, String)*) =
    rows.toDF("conv_id", "turn_idx", "role", "content")

  test("assemble groups by id modulo, orders turns by id, alternates roles") {
    val docs = (0L until 6L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val got = Sft.assemble(docs, col("doc_id"), col("text"), 2)
      .orderBy("conv_id", "turn_idx")
      .as[(Long, Int, String, Long, String)].collect()
    assert(got.toSeq === Seq(
      (0L, 0, "user", 0L, "text0"), (0L, 1, "assistant", 2L, "text2"),
      (0L, 2, "user", 4L, "text4"),
      (1L, 0, "user", 1L, "text1"), (1L, 1, "assistant", 3L, "text3"),
      (1L, 2, "user", 5L, "text5")))
  }

  test("render serializes the chat template in turn order") {
    val t = turns((7L, 1, "assistant", "hi there"), (7L, 0, "user", "hello"))
    val got = Sft.render(t).as[(Long, Long, String, Long)].collect()
    val want = "<|user|>\nhello<|end|>\n<|assistant|>\nhi there<|end|>\n<|assistant|>\n"
    assert(got.toSeq === Seq((7L, 2L, want, want.length.toLong)))
  }

  test("lossMask spans recover each turn's content from the rendered string verbatim") {
    val t = turns(
      (1L, 0, "user", "ask me"), (1L, 1, "assistant", "an answer"),
      (1L, 2, "user", "more?"), (1L, 3, "assistant", "yes"),
      (2L, 0, "user", "solo"))
    val prompts = Sft.render(t).select("conv_id", "prompt")
      .as[(Long, String)].collect().toMap
    val spans = Sft.lossMask(t).orderBy("conv_id", "turn_idx")
      .as[(Long, Int, String, Long, Long, Boolean)].collect()
    val contents = t.select("conv_id", "turn_idx", "content")
      .as[(Long, Int, String)].collect().map(r => (r._1, r._2) -> r._3).toMap
    spans.foreach { case (c, i, role, s, e, trainable) =>
      assert(prompts(c).substring(s.toInt, e.toInt) === contents((c, i)))
      assert(trainable === (role == "assistant"))
    }
    // trainable spans cover assistant content only: 2 + 0 per conv
    assert(spans.count(_._6) === 2)
  }

  test("validate flags each structural rule independently") {
    val t = turns(
      // conv 1: well-formed pair
      (1L, 0, "user", "q"), (1L, 1, "assistant", "a"),
      // conv 2: same-role adjacency (user, user, assistant)
      (2L, 0, "user", "q1"), (2L, 1, "user", "q2"), (2L, 2, "assistant", "a"),
      // conv 3: starts with assistant
      (3L, 0, "assistant", "a"), (3L, 1, "user", "q"), (3L, 2, "assistant", "a2"),
      // conv 4: ends with user
      (4L, 0, "user", "q"), (4L, 1, "assistant", "a"), (4L, 2, "user", "q2"),
      // conv 5: whitespace-only turn
      (5L, 0, "user", "q"), (5L, 1, "assistant", "   "))
    val got = Sft.validate(t, maxTurns = 2).orderBy("conv_id")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(got.toSeq === Seq(
      (1L, 2L, true, true, true, true, true, true),
      (2L, 3L, false, true, true, true, false, false),
      (3L, 3L, true, false, true, true, false, false),
      (4L, 3L, true, true, false, true, false, false),
      (5L, 2L, true, true, true, false, true, false)))
  }

  test("dedupByAssistant is invariant to user turns, case, and whitespace") {
    val t = turns(
      (1L, 0, "user", "how?"), (1L, 1, "assistant", "Do  this\tnow"),
      // same assistant content modulo case/whitespace, different user turn
      (2L, 0, "user", "HOW???"), (2L, 1, "assistant", "  do this NOW "),
      // genuinely different assistant content
      (3L, 0, "user", "how?"), (3L, 1, "assistant", "do that instead"))
    val got = Sft.dedupByAssistant(t).orderBy("conv_id")
      .select("conv_id", "is_canonical").as[(Long, Boolean)].collect()
    assert(got.toSeq === Seq((1L, true), (2L, false), (3L, true)))
    val sigs = Sft.dedupByAssistant(t).select("sig").as[String].collect()
    assert(sigs.toSet.size === 2)
  }

  test("trimToBudget keeps the largest whole-turn suffix, start-aligned to user") {
    // tokens: 10(u) 5(a) 10(u) 5(a); budget 21 fits turns 1..3 (20) but
    // turn 1 is an assistant turn => kept must start at turn 2.
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val t = turns(
      (1L, 0, "user", words(10)), (1L, 1, "assistant", words(5)),
      (1L, 2, "user", words(10)), (1L, 3, "assistant", words(5)))
    val got = Sft.trimToBudget(t, budgetTokens = 21).orderBy("turn_idx")
      .select("turn_idx", "tail_tokens", "kept").as[(Int, Long, Boolean)].collect()
    assert(got.toSeq === Seq((0, 30L, false), (1, 20L, false),
      (2, 15L, true), (3, 5L, true)))
  }

  test("parseChatJson: valid turns, escapes, malformed and empty docs get one sentinel row") {
    val docs = Seq(
      (1L, """{"messages":[{"role":"user","content":"hi \"there\"\nnow"},{"role":"assistant","content":"c:\\tmp"}]}"""),
      (2L, "{broken json"),
      (3L, """{"messages":[]}"""),
      (4L, """{"other":"shape"}"""),
      (5L, """{"messages":[{"content":"role went missing"}]}"""))
      .toDF("conv_id", "j")
    val got = Sft.parseChatJson(docs, col("conv_id"), col("j"))
      .orderBy("conv_id", "turn_idx")
      .as[(Long, Int, String, String)].collect()
    assert(got.toSeq === Seq(
      (1L, 0, "user", "hi \"there\"\nnow"),
      (1L, 1, "assistant", "c:\\tmp"),
      (2L, -1, "_malformed_", ""),
      (3L, -1, "_malformed_", ""),
      (4L, -1, "_malformed_", ""),
      // a parsed turn with a missing role keeps its row — the sentinel
      // role never leaks into turn_idx >= 0 rows
      (5L, 0, "", "role went missing")))
  }

  test("preferencePairs: argmax/argmin pair, tie and margin gates") {
    val responses = Seq(
      (1L, 1L, 10L), (1L, 2L, 100L), (1L, 3L, 40L), // clear pair, margin 90
      (2L, 4L, 50L),                                // single response
      (3L, 5L, 30L), (3L, 6L, 30L),                 // all-tie: chosen==rejected
      (4L, 7L, 30L), (4L, 8L, 60L))                 // margin 30 < 50
      .toDF("prompt_id", "resp_id", "score")
    val got = Sft.preferencePairs(responses, minMargin = 50L)
      .orderBy("prompt_id")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 1L, 90L, true),
      (2L, 1L, 4L, 4L, 0L, false),
      (3L, 2L, 5L, 5L, 0L, false),
      (4L, 2L, 8L, 7L, 30L, false)))
  }

  test("trimToBudget keeps nothing when no user turn fits") {
    val t = turns((1L, 0, "user", Seq.fill(10)("w").mkString(" ")),
      (1L, 1, "assistant", "short reply"))
    val got = Sft.trimToBudget(t, budgetTokens = 5)
      .select("kept").as[Boolean].collect()
    assert(got.forall(_ == false))
  }
}
