package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: tokenization, quality
 * scoring, language ID, fingerprinting. All pure narrow transformations
 * (no shuffle) built from codegen'd `functions._` — at 100 TB these run
 * at scan speed inside whole-stage codegen.
 */
object TextAnalysis {

  /** Whitespace tokenizer (lowercased). */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von")
  val FrStopwords: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pas")

  /** Count of tokens present in `words` (stopword hits). */
  def hitCount(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /**
   * Language ID by stopword n-gram heuristic: count stopword hits per
   * language, argmax wins, no hits => "und" (undetermined).
   */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = hitCount(t, EnStopwords)
    val de = hitCount(t, DeStopwords)
    val fr = hitCount(t, FrStopwords)
    when(en >= de && en >= fr && en > 0, lit("en"))
      .when(de >= fr && de > 0, lit("de"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("und"))
  }

  /**
   * Quality features: char/token counts, mean token length, stopword
   * ratio, punctuation count. Ratios are plain double divisions of
   * exactly-computed integers (deterministic across engines).
   */
  def qualityFeatures(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val t = tokens(textCol)
    val nTokens = size(t)
    val nChars = length(textCol)
    val sumTokLen = length(concat_ws("", t))
    val stopHits = hitCount(t, EnStopwords)
    val punct = length(regexp_replace(textCol, "[^.,;:!?]", ""))
    df.select(
      idCol.as("doc_id"),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      (sumTokLen.cast("double") / nTokens.cast("double")).as("mean_token_len"),
      (stopHits.cast("double") / nTokens.cast("double")).as("stopword_ratio"),
      punct.as("punct_count"))
  }

  /**
   * Document fingerprint: order-sensitive rolling hash over the token
   * stream (chained xxhash64, ANSI-safe: no overflowing arithmetic) —
   * reorderings of the same bag of words get different prints,
   * whitespace/case changes do not.
   */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, tok) => xxhash64(acc, tok))

  /**
   * BPE-ish regex pre-tokenizer: letter runs, digit runs, and single
   * non-alphanumeric marks over the lowercased text — the shape of the
   * GPT-2 pre-tokenizer pattern without lookahead (so RE2-based engines
   * can evaluate the identical expression; the oracle does). Subword
   * merge tables are model artifacts; the pre-tokenizer is the pipeline
   * half — sub-token counts for quality filters and token budgeting.
   * Narrow codegen-able projection, scan speed at 100 TB.
   */
  val BpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Sub-token array under [[BpeTokenPattern]]. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeTokenPattern), lit(0))

  /** Sub-token count under [[BpeTokenPattern]]. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /**
   * Corpus vocabulary: token -> document-wide occurrence count, top-k
   * by frequency (tie-break on token for determinism). One explode +
   * one hash shuffle with map-side partial aggregation; the top-k is a
   * TakeOrdered over the per-token aggregates, not a global sort of
   * the corpus.
   */
  def vocabulary(df: DataFrame, textCol: Column, k: Int): DataFrame =
    df.select(explode(tokens(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)
}
