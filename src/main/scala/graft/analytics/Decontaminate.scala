package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents that share a word
 * n-gram with a held-out evaluation set (the GPT-3 appendix-C /
 * Llama-style 8-to-13-gram overlap rule). Training on eval data
 * silently inflates benchmark scores, so a 100 TB corpus build runs
 * this between dedup and sampling.
 *
 * Scale shape: the eval set is benchmark-sized (thousands of docs, not
 * billions), so its distinct n-gram set is a broadcast; the corpus is
 * shingled in one narrow pass, each shingle probed against the
 * broadcast, and hit counts reduce in a single groupBy(doc_id) whose
 * map-side partial aggregation collapses every mapper's shingles to
 * one row per document before the shuffle. Documents too short to
 * shingle rejoin via a narrow filter — nothing unbounded is ever
 * broadcast or re-joined.
 */
object Decontaminate {

  /** (doc_id, n_hits, contaminated) for every corpus row: n_hits =
    * distinct eval n-grams of order `n` appearing in the doc.
    *
    * Shingles cross the explode/join as 64-bit hashes, not ~50-byte
    * n-gram strings — an order-of-magnitude cut in the exploded
    * intermediate and in broadcast probe cost. A collision would need
    * two distinct grams sharing an xxhash64 (~1e-13 per eval-gram pair
    * at benchmark scale), and the oracle's exact-string recomputation
    * would catch one on test data. */
  def flagOverlap(corpus: DataFrame, evalSet: DataFrame,
      idCol: Column, textCol: Column, n: Int): DataFrame = {
    def hashed(c: Column): Column =
      array_distinct(transform(Dedup.shingles(c, n), g => xxhash64(g)))
    val evalGrams = evalSet.select(explode(hashed(textCol)).as("__g"))
      .distinct().withColumn("__hit", lit(1))
    // Per-doc dedup happens inside the row (array_distinct) so the only
    // shuffle in the whole operator is the final partial-agg groupBy.
    val counted = corpus
      .select(idCol.as("doc_id"), explode(hashed(textCol)).as("__g"))
      .join(broadcast(evalGrams), Seq("__g"), "left")
      .groupBy("doc_id").agg(count(col("__hit")).as("n_hits"))
    val tooShort = corpus
      .where(size(split(trim(lower(textCol)), "\\s+")) < n)
      .select(idCol.as("doc_id"), lit(0L).as("n_hits"))
    counted.unionByName(tooShort)
      .select(col("doc_id"), col("n_hits"), (col("n_hits") > 0).as("contaminated"))
  }

  /**
   * Embedding-space decontamination: the SEMANTIC companion of
   * [[flagOverlap]] — n-gram overlap misses paraphrased or translated
   * eval leakage, cosine similarity to the eval set's embeddings does
   * not. For every corpus vector: its nearest eval vector (ties by
   * eval id) and the integer micro-unit cosine; `contaminated` iff
   * cos_u ≥ `thresholdU`.
   *
   * Scale shape: the eval set is benchmark-sized, so it BROADCASTS —
   * the corpus is scanned once against the broadcast eval table and
   * the per-vector argmax is a rank window keyed on vec_id. This
   * broadcast nested-loop is the production plan at 100 TB, not a
   * test-scale shortcut: |eval| is thousands, so per-row cost is
   * bounded and no shuffle of the corpus ever happens beyond the
   * argmax window's hash partition on vec_id.
   *
   * `corpus`: (vec_id, embedding double[]); `evalSet`: (eval_id,
   * embedding double[]). Cosines floor to the library-wide 1e-5
   * micro-units, so ranking and threshold are exact cross-engine.
   */
  def flagEmbedOverlap(corpus: DataFrame, evalSet: DataFrame,
      thresholdU: Long): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id"), col("embedding").as("_ce"))
      .withColumn("_cn", Similarity.norm(col("_ce")))
    val e = evalSet.select(col("eval_id"), col("embedding").as("_ee"))
      .withColumn("_en", Similarity.norm(col("_ee")))
    // LEFT join + sentinel: every corpus vector gets exactly one
    // verdict row even when the eval set is empty, and a degenerate
    // zero-norm embedding (cosine undefined — 0/0 → null) scores the
    // out-of-range sentinel -2e5 instead of a null that a downstream
    // `where(!contaminated)` would silently drop.
    val scored = c.join(broadcast(e), lit(true), "left")
      .select(col("vec_id"), col("eval_id"),
        coalesce(
          floor(Similarity.dot(col("_ce"), col("_ee")) / (col("_cn") * col("_en"))
            * lit(100000L) + lit(0.5)).cast("long"),
          lit(-200000L)).as("cos_u"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_u").desc, col("eval_id"))
    scored.withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1)
      .select(col("vec_id"), col("eval_id"), col("cos_u"),
        (col("cos_u") >= thresholdU).as("contaminated"))
  }
}
