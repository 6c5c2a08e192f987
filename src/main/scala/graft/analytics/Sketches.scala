package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch-vs-exact error contracts — the cardinality and quantile
 * sketches a 100 TB pipeline runs INSTEAD of exact aggregation, with
 * the exact answer computed alongside at test scale to certify the
 * error bound.
 *
 * At full scale only the sketch side runs: `approx_count_distinct` is
 * one HyperLogLog++ register set per partial aggregate — fixed bytes,
 * map-side combined, never a shuffle of the distinct key domain — and
 * `percentile_approx` is one bounded quantile summary per partition.
 * Both are single-pass partial aggregates inside whole-stage codegen.
 * The exact companions (`count(distinct)`, sort-based percentile) are
 * exactly the parts that do NOT scale — which is the point of the
 * contract: certify the sketch's bound where exact is still cheap,
 * then trust only the sketch where it isn't. Both sketches are
 * deterministic for a fixed input (no seeds), so the contract holds
 * run-to-run.
 */
object Sketches {

  /**
   * One-row contract over a corpus: HLL vocabulary cardinality within
   * `vocabTol` of exact, and approximate length percentiles
   * (p50/p90/p99 at `accuracy`) within `lenTol` (relative, floored at
   * `lenFloor` absolute) of the exact interpolated percentile.
   * `exact_vocab` rides along so the oracle re-derives the exact half
   * independently; the booleans are the certified bound.
   */
  def sketchContracts(docs: DataFrame, textCol: Column, lenCol: Column,
      vocabTol: Double = 0.05, lenTol: Double = 0.10, lenFloor: Double = 5.0,
      accuracy: Int = 1000): DataFrame = {
    val vocab = docs.select(explode(TextAnalysis.tokens(textCol)).as("tok"))
      .agg(countDistinct(col("tok")).as("exact_vocab"),
        approx_count_distinct(col("tok"), 0.02).as("approx_vocab"))
    def ok(approx: Column, exact: Column): Column =
      abs(approx.cast("double") - exact) <= greatest(lit(lenFloor), exact * lenTol)
    val qs = docs.agg(
      percentile(lenCol, lit(0.5)).as("p50"),
      percentile(lenCol, lit(0.9)).as("p90"),
      percentile(lenCol, lit(0.99)).as("p99"),
      percentile_approx(lenCol, lit(0.5), lit(accuracy)).as("a50"),
      percentile_approx(lenCol, lit(0.9), lit(accuracy)).as("a90"),
      percentile_approx(lenCol, lit(0.99), lit(accuracy)).as("a99"))
    vocab.crossJoin(qs).select(
      col("exact_vocab"),
      (abs(col("approx_vocab").cast("double") - col("exact_vocab")) <=
        col("exact_vocab") * vocabTol).as("vocab_ok"),
      ok(col("a50"), col("p50")).as("p50_ok"),
      ok(col("a90"), col("p90")).as("p90_ok"),
      ok(col("a99"), col("p99")).as("p99_ok"))
  }

  /**
   * Misra–Gries heavy-hitter candidates — the frequent-items sketch:
   * each partition folds its token stream through k counters (an item
   * either increments its counter, claims a free one, or decrements
   * ALL counters — fixed memory, one pass), and partition summaries
   * merge by summing per-token surviving counts. Mergeability gives
   * the classical guarantee: any token with true frequency > N/k is
   * present, and each merged estimate undercounts by at most N/k.
   *
   * At 100 TB this is the ONLY way to ask "which tokens dominate the
   * corpus" — k×partitions bounded state, no shuffle of the token
   * domain; the exact groupBy companion exists only to certify the
   * bound at test scale.
   */
  def heavyHitterCandidates(toks: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = toks.sparkSession
    import spark.implicits._
    toks.select(col("tok").cast("string")).as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m(t) = c + 1
          case None if m.size < k => m(t) = 1L
          case None =>
            // decrement-all: amortized O(1) per input item
            val dead = scala.collection.mutable.ArrayBuffer[String]()
            m.foreach { case (key, c) =>
              if (c == 1L) dead += key else m(key) = c - 1 }
            dead.foreach(m.remove)
        }
      }
      m.iterator
    }.toDF("tok", "est")
      .groupBy("tok").agg(sum("est").as("est"))
  }

  /**
   * One-row heavy-hitter contract: every token with exact count
   * strictly above N/k is among the candidates (`cover_ok`), and every
   * candidate's merged estimate is a lower bound within N/k of exact
   * (`bound_ok`). Only partitioning-INDEPENDENT facts are emitted —
   * the candidate set itself varies with partition layout; the
   * guarantees do not. Integer cross-multiplication keeps the
   * threshold exact on any engine.
   */
  def heavyHitterContract(docs: DataFrame, textCol: Column, k: Int): DataFrame = {
    val toks = docs.select(explode(TextAnalysis.tokens(textCol)).as("tok"))
    val cands = heavyHitterCandidates(toks, k)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val total = exact.agg(sum("exact").as("n_tokens"))
    exact.join(cands, Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .agg(
        max(col("n_tokens")).as("n_tokens"),
        sum(when(col("exact") * k > col("n_tokens"), 1L).otherwise(0L))
          .as("n_heavy_exact"),
        (max(when(col("exact") * k > col("n_tokens") && col("est").isNull, 1)
          .otherwise(0)) === 0).as("cover_ok"),
        (max(when(col("est").isNotNull &&
            (col("est") > col("exact") ||
              (col("exact") - col("est")) * k > col("n_tokens")), 1)
          .otherwise(0)) === 0).as("bound_ok"))
  }
}
