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
}
