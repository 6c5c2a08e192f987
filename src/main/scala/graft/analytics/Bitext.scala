package graft.analytics

import graft.Pins._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Margin-based bitext mining (the CCMatrix/LASER recipe, Artetxe &
 * Schwenk 2019): align a source-language corpus with a target-language
 * corpus by embedding both into a shared space and scoring candidate
 * pairs with the RATIO margin
 *
 *   margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)
 *
 * where `avgK(v)` is the mean cosine of v's k nearest neighbors in the
 * OTHER corpus. Dividing by the neighborhood average cancels hubness
 * (vectors that are close to everything score high with everything);
 * raw cosine thresholds are not comparable across query density, the
 * margin is. A pair is mined when the target is the source's
 * best-margin candidate and the margin clears a threshold.
 *
 * Every score is an exact integer: the single floating-point step is
 * `cos_u = floor(cos * 10^5 + 0.5)` (the library-wide cosine
 * micro-unit granularity, proven engine-stable by the embedding-dedup
 * oracles); neighborhood averages are floor-divided integer sums and
 * the margin is `floor(cos_u * 2*10^6 / (avg_src + avg_tgt))` — so
 * ranking is total, aggregation-order-independent, and replayable by
 * the DuckDB oracle end-to-end.
 *
 * Scale shape: [[marginMineExact]] is the certification leg (all-pairs
 * — quadratic, test-scale only, the same role
 * [[Similarity.cosineNearDupsExact]] plays for dedup).
 * [[marginMineIvf]] is the production path: candidates come from the
 * IVF index ([[Similarity.ivfTopK]] — inverted lists, bounded probe
 * fan-out, exact re-rank on candidates only), run once in each
 * direction, and the margin is computed on the candidate set — the
 * standard mined-bitext approximation (neighborhood averages over ANN
 * neighbors, not true neighbors). At 100 TB per side this is two IVF
 * probes + one candidate-sized join, never an all-pairs product.
 */
object Bitext {

  /** Cosine micro-units: floor(cos * 1e5 + 0.5) — integer in
    * [-100000, 100000]. Half-up at the 5th decimal, the granularity
    * the embedding-cosine oracles already certify cross-engine. */
  private def cosU(cos: Column): Column =
    floor(cos * lit(100000L) + lit(0.5)).cast("long")

  /** Per-key mean of the top-k `cos_u` (ties broken by the other id
    * ascending), floor-divided: floor(sum_topk / count_topk). */
  private def topKAvgU(scored: DataFrame, keyCol: String, otherCol: String,
      k: Int, outCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("cos_u").desc, col(otherCol))
    scored.withColumn("_r", row_number().over(w))
      .where(col("_r") <= k)
      .groupBy(keyCol)
      .agg(floor(sum(col("cos_u")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as(outCol))
  }

  /** Margin scoring + forward-best mining over a scored candidate
    * table `(src_id, tgt_id, cos_u)` with its two neighborhood-average
    * tables — ONE spelling shared by the exact and IVF legs so a
    * margin-rule change can never fork them. Margin is in 1e-6 ratio
    * units (1_000_000 = margin 1.0); a non-positive neighborhood sum
    * means the ratio margin is undefined-or-negative (an outlier whose
    * neighbors all anti-correlate), so the pair scores the sentinel
    * -1 and can never clear a threshold — clamping the denominator
    * would instead inflate such pairs by ~2e6x. */
  private def mineFromAverages(scored: DataFrame, avgS: DataFrame,
      avgT: DataFrame, marginThresholdU: Long): DataFrame = {
    val denom = col("avg_src_u") + col("avg_tgt_u")
    val margins = scored
      .join(avgS, Seq("src_id"))
      .join(avgT, Seq("tgt_id"))
      .withColumn("margin_u",
        when(denom > 0,
          floor(col("cos_u").cast("double") * lit(2000000.0) /
            denom.cast("double")).cast("long"))
          .otherwise(lit(-1L)))
    val best = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_u").desc, col("tgt_id"))
    margins.withColumn("_rk", row_number().over(best))
      .where(col("_rk") === 1 && col("margin_u") >= marginThresholdU)
      .select("src_id", "tgt_id", "cos_u", "margin_u")
  }

  private def mineFromScored(scored: DataFrame, k: Int,
      marginThresholdU: Long): DataFrame =
    mineFromAverages(scored,
      topKAvgU(scored, "src_id", "tgt_id", k, "avg_src_u"),
      topKAvgU(scored, "tgt_id", "src_id", k, "avg_tgt_u"),
      marginThresholdU)

  /**
   * Exact margin mining: score EVERY (src, tgt) pair, take true
   * k-NN averages, mine forward-best pairs above the threshold.
   * All-pairs — the certification baseline the IVF leg's recall
   * contract is judged against; production uses [[marginMineIvf]].
   * `src`/`tgt`: (`src_id`|`tgt_id`, `embedding` double array).
   */
  def marginMineExact(src: DataFrame, tgt: DataFrame, k: Int,
      marginThresholdU: Long): DataFrame = {
    graft.functions.GraftFunctions.register(src.sparkSession)
    val s0 = src.select(col("src_id"), col("embedding").as("_se"))
      .withColumn("_sn", Similarity.norm(col("_se")))
    // The broadcast-NLJ streams the SOURCE side, so the product's task
    // count is the source scan's split count — a single-file embedding
    // table runs the whole N×M dot-product pass as ONE task (probe:
    // 1.4 s single-task stages). Fan the streamed side to the session's
    // parallelism when it under-splits; at real scale the table already
    // carries thousands of splits and this is a no-op.
    val sp = src.sparkSession.sparkContext.defaultParallelism
    val s = if (s0.rdd.getNumPartitions * 2 < sp) s0.repartition(sp) else s0
    val t = tgt.select(col("tgt_id"), col("embedding").as("_te"))
      .withColumn("_tn", Similarity.norm(col("_te")))
    // Pin the scored N×M product: it feeds BOTH neighborhood-average
    // aggregates AND the margin join — three consumers whose exchange
    // shapes differ, so without the pin the full cross join (every
    // dot product) evaluates three times. The pinned table is
    // (src_id, tgt_id, cos_u) — 3 narrow columns, the all-pairs score
    // table this certification leg is already quadratic in. Pinning it
    // PRE-HASHED on src_id (checkpoint preserves outputPartitioning)
    // lets the source-side top-k window and the forward-best window read
    // it with NO further exchange — only the target-side average pays
    // one; the dot products themselves are computed map-side in the
    // fanned crossJoin stage before this shuffle.
    val scored = s.crossJoin(t).select(col("src_id"), col("tgt_id"),
      cosU(Similarity.dot(col("_se"), col("_te")) / (col("_sn") * col("_tn")))
        .as("cos_u"))
      .repartition(col("src_id"))
      .pinned()
    mineFromScored(scored, k, marginThresholdU)
  }

  /**
   * Production margin mining over IVF candidates: one
   * [[Similarity.ivfTopK]] probe per direction (src→tgt candidates
   * carry the pairs to mine; tgt→src candidates supply the
   * target-side neighborhood averages), margins on the candidate set
   * only. `candK` is the per-query candidate width (≥ k; wider =
   * closer to exact). Same output shape as [[marginMineExact]].
   */
  def marginMineIvf(src: DataFrame, tgt: DataFrame, k: Int,
      marginThresholdU: Long, candK: Int, nLists: Int = 16,
      nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val tgtCorpus = tgt.select(col("tgt_id").as("vec_id"), col("embedding"))
    val srcCorpus = src.select(col("src_id").as("vec_id"), col("embedding"))
    val srcQ = src.select(col("src_id").as("query_id"), col("embedding").as("query_vec"))
    val tgtQ = tgt.select(col("tgt_id").as("query_id"), col("embedding").as("query_vec"))
    // Deliberately NOT pinned although the forward probe feeds two
    // consumers: the whole IVF mine is a single-action subtree whose
    // duplicate probe evaluations run as CONCURRENT stages inside that
    // action (wall = max, not sum) — an eager pin here serializes the
    // probe in front of the rest (r18 probe: +1.5 s on bt_margin_recall,
    // the same class of loss as the verifyJaccard sets-pin in r17).
    val fwd = Similarity.ivfTopK(tgtCorpus, srcQ, candK, nLists, nProbe, seed)
      .select(col("query_id").as("src_id"), col("vec_id").as("tgt_id"),
        cosU(col("cos")).as("cos_u"))
    val bwd = Similarity.ivfTopK(srcCorpus, tgtQ, candK, nLists, nProbe, seed)
      .select(col("vec_id").as("src_id"), col("query_id").as("tgt_id"),
        cosU(col("cos")).as("cos_u"))
    mineFromAverages(fwd,
      topKAvgU(fwd, "src_id", "tgt_id", k, "avg_src_u"),
      topKAvgU(bwd, "tgt_id", "src_id", k, "avg_tgt_u"),
      marginThresholdU)
  }
}
