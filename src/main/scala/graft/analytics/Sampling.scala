package graft.analytics

import graft.Pins._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling and splitting for training-data pipelines.
 *
 * Assignment is a pure function of the row's id — the top 32 bits of
 * `md5` over the id's decimal string — so splits are (a) reproducible
 * run-to-run and across cluster sizes/partitionings, (b) stable under
 * data re-ordering and re-partitioning, and (c) re-derivable by any
 * other engine (the correctness oracle computes the identical
 * expression in SQL). Never `rand()`: a seeded RNG depends on row
 * order and partition count, which a 1000-executor re-run does not
 * preserve.
 *
 * Scale shape: bucket assignment and rate filtering are narrow
 * projections (whole-stage codegen, scan speed at 100 TB); the only
 * shuffles are the tiny broadcast of the per-stratum rate table and,
 * for [[topKPerGroup]], one hash shuffle on the group key.
 */
object Sampling {

  /** Bucket granularity: rates/weights resolve to 1/10000ths. */
  val Buckets = 10000

  /** Deterministic hash bucket in [0, nBuckets) — the engine-parity
    * hashing device (the oracle computes the identical md5-prefix
    * expression); every bucketed draw in the library routes through
    * here so the convention cannot drift. */
  def hashBucket(idCol: Column, nBuckets: Int = Buckets): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % nBuckets

  /**
   * Train/val/test split by cumulative weight, e.g.
   * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Buckets are
   * carved into contiguous ranges in the order given; weights must sum
   * to 1. Adds a `split` column.
   */
  def split(df: DataFrame, idCol: Column, weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1 (got $weights)")
    val cuts = weights.scanLeft(0.0)(_ + _._2).map(w => math.round(w * Buckets))
    val b = hashBucket(idCol)
    val expr = weights.zipWithIndex.tail.foldLeft(
        when(b < cuts(1), lit(weights.head._1))) {
      case (acc, ((name, _), i)) => acc.when(b >= cuts(i) && b < cuts(i + 1), lit(name))
    }
    df.withColumn("split", expr)
  }

  /**
   * Per-stratum deterministic sampling (training-mix construction):
   * keep a row iff `bucket < rate(stratum) * Buckets`. Rates are a tiny
   * broadcast-joined table; strata absent from `rates` use
   * `defaultRate`. A rate of 1.0 keeps everything, 0.0 drops the
   * stratum entirely.
   */
  def stratifiedSample(df: DataFrame, idCol: Column, strataCol: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = rates.toSeq.toDF("__stratum", "__rate")
    df.withColumn("__stratum", strataCol)
      .join(broadcast(rdf), Seq("__stratum"), "left")
      .where(hashBucket(idCol) <
        coalesce(col("__rate"), lit(defaultRate)) * Buckets)
      .drop("__stratum", "__rate")
  }

  /**
   * Temperature-resampled mixture (the multilingual-corpus rebalancing
   * op: upweight rare strata, downsample dominant ones). With
   * temperature alpha = 0.5, stratum s with share p_s is kept at rate
   * r_s = p_s^(alpha-1) normalized so the rarest stratum keeps
   * everything — i.e. r_s = sqrt(n_min / n_s). sqrt and division are
   * IEEE-correctly-rounded, so the oracle's doubles are bit-identical
   * (a general pow would not be).
   *
   * Two tiny aggregates (stratum counts, their min — bounded metadata)
   * feed a broadcast rate table; the corpus itself is filtered in one
   * narrow pass.
   */
  def temperatureMixture(df: DataFrame, idCol: Column, strataCol: Column): DataFrame = {
    val counts = df.groupBy(strataCol.as("__stratum")).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min("__n")).first().getLong(0)
    val rates = counts.withColumn("__rate",
      sqrt(lit(minN).cast("double") / col("__n").cast("double")))
    df.withColumn("__stratum", strataCol)
      .join(broadcast(rates), Seq("__stratum"))
      .where(hashBucket(idCol) < col("__rate") * Buckets)
      .drop("__stratum", "__n", "__rate")
  }

  /**
   * Repeat-factor UPSAMPLING — the other half of mixture construction
   * ([[temperatureMixture]] can only downsample): stratum factor f >= 0
   * emits floor(f) copies of every row, plus one more copy iff the
   * row's hash bucket falls under the fractional part — so each row
   * contributes exactly floor(f) or ceil(f) copies, deterministically,
   * with stratum-level expectation f (the epoch-repeat rule multilingual
   * training mixes use for underrepresented languages). A `copy` column
   * (0-based) disambiguates duplicates downstream.
   *
   * Scale shape: a tiny broadcast factor table + one bounded
   * `explode(sequence(...))` — fan-out is exactly the repeat factor a
   * downstream trainer pays anyway; no shuffle, no window. All
   * arithmetic integral once factors are resolved to 1/10000ths, so any
   * engine re-derives copy counts bit-identically.
   *
   * The extra-copy bucket is SALTED (`"up:" + id`, the way
   * [[epochShuffle]] salts by epoch): an unsalted bucket would correlate
   * with every other hashBucket decision in a composed pipeline — e.g.
   * after [[temperatureMixture]] keeps exactly the rows with bucket <
   * rate, an unsalted ceil-copy draw on the survivors would be
   * conditioned on that cut and the realized factor would drift off f.
   */
  def upsampleRepeat(df: DataFrame, idCol: Column, strataCol: Column,
      factors: Map[String, Double], defaultFactor: Double = 1.0): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(_ >= 0), "factors must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val fdf = factors.toSeq.map { case (s, f) =>
      (s, math.round(f * Buckets)) }.toDF("__stratum", "__fb")
    val fb = coalesce(col("__fb"), lit(math.round(defaultFactor * Buckets)))
    val whole = (fb / Buckets).cast("long")             // floor(f)
    val frac = fb - whole * Buckets                     // frac(f) in buckets
    val copies = whole +
      (hashBucket(concat(lit("up:"), idCol.cast("string"))) < frac).cast("long")
    df.withColumn("__stratum", strataCol)
      .join(broadcast(fdf), Seq("__stratum"), "left")
      .withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__stratum", "__fb", "__copies")
  }

  /**
   * Deterministic per-group top-k — a seedless "reservoir": rank rows
   * inside each group by (hash bucket, id) and keep rank <= k. The hash
   * makes the kept set a uniform, order-independent sample; the id
   * tie-break makes it total. One shuffle on the group key; each task
   * ranks only its own groups.
   */
  def topKPerGroup(df: DataFrame, groupCol: Column, idCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(hashBucket(idCol), idCol)
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /**
   * Per-source SHARE CAP (the RefinedWeb/C4-style domain cap: no source
   * may exceed `cap` of the corpus): any stratum whose share p_s
   * exceeds `cap` is thinned at rate cap/p_s = cap*N/n_s, computed
   * against the ORIGINAL corpus size in one pass (the single-pass
   * contract — iterative waterfilling re-normalizes against the
   * post-cap total and is a driver-side loop over the tiny rate table
   * if wanted). Strata under the cap pass through whole. The thinning
   * draw is salted (`"cap:" + id`) so composition with other samplers
   * stays unbiased. Two tiny aggregates feed a broadcast rate table;
   * the corpus maps through one narrow filter.
   */
  def capSourceShare(df: DataFrame, idCol: Column, sourceCol: Column,
      cap: Double): DataFrame = {
    require(cap > 0 && cap <= 1, s"cap must be in (0, 1] (got $cap)")
    val counts = df.groupBy(sourceCol.as("__stratum")).agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum("__n")).first().getLong(0)
    val rates = counts.withColumn("__rate",
      least(lit(1.0), lit(cap) * lit(total).cast("double") / col("__n").cast("double")))
    df.withColumn("__stratum", sourceCol)
      .join(broadcast(rates), Seq("__stratum"))
      .where(hashBucket(concat(lit("cap:"), idCol.cast("string"))) <
        col("__rate") * Buckets)
      .drop("__stratum", "__n", "__rate")
  }

  /**
   * Deterministic EPOCH SHUFFLE — the global training-order permutation:
   * adds `pos`, the row's 0-based position in the order
   * `(md5(epoch + ":" + id), id)`. Changing `epoch` re-permutes the
   * corpus; the same epoch always re-derives the identical order on any
   * engine, partitioning, or cluster size (the reproducible-epoch rule;
   * never `rand()`-sorted, see the class scaladoc).
   *
   * Scale shape: a naive `row_number() OVER (ORDER BY key)` is a
   * single-task corpus sort. Instead the key's first 16 bits bucket rows
   * into 65536 uniform ranges (fixed-width lowercase hex, so bucket
   * order IS key order); per-bucket counts are prefix-summed on the tiny
   * bucket table and broadcast back, and each bucket ranks only its own
   * ~corpus/65536 slice — the same two-phase shape as
   * [[graft.analytics.TextAnalysis.packSequences]] and the log's offset
   * assignment. No window or sort ever spans the corpus.
   */
  def epochShuffle(df: DataFrame, idCol: Column, epoch: Int): DataFrame = {
    val key = md5(concat(lit(epoch + ":"), idCol.cast("string")).cast("binary"))
    val keyed = df.withColumn("__key", key)
      .withColumn("__bucket", substring(col("__key"), 1, 4))
    val bucketAgg = keyed.groupBy("__bucket").agg(count(lit(1)).as("__n"))
    // prefix over the bucket table: <= 65536 rows, not the corpus
    val baseW = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    val bases = bucketAgg
      .withColumn("__base", coalesce(sum("__n").over(baseW), lit(0L)))
      .select("__bucket", "__base")
    val localW = Window.partitionBy("__bucket").orderBy(col("__key"), idCol)
    keyed.join(broadcast(bases), Seq("__bucket"))
      .withColumn("pos", col("__base") + row_number().over(localW) - 1)
      .drop("__bucket", "__key")
  }

  /**
   * DSIR-style importance resampling (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): score every raw
   * document by the log-likelihood ratio of hashed-bigram bag models —
   * a smoothed multinomial over `buckets` hashed word-bigram features
   * fit on the TARGET domain versus one fit on the RAW pool — then
   * select `k` documents without replacement via the Gumbel top-k
   * trick on the log-weights.
   *
   * Engine-parity arithmetic: each bucket's log-likelihood-ratio and
   * each document's Gumbel noise are floored to integer MICRO-units
   * immediately after the (only) floating-point step, so the per-doc
   * score is an exact integer sum — reproducible bit-for-bit by any
   * engine in any aggregation order, and the top-k cut is a total
   * order (micro-key, then doc_id). Gumbel noise is hash-derived from
   * the doc id ([[hashBucket]]), never `rand()`.
   *
   * Scale shape: two narrow gram passes (raw pool + target) into
   * bucket count tables bounded by `buckets`; the LLR table broadcasts
   * to a single hash aggregate per document; selection is a TakeOrdered
   * top-k (never a global sort materialization) whose id set broadcasts
   * back as the `selected` flag.
   *
   * Returns (doc_id, n_grams, score_u, gumbel_u, selected) with scores
   * in micro-log units.
   */
  def importanceResample(raw: DataFrame, target: DataFrame, idCol: Column,
      textCol: Column, k: Int, buckets: Int = 8192,
      seed: String = "dsir"): DataFrame = {
    require(k > 0 && buckets > 0, "need positive k and bucket count")
    def grams(df: DataFrame) = df
      .select(idCol.as("doc_id"), explode(Dedup.shingles(textCol, 2)).as("__g"))
      .withColumn("bucket", hashBucket(col("__g"), buckets))
    // Pin the two hashed-bigram count tables: the corpus side feeds the
    // bucket-mass aggregate, the LLR model AND the per-doc scores, the
    // target side both its total and the model join — without the pins
    // each consumer re-runs the md5-per-bigram explode over its corpus
    // (probe: the same 11 s-of-task-time stage ran 3x). Both tables are
    // bounded feature artifacts: docB ≤ |docs| x distinct-buckets-per-doc
    // rows, tgtB ≤ `buckets` rows.
    val docB = grams(raw).groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      .pinned()
    val rawB = docB.groupBy("bucket").agg(sum("n").as("rn"))
    val tgtB = grams(target).groupBy("bucket").agg(count(lit(1)).as("tn"))
      .pinned()
    // totals as broadcast one-row scalars INSIDE the plan — collecting
    // them to the driver forced a full extra shingling pass per total
    val rawTotDf = rawB.agg(sum("rn").as("__raw_tot"))
    val tgtTotDf = tgtB.agg(coalesce(sum("tn"), lit(0L)).as("__tgt_tot"))
    // add-one smoothing over the hashed feature space; a bucket absent
    // from the target keeps the floor probability 1/(T+B)
    val llr = rawB.join(tgtB, Seq("bucket"), "left")
      .crossJoin(broadcast(rawTotDf)).crossJoin(broadcast(tgtTotDf))
      .select(col("bucket"),
        floor((log(coalesce(col("tn"), lit(0L)) + lit(1))
          - log((col("__tgt_tot") + lit(buckets)).cast("double"))
          - log(col("rn") + lit(1))
          + log((col("__raw_tot") + lit(buckets)).cast("double"))) * lit(1000000.0)).as("llr_u"))
    val scores = docB.join(broadcast(llr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("llr_u")).as("score_u"), sum("n").as("n_grams"))
    // Pinned: consumed by the top-k cut AND the final selected-flag join
    // — two actions' worth of subtrees that would each re-run the score
    // aggregation. Output-scale table (one row per raw doc, 4 columns).
    val withG = raw.select(idCol.as("doc_id")).join(scores, Seq("doc_id"), "left")
      .na.fill(0L, Seq("score_u", "n_grams"))
      .withColumn("__u",
        (hashBucket(concat(lit(seed + ":"), col("doc_id")), 1000000) + lit(0.5))
          / lit(1000000.0))
      .withColumn("gumbel_u", floor(-log(-log(col("__u"))) * lit(1000000.0)))
      .drop("__u")
      .pinned()
    val picked = withG
      .orderBy((col("score_u") + col("gumbel_u")).desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), lit(true).as("__sel"))
    withG.join(broadcast(picked), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("score_u"), col("gumbel_u"),
        coalesce(col("__sel"), lit(false)).as("selected"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
   * document by its language-model score and cut the corpus into
   * equal-mass head / middle / tail thirds — the canonical quality
   * stratification (head feeds training, tail gets dropped or
   * re-scored). Input is [[TextAnalysis.bigramPerplexity]]'s output;
   * the sort key is the exact integer mean NLL in micro-units
   * (`-sum_logp_u div n_bigrams`, ties broken by doc id), so the cut
   * is total and engine-reproducible; unscorable documents (no
   * bigrams) sink to the tail via a MaxValue key.
   *
   * Scale shape: the global rank is the repo's two-phase
   * range-partition pattern ([[epochShuffle]] /
   * `RecordLog.assignOffsetsScalable`) — partition-local row_number
   * plus broadcast per-partition bases; no corpus-wide window.
   */
  def perplexityBuckets(scored: DataFrame): DataFrame = {
    val s = scored.withColumn("score_u",
      when(col("n_bigrams") > 0, expr("(-sum_logp_u) div n_bigrams"))
        .otherwise(lit(Long.MaxValue)))
    val np = math.max(s.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val parted = s.repartitionByRange(np, col("score_u"), col("doc_id"))
      .withColumn("__part", spark_partition_id())
    val counts = parted.groupBy("__part").agg(count(lit(1)).as("__n"))
    val bases = counts.withColumn("__base",
      coalesce(sum("__n").over(Window.orderBy("__part")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val total = counts.agg(sum("__n").as("__total"))
    parted
      .join(broadcast(bases.select("__part", "__base")), Seq("__part"))
      .crossJoin(broadcast(total))
      .withColumn("__r", col("__base") - 1 + row_number().over(
        Window.partitionBy("__part").orderBy("score_u", "doc_id")))
      .select(col("doc_id"), col("score_u"),
        when(expr("__r * 3 div __total") === 0, "head")
          .when(expr("__r * 3 div __total") === 1, "middle")
          .otherwise("tail").as("bucket"))
  }

  /**
   * Token-budget mixture planner — the pre-training mixture arithmetic:
   * given each source's available token mass, a per-source weight (in
   * parts per million of the training budget), and the total token
   * budget, derive the sampling plan per source: its token target,
   * how many FULL epochs of the source that needs (over-weighted
   * sources repeat), and the keep rate (in ppm) for the final partial
   * epoch (under-weighted sources downsample; `n_full_epochs = 0`).
   *
   * All arithmetic is exact integer division (`div`, the repo
   * convention), reproducible on any engine — the plan feeds
   * [[upsampleRepeat]] / [[stratifiedSample]] to materialize the
   * mixture. One token-count aggregate over the corpus + a broadcast
   * weight join; the output is bounded source metadata.
   *
   * Long-overflow guard: `budget × ppm` and `remainder × 1e6` must fit
   * i64, so the budget is capped at 9×10^12 tokens (9T — beyond any
   * current training run; raise to DECIMAL if that changes).
   */
  def tokenBudgetPlan(docs: DataFrame, sourceCol: Column, nTokensCol: Column,
      weights: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0 && budgetTokens <= 9000000000000L,
      "budget must be in (0, 9e12] tokens")
    val avail = docs.groupBy(sourceCol.as("source"))
      .agg(sum(nTokensCol).as("tokens_available"))
    avail.join(broadcast(weights), Seq("source"))
      .withColumn("tokens_target",
        expr(s"$budgetTokens * weight_ppm div 1000000"))
      .select(col("source"), col("tokens_available"), col("weight_ppm"),
        col("tokens_target"),
        expr("tokens_target div tokens_available").as("n_full_epochs"),
        expr("((tokens_target % tokens_available) * 1000000) div tokens_available")
          .as("remainder_rate_ppm"))
  }

  /**
   * Count-aware dedup ("dedup then reweight"): given a connected-
   * components labeling `(doc_id, cluster_id)` of the near-dup graph
   * ([[Dedup.connectedComponents]]), keep ONE canonical doc per
   * cluster (the min-id representative, `keep`) and carry the
   * cluster's multiplicity as its training weight (`repeat_weight` =
   * cluster size on the canonical row, 0 elsewhere) — so the deduped
   * corpus preserves each document's original frequency mass instead
   * of silently flattening the distribution (the documented failure
   * mode of naive dedup before mixture construction). One aggregate on
   * cluster_id + one broadcast-size join back; integer weights.
   */
  def dedupWeights(components: DataFrame): DataFrame =
    components
      .join(components.groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size")), "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("keep"),
        when(col("doc_id") === col("cluster_id"), col("cluster_size"))
          .otherwise(lit(0L)).as("repeat_weight"))

  /**
   * Curriculum ordering: assign each document a training STAGE by
   * difficulty quantile (easy stages first — the classic curriculum-
   * learning schedule) and a deterministic shuffled position WITHIN
   * its stage (hash-derived, so co-stage examples don't arrive in
   * difficulty order — intra-stage order must look i.i.d. or the
   * easiest-first bias leaks into every batch). `ntile` over the total
   * order (difficulty, id) makes stage assignment reproducible; the
   * within-stage key is the library-wide md5 bucket, so the
   * permutation is a pure function of the id — stable across cluster
   * sizes and replayable by the oracle.
   *
   * Stage = `(rank - 1) * nStages div total + 1` over the total order
   * (the repo's exact-quantile device — same integer arithmetic on
   * both engines, no ntile remainder-placement ambiguity). Scale note:
   * the stage quantile is one global rank — at 100 TB, replace with
   * approx-quantile cut points broadcast as a range filter
   * ([[ccnetQualityBuckets]]'s shape); the exact rank is kept here
   * because the oracle certifies EXACT quantile boundaries.
   * Output: doc_id, difficulty, stage (1-based), pos (1-based within
   * stage).
   */
  def curriculum(docs: DataFrame, idCol: Column, difficultyCol: Column,
      nStages: Int): DataFrame = {
    require(nStages > 0, "nStages must be positive")
    val posW = Window.partitionBy(col("stage"))
      .orderBy(col("__shuf"), col("doc_id"))
    docs.select(idCol.as("doc_id"), difficultyCol.cast("long").as("difficulty"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("difficulty").asc, col("doc_id").asc)))
      .withColumn("__total", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("stage", expr(s"(__r - 1) * $nStages div __total") + 1)
      .withColumn("__shuf", hashBucket(col("doc_id"), 1000000))
      .withColumn("pos", row_number().over(posW))
      .select("doc_id", "difficulty", "stage", "pos")
  }

  /**
   * Length-bucketed batching (dynamic batching): rank sequences by
   * token count (ties by id — total order), cut the rank into
   * fixed-size batches, and report each row's padding cost against
   * its batch maximum. Batching similar lengths together is what
   * keeps padding waste low when examples are padded to the batch
   * max — random batching wastes (max-mean)/max of every batch.
   *
   * The exact global rank here is the oracle-certifiable spelling; at
   * 100 TB use the two-phase bucketed rank ([[epochShuffle]]'s
   * device) — batch boundaries shift by at most one bucket's rounding
   * and the padding arithmetic is unchanged. Output: doc_id,
   * n_tokens, batch_id (0-based), batch_max, pad (= batch_max -
   * n_tokens, the per-row padding waste).
   */
  def lengthBuckets(docs: DataFrame, idCol: Column, nTokensCol: Column,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val rankW = Window.orderBy(col("n_tokens").asc, col("doc_id").asc)
    val batchW = Window.partitionBy(col("batch_id"))
    docs.select(idCol.as("doc_id"), nTokensCol.cast("long").as("n_tokens"))
      .withColumn("__r", row_number().over(rankW))
      .withColumn("batch_id", expr(s"(__r - 1) div $batchSize"))
      .withColumn("batch_max", max(col("n_tokens")).over(batchW))
      .withColumn("pad", col("batch_max") - col("n_tokens"))
      .select("doc_id", "n_tokens", "batch_id", "batch_max", "pad")
  }

  /**
   * Anneal-phase selection (the MiniCPM/Llama-3 "midtraining" recipe):
   * the final phase of a training run re-samples from a small
   * HIGH-QUALITY subset instead of the full mixture. Rank documents by
   * quality (ties by id — total order) and mark the top
   * `annealFracPpm` parts-per-million as the anneal set; anneal docs
   * carry `anneal_weight_ppm = 10^6 * total div n_anneal` (the
   * renormalized per-doc mass so the anneal phase preserves total
   * sampling mass over the shrunken set), everyone else 0. Pretrain-
   * phase weights stay uniform and are not emitted.
   *
   * The exact rank is the oracle-certifiable spelling (the 100 TB
   * path swaps in approx-quantile cut points, same as [[curriculum]]).
   * Output: doc_id, score, is_anneal, anneal_weight_ppm.
   */
  def annealPhase(docs: DataFrame, idCol: Column, scoreCol: Column,
      annealFracPpm: Long): DataFrame = {
    require(annealFracPpm > 0 && annealFracPpm <= 1000000L,
      "annealFracPpm must be in (0, 1e6]")
    docs.select(idCol.as("doc_id"), scoreCol.cast("long").as("score"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .withColumn("__total", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("is_anneal",
        expr(s"__r * 1000000 <= $annealFracPpm * __total"))
      .withColumn("__na", sum(when(col("is_anneal"), 1L).otherwise(0L))
        .over(Window.partitionBy(lit(1))))
      .withColumn("anneal_weight_ppm",
        when(col("is_anneal"), expr("1000000 * __total div greatest(__na, 1)"))
          .otherwise(lit(0L)))
      .select("doc_id", "score", "is_anneal", "anneal_weight_ppm")
  }

  /**
   * Domain reweighting by multiplicative weights (the DoReMi family,
   * Xie et al. 2023, linearized): start from the uniform mixture and,
   * for `rounds` update steps, multiply each domain's weight by
   * `1 + eta * normalized_excess_loss` then renormalize — domains the
   * proxy model finds hard gain mixture share. This is the
   * exponentiated-gradient update with exp(x) ≈ 1+x, which keeps
   * EVERY step in exact integer parts-per-million arithmetic
   * (`div`, the repo convention): no libm exp whose final ULP could
   * differ across engines, so the oracle replays all rounds exactly.
   *
   * `domainLoss`: (`source`, `loss_u`) — one row per domain,
   * non-negative integer proxy loss in micro-units (the caller
   * derives it: per-domain perplexity, quality deficit, …). Losses
   * are max-normalized to [0, 10^6] once, up front. The table is
   * bounded domain METADATA (tens of rows), so the empty-partition
   * windows here are driver-scale folds, not data-plane shuffles.
   * Output: source, loss_u, norm_loss_u, w_round_1 … w_round_R
   * (ppm, each round summing to ~10^6 less integer-division dust).
   */
  def domainReweight(domainLoss: DataFrame, rounds: Int, etaPpm: Long): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1, 16]")
    require(etaPpm >= 0 && etaPpm <= 1000000L, "etaPpm must be in [0, 1e6]")
    val all = Window.partitionBy(lit(1))
    var cur = domainLoss
      .withColumn("__max", greatest(max(col("loss_u")).over(all), lit(1L)))
      .withColumn("norm_loss_u", expr("loss_u * 1000000 div __max"))
      .withColumn("__k", count(lit(1)).over(all))
      .withColumn("__w", expr("1000000 div __k"))
    (1 to rounds).foreach { r =>
      cur = cur
        .withColumn("__raw",
          expr(s"__w * (1000000 + $etaPpm * norm_loss_u div 1000000) div 1000000"))
        .withColumn("__sum", sum(col("__raw")).over(all))
        .withColumn("__w", expr("__raw * 1000000 div __sum"))
        .withColumn(s"w_round_$r", col("__w"))
    }
    cur.select(col("source") +: col("loss_u") +: col("norm_loss_u") +:
      (1 to rounds).map(r => col(s"w_round_$r")): _*)
  }
}
