package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Similarity search over an embedding column (`Array[Double]`).
 *
 * Baseline: brute-force cosine top-k — broadcast the (small) query set,
 * score every corpus vector in one narrow pass, per-query top-k via
 * window. Scale path: sign-random-projection LSH buckets
 * (deterministic hyperplanes) so candidate generation is a bucket join
 * instead of a cross product.
 *
 * All vector math runs through the codegen'd [[graft.functions.VecDot]] /
 * [[graft.functions.VecNorm]] kernels (a fused primitive loop inside
 * whole-stage codegen); norms are computed once per row *before* any
 * pair join so a pair costs exactly one dot product.
 */
object Similarity {

  private def kernels(df: DataFrame): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df
  }

  /** dot(a, b) via the native codegen kernel. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(v: Column): Column = call_function("vec_norm", v)

  /** cosine from a precomputed-norm pair: dot / (na * nb). */
  private def cosPre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest corpus
   * vectors. Queries are broadcast (must be small); the corpus is scanned
   * once; per-query top-k is a partial top-k under AQE.
   *
   * `excludeSelf` (default true) drops `query_id == vec_id` matches — for
   * corpus-derived query sets. Pass false for an external query set whose
   * ids may coincide with corpus ids.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = kernels(corpus).withColumn("_cn", norm(col("embedding")))
    val q = kernels(queries).withColumn("_qn", norm(col("query_vec")))
    val scored = c.crossJoin(broadcast(q))
      .where(if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .select(col("query_id"), col("vec_id"),
        cosPre(col("query_vec"), col("embedding"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /**
   * Integer-parity inner-product top-k: the oracle-certified twin of
   * the float ANN rankings. Embeddings quantize to integer micro-units
   * (`floor(x * scale + 0.5)` — round-half-up spelled as `floor` so
   * Spark and DuckDB agree bit-for-bit; float→double widening and the
   * double product are IEEE-exact on both engines), scores are EXACT
   * int64 inner products (order-independent summation, no float
   * accumulation anywhere), and ranks tie-break on vec_id. Every rank
   * is therefore bit-replayable in pure integer SQL — certifying the
   * scan→score→window top-k machinery the float `ann_*` variants share
   * (those keep recall contracts: float cosine ranks are
   * order-of-summation sensitive).
   */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      scale: Int = 10000): DataFrame = {
    def qz(v: Column): Column =
      transform(v, x => floor(x.cast("double") * scale + lit(0.5)).cast("long"))
    val c = corpus.select(col("vec_id"), qz(col("embedding")).as("_qe"))
    val q = queries.select(col("query_id"), qz(col("query_vec")).as("_qq"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("_qe"), col("_qq"), _ * _), lit(0L), _ + _)
          .as("iscore"))
    val w = Window.partitionBy("query_id").orderBy(col("iscore").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "iscore", "rank")
  }

  /** Per-dimension [lo, hi] ranges of a trained 8-bit scalar quantizer
    * (the faiss ScalarQuantizer QT_8bit layout: uniform levels, exact
    * endpoints). */
  final case class SqModel(lo: Array[Double], hi: Array[Double])

  /**
   * Train the scalar quantizer: per-dimension min/max over the corpus
   * in ONE distributed aggregation pass (posexplode → per-position
   * extremes; `dim` rows return to the driver — control-plane sized at
   * any corpus scale, unlike the samples a codebook trainer needs).
   */
  def sqTrain(corpus: DataFrame, vecCol: String = "embedding"): SqModel = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
      .collect()
    val dim = rows.map(_.getInt(0)).max + 1
    val lo = new Array[Double](dim)
    val hi = new Array[Double](dim)
    rows.foreach { r =>
      lo(r.getInt(0)) = r.getDouble(1); hi(r.getInt(0)) = r.getDouble(2)
    }
    SqModel(lo, hi)
  }

  /**
   * SQ8 codes: `c_i = round((x_i - lo_i) / (hi_i - lo_i) * 255)`
   * clamped to [0, 255] (round-half-up spelled as `floor(+0.5)` so
   * Spark and DuckDB agree bit-for-bit; degenerate dimensions code to
   * 0) — one byte of information per dimension, a 4x compression of
   * float32 at scale. In-row zip_with over broadcast range literals:
   * narrow, codegen'd, no shuffle.
   */
  def sqEncode(df: DataFrame, model: SqModel, vecCol: String = "embedding",
      out: String = "sq_code"): DataFrame = {
    val loLit = typedLit(model.lo.toSeq)
    val deltaLit = typedLit(model.lo.indices.map(i => model.hi(i) - model.lo(i)))
    df.withColumn(out,
      zip_with(
        zip_with(col(vecCol).cast("array<double>"), loLit, (x, l) => x - l),
        deltaLit,
        (d, w) => when(w > lit(0.0),
            least(greatest(floor(d / w * 255 + lit(0.5)), lit(0.0)), lit(255.0)))
          .otherwise(lit(0.0)).cast("int")))
  }

  /**
   * SQ8 symmetric top-k: both sides coded, ranked by the EXACT int64
   * dot of integer-reconstructed values — per dimension the decoded
   * `lo_i + c_i·Δ_i/255` is expressed in `scale` micro-units as
   * `L_i + c_i·D_i` with `L_i = round(lo_i·scale)` and
   * `D_i = round(Δ_i·scale/255)`, so the score is a pure int64 sum
   * that tracks the float reconstruction to ~1/scale yet stays
   * bit-replayable like [[quantizedTopK]] (a raw CODE dot would
   * reweight every dimension by 1/Δ_i² and wreck the cosine ranking).
   * Train → encode → reconstruct → scan all sit under the oracle; the
   * float-faithfulness of the trained ranks is certified separately by
   * the recall contract against [[bruteForceTopK]].
   */
  def sqTopK(codedCorpus: DataFrame, codedQueries: DataFrame,
      model: SqModel, k: Int, codeCol: String = "sq_code",
      scale: Long = 1000000L): DataFrame = {
    val lInt = typedLit(model.lo.map(l => math.floor(l * scale + 0.5).toLong).toSeq)
    val dInt = typedLit(model.lo.indices.map(i =>
      math.floor((model.hi(i) - model.lo(i)) * scale / 255.0 + 0.5).toLong))
    def recon(codes: Column): Column =
      zip_with(zip_with(codes, dInt, (c, d) => c.cast("long") * d), lInt,
        (v, l) => v + l)
    val c = codedCorpus.select(col("vec_id"), recon(col(codeCol)).as("_cr"))
    val q = codedQueries.select(col("query_id"), recon(col(codeCol)).as("_qr"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("_cr"), col("_qr"), _ * _), lit(0L), _ + _)
          .as("iscore"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("iscore").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "iscore", "rank")
  }

  /**
   * Contrastive-pair mining for embedding-model training data: for each
   * anchor query, the single most-similar SAME-label vector is the
   * positive and the `kNeg` most-similar DIFFERENT-label vectors are the
   * hard negatives — the standard triplet shape (anchor, positive,
   * hard negative), with `margin = pos_cos - neg_cos` as the training
   * signal. Anchors with no same-label partner cannot form a triplet
   * and drop out.
   *
   * Dataflow: one broadcast of the bounded anchor batch against the
   * corpus (the [[bruteForceTopK]] kernel -- at 100 TB anchors stream
   * through in bounded batches, or the candidate set narrows first via
   * the IVF/LSH buckets); the label split and both rank windows reuse
   * the single scored pass, partitioned per anchor.
   */
  def mineTriplets(corpus: DataFrame, queries: DataFrame, kNeg: Int): DataFrame = {
    val c = kernels(corpus).withColumn("_cn", norm(col("embedding")))
    val q = kernels(queries).withColumn("_qn", norm(col("query_vec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("query_label"), col("vec_id"), col("label"),
        cosPre(col("query_vec"), col("embedding"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val pos = scored.where(col("label") === col("query_label"))
      .withColumn("__r", row_number().over(w)).where(col("__r") === 1)
      .select(col("query_id"), col("vec_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = scored.where(col("label") =!= col("query_label"))
      .withColumn("neg_rank", row_number().over(w))
      .where(col("neg_rank") <= kNeg)
      .select(col("query_id"), col("vec_id").as("neg_id"),
        col("cos").as("neg_cos"), col("neg_rank"))
    neg.join(pos, Seq("query_id"))
      .select(col("query_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"), col("neg_rank"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
  }

  /** `nBits`-bit sign-random-projection sketch: one fused codegen loop
    * over hash-derived ±1 hyperplanes ([[graft.functions.VecSignSketch]]).
    * Deterministic on every executor; no literal plane arrays in the plan. */
  def signSketch(emb: Column, nBits: Int): Column =
    call_function("vec_sign_sketch", emb, lit(nBits))

  /**
   * Explode a vector column into (band_id, band) rows. The sketch is
   * materialized into a `_sk` column *before* banding so it is computed
   * exactly once per row — referencing the sketch expression from each
   * band chunk would duplicate the subtree `bands` times (the round-1
   * 11×-slowdown bug).
   */
  private def withBands(df: DataFrame, vecCol: String, nBits: Int, bands: Int): DataFrame = {
    val width = nBits / bands
    val chunks = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        shiftright(col("_sk"), b * width).bitwiseAND((1L << width) - 1).as("band"))
    }
    df.withColumn("_sk", signSketch(col(vecCol), nBits))
      .withColumn("c", explode(array(chunks: _*)))
      .withColumn("band_id", col("c.band_id"))
      .withColumn("band", col("c.band")).drop("c", "_sk")
  }

  /**
   * LSH-bucketed ANN: bucket by sketch band, score only within-bucket
   * candidates. Trades recall for a bucket join that scales linearly
   * with corpus size (vs the cross product of [[bruteForceTopK]]).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
      nBits: Int = 16, bands: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    val c = kernels(corpus).withColumn("_cn", norm(col("embedding")))
    val q = kernels(queries).withColumn("_qn", norm(col("query_vec")))
    val cb = withBands(c, "embedding", nBits, bands)
    val qb = withBands(q, "query_vec", nBits, bands)
    val cand = cb.join(broadcast(qb), Seq("band_id", "band"))
      .where(if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .select(col("query_id"), col("vec_id"), col("query_vec"), col("embedding"),
        col("_qn"), col("_cn"))
      .dropDuplicates("query_id", "vec_id")
    val scored = cand.select(col("query_id"), col("vec_id"),
      cosPre(col("query_vec"), col("embedding"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /**
   * IVF (inverted-file) ANN: coarse k-means centroids split the corpus
   * into `nLists` posting lists; each query probes only its `nProbe`
   * closest centroids' lists, so the scored candidate volume is
   * ~ n * nProbe / nLists of the corpus instead of all of it. Centroids
   * are a tiny broadcast table trained by [[localKmeans]] on a bounded
   * hash-sample (`trainMod`); corpus assignment is one narrow argmin
   * expression; the probe ranking runs on queries × nLists rows.
   * Training is seeded AND partitioning-independent.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      trainMod: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = kernels(corpus).withColumn("_cn", norm(col("embedding")))
    val cents = localKmeans(collectSample(corpus, "embedding", trainMod),
      nLists, iters = 10, seed = seed)
    val assigned = c.withColumn("list_id", coarseAssign(col("embedding"), cents))
    val centDf = cents.zipWithIndex
      .map { case (v, i) => (i, v.toIndexedSeq) }.toDF("list_id", "centroid")
    val q = kernels(queries).withColumn("_qn", norm(col("query_vec")))
    // rank centroids per query by L2 distance (the k-means metric):
    // ||q-c||^2 = ||q||^2 - 2 q.c + ||c||^2; ||q||^2 is constant per query
    val probeW = Window.partitionBy("query_id").orderBy(col("_cd"), col("list_id"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("_cd",
        norm(col("centroid")) * norm(col("centroid")) -
          lit(2.0) * dot(col("query_vec"), col("centroid")))
      .withColumn("_pr", row_number().over(probeW))
      .where(col("_pr") <= nProbe)
      .select("query_id", "query_vec", "_qn", "list_id")
    val cand = assigned.join(broadcast(probes), Seq("list_id"))
      .where(col("query_id") =!= col("vec_id"))
    val scored = cand.select(col("query_id"), col("vec_id"),
      cosPre(col("query_vec"), col("embedding"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Exact embedding-cosine near-duplicate pairs (all pairs >= threshold)
   *  via self-join — quadratic in corpus size but each pair costs a
   *  single fused dot product; the baseline the LSH variant is judged
   *  against. */
  def cosineNearDupsExact(corpus: DataFrame, threshold: Double): DataFrame = {
    val withNorm = kernels(corpus).withColumn("_n", norm(col("embedding")))
    val a = withNorm.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("_n").as("n_a"))
    val b = withNorm.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("_n").as("n_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosPre(col("emb_a"), col("emb_b"), col("n_a"), col("n_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /**
   * Embedding-cosine near-duplicate pairs, LSH-bucketed candidates +
   * exact verify. Candidate volume ~ bands * n^2 / 2^width; recall per
   * pair = 1-(1-p^width)^bands with p = 1 - acos(cos)/pi, so this prunes
   * aggressively in the realistic near-dup regime (cos >= 0.9) and is
   * documented as lossy for low thresholds — use
   * [[cosineNearDupsExact]] when the threshold is far from 1. Band
   * buckets larger than `maxBucket` are dropped before the self-join
   * ([[Dedup.capBuckets]] — the hot-bucket skew cap; a degenerate
   * bucket of near-identical or zero vectors would self-join
   * quadratically at scale).
   */
  def cosineNearDups(corpus: DataFrame, dim: Int, threshold: Double,
      nBits: Int = 64, bands: Int = 8, maxBucket: Int = 1000): DataFrame = {
    val withNorm = kernels(corpus).withColumn("_n", norm(col("embedding")))
    val banded = Dedup.capBuckets(
      withBands(withNorm.select("vec_id", "embedding"), "embedding", nBits, bands)
        .select("vec_id", "band_id", "band"),
      Seq("band_id", "band"), maxBucket)
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band_id") === col("b.band_id") && col("a.band") === col("b.band") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val av = withNorm.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("_n").as("n_a"))
    val bv = withNorm.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("_n").as("n_b"))
    cand.join(av, "vec_a").join(bv, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosPre(col("emb_a"), col("emb_b"), col("n_a"), col("n_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
   * every vector to its nearest centroid by cosine, then inside each
   * cluster drop any vector within `threshold` cosine of a lower-id
   * clustermate — one representative survives per semantic duplicate
   * group. Returns (vec_id, cluster_id, kept).
   *
   * Scale shape: centroids are a broadcast (the paper uses k ~ sqrt(N)
   * clusters — pass a centroid set sized for the corpus); assignment is
   * one narrow broadcast-scored pass + a per-vector top-1 window keyed
   * by vec_id. The pairwise stage self-joins ONLY within a cluster, so
   * the quadratic term is (N/k)^2 * k, not N^2 — growing k with the
   * corpus keeps per-cluster work constant. Norms are computed once per
   * vector before any pair join.
   */
  def semDedup(corpus: DataFrame, centroids: DataFrame, threshold: Double): DataFrame = {
    val c = kernels(corpus).withColumn("_n", norm(col("embedding")))
    val cent = kernels(centroids)
      .select(col("centroid_id"), col("centroid"), norm(col("centroid")).as("_cn"))
    val w = Window.partitionBy("vec_id").orderBy(col("_cs").desc, col("centroid_id"))
    val assigned = c.crossJoin(broadcast(cent))
      .withColumn("_cs", cosPre(col("embedding"), col("centroid"), col("_n"), col("_cn")))
      .withColumn("_r", row_number().over(w))
      .where(col("_r") === 1)
      .select(col("vec_id"), col("embedding"), col("_n"), col("centroid_id").as("cluster_id"))
    val a = assigned.select(col("cluster_id"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("_n").as("n_a"))
    val b = assigned.select(col("cluster_id"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("_n").as("n_b"))
    val dominated = a.join(b, Seq("cluster_id"))
      .where(col("id_a") < col("id_b") &&
        cosPre(col("emb_a"), col("emb_b"), col("n_a"), col("n_b")) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.select("vec_id", "cluster_id")
      .join(dominated.withColumn("_dom", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"), coalesce(!col("_dom"), lit(true)).as("kept"))
  }

  /** The `k` lowest-id corpus vectors as a deterministic centroid set —
    * reproducible across engines and partitionings (a k-means fit would
    * not be); adequate for random-ish corpora, swappable for trained
    * centroids in production. */
  def headCentroids(corpus: DataFrame, k: Int): DataFrame =
    corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  // ---------------------------------------------------------------------
  // Product quantization (PQ) — compressed-domain ANN (Jegou et al. 2011,
  // "Product Quantization for Nearest Neighbor Search").
  //
  // The 100 TB story: a 768-dim float corpus is ~3 KB/vector; PQ stores
  // `m` small sub-space code indices instead (m bytes at k<=256), a
  // 100-750x memory/scan-bandwidth reduction. Scoring a candidate is m
  // table lookups (ADC — asymmetric distance computation) instead of a
  // d-wide dot product, and both the codebooks and the per-query lookup
  // tables are kilobyte-scale broadcasts, so the scan stays narrow:
  // no shuffle until the final per-query top-k.
  // ---------------------------------------------------------------------

  /**
   * PQ model: `codebooks(mi)(j)` = centroid `j` of subspace `mi`, each of
   * length `subDim`. Tiny (m*k*subDim doubles — e.g. 8*16*8 = 1 KiB),
   * so it rides the plan as literal arrays: encoding and scoring need no
   * join against a codebook table.
   */
  final case class PqModel(subDim: Int,
      codebooks: IndexedSeq[IndexedSeq[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
  }

  /** L2-normalize `vecCol` in place (unit vectors make inner product ==
    * cosine, the standard PQ-for-cosine preparation). Norm is
    * materialized once per row before the element-wise divide. */
  def normalized(df: DataFrame, vecCol: String): DataFrame =
    kernels(df).withColumn("__n", norm(col(vecCol)))
      .withColumn(vecCol, transform(col(vecCol), x => x / col("__n")))
      .drop("__n")

  /**
   * Driver-local seeded Lloyd's k-means over a BOUNDED training sample.
   * Codebook/centroid training needs a sample, not the corpus — the
   * distributed halves of every index here sample via `trainMod`
   * (deterministic hash of vec_id), so the collected set stays small by
   * construction and the fit is pure local arithmetic: no per-iteration
   * Spark jobs (an ML-pipeline fit pays tens of scheduler round-trips
   * per codebook; a PQ index trains m+1 codebooks). Fully deterministic
   * AND partitioning-independent: init is maximin (farthest-point)
   * seeding from the point with the smallest seeded id-hash — the
   * deterministic cousin of k-means++ (one centroid lands per natural
   * cluster before any splitting happens), ties on id; Lloyd's from a
   * fixed init over the id-sorted sample is fully order-pinned. An
   * engine re-derives identical codebooks from the same (sample, seed)
   * regardless of cluster layout — a distributed seeded fit cannot
   * promise that.
   */
  def localKmeans(points: IndexedSeq[(Long, Array[Double])], k: Int,
      iters: Int, seed: Long): IndexedSeq[Array[Double]] = {
    require(points.nonEmpty, "empty training sample")
    val dim = points.head._2.length
    def mix(x: Long): Long = {
      var h = x * 0x9E3779B97F4A7C15L + seed
      h = (h ^ (h >>> 32)) * 0xBF58476D1CE4E5B9L
      h ^ (h >>> 29)
    }
    val sorted = points.sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    // maximin init: start from the smallest-hash point, then repeatedly
    // take the point FARTHEST from its nearest chosen centroid (ties on
    // id) — deterministic k-means++-style spread
    val kk = math.min(k, points.length)
    val first = points.minBy { case (id, _) => (mix(id), id) }._2
    val init = scala.collection.mutable.ArrayBuffer(first.clone())
    val minD = Array.fill(sorted.length)(Double.MaxValue)
    while (init.length < kk) {
      var bi = 0; var bd = -1.0
      var i = 0
      while (i < sorted.length) {
        val d = math.min(minD(i), d2(sorted(i)._2, init.last))
        minD(i) = d
        if (d > bd) { bd = d; bi = i }
        i += 1
      }
      init += sorted(bi)._2.clone()
    }
    var cents: IndexedSeq[Array[Double]] = init.toIndexedSeq
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      // assignment order irrelevant: per-cluster sums commute exactly
      // only if summed in a fixed order — iterate the id-sorted sample
      sorted.foreach { case (_, x) =>
        var best = 0; var bd = Double.MaxValue; var j = 0
        while (j < kk) {
          var d = 0.0; var i = 0
          val c = cents(j)
          while (i < dim) { val t = x(i) - c(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = j }
          j += 1
        }
        var i = 0
        val s = sums(best)
        while (i < dim) { s(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cents = (0 until kk).map { j =>
        if (counts(j) == 0) cents(j) // empty cluster keeps its centroid
        else sums(j).map(_ / counts(j))
      }
      it += 1
    }
    cents
  }

  /** Hard ceiling on rows collected to the driver for codebook /
    * centroid training. The `trainMod` ratio alone scales the sample
    * WITH the corpus (100× corpus → 100× driver rows → OOM); the
    * absolute cap keeps driver memory constant at any corpus size.
    * 65536 × ~1 KB vectors ≈ 64 MB — ample for k-means quality. */
  val MaxTrain = 65536

  /** Collect the deterministic hash-sample as (vec_id, vector) pairs —
    * the bounded local training set. The sample is the first `maxTrain`
    * rows in (xxhash64(vec_id), vec_id) order — deterministic,
    * partitioning-independent, and executed as a distributed top-k
    * (TakeOrdered), so at most `maxTrain` rows ever reach the driver. */
  private[graft] def collectSample(corpus: DataFrame, vecCol: String,
      trainMod: Int, maxTrain: Int = MaxTrain): IndexedSeq[(Long, Array[Double])] =
    samplePlan(corpus, vecCol, trainMod, maxTrain)
      .collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** The capped sample plan, exposed for plan pinning: PlanSpec asserts
    * the GlobalLimit sits above the scan so the collect is a bounded
    * top-k, never a full-corpus materialization. */
  private[graft] def samplePlan(corpus: DataFrame, vecCol: String,
      trainMod: Int, maxTrain: Int = MaxTrain): DataFrame = {
    val sample =
      if (trainMod <= 1) corpus
      else corpus.where(pmod(xxhash64(col("vec_id")), lit(trainMod)) === 0)
    sample.select(col("vec_id").cast("long"), col(vecCol))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(maxTrain)
  }

  /** Per-subspace codebooks over a local sample (shared by [[pqTrain]]
    * and the residual stage of [[ivfPqBuild]]). */
  private def trainBooks(pts: IndexedSeq[(Long, Array[Double])],
      m: Int, k: Int, seed: Long): PqModel = {
    val dim = pts.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { mi =>
      val sliced = pts.map { case (id, x) =>
        (id, java.util.Arrays.copyOfRange(x, mi * subDim, (mi + 1) * subDim))
      }
      localKmeans(sliced, k, iters = 10, seed = seed + mi)
    }
    PqModel(subDim, books)
  }

  /**
   * Train per-subspace codebooks: `m` independent seeded k-means fits,
   * each over the `subDim`-wide slice of the (normalized) vectors.
   * Training cost is bounded at scale by fitting on a deterministic
   * hash-sample of the corpus (`trainMod` > 1 keeps every vec_id with
   * xxhash64(vec_id) % trainMod == 0) — codebook quality needs a sample,
   * not the corpus. The fit itself is [[localKmeans]]: local, seeded,
   * partitioning-independent.
   */
  def pqTrain(corpus: DataFrame, vecCol: String = "embedding",
      m: Int = 8, k: Int = 16, seed: Long = 42L, trainMod: Int = 1): PqModel =
    trainBooks(collectSample(corpus, vecCol, trainMod), m, k, seed)

  /** Nearest-codebook-entry index for one subspace slice: a single
    * `aggregate` pass over the centroid literals (argmin of
    * ||c_j||^2 - 2 s.c_j — the ||s||^2 term is constant over j, so it
    * never needs computing). One pass, no duplicated distance subtree. */
  private def argminCode(sliceCol: Column,
      book: IndexedSeq[Array[Double]]): Column = {
    val norms = typedlit(book.map(c => c.map(x => x * x).sum))
    val cents = typedlit(book.map(_.toIndexedSeq))
    aggregate(
      sequence(lit(0), lit(book.length - 1)),
      struct(lit(-1).cast("int").as("j"), lit(Double.MaxValue).as("d")),
      (acc, j) => {
        val ji = j.cast("int")
        val d = element_at(norms, ji + 1) -
          lit(2.0) * dot(sliceCol, element_at(cents, ji + 1))
        when(d < acc.getField("d"), struct(ji.as("j"), d.as("d"))).otherwise(acc)
      },
      acc => acc.getField("j"))
  }

  /**
   * Encode each vector as `m` codebook indices (`codes` array<int>).
   * Entirely narrow: slices are materialized once per row, each code is
   * one argmin fold over the broadcast-as-literal codebook — no join,
   * no shuffle, safe to fuse into any downstream scan.
   */
  def pqEncode(corpus: DataFrame, model: PqModel,
      vecCol: String = "embedding"): DataFrame = {
    val sliced = (0 until model.m).foldLeft(kernels(corpus)) { (df, mi) =>
      df.withColumn(s"__s$mi",
        slice(col(vecCol), mi * model.subDim + 1, model.subDim))
    }
    val codes = (0 until model.m).map(mi =>
      argminCode(col(s"__s$mi"), model.codebooks(mi)))
    sliced.withColumn("codes", array(codes: _*))
      .drop((0 until model.m).map(mi => s"__s$mi"): _*)
  }

  /**
   * ADC top-k over PQ codes: each query precomputes an m x k lookup
   * table of partial inner products against the codebook (a few KiB,
   * broadcast with the query set); scoring a corpus row is then
   * `sum(lut(mi)(codes(mi)))` — m table lookups via one `zip_with` +
   * `aggregate`, never touching the raw vectors. On normalized input
   * the ADC score approximates cosine. The only shuffle is the final
   * per-query top-k.
   *
   * `rerank > 0` adds the standard exact re-rank stage (ADC+R): the ADC
   * scan keeps a per-query shortlist of `rerank` candidates, whose RAW
   * vectors are then fetched (a join on vec_id — queries x rerank rows,
   * tiny) and scored exactly. Recall@k of the result equals ADC
   * recall@rerank, at the cost of `rerank` exact dot products per query
   * — the compressed scan still never touches the raw corpus.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, model: PqModel, k: Int,
      excludeSelf: Boolean = true, rerank: Int = 0): DataFrame =
    pqTopKFromCodes(pqEncode(corpus, model).select("vec_id", "codes"),
      corpus, queries, model, k, excludeSelf, rerank)

  /** [[pqTopK]] over PRE-MATERIALIZED codes — the production shape: the
    * m-byte codes are encoded once at ingest and stored beside the
    * table; a query scans only the stored codes (plus `rerank` raw
    * fetches). */
  def pqTopKFromCodes(enc: DataFrame, corpus: DataFrame, queries: DataFrame,
      model: PqModel, k: Int, excludeSelf: Boolean = true,
      rerank: Int = 0): DataFrame = {
    val luts = (0 until model.m).map { mi =>
      val s = slice(col("query_vec"), mi * model.subDim + 1, model.subDim)
      transform(typedlit(model.codebooks(mi).map(_.toIndexedSeq)), c => dot(s, c))
    }
    val q = kernels(queries).withColumn("lut", array(luts: _*))
      .select("query_id", "lut")
    val scored = enc.crossJoin(broadcast(q))
      .where(if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .select(col("query_id"), col("vec_id"),
        aggregate(
          zip_with(col("codes"), col("lut"), (c, t) => element_at(t, c + 1)),
          lit(0.0), (a, b) => a + b).as("adc"))
    val w = Window.partitionBy("query_id").orderBy(col("adc").desc, col("vec_id"))
    val shortlist = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= math.max(k, rerank))
    if (rerank <= 0)
      shortlist.where(col("rank") <= k)
        .select("query_id", "vec_id", "adc", "rank")
    else exactRerank(shortlist, corpus, queries, k)
  }

  /** Exact cosine re-rank of a (query_id, vec_id) shortlist: fetch the
    * raw vectors for the queries x shortlist rows (tiny) and re-score
    * exactly — the standard ADC+R second stage. */
  private def exactRerank(shortlist: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val cn = kernels(corpus)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("_cn"))
    val qn = kernels(queries)
      .select(col("query_id"), col("query_vec"), norm(col("query_vec")).as("_qn"))
    val exact = shortlist.select("query_id", "vec_id")
      .join(cn, Seq("vec_id"))
      .join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosPre(col("query_vec"), col("embedding"), col("_qn"), col("_cn")).as("cos"))
    val rw = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    exact.withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /**
   * IVFADC (Jegou et al. 2011 §IV, the FAISS `IVFx,PQy` index): the
   * coarse k-means quantizer splits the corpus into `nLists` posting
   * lists, and each vector stores the PQ code of its RESIDUAL
   * (x - coarse centroid) — residuals are smaller than raw vectors, so
   * the same codebook budget quantizes them more finely. A query probes
   * its `nProbe` closest lists; within a probed list the approximate
   * squared L2 distance decomposes into three broadcast-resolvable
   * terms:
   *
   *   ||q - (c_l + r_x)||^2 = ||q - c_l||^2 - 2 (q - c_l).r_x + ||r_x||^2
   *
   * term 1 is per (query, probed list); term 2 is `m` lookups in the
   * per-(query, list) ADC table of the query residual; term 3 is `m`
   * lookups in the static codeword-norm table (subspaces are disjoint
   * coordinates, so cross-subspace terms vanish exactly).
   *
   * Scale shape: candidate volume ~ nProbe/nLists of the corpus, each
   * candidate scored by 2m table lookups on its m-byte code — the raw
   * corpus is touched only by the optional exact re-rank on the final
   * shortlist. Probes (with their LUTs) broadcast; the only shuffle is
   * the per-query top-k.
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, m: Int = 16, pqK: Int = 32,
      seed: Long = 42L, rerank: Int = 0): DataFrame =
    ivfPqQuery(corpus, queries,
      ivfPqBuild(corpus, nLists = nLists, m = m, pqK = pqK, seed = seed),
      k, nProbe = nProbe, rerank = rerank)

  /** The trained halves of an IVFADC index: the coarse quantizer's
    * centroids and the residual PQ codebooks. Training is the expensive
    * build step; the index itself is kilobytes and reusable across
    * query batches (the residual encode is a narrow recompute). */
  final case class IvfPqIndex(
      coarse: IndexedSeq[Array[Double]], model: PqModel)

  /** Train the IVFADC index: coarse k-means over the vectors, then PQ
    * codebooks over the coarse residuals. `trainMod > 1` fits both
    * stages on a deterministic hash-sample (codebooks need a sample,
    * not the corpus — the bounded-training-cost knob for 100 TB); the
    * whole build is ONE sample collect + [[localKmeans]] fits, no
    * per-iteration distributed jobs. */
  def ivfPqBuild(corpus: DataFrame, nLists: Int = 16, m: Int = 16,
      pqK: Int = 32, seed: Long = 42L, trainMod: Int = 1): IvfPqIndex = {
    val pts = collectSample(corpus, "embedding", trainMod)
    val coarse = localKmeans(pts, nLists, iters = 10, seed = seed)
    val dim = pts.head._2.length
    val resid = pts.map { case (id, x) =>
      var best = 0; var bd = Double.MaxValue; var j = 0
      while (j < coarse.length) {
        var d = 0.0; var i = 0
        val c = coarse(j)
        while (i < dim) { val t = x(i) - c(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = j }
        j += 1
      }
      val c = coarse(best)
      (id, Array.tabulate(dim)(i => x(i) - c(i)))
    }
    IvfPqIndex(coarse, trainBooks(resid, m, pqK, seed))
  }

  /** Coarse-list assignment as a pure expression: argmin_j of
    * ||c_j||^2 - 2 x.c_j (the ||x||^2 term is constant over j) — the
    * same fold as [[argminCode]], against the broadcast-as-literal
    * coarse centroids. Narrow, codegen'd, no ML pipeline pass. */
  private def coarseAssign(vecCol: Column, coarse: IndexedSeq[Array[Double]]): Column =
    argminCode(vecCol, coarse)

  /** Residual-encode the corpus against an [[IvfPqIndex]]:
    * (vec_id, list_id, codes) — the rows a production deployment stores
    * beside the table at ingest. */
  def ivfPqEncode(corpus: DataFrame, index: IvfPqIndex): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = index.coarse.zipWithIndex
      .map { case (v, i) => (i, v.toIndexedSeq) }.toDF("list_id", "centroid")
    val assigned = kernels(corpus)
      .withColumn("list_id", coarseAssign(col("embedding"), index.coarse))
    // residual encode: r = x - c_list, PQ-coded with shared codebooks
    val resid = assigned.join(broadcast(centDf), Seq("list_id"))
      .withColumn("embedding", zip_with(col("embedding"), col("centroid"), _ - _))
      .drop("centroid")
    pqEncode(resid, model = index.model).select("vec_id", "list_id", "codes")
  }

  /** Query an [[IvfPqIndex]]: residual-encode the corpus (narrow), probe,
    * ADC-score, optional exact re-rank. See [[ivfPqTopK]] for the math. */
  def ivfPqQuery(corpus: DataFrame, queries: DataFrame, index: IvfPqIndex,
      k: Int, nProbe: Int = 4, rerank: Int = 0): DataFrame =
    ivfPqQueryFromCodes(ivfPqEncode(corpus, index), corpus, queries, index,
      k, nProbe, rerank)

  /** [[ivfPqQuery]] over PRE-MATERIALIZED (vec_id, list_id, codes) rows. */
  def ivfPqQueryFromCodes(encoded: DataFrame, corpus: DataFrame,
      queries: DataFrame, index: IvfPqIndex, k: Int, nProbe: Int = 4,
      rerank: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = index.model
    val centDf = index.coarse.zipWithIndex
      .map { case (v, i) => (i, v.toIndexedSeq) }.toDF("list_id", "centroid")
    val codeNorms = typedlit(model.codebooks.map(_.map(cw => cw.map(x => x * x).sum).toIndexedSeq))

    // probe ranking per query (L2 to coarse centroids), then per-probe
    // residual LUTs — everything on the broadcast-bound query side
    val q = kernels(queries).withColumn("_qn", norm(col("query_vec")))
    val probeW = Window.partitionBy("query_id").orderBy(col("_cd"), col("list_id"))
    val probes0 = q.crossJoin(broadcast(centDf))
      .withColumn("_cd",
        norm(col("centroid")) * norm(col("centroid")) -
          lit(2.0) * dot(col("query_vec"), col("centroid")))
      .withColumn("_pr", row_number().over(probeW))
      .where(col("_pr") <= nProbe)
      .withColumn("qres", zip_with(col("query_vec"), col("centroid"), _ - _))
    val luts = (0 until model.m).map { mi =>
      val s = slice(col("qres"), mi * model.subDim + 1, model.subDim)
      transform(typedlit(model.codebooks(mi).map(_.toIndexedSeq)), cw => dot(s, cw))
    }
    val probes = probes0
      .withColumn("term1", dot(col("qres"), col("qres")))
      .withColumn("lut", array(luts: _*))
      .select("query_id", "list_id", "term1", "lut")

    val scored = encoded.join(broadcast(probes), Seq("list_id"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (col("term1")
          - lit(2.0) * aggregate(
              zip_with(col("codes"), col("lut"), (ci, t) => element_at(t, ci + 1)),
              lit(0.0), (a, b) => a + b)
          + aggregate(
              zip_with(col("codes"), codeNorms, (ci, t) => element_at(t, ci + 1)),
              lit(0.0), (a, b) => a + b)).as("dist2"))
    val w = Window.partitionBy("query_id").orderBy(col("dist2"), col("vec_id"))
    val shortlist = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= math.max(k, rerank))
    if (rerank <= 0)
      shortlist.where(col("rank") <= k)
        .select("query_id", "vec_id", "dist2", "rank")
    else exactRerank(shortlist, corpus, queries, k)
  }

  // -------------------------------------------------------------------
  // Integer-parity IVF / PQ / IVFADC twins (the [[quantizedTopK]] /
  // [[sqTopK]] device extended to the clustered indexes): deterministic
  // integer training — seed partition `vec_id % k`, ONE Lloyd step with
  // floor-division centroids — plus exact int64 assignment, probing, and
  // ADC scoring, so an external engine replays the ENTIRE
  // train → assign → probe → score → rank pipeline bit-for-bit in pure
  // integer SQL. These certify the index *machinery*; the float
  // production paths ([[ivfTopK]], [[pqTopKFromCodes]],
  // [[ivfPqQueryFromCodes]]) carry recall contracts instead (k-means on
  // float samples is not cross-engine replayable).
  // -------------------------------------------------------------------

  /** `floor(x·scale + 0.5)` integer micro-unit quantization (the
    * round-half-up spelling Spark and DuckDB agree on bit-for-bit). */
  private def qzArr(v: Column, scale: Int): Column =
    transform(v, x => floor(x.cast("double") * scale + lit(0.5)).cast("long"))

  /** Exact int64 squared L2 distance between two quantized vectors. */
  private def iD2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Exact int64 inner product of two quantized vectors. */
  private def iDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** Shift keeping floor-division numerators non-negative: truncating
    * (Spark `div`) and flooring (DuckDB `//`) integer division only
    * agree on non-negative operands, and centroid component sums can be
    * negative. 1e12 dominates any micro-unit component; counts × 1e12
    * stay far under Long.MaxValue. */
  private val DivOffset = 1000000000000L

  /** One-Lloyd-step deterministic integer centroids: seed partition
    * `vec_id % nLists`, per-dimension mean by offset floor-division.
    * Returns (list_id, centroid array<long>). One distributed agg pass;
    * nLists × dim rows — control-plane sized at any corpus scale. */
  private def intSeedCentroids(qv: DataFrame, nLists: Int,
      vecCol: String): DataFrame =
    qv.select((col("vec_id") % nLists).cast("int").as("list_id"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("list_id", "pos")
      .agg(sum("v").as("_s"), count(lit(1)).as("_n"))
      .withColumn("c", expr(s"(_s + _n * ${DivOffset}L) div _n - ${DivOffset}L"))
      .groupBy("list_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))

  /**
   * Integer-parity IVF top-k: quantize, train coarse centroids by the
   * seed+one-step device, assign every vector to its nearest centroid
   * (exact int64 L2, ties to the smaller list), probe each query's
   * `nProbe` nearest lists, rank in-list candidates by exact int64
   * inner product with vec_id tie-break. Scale shape identical to
   * [[ivfTopK]]: centroids and probes broadcast, candidate volume
   * ~ nProbe/nLists of the corpus, one final per-query top-k window.
   */
  def ivfIntTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 8, nProbe: Int = 2, scale: Int = 10000): DataFrame = {
    val qc = corpus.select(col("vec_id"), qzArr(col("embedding"), scale).as("_qe"))
    val qq = queries.select(col("query_id"), qzArr(col("query_vec"), scale).as("_qq"))
    val cents = intSeedCentroids(qc, nLists, "_qe")
    val aw = Window.partitionBy("vec_id").orderBy(col("_d"), col("list_id"))
    val assigned = qc.crossJoin(broadcast(cents))
      .withColumn("_d", iD2(col("_qe"), col("centroid")))
      .withColumn("_r", row_number().over(aw))
      .where(col("_r") === 1)
      .select(col("vec_id"), col("_qe"), col("list_id"))
    val pw = Window.partitionBy("query_id").orderBy(col("_d"), col("list_id"))
    val probes = qq.crossJoin(broadcast(cents))
      .withColumn("_d", iD2(col("_qq"), col("centroid")))
      .withColumn("_r", row_number().over(pw))
      .where(col("_r") <= nProbe)
      .select(col("query_id"), col("_qq"), col("list_id"))
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        iDot(col("_qe"), col("_qq")).as("iscore"))
    val w = Window.partitionBy("query_id").orderBy(col("iscore").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "iscore", "rank")
  }

  /**
   * Integer-parity LSH top-k: sign-random-projection buckets whose
   * hyperplanes derive from the md5 device (`r(b,d) = md5int("lsh:b:d")
   * mod 2001 − 1000` — the same cross-engine hash spelling the
   * minhash-parity entry uses), bits from exact int64 projection sums,
   * `nBits/bandBits` bucket bands, candidates from band-equality joins
   * only, exact int64 inner-product ranking. The whole
   * sketch → bucket → verify pipeline replays in pure integer SQL. The
   * float production path ([[lshTopK]], xxhash-seeded kernels) keeps its
   * recall contract.
   */
  /** md5-device integer hyperplanes: `r(b,d) = md5int("lsh:b:d") mod
    * 2001 − 1000`, replayable by any engine with md5. */
  private def md5Proj(nBits: Int, dim: Int): IndexedSeq[IndexedSeq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sKey: String): Long = {
      val hex = md.digest(sKey.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    (0 until nBits).map(b => (0 until dim).map(d => h(s"lsh:$b:$d") % 2001L - 1000L))
  }

  /** Band bucket values from exact int64 sign bits of the md5
    * hyperplane projections: one Column per band of `bandBits` bits. */
  private def md5Bands(vec: Column, proj: IndexedSeq[IndexedSeq[Long]],
      bandBits: Int): Seq[Column] = {
    val bits = proj.indices.map { b =>
      val s = aggregate(zip_with(vec, typedLit(proj(b)), _ * _), lit(0L), _ + _)
      when(s > 0L, lit(1)).otherwise(lit(0))
    }
    (0 until proj.size / bandBits).map { g =>
      (0 until bandBits).map(p => bits(g * bandBits + p) * lit(1 << p))
        .reduce(_ + _)
    }
  }

  def lshIntTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 16, bandBits: Int = 4, scale: Int = 10000,
      dim: Int = 64): DataFrame = {
    // `dim` must match the embedding width: a shorter projection would
    // zip_with into nulls and silently zero every sign bit
    val proj = md5Proj(nBits, dim)
    val qc = corpus.select(col("vec_id"), qzArr(col("embedding"), scale).as("_qe"))
    val qq = queries.select(col("query_id"), qzArr(col("query_vec"), scale).as("_qq"))
    def banded(df: DataFrame, vc: String, idc: String): DataFrame =
      df.select(col(idc), posexplode(array(md5Bands(col(vc), proj, bandBits): _*))
        .as(Seq("band_id", "bv")))
    val cb = banded(qc, "_qe", "vec_id")
    val qb = banded(qq, "_qq", "query_id")
    val cand = cb.join(broadcast(qb), Seq("band_id", "bv"))
      .where(col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id").distinct()
    val scored = cand
      .join(qc, Seq("vec_id"))
      .join(broadcast(qq), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        iDot(col("_qe"), col("_qq")).as("iscore"))
    val w = Window.partitionBy("query_id").orderBy(col("iscore").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "iscore", "rank")
  }

  /**
   * Embedding near-duplicate pairs with FULLY REPLAYABLE candidates:
   * md5-hyperplane band buckets (the [[lshIntTopK]] device) generate the
   * candidate pairs, the exact float cosine (double, the proven
   * cross-engine round-5 device) verifies the threshold — so unlike the
   * xxhash-bucketed [[cosineNearDups]] production path (certified by its
   * recall contract), every candidate AND every verdict of this leg sits
   * under the oracle. Same scale shape: band-equality self-joins only,
   * hot buckets capped, no all-pairs product.
   */
  def cosineNearDupsParity(corpus: DataFrame, threshold: Double,
      nBits: Int = 16, bandBits: Int = 4, scale: Int = 10000,
      maxBucket: Int = 10000, dim: Int = 64): DataFrame = {
    // `dim` must match the embedding width (see lshIntTopK)
    val proj = md5Proj(nBits, dim)
    val qc = corpus.select(col("vec_id"), qzArr(col("embedding"), scale).as("_qe"))
    val banded = Dedup.capBuckets(
      qc.select(col("vec_id"),
        posexplode(array(md5Bands(col("_qe"), proj, bandBits): _*))
          .as(Seq("band_id", "bv"))),
      Seq("band_id", "bv"), maxBucket)
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band_id") === col("b.band_id") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val withNorm = kernels(corpus).withColumn("_n", norm(col("embedding")))
    val av = withNorm.select(col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("_n").as("n_a"))
    val bv = withNorm.select(col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("_n").as("n_b"))
    cand.join(av, "vec_a").join(bv, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosPre(col("emb_a"), col("emb_b"), col("n_a"), col("n_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Per-(vector, subspace) quantized sub-vectors: (vec_id, s, sub). */
  private def intSubVectors(qv: DataFrame, subDim: Int,
      vecCol: String): DataFrame =
    qv.select(col("vec_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .withColumn("s", expr(s"pos div $subDim").cast("int"))
      .groupBy("vec_id", "s")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        x => x.getField("v")).as("sub"))

  /** Seed+one-step integer codebooks per subspace: (s, j, centroid). */
  private def intSubCodebooks(subs: DataFrame, ksub: Int): DataFrame =
    subs.select(col("s"), (col("vec_id") % ksub).cast("int").as("j"),
        posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy("s", "j", "pos")
      .agg(sum("v").as("_s"), count(lit(1)).as("_n"))
      .withColumn("c", expr(s"(_s + _n * ${DivOffset}L) div _n - ${DivOffset}L"))
      .groupBy("s", "j")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))

  /** Nearest-codebook-entry codes (exact int64 L2, ties to smaller j):
    * (vec_id, s, code). */
  private def intEncode(subs: DataFrame, books: DataFrame): DataFrame = {
    val ew = Window.partitionBy("vec_id", "s").orderBy(col("_d"), col("j"))
    subs.join(broadcast(books), Seq("s"))
      .withColumn("_d", iD2(col("sub"), col("centroid")))
      .withColumn("_r", row_number().over(ew))
      .where(col("_r") === 1)
      .select(col("vec_id"), col("s"), col("j").as("code"))
  }

  /**
   * Integer-parity PQ ADC top-k: quantize, train per-subspace integer
   * codebooks (seed+one-step), encode every vector as `m` codes, score
   * query × candidate by the ADC lookup sum Σ_s dot(q_sub, book(s,
   * code)) — exact int64 throughout, no rerank stage, so the ENTIRE
   * compressed-domain ranking sits under the oracle. Scale shape
   * identical to [[pqTopKFromCodes]]: the query LUT (queries × m × ksub
   * partial dots) broadcasts; the scan touches only stored codes.
   */
  def pqIntTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 4, dim: Int = 64, scale: Int = 10000): DataFrame = {
    val subDim = dim / m
    val qc = corpus.select(col("vec_id"), qzArr(col("embedding"), scale).as("_qe"))
    val qq = queries.select(col("query_id").as("vec_id"),
      qzArr(col("query_vec"), scale).as("_qq"))
    val subs = intSubVectors(qc, subDim, "_qe")
    val books = intSubCodebooks(subs, ksub)
    val codes = intEncode(subs, books)
    val qdots = intSubVectors(qq, subDim, "_qq")
      .join(broadcast(books), Seq("s"))
      .select(col("vec_id").as("query_id"), col("s"), col("j"),
        iDot(col("sub"), col("centroid")).as("_qd"))
    val adc = codes.as("c").join(
        broadcast(qdots).as("d"),
        col("d.s") === col("c.s") && col("d.j") === col("c.code"))
      .where(col("d.query_id") =!= col("c.vec_id"))
      .groupBy(col("d.query_id").as("query_id"), col("c.vec_id").as("vec_id"))
      .agg(sum(col("d._qd")).as("iscore"))
    val w = Window.partitionBy("query_id").orderBy(col("iscore").desc, col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "iscore", "rank")
  }

  /**
   * Integer-parity IVFADC top-k: coarse integer IVF ([[ivfIntTopK]]'s
   * device) + per-subspace integer codebooks trained on the RESIDUALS
   * r = q − c_list (the Jegou et al. 2011 §IV residual encoding), inner
   * -product scored as dot(q, c_list) + Σ_s dot(q_sub, book(s, code)) —
   * the exact IVFADC decomposition, every term int64. The coarse term
   * and the query LUT broadcast; candidates come only from probed lists.
   */
  def ivfPqIntTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 8, nProbe: Int = 2, m: Int = 8, ksub: Int = 4,
      dim: Int = 64, scale: Int = 10000): DataFrame = {
    val subDim = dim / m
    val qc = corpus.select(col("vec_id"), qzArr(col("embedding"), scale).as("_qe"))
    val qq = queries.select(col("query_id"), qzArr(col("query_vec"), scale).as("_qq"))
    val cents = intSeedCentroids(qc, nLists, "_qe")
    val aw = Window.partitionBy("vec_id").orderBy(col("_d"), col("list_id"))
    val assigned = qc.crossJoin(broadcast(cents))
      .withColumn("_d", iD2(col("_qe"), col("centroid")))
      .withColumn("_r", row_number().over(aw))
      .where(col("_r") === 1)
      .select(col("vec_id"), col("_qe"), col("list_id"), col("centroid"))
    val resid = assigned.select(col("vec_id"),
      zip_with(col("_qe"), col("centroid"), _ - _).as("_re"),
      col("list_id"))
    val subs = intSubVectors(resid.select(col("vec_id"), col("_re")), subDim, "_re")
    val books = intSubCodebooks(subs, ksub)
    val codes = intEncode(subs, books)
    val pw = Window.partitionBy("query_id").orderBy(col("_d"), col("list_id"))
    val probes = qq.crossJoin(broadcast(cents))
      .withColumn("_d", iD2(col("_qq"), col("centroid")))
      .withColumn("_r", row_number().over(pw))
      .where(col("_r") <= nProbe)
      .select(col("query_id"), col("_qq"), col("list_id"),
        iDot(col("_qq"), col("centroid")).as("term1"))
    val qdots = intSubVectors(
        probes.select(col("query_id").as("vec_id"), col("_qq")).distinct(),
        subDim, "_qq")
      .join(broadcast(books), Seq("s"))
      .select(col("vec_id").as("query_id"), col("s"), col("j"),
        iDot(col("sub"), col("centroid")).as("_qd"))
    val cand = assigned.select("vec_id", "list_id")
      .join(broadcast(probes.select("query_id", "list_id", "term1")), Seq("list_id"))
      .where(col("query_id") =!= col("vec_id"))
    val adc = cand.join(codes, Seq("vec_id"))
      .join(broadcast(qdots), Seq("query_id", "s"))
      .where(col("j") === col("code"))
      .groupBy("query_id", "vec_id")
      .agg((first(col("term1")) + sum(col("_qd"))).as("iscore"))
    val w = Window.partitionBy("query_id").orderBy(col("iscore").desc, col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "iscore", "rank")
  }
}
