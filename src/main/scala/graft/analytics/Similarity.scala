package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`).
 *
 * Baseline: brute-force cosine top-k — broadcast the (small) query set,
 * score every corpus vector in one narrow pass, per-query top-k via
 * window. Scale path: sign-random-projection LSH buckets
 * (deterministic hyperplanes) so candidate generation is a bucket join
 * instead of a cross product.
 */
object Similarity {

  /** dot(a, b) via zip_with + aggregate (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest corpus
   * vectors. Queries are broadcast (must be small); the corpus is scanned
   * once; per-query top-k is a partial top-k under AQE.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("query_vec"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /**
   * Deterministic hyperplanes for sign-random-projection: component j of
   * plane i is ±1 from a hash of (i, j) — no RNG, identical on every
   * executor and every run.
   */
  private def planeLit(i: Int, dim: Int): Column = {
    val comps = (0 until dim).map { j =>
      val h = scala.util.hashing.MurmurHash3.productHash((i, j))
      if ((h & 1) == 0) 1.0f else -1.0f
    }
    array(comps.map(lit): _*)
  }

  /** `nBits`-bit sign sketch of the embedding column. */
  def signSketch(emb: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(dot(emb, planeLit(i, dim)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /**
   * LSH-bucketed ANN: bucket by sketch band, score only within-bucket
   * candidates. Trades recall for a bucket join that scales linearly.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
      nBits: Int = 16, bands: Int = 4): DataFrame = {
    val width = nBits / bands
    def withBands(df: DataFrame, vecCol: String): DataFrame = {
      val sk = signSketch(col(vecCol), dim, nBits)
      val chunks = (0 until bands).map { b =>
        struct(lit(b).as("band_id"),
          shiftright(sk, b * width).bitwiseAND((1L << width) - 1).as("band"))
      }
      df.withColumn("c", explode(array(chunks: _*)))
        .withColumn("band_id", col("c.band_id"))
        .withColumn("band", col("c.band")).drop("c")
    }
    val cb = withBands(corpus, "embedding")
    val qb = withBands(queries, "query_vec")
    val cand = cb.join(broadcast(qb), Seq("band_id", "band"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("query_vec"), col("embedding"))
      .distinct()
    val scored = cand.select(col("query_id"), col("vec_id"),
      cosine(col("query_vec"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Exact embedding-cosine near-duplicate pairs (all pairs >= threshold)
   *  via self-join — quadratic; the baseline the LSH variant is judged
   *  against. */
  def cosineNearDupsExact(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs (all pairs >= threshold),
   *  LSH-bucketed candidate generation + exact verify. Recall at
   *  cos>=0.4 with the 24-bit/8-band default is ~0.9; more bits/bands
   *  trade compute for recall. */
  def cosineNearDups(corpus: DataFrame, dim: Int, threshold: Double,
      nBits: Int = 24, bands: Int = 8): DataFrame = {
    val width = nBits / bands
    val sk = signSketch(col("embedding"), dim, nBits)
    val chunks = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        shiftright(sk, b * width).bitwiseAND((1L << width) - 1).as("band"))
    }
    val banded = corpus.select(col("vec_id"), col("embedding"),
      explode(array(chunks: _*)).as("c"))
      .select(col("vec_id"), col("embedding"), col("c.band_id"), col("c.band"))
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band_id") === col("b.band_id") && col("a.band") === col("b.band") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("emb_a"), col("b.embedding").as("emb_b"))
      .distinct()
    cand.select(col("vec_a"), col("vec_b"), cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
