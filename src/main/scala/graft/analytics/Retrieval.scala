package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval for training-data curation: the lexical leg (BM25)
 * and the dense leg (embedding similarity) each rank candidates, and
 * reciprocal-rank fusion (Cormack et al. 2009) merges the two lists
 * without score calibration — the standard recipe for retrieval-based
 * data selection, eval-set mining, and RAG-corpus curation where
 * neither signal alone is trustworthy (lexical misses paraphrase,
 * dense misses rare named entities).
 *
 * Every score in the module is an exact integer: BM25 contributions
 * floor to micro-units at the single floating-point step (the
 * [[TextAnalysis.bm25TopK]] device), the dense leg rides the
 * integer-reconstructed SQ8 dot ([[Similarity.sqTopK]]), and the RRF
 * fold itself is `floor(10^6 / (k + rank))` per leg — so fused ranks
 * are total, aggregation-order-independent, and replayable by the
 * DuckDB oracle end-to-end.
 */
object Retrieval {

  /**
   * Multi-query Okapi BM25 top-k: rank every corpus document against
   * EACH query independently. Queries arrive as `(query_id, text)`;
   * a query's term set is its distinct tokens (binary query-term
   * weighting — the standard Okapi shape, query tf ignored).
   *
   * Scale shape: the per-(doc, term) contribution is query-INDEPENDENT,
   * so it is computed once over the corpus — one explode filtered down
   * to the union of query vocabularies before any shuffle, one
   * (doc, term) count, bounded broadcast stat joins — and only then
   * fans out to queries via a broadcast join on term. Q queries cost
   * one corpus pass + Q broadcast fan-outs, not Q corpus passes. The
   * per-query cut is a rank window over candidate docs (docs sharing
   * ≥1 query term), never a global sort of the corpus.
   */
  def bm25PerQuery(df: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = true): DataFrame = {
    require(k > 0)
    val base = df.select(idCol.as("doc_id"),
      TextAnalysis.tokens(textCol).as("__toks"))
    val dl = base.select(col("doc_id"), size(col("__toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
    val terms = qterms.select("term").distinct()
    val tf = base.select(col("doc_id"), explode(col("__toks")).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contribs = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("__idf",
        log((col("n_docs").cast("double") - col("df") + 0.5) /
          (col("df").cast("double") + 0.5) + 1))
      .withColumn("__contrib_u",
        floor(col("__idf") * (col("tf").cast("double") * lit(k1 + 1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("__avgdl")))
          * 1000000.0).cast("long"))
    val scored = contribs
      .join(broadcast(qterms), Seq("term"))
      .groupBy("query_id", "doc_id").agg(sum("__contrib_u").as("score_u"))
    val filtered =
      if (excludeSelf) scored.where(col("doc_id") =!= col("query_id")) else scored
    val w = Window.partitionBy("query_id").orderBy(col("score_u").desc, col("doc_id"))
    filtered.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "score_u", "rank")
  }

  /**
   * Reciprocal-rank fusion of two per-query rank lists, each
   * `(query_id, doc_id, rank)`: `rrf = Σ_leg 1/(kRrf + rank_leg)`,
   * accumulated in exact micro-units (`floor(10^6/(kRrf+rank))` per
   * leg; a doc absent from a leg contributes 0). `kRrf = 60` is the
   * published default. The fused order is total (`rrf_u` desc,
   * `doc_id`) and engine-reproducible — no float accumulation.
   *
   * Scale shape: both inputs are already top-k cuts (Q×k rows), so the
   * full-outer merge and the per-query rank window run on candidate
   * lists, never the corpus.
   */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int, kRrf: Int = 60): DataFrame = {
    require(k > 0 && kRrf >= 0)
    def leg(df: DataFrame, as: String) =
      df.select(col("query_id"), col("doc_id"), col("rank").as(as))
    def contrib(rank: Column): Column =
      coalesce(floor(lit(1000000L) / (lit(kRrf) + rank)).cast("long"), lit(0L))
    val joined = leg(lex, "lex_rank")
      .join(leg(dense, "dense_rank"), Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_u", contrib(col("lex_rank")) + contrib(col("dense_rank")))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_u").desc, col("doc_id"))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "lex_rank", "dense_rank", "rrf_u", "rank")
  }
}
