package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark shuffles partition data across executors"),
    (1L, "spark partition pruning skips parquet files"),
    (2L, "cats purr and dogs bark all day long"),
    (3L, "partition data layout drives shuffle cost in spark"),
    (4L, "unrelated culinary text about baking sourdough bread"))
    .toDF("doc_id", "text")

  test("bm25PerQuery ranks per query, excludes self, starts ranks at 1") {
    val queries = Seq(
      (0L, "spark partition data"),
      (2L, "dogs bark"),
      (1L, "shuffle cost")).toDF("query_id", "text")
    val got = Retrieval.bm25PerQuery(corpus, col("doc_id"), col("text"),
        queries, k = 5)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect()
    val byQuery = got.groupBy(_._1)
    // self never appears in its own result list
    assert(!got.exists { case (q, d, _) => q == d })
    // queries with hits produce an independent ranking starting at 1
    assert(byQuery(0L).map(_._3).min === 1)
    assert(byQuery(1L).map(_._3).min === 1)
    // query 0 ("spark partition data"): doc 3 carries all three terms,
    // doc 1 carries two -- doc 3 must outrank the culinary doc 4
    val q0 = byQuery(0L).sortBy(_._3).map(_._2).toSeq
    assert(q0.head === 3L)
    assert(!q0.take(2).contains(4L))
    // query 2 ("dogs bark"): the ONLY doc containing those terms is
    // doc 2 itself, which self-exclusion removes -- zero result rows,
    // not a rank list padded with zero-score docs
    assert(!byQuery.contains(2L))
    // query 1 ("shuffle cost"): doc 3 mentions both words
    assert(byQuery(1L).sortBy(_._3).map(_._2).head === 3L)
  }

  test("bm25PerQuery matches the single-query bm25TopK scores") {
    // one query whose distinct tokens equal the explicit term set:
    // the per-(doc, term) contribution table is identical, so per-doc
    // score_u must agree exactly (both floor to micro-units before
    // summing).
    val qText = "spark partition"
    val single = TextAnalysis.bm25TopK(corpus, col("doc_id"), col("text"),
        Seq("spark", "partition").toDF("term"), k = 10)
      .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
    val multi = Retrieval.bm25PerQuery(corpus, col("doc_id"), col("text"),
        Seq((99L, qText)).toDF("query_id", "text"), k = 10,
        excludeSelf = false)
      .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
    assert(multi === single)
  }

  test("rrfFuse: exact micro-unit arithmetic, missing legs, tie-break") {
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 11L, 1), (0L, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, dense, k = 10)
      .select("doc_id", "lex_rank", "dense_rank", "rrf_u", "rank")
      .as[(Long, Option[Int], Option[Int], Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    def c(r: Int): Long = 1000000L / (60 + r)
    // doc 11 is in both legs: rank 2 lexical + rank 1 dense
    assert(got(11L)._4 === c(2) + c(1))
    // docs present in one leg only contribute once, with the other rank null
    assert(got(10L) === ((10L, Some(1), None, c(1), 2)))
    assert(got(13L) === ((13L, None, Some(2), c(2), 3)))
    assert(got(12L)._4 === c(3))
    // doc 11 (two legs) outranks every single-leg doc
    assert(got(11L)._5 === 1)
    // ties (equal rrf_u) break by doc_id: craft two single-leg docs at
    // the same rank on opposite legs
    val tied = Retrieval.rrfFuse(
      Seq((1L, 20L, 1)).toDF("query_id", "doc_id", "rank"),
      Seq((1L, 19L, 1)).toDF("query_id", "doc_id", "rank"), k = 10)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(tied(19L) === 1 && tied(20L) === 2)
  }

  test("rrfFuse keeps only the per-query top k") {
    val lex = (1 to 8).map(r => (0L, 100L + r, r)).toDF("query_id", "doc_id", "rank")
    val dense = (1 to 8).map(r => (0L, 200L + r, r)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, dense, k = 5)
    assert(got.count() === 5L)
    assert(got.agg(max("rank")).as[Int].head() === 5)
  }
}
