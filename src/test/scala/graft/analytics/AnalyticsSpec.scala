package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "completely different words entirely unrelated text here now ok"),
    (3L, "THE  quick   brown fox jumps over the lazy dog"), // exact after normalize
    (4L, "der hund ist nicht ein katze und das haus"))      // german-ish
    .toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates") {
    val got = Dedup.exact(docs, col("doc_id"), regexp_replace(col("text"), "\\s+", " "))
      .where(col("copies") > 1).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("canonical_id") === 0L)
    assert(got.head.getAs[Long]("copies") === 2L)
  }

  test("minhash LSH finds the planted near-duplicate pair") {
    val pairs = Dedup.minHashNearDups(docs, col("doc_id"), col("text"),
      shingleN = 2, k = 16, bands = 8, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("ngram jaccard exact pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), n = 2, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhash: identical docs identical prints; near-dups close in hamming") {
    val fps = Dedup.simHash(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0L), fps(1L)) < ham(fps(0L), fps(2L)))
    // bands=32 (2-bit chunks) keeps banding complete for maxDist up to 31;
    // the planted near-dup pair differs in well under 26 bits.
    val nd = Dedup.simHashNearDups(
      Dedup.simHash(docs, col("doc_id"), col("text")), bands = 32, maxDist = 25)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((0L, 1L)))
    assertThrows[IllegalArgumentException] {
      Dedup.simHashNearDups(Dedup.simHash(docs, col("doc_id"), col("text")), bands = 4, maxDist = 16)
    }
  }

  test("text analysis: tokens, langid, fingerprint invariance") {
    val t = docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(t(0L) === 9)
    val langs = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(langs(0L) === "en")
    assert(langs(4L) === "de")
    val fps = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fps(0L) === fps(3L))   // whitespace/case-insensitive
    assert(fps(0L) !== fps(1L))   // content-sensitive
  }

  test("similarity: brute-force topk ranks the most-similar vector first") {
    val corpus = Seq(
      (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.9, 0.1, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)), (3L, Array(0.0, 0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val got = Similarity.bruteForceTopK(corpus, queries, 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("similarity: LSH topk recall vs brute force on clustered vectors") {
    val corpus = (0 until 50).map { i =>
      val base = if (i % 2 == 0) Array.fill(8)(1.0) else Array.tabulate(8)(j => if (j % 2 == 0) 1.0 else -1.0)
      (i.toLong, base.zipWithIndex.map { case (x, j) => x + 0.01 * ((i * 7 + j) % 5) })
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val bf = Similarity.bruteForceTopK(corpus, queries, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, queries, dim = 8, k = 3, nBits = 8, bands = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf intersect lsh).size >= 4) // >= 2/3 recall on this easy layout
  }

  test("similarity: IVF topk recall vs brute force on clustered vectors") {
    val corpus = (0 until 60).map { i =>
      val base = if (i % 2 == 0) Array.fill(8)(1.0) else Array.tabulate(8)(j => if (j % 2 == 0) 1.0 else -1.0)
      (i.toLong, base.zipWithIndex.map { case (x, j) => x + 0.01 * ((i * 7 + j) % 5) })
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val bf = Similarity.bruteForceTopK(corpus, queries, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3, nLists = 4, nProbe = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // two clean clusters: probing half the lists must find the true cluster
    assert((bf intersect ivf).size >= 4)
  }

  test("multimodal plumbing: batch decode stub produces typed features") {
    implicit val s = spark
    val media = Multimodal.fakeMediaFromText(docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === docs.count())
    assert(feats.forall(f => f.byte_len > 0 && f.width >= 16 && f.height >= 16))
    // determinism
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).toSet === again.map(_.checksum).toSet)
  }
}
