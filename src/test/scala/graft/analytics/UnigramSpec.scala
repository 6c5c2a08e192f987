package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat ate the rat"),
    (2L, "concatenation of the catalogue"),
    (3L, "Punct! 123 mixed-CASE the the the"))
    .toDF("doc_id", "text")

  test("seed pieces: substring weights with deterministic tie-break") {
    val top = Unigram.seedPieces(docs, col("text"), maxPieceLen = 4, topK = 5)
      .as[(String, Long)].collect()
    // "the" appears 7x as a word (plus inside no other letter word here),
    // so pieces t/h/e/th/he/the all carry >= 7
    val m = top.toMap
    assert(m("t") >= 7L)
    // weights are non-increasing and ties are lexicographic
    val ws = top.map(_._2)
    assert(ws.sameElements(ws.sortBy(-_)))
    top.sliding(2).foreach {
      case Array((p1, w1), (p2, w2)) => assert(w1 > w2 || (w1 == w2 && p1 < p2))
      case _ => ()
    }
  }

  test("trained vocab keeps every character and respects vocabSize") {
    val vocab = Unigram.learnVocab(docs, col("text"), vocabSize = 30)
    val pieces = vocab.map(_._1).toSet
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+")).filter(_.forall(c => c >= 'a' && c <= 'z'))
      .flatMap(_.toCharArray).map(_.toString).toSet
    chars.foreach(c => assert(pieces.contains(c), s"missing char piece '$c'"))
    assert(vocab.size <= 30 + 0)
    // probabilities normalize: sum of exp(logp) ~ 1
    val z = vocab.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(z - 1.0) < 1e-9)
  }

  test("encoded counts respect the floor/ceiling bounds and beat chars on repeats") {
    val vocab = Unigram.learnVocab(docs, col("text"), vocabSize = 50)
    val enc = Unigram.encodedCount(vocab)
    val got = docs.select(col("doc_id"), enc(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    // doc 0: 6 words, letter chars = 3+3+3+2+3+3 = 17; floor = 6
    assert(got(0L) >= 6 && got(0L) <= 17)
    // "the" is frequent; a trained unigram model should carry it as one
    // piece, so doc 0 encodes strictly below character count
    assert(got(0L) < 17)
    // mixed tokens count 1 each: "punct!" is not pure-letter (the '!')
    val n3 = got(3L)
    assert(n3 >= 1 + 1 + 1 + 3 && n3 <= 1 + 1 + 5 + 9)
  }

  test("training is insensitive to input row order") {
    val a = Unigram.learnVocab(docs, col("text"), vocabSize = 40)
    val b = Unigram.learnVocab(docs.orderBy(col("doc_id").desc), col("text"), vocabSize = 40)
    assert(a === b)
  }
}
