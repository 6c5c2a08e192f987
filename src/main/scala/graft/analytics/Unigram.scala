package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword tokenizer training (Kudo 2018, the SentencePiece
 * `unigram` model) — the second trainer in the tokenization family
 * beside BPE ([[TextAnalysis.learnBpeMerges]]).
 *
 * Same scale decomposition as the BPE trainer: the DISTRIBUTED work is
 * the corpus word-frequency pass (one explode + one hash-shuffle count —
 * scales like any vocabulary build) and the seed-piece weighting (a
 * second explode over per-word substrings); the EM loop then runs over
 * the bounded top-`maxWords` frequency table on the driver — bounded
 * driver state by construction, the decomposition every published
 * SentencePiece-style trainer uses (EM statistics are additive over the
 * word-frequency table, so the corpus never re-enters the loop).
 *
 * Deterministic end to end: seed weights are integral with
 * lexicographic tie-breaks, Viterbi ties prefer the LONGER piece then
 * the lexicographically smaller one, and M-step probabilities are
 * compared only through exact integer usage counts — so two runs (or
 * two engines, for the seed pass) derive identical tables.
 */
object Unigram {

  /** Only lowercase pure-letter words train pieces — same convention as
    * the BPE trainer (digits/punctuation are their own symbols). */
  private def letterWords(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(TextAnalysis.tokens(textCol)).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /**
   * The seed-piece weight table — the trainer's first phase, fully
   * distributed and exactly SQL-replayable: every substring of every
   * letter-word up to `maxPieceLen` chars, weighted by word frequency ×
   * occurrences, top-`topK` by (weight desc, piece asc). This is the
   * oracle anchor for `txt_unigram_learn_contract`.
   */
  def seedPieces(df: DataFrame, textCol: Column, maxPieceLen: Int = 4,
      topK: Int = 30): DataFrame =
    letterWords(df, textCol)
      .select(col("w"), col("c"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("c"),
        explode(transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - col("i") + 1)),
          l => col("w").substr(col("i"), l))).as("piece"))
      .groupBy("piece").agg(sum("c").as("weight"))
      .orderBy(col("weight").desc, col("piece"))
      .limit(topK)

  /**
   * Train the unigram vocabulary: seed with the `seedCap` heaviest
   * substrings (plus every single character — the coverage floor that
   * keeps Viterbi total), run `iters` EM rounds over the word-frequency
   * table (E: Viterbi-best segmentation per word; M: piece probability ∝
   * exact usage count), then prune to `vocabSize` pieces keeping all
   * single characters. Returns (piece, logProb) pairs.
   */
  def learnVocab(df: DataFrame, textCol: Column, vocabSize: Int = 300,
      maxPieceLen: Int = 4, iters: Int = 3, seedCap: Int = 2000,
      maxWords: Int = 100000): Seq[(String, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val words: Array[(String, Long)] = letterWords(df, textCol)
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)].collect()

    // seed weights (driver replay of the distributed seedPieces formula
    // over the same bounded word table)
    val seedW = scala.collection.mutable.HashMap[String, Long]()
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i))
      { val p = w.substring(i, i + l); seedW(p) = seedW.getOrElse(p, 0L) + c }
    val chars = seedW.keys.filter(_.length == 1).toSeq.sorted
    val multi = seedW.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, wt) => (-wt, p) }.take(seedCap).map(_._1)
    var pieces: Seq[String] = chars ++ multi
    var usage: Map[String, Long] = seedW.toMap // weights drive round-1 probs

    def logProbs(u: Map[String, Long], ps: Seq[String]): Map[String, Double] = {
      val tot = ps.map(p => math.max(u.getOrElse(p, 0L), 1L)).sum.toDouble
      ps.map(p => p -> math.log(math.max(u.getOrElse(p, 0L), 1L) / tot)).toMap
    }

    /** Viterbi-best segmentation of `w`: max total log-prob; ties prefer
      * the longer last piece, then the lexicographically smaller one. */
    def viterbi(w: String, lp: Map[String, Double]): Seq[String] = {
      val n = w.length
      val best = new Array[Double](n + 1)
      val back = new Array[Int](n + 1) // piece length ending at position
      java.util.Arrays.fill(best, Double.NegativeInfinity)
      best(0) = 0.0
      for (e <- 1 to n) {
        var bl = -1; var bs = Double.NegativeInfinity; var bp = ""
        for (l <- 1 to math.min(maxPieceLen, e)) {
          val p = w.substring(e - l, e)
          lp.get(p) match {
            case Some(x) if best(e - l) > Double.NegativeInfinity =>
              val s = best(e - l) + x
              if (s > bs || (s == bs && (l > bl || (l == bl && p < bp)))) {
                bs = s; bl = l; bp = p
              }
            case _ => ()
          }
        }
        best(e) = bs; back(e) = bl
      }
      require(best(n) > Double.NegativeInfinity, s"uncovered word: $w")
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var e = n
      while (e > 0) { out += w.substring(e - back(e), e); e -= back(e) }
      out.reverse.toSeq
    }

    var round = 0
    while (round < iters) {
      val lp = logProbs(usage, pieces)
      val counts = scala.collection.mutable.HashMap[String, Long]()
      for ((w, c) <- words; p <- viterbi(w, lp))
        counts(p) = counts.getOrElse(p, 0L) + c
      usage = counts.toMap
      round += 1
    }
    // prune: keep all single chars (coverage) + heaviest multis by exact
    // usage count, ties lexicographic
    val keptMulti = pieces.filter(_.length > 1)
      .map(p => (p, usage.getOrElse(p, 0L)))
      .filter(_._2 > 0L)
      .sortBy { case (p, u) => (-u, p) }
      .take(math.max(0, vocabSize - chars.length))
      .map(_._1)
    pieces = chars ++ keptMulti
    val lp = logProbs(usage, pieces)
    pieces.map(p => p -> lp(p))
  }

  /**
   * Encoded piece count per text under a trained vocabulary: letter
   * words segment by Viterbi (same kernel as training), every other
   * token is one symbol. A Scala kernel closure over the broadcast
   * vocab — the same shape as [[TextAnalysis.bpeEncodedCount]];
   * tokenize/aggregate around it stay in codegen.
   */
  def encodedCount(vocab: Seq[(String, Double)], maxPieceLen: Int = 4): Column => Column = {
    val lp = vocab.toMap
    val enc = udf { (toks: Seq[String]) =>
      if (toks == null) 0
      else toks.map { w =>
        if (!w.forall(c => c >= 'a' && c <= 'z') || w.isEmpty) 1
        else {
          // same DP and tie-break as the training Viterbi (longer last
          // piece, then lexicographically smaller), so encoded counts
          // replay the trainer's segmentation exactly
          val n = w.length
          val best = new Array[Double](n + 1)
          val pcs = new Array[Int](n + 1)
          java.util.Arrays.fill(best, Double.NegativeInfinity)
          best(0) = 0.0; pcs(0) = 0
          for (e <- 1 to n) {
            var bs = Double.NegativeInfinity; var bl = -1; var bp = ""; var bc = 0
            for (l <- 1 to math.min(maxPieceLen, e)) {
              val p = w.substring(e - l, e)
              lp.get(p) match {
                case Some(x) if best(e - l) > Double.NegativeInfinity =>
                  val s = best(e - l) + x
                  if (s > bs || (s == bs && (l > bl || (l == bl && p < bp)))) {
                    bs = s; bl = l; bp = p; bc = pcs(e - l) + 1
                  }
                case _ => ()
              }
            }
            best(e) = bs; pcs(e) = if (bl > 0) bc else 0
          }
          if (best(n) > Double.NegativeInfinity) pcs(n) else n // char fallback
        }
      }.sum
    }
    text => enc(TextAnalysis.tokens(text))
  }
}
