package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.TextAnalysis.{SpanHashBase1, SpanHashBase2, SpanHashMod1, SpanHashMod2}

/** The rolling kernel must reproduce the per-window polynomial fold
  * bit-exactly — the DuckDB oracle replays the fold in SQL. */
class TextExpressionsSpec extends AnyFunSuite {

  // the original spelling: fold each window independently
  private def foldWindow(w: Seq[Long]): Long = {
    var h1 = 0L; var h2 = 0L
    w.foreach { t =>
      h1 = (h1 * SpanHashBase1 + t) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + t) % SpanHashMod2
    }
    h1 * 2147483648L + h2
  }

  test("rolling window hashes equal the independent per-window folds") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(2, 3, 7, 50, 257); k <- Seq(2, 3, 5, 13) if k <= n) {
      // 48-bit token hashes, like the md5 prefix
      val th = Array.fill(n)(rnd.nextLong() & ((1L << 48) - 1))
      val got = TextKernels.spanWindowHashes(new GenericArrayData(th), k)
      val want = th.toSeq.sliding(k).map(foldWindow).toSeq
      assert(got.numElements() === n - k + 1, s"n=$n k=$k")
      assert(got.toLongArray().toSeq === want, s"n=$n k=$k")
    }
  }

  test("shorter-than-k input yields no windows") {
    val th = new GenericArrayData(Array(7L, 8L))
    assert(TextKernels.spanWindowHashes(th, 3).numElements() === 0)
  }

  test("repetition_ngram_stats equals the sort+fold reference spelling") {
    import org.apache.spark.unsafe.types.UTF8String
    def ref(toks: Seq[String], n: Int): (Long, Long) = {
      if (toks.size < n) return (0L, 0L)
      val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
      val byGram = grams.groupBy(identity).view.mapValues(_.size)
      val rep = byGram.filter(_._2 >= 2)
      val top = rep.map { case (g, c) => c.toLong * g.length }
        .maxOption.getOrElse(0L)
      val dup = rep.map { case (g, c) => (c - 1).toLong * g.length }.sum
      (top, dup)
    }
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "bb", "ccc", "dd", "e", "ffff")
    for (len <- Seq(0, 1, 5, 30, 200)) {
      val toks = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = TextKernels.repetitionNgramStats(arr)
      for (n <- 2 to 10) {
        val (top, dup) = ref(toks, n)
        val want = if (n <= 4) top else dup
        assert(got.getLong(n - 2) === want, s"len=$len n=$n")
      }
    }
  }

  test("minhashSignature matches Spark's min(xxhash64(i, shingle)) aggregate") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.{XxHash64, Literal, BoundReference}
    val rnd = new scala.util.Random(11)
    val k = 16
    for (docLen <- Seq(1, 3, 40)) {
      val shingles = Seq.fill(docLen)(
        Seq.fill(3)(('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(4)))
          .mkString(" "))
      val arr = new GenericArrayData(
        shingles.map(s => UTF8String.fromString(s)).toArray[Any])
      val got = TextKernels.minhashSignature(arr, k)
      // reference: evaluate the real XxHash64 expression per (i, shingle)
      (0 until k).foreach { i =>
        val want = shingles.map { s =>
          XxHash64(Seq(Literal(i),
            Literal(UTF8String.fromString(s),
              org.apache.spark.sql.types.StringType)), 42L).eval(null)
            .asInstanceOf[Long]
        }.min
        assert(got.getLong(i) === want, s"docLen=$docLen i=$i")
      }
    }
    // shingle-less doc -> null (the aggregate spelling never emits it)
    assert(TextKernels.minhashSignature(
      new GenericArrayData(Array.empty[Any]), k) == null)
  }

  test("minhashBands: in-kernel shingling + buckets equal the column spelling") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.{XxHash64, Literal}
    val rnd = new scala.util.Random(5)
    val (n, k, bands) = (3, 16, 8)
    // include multi-byte tokens to exercise the byte-join path
    val vocab = Seq("alpha", "b", "gamma", "déjà", "ε", "zz")
    val toks = Seq.fill(27)(vocab(rnd.nextInt(vocab.size)))
    val tokArr = new GenericArrayData(
      toks.map(t => UTF8String.fromString(t)).toArray[Any])
    // reference: shingle strings via mkString, signature via the pinned
    // kernel over the shingle ARRAY, band hash via the real expression
    val shingleStrs = toks.sliding(n).map(_.mkString(" ")).toSeq
    val sig = TextKernels.minhashSignature(new GenericArrayData(
      shingleStrs.map(s => UTF8String.fromString(s)).toArray[Any]), k)
    val got = TextKernels.minhashBands(tokArr, n, k, bands)
    val r = k / bands
    (0 until bands).foreach { b =>
      val row = got.getStruct(b, 2)
      assert(row.getInt(0) === b)
      val want = XxHash64((b * r until (b + 1) * r).map(i =>
        Literal(sig.getLong(i))), 42L).eval(null).asInstanceOf[Long]
      assert(row.getLong(1) === want, s"band $b")
    }
    // sub-n-token docs yield null (no shingles, never pair)
    assert(TextKernels.minhashBands(new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b"))),
      n, k, bands) == null)
  }

  test("simhashFingerprint matches the 64-conditional-sum aggregate spelling") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.{XxHash64, Literal}
    val rnd = new scala.util.Random(23)
    for (docLen <- Seq(1, 2, 17, 100)) {
      val toks = Seq.fill(docLen)(
        ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5)))
      val hs = toks.map(t => XxHash64(Seq(Literal(UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType)), 42L).eval(null)
        .asInstanceOf[Long])
      var want = 0L
      (0 until 64).foreach { i =>
        val s = hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
        if (s > 0) want |= (1L << i)
      }
      val got = TextKernels.simhashFingerprint(new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any]))
      assert(got === want, s"docLen=$docLen")
    }
  }

  test("profileClassify: penalties for absent grams, lang tie-break, null short text") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{ProfileClassify => PC}
    // encode/parse round trip
    val profs = Seq(
      ("de", Seq(("der", 1), ("ein", 2))),
      ("en", Seq(("the", 1), ("he ", 2), ("e q", 3))))
    assert(PC.parseProfiles(PC.encodeProfiles(profs)) === profs)
    val lookup = profs.map { case (l, es) =>
      val m = new java.util.HashMap[String, Integer]()
      es.foreach { case (g, r) => m.put(g, Integer.valueOf(r)) }
      (l, m)
    }.toArray
    // "the" doc: grams rank 1.. ; en matches some, de none (all penalties)
    val r = TextKernels.profileClassify(UTF8String.fromString("the"), 3, 50, lookup)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(r.getUTF8String(0).toString === "en") // |1-1|=0 beats de's 50
    assert(r.getLong(1) === 0L)
    // text with no profile grams at all: every lang scores m*k; tie
    // breaks on lang ascending
    val t = TextKernels.profileClassify(UTF8String.fromString("zzzz"), 3, 50, lookup)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(t.getUTF8String(0).toString === "de")
    // "zzzz" has windows zzz,zzz -> ONE distinct profile gram -> 1 * k
    assert(t.getLong(1) === 50L)
    // shorter than n -> null (unclassifiable)
    assert(TextKernels.profileClassify(UTF8String.fromString("ab"), 3, 50, lookup)
      == null)
  }
}
