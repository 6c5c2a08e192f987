package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst kernel for the exact repeated-span window hash
 * ([[graft.analytics.TextAnalysis.duplicateSpans]]).
 *
 * The declarative spelling — `transform(sequence(0, n-k), i =>
 * aggregate(slice(th, i+1, k), …))` — invokes an interpreted lambda per
 * window ELEMENT (O(n·k) boxed steps per document) because higher-order
 * functions are CodegenFallback. This kernel emits every window hash in
 * one O(n) primitive rolling loop: identical double polynomial folds mod
 * the coprime 31-bit primes, identical 62-bit packing
 * (`h1 * 2^31 + h2`), so the values — and therefore the DuckDB oracle,
 * which replays the per-window fold in SQL — are bit-exactly unchanged.
 *
 * Rolling form of the fold: the fold computes the window's polynomial
 * value mod M exactly at every step, so sliding by one token is
 * `h' = ((h - t_out·B^(k-1)) · B + t_in) mod M`, with every
 * intermediate bounded by 2^62 (h < 2^31, B^(k-1) mod M < 2^31,
 * t < 2^48 — the 48-bit md5 token prefix).
 */
object TextKernels {
  import graft.analytics.TextAnalysis.{SpanHashBase1, SpanHashBase2, SpanHashMod1, SpanHashMod2}

  def spanWindowHashes(th: ArrayData, k: Int): ArrayData = {
    val n = th.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // B^(k-1) mod M — the outgoing token's coefficient
    var p1 = 1L; var p2 = 1L
    var j = 1
    while (j < k) {
      p1 = p1 * SpanHashBase1 % SpanHashMod1
      p2 = p2 * SpanHashBase2 % SpanHashMod2
      j += 1
    }
    val out = new Array[Long](n - k + 1)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < k) {
      val t = th.getLong(i)
      h1 = (h1 * SpanHashBase1 + t) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + t) % SpanHashMod2
      i += 1
    }
    out(0) = h1 * 2147483648L + h2
    while (i < n) {
      val tOut = th.getLong(i - k)
      h1 = ((h1 - tOut % SpanHashMod1 * p1) % SpanHashMod1 + SpanHashMod1) % SpanHashMod1
      h2 = ((h2 - tOut % SpanHashMod2 * p2) % SpanHashMod2 + SpanHashMod2) % SpanHashMod2
      val tIn = th.getLong(i)
      h1 = (h1 * SpanHashBase1 + tIn) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + tIn) % SpanHashMod2
      out(i - k + 1) = h1 * 2147483648L + h2
      i += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Top-K character-n-gram profile of a (pre-normalized) string — the
   * per-document half of the Cavnar–Trenkle rank profile, fused into
   * one pass. Replaces the declarative explode-every-gram →
   * groupBy(doc, gram) → per-doc rank window spelling, whose shuffle
   * carries one row per CHARACTER of the corpus; this kernel counts
   * and ranks inside the row, so only K rows per document ever reach
   * an exchange. Semantics are bit-identical to the window spelling:
   * grams are code-point substrings, ranked by (count desc, gram asc
   * in UTF-8 binary order = code-point order), first K returned with
   * 1-based ranks. Shorter-than-n text yields an empty profile (the
   * declarative `when(length < n, array())` guard).
   */
  def topGramProfile(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int, k: Int): ArrayData = {
    val s = text.toString
    // code-point start offsets (UTF-16 indices)
    val cps = new Array[Int](s.codePointCount(0, s.length) + 1)
    var ci = 0; var off = 0
    while (off < s.length) {
      cps(ci) = off; ci += 1
      off += Character.charCount(s.codePointAt(off))
    }
    cps(ci) = s.length
    val total = ci // code points
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[String, Array[Int]]()
    var i = 0
    while (i + n <= total) {
      val g = s.substring(cps(i), cps(i + n))
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1)) else c(0) += 1
      i += 1
    }
    val entries = new Array[(String, Int)](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next(); entries(j) = (e.getKey, e.getValue()(0)); j += 1
    }
    // (count desc, gram asc by code point — UTF8String binary order)
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Int)] {
      override def compare(a: (String, Int), b: (String, Int)): Int = {
        if (a._2 != b._2) return Integer.compare(b._2, a._2)
        val x = a._1; val y = b._1
        var p = 0; var q = 0
        while (p < x.length && q < y.length) {
          val cx = x.codePointAt(p); val cy = y.codePointAt(q)
          if (cx != cy) return Integer.compare(cx, cy)
          p += Character.charCount(cx); q += Character.charCount(cy)
        }
        Integer.compare(x.length - p, y.length - q)
      }
    })
    val m = math.min(k, entries.length)
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      out(r) = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(entries(r)._1), r + 1)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** One n-gram group key: a token-array slice compared by CONTENT
    * (exact sequence equality — tokens are whitespace-free, so this is
    * identical to equality of the space-joined gram string). */
  private final class Gram(val ts: Array[org.apache.spark.unsafe.types.UTF8String],
      val start: Int, val n: Int) {
    override val hashCode: Int = {
      var h = 1; var i = start
      while (i < start + n) { h = h * 31 + ts(i).hashCode(); i += 1 }
      h
    }
    override def equals(o: Any): Boolean = {
      val g = o.asInstanceOf[Gram]
      if (g.start == start) return true
      var i = 0
      while (i < n) {
        if (!ts(start + i).equals(g.ts(g.start + i))) return false
        i += 1
      }
      true
    }
  }

  /**
   * The FULL Gopher n-gram repetition battery in ONE pass over the
   * token array: top-{2,3,4}-gram char masses (max over grams occurring
   * ≥ 2 times of count × joined char length) and duplicate-{5..10}-gram
   * char masses (Σ (count−1) × length) — bit-identical to the
   * sort_array + fold spelling ([[graft.analytics.TextAnalysis]]
   * `dupMass`), which builds, sorts and folds NINE arrays of joined
   * gram strings per document. Here grams are grouped by token-slice
   * content (no join strings materialize) and the char length comes
   * from a prefix sum of token lengths (+ n−1 joiner spaces).
   */
  def repetitionNgramStats(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val l = toks.numElements()
    val ts = new Array[org.apache.spark.unsafe.types.UTF8String](l)
    val pre = new Array[Long](l + 1)
    var i = 0
    while (i < l) {
      val t = toks.getUTF8String(i)
      ts(i) = t
      pre(i + 1) = pre(i) + t.numChars()
      i += 1
    }
    val out = new Array[Long](9)
    var n = 2
    while (n <= 10) {
      if (l >= n) {
        val map = new java.util.HashMap[Gram, Array[Int]](l * 2)
        var s = 0
        while (s + n <= l) {
          val g = new Gram(ts, s, n)
          val v = map.get(g)
          if (v == null) map.put(g, Array(1, s)) else v(0) += 1
          s += 1
        }
        var top = 0L; var dup = 0L
        val it = map.values().iterator()
        while (it.hasNext) {
          val v = it.next()
          val c = v(0)
          if (c >= 2) {
            val st = v(1)
            val len = pre(st + n) - pre(st) + (n - 1)
            val mass = c.toLong * len
            if (mass > top) top = mass
            dup += (c - 1).toLong * len
          }
        }
        out(n - 2) = if (n <= 4) top else dup
      }
      n += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(out(0), out(1), out(2), out(3),
      out(4), out(5), out(6), out(7), out(8))
  }

  /** The per-document half of Cavnar–Trenkle classification fused end
    * to end: top-K gram ranks (same total order as [[topGramProfile]])
    * PLUS the out-of-place distance against every language profile and
    * the argmin — all in-row. Returns null when the document is shorter
    * than n (no profile → unclassifiable, matching the join spelling
    * where such docs never reach the output). `profiles` maps lang →
    * (gram → rank); ties break on lang ascending (binary order). */
  def profileClassify(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int, k: Int,
      profiles: Array[(String, java.util.HashMap[String, Integer])]): Any = {
    val grams = topGramProfile(text, n, k)
    val m = grams.numElements()
    if (m == 0) return null
    var bestLang: String = null
    var bestDist = Long.MaxValue
    var li = 0
    while (li < profiles.length) {
      val (lang, prof) = profiles(li)
      var dist = 0L
      var i = 0
      while (i < m) {
        val e = grams.getStruct(i, 2)
        val r = prof.get(e.getUTF8String(0).toString)
        dist += (if (r == null) k.toLong
                 else math.abs(e.getInt(1).toLong - r.longValue()))
        i += 1
      }
      if (dist < bestDist || (dist == bestDist &&
          (bestLang == null || lang.compareTo(bestLang) < 0))) {
        bestDist = dist; bestLang = lang
      }
      li += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(bestLang), bestDist)
  }

  /**
   * MinHash signature in-row: k minima of `xxhash64(i, shingle)` over
   * the shingle array — BIT-IDENTICAL to Spark's
   * `min(xxhash64(lit(i), col("shingle")))` aggregate (seed 42, int
   * child then string child chained), but computed inside the row so
   * the corpus-wide (doc × shingle) explode + groupBy shuffle
   * disappears from the production signature pass. Duplicate shingles
   * are harmless (min over a multiset equals min over its set — the
   * exploded spelling deduped first). Null for shingle-less docs (the
   * aggregate spelling never emitted them).
   */
  def minhashSignature(shingles: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = shingles.numElements()
    if (n == 0) return null
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      val base = s.getBaseObject; val off = s.getBaseOffset; val len = s.numBytes
      i = 0
      while (i < k) {
        val h = XXH64.hashUnsafeBytes(base, off, len, seeds(i))
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash fingerprint in-row: the 64 ±1 bit votes over
    * `xxhash64(token)` and the sign-pack, one pass over the token
    * array — bit-identical to the 64-conditional-sum groupBy spelling
    * (seed 42 single-child hash; ties vote 0 → bit stays clear), minus
    * its corpus-wide token shuffle. */
  def simhashFingerprint(toks: ArrayData): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val t = toks.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** MinHash signature AND LSH band hashes in one pass straight from
    * the TOKEN array: n-token shingles are byte-joined with 0x20 into
    * a reused scratch buffer (identical bytes to the
    * `concat_ws(" ", slice(...))` shingle string — no interpreted HOF,
    * no per-window string allocation), each window feeds the k minima
    * of `xxhash64(i, shingle)` (as [[minhashSignature]]), and the
    * signature folds into `bands` band hashes, each the chained-seed
    * xxhash64 of its r slots — exactly `xxhash64(mh_{b·r} …)` (seed
    * 42, hashLong chain), so the candidate buckets are identical to
    * the exploded column spelling. ONE evaluation per document feeds
    * one explode; neither the shingle array nor the 16-column
    * signature table ever materializes. Null for docs shorter than n
    * tokens (no shingles — such docs never pair). */
  def minhashBands(toks: ArrayData, n: Int, k: Int, bands: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val l = toks.numElements()
    if (l < n) return null
    val ts = new Array[org.apache.spark.unsafe.types.UTF8String](l)
    var i = 0
    var maxWin = 0
    while (i < l) {
      ts(i) = toks.getUTF8String(i)
      i += 1
    }
    i = 0
    var winBytes = n - 1 // joiner spaces
    while (i < n) { winBytes += ts(i).numBytes; i += 1 }
    maxWin = winBytes
    var w = 1
    while (w + n <= l) {
      winBytes += ts(w + n - 1).numBytes - ts(w - 1).numBytes
      if (winBytes > maxWin) maxWin = winBytes
      w += 1
    }
    val buf = new Array[Byte](maxWin)
    val seeds = new Array[Long](k)
    i = 0
    while (i < k) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s + n <= l) {
      var pos = 0
      var j = s
      while (j < s + n) {
        if (j > s) { buf(pos) = ' '; pos += 1 }
        val t = ts(j)
        t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += t.numBytes
        j += 1
      }
      i = 0
      while (i < k) {
        val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, seeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    val r = k / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      i = b * r
      while (i < (b + 1) * r) { h = XXH64.hashLong(sig(i), h); i += 1 }
      out(b) = org.apache.spark.sql.catalyst.InternalRow(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }

  def polyFingerprint(th: ArrayData): Long = {
    val n = th.numElements()
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < n) {
      val t = th.getLong(i)
      h1 = (h1 * SpanHashBase1 + t) % SpanHashMod1
      h2 = (h2 * SpanHashBase2 + t) % SpanHashMod2
      i += 1
    }
    h1 * 2147483648L + h2
  }
}

/** `poly_fingerprint(array<long>) -> long` — the whole-array packed
  * double polynomial fold (the k = n degenerate case of
  * [[SpanWindowHashes]]): an order-sensitive document fingerprint over
  * 48-bit token hashes that an external SQL engine replays exactly
  * (DuckDB: `list_reduce` with the same packed lambda). Empty array
  * folds to 0. */
case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprint requires array<long> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.polyFingerprint(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.polyFingerprint($a)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

/** `top_gram_profile(string, n, k) -> array<struct<gram,drank>>` — the
  * per-document Cavnar–Trenkle top-K n-gram rank profile in one pass
  * (no per-character explode, no per-doc rank window). */
case class TopGramProfile(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n > 0 && k > 0, "n-gram size and profile size must be positive")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("gram",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("drank",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_gram_profile"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_gram_profile requires string input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.topGramProfile(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.topGramProfile($a, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): TopGramProfile =
    copy(child = newChild)
}

/** `ProfileClassify(text) -> struct<pred_lang, distance>` — the fused
  * Cavnar–Trenkle classifier: per-doc top-K gram profile, out-of-place
  * distance against every (broadcast-by-closure) language profile, and
  * the (dist, lang) argmin, in one row-local pass. Null for docs
  * shorter than n (no profile — the join spelling drops them too). */
case class ProfileClassify(child: Expression, n: Int, k: Int,
    profiles: Seq[(String, Seq[(String, Int)])])
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("pred_lang",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("distance", LongType,
      nullable = false)))
  override def prettyName: String = "profile_classify"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"profile_classify requires string input, got $other")
  }

  @transient private lazy val lookup: Array[(String, java.util.HashMap[String, Integer])] =
    profiles.sortBy(_._1).map { case (lang, entries) =>
      val m = new java.util.HashMap[String, Integer](entries.size * 2)
      entries.foreach { case (g, r) => m.put(g, Integer.valueOf(r)) }
      (lang, m)
    }.toArray

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.profileClassify(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k, lookup)

  // the profile table rides the closure; interpreted eval is one
  // row-local pass (the surrounding projection stays codegen'd —
  // CodegenFallback only splits this expression out)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("profileClassify", this,
      classOf[ProfileClassify].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |Object r = $self.kernelEval($a);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
       """.stripMargin
    })
  }

  /** Codegen entry point (reference-object call). */
  def kernelEval(a: Object): Object =
    TextKernels.profileClassify(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k, lookup)
      .asInstanceOf[Object]

  override protected def withNewChildInternal(newChild: Expression): ProfileClassify =
    copy(child = newChild)
}

object ProfileClassify {
  // profile table as a foldable string argument (the public-API path
  // into the function registry): blocks separated by control chars
  // \u0001 (language blocks) / \u0002 (entries) / \u0003 (gram|rank)
  // - none can occur in grams (text is whitespace-normalized lowercase)
  private final val LangSep = '\u0001'
  private final val EntrySep = '\u0002'
  private final val RankSep = '\u0003'

  def encodeProfiles(profiles: Seq[(String, Seq[(String, Int)])]): String =
    profiles.map { case (lang, entries) =>
      lang + EntrySep + entries.map { case (g, r) => g + RankSep + r }
        .mkString(EntrySep.toString)
    }.mkString(LangSep.toString)

  def parseProfiles(s: String): Seq[(String, Seq[(String, Int)])] =
    if (s.isEmpty) Nil
    else s.split(LangSep).toSeq.map { block =>
      val parts = block.split(EntrySep)
      (parts.head, parts.tail.toSeq.map { e =>
        val i = e.lastIndexOf(RankSep.toInt)
        (e.substring(0, i), e.substring(i + 1).toInt)
      })
    }
}

/** `simhash_fingerprint(array<string>) -> long` — the 64-bit SimHash
  * sign-pack in one row-local pass (values identical to the
  * 64-conditional-sum aggregate spelling). */
case class SimhashFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fingerprint requires array<string> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.simhashFingerprint(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernels.simhashFingerprint($a)")

  override protected def withNewChildInternal(newChild: Expression): SimhashFingerprint =
    copy(child = newChild)
}

/** `minhash_bands(tokens array<string>, n, k, bands) ->
  * array<struct<band_id, band_hash>>` — in-kernel shingling +
  * signature + LSH banding in one row-local pass (buckets identical
  * to xxhash64 over the mh columns; null for sub-n-token docs). */
case class MinhashBands(child: Expression, n: Int, k: Int, bands: Int)
    extends UnaryExpression {
  require(n > 0, "shingle width must be positive")
  require(k > 0 && bands > 0 && k % bands == 0,
    "signature length must be a positive multiple of the band count")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("band_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("band_hash", LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.minhashBands(a.asInstanceOf[ArrayData], n, k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.TextKernels.minhashBands($a, $n, $k, $bands);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

/** `minhash_signature(array<string>, k) -> array<long>` — the k-minima
  * MinHash signature in one row-local pass (values identical to the
  * min(xxhash64(i, shingle)) aggregate; null for shingle-less docs). */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "signature length must be positive")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.minhashSignature(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.TextKernels.minhashSignature($a, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** `repetition_ngram_stats(array<string>) -> struct<top2..top4,
  * dup5..dup10: long>` — all nine Gopher n-gram repetition masses in
  * one pass (no per-n gram-array build + sort + fold). */
case class RepetitionNgramStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    (Seq("top2", "top3", "top4") ++ (5 to 10).map(n => s"dup$n")).map(f =>
      org.apache.spark.sql.types.StructField(f, LongType, nullable = false)))
  override def prettyName: String = "repetition_ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_ngram_stats requires array<string> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.repetitionNgramStats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernels.repetitionNgramStats($a)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionNgramStats =
    copy(child = newChild)
}

/** `span_window_hashes(array<long>, k) -> array<long>` — every k-token
  * packed window hash of a token-hash array, one fused rolling loop. */
case class SpanWindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 1, "span length must exceed one token")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_window_hashes requires array<long> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.spanWindowHashes(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.spanWindowHashes($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanWindowHashes =
    copy(child = newChild)
}
