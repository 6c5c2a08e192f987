package graft.analytics

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized property checks over the SFT-curation, bitext,
  * and mixture operators — invariants the example-based specs can't
  * sweep (arbitrary turn shapes, score ties, partitioning noise). */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomTurns(rnd: Random, nConvs: Int, maxTurns: Int) = {
    val rows = for {
      c <- 0 until nConvs
      n = 1 + rnd.nextInt(maxTurns)
      t <- 0 until n
    } yield (c.toLong, t,
      if (rnd.nextInt(10) == 0) (if (t % 2 == 0) "assistant" else "user")
      else (if (t % 2 == 0) "user" else "assistant"),
      if (rnd.nextInt(12) == 0) "  "
      else Seq.fill(1 + rnd.nextInt(20))("w" + rnd.nextInt(50)).mkString(" "))
    rows.toDF("conv_id", "turn_idx", "role", "content")
  }

  test("trimToBudget: kept is a user-opening suffix whose token total fits") {
    val rnd = new Random(11)
    for (round <- 1 to 3) {
      val turns = randomTurns(rnd, 30, 8)
      val budget = 20 + rnd.nextInt(60)
      val got = Sft.trimToBudget(turns, budget)
        .select("conv_id", "turn_idx", "role", "n_tokens", "kept")
        .as[(Long, Int, String, Long, Boolean)].collect()
      got.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._2)
        val kept = sorted.filter(_._5)
        if (kept.nonEmpty) {
          // contiguous suffix: kept turn indices run to the last turn
          assert(kept.map(_._2).toSeq ===
            (sorted.last._2 - kept.length + 1 to sorted.last._2).toSeq)
          assert(kept.head._3 === "user") // opens on a user turn
          assert(kept.map(_._4).sum <= budget) // fits the budget
          // maximality: one more turn would bust the budget or open on
          // a non-user turn
          val prefix = sorted.takeRight(kept.length + 1)
          if (prefix.length > kept.length)
            assert(prefix.map(_._4).sum > budget || prefix.head._3 != "user")
        }
      }
    }
  }

  test("validate: ok iff a replayed rule-by-rule check agrees") {
    val rnd = new Random(23)
    val turns = randomTurns(rnd, 50, 6)
    val got = Sft.validate(turns, maxTurns = 4)
      .select("conv_id", "ok").as[(Long, Boolean)].collect().toMap
    val raw = turns.as[(Long, Int, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    raw.foreach { case (c, rs) =>
      val roles = rs.map(_._3).toSeq
      val want = roles.sliding(2).forall(p => p.length < 2 || p(0) != p(1)) &&
        roles.head == "user" && roles.last == "assistant" &&
        rs.forall(_._4.trim.nonEmpty) && rs.length <= 4
      assert(got(c) === want, s"conv $c: roles=$roles")
    }
  }

  test("dedupByAssistant: canonical flags are partitioning-independent and sig-consistent") {
    val rnd = new Random(31)
    val turns = randomTurns(rnd, 40, 5)
    val a = Sft.dedupByAssistant(turns)
    val b = Sft.dedupByAssistant(turns.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val rows = a.select("conv_id", "sig", "is_canonical")
      .as[(Long, String, Boolean)].collect()
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.count(_._3) === 1) // exactly one canonical per signature
      assert(g.filter(_._3).head._1 === g.map(_._1).min) // the min id
    }
  }

  test("preferencePairs: chosen beats rejected, kept implies margin and distinctness") {
    val rnd = new Random(47)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(60).toLong, i.toLong, rnd.nextInt(20).toLong)
    }
    val scores = rows.groupBy(_._1).view
      .mapValues(rs => rs.map(r => r._2 -> r._3).toMap).toMap
    val got = Sft.preferencePairs(rows.toDF("prompt_id", "resp_id", "score"),
        minMargin = 5L)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length === scores.size)
    got.foreach { case (p, n, ch, rj, margin, kept) =>
      val s = scores(p)
      assert(n === s.size)
      assert(s(ch) === s.values.max && s(rj) === s.values.min)
      assert(margin === s.values.max - s.values.min)
      assert(kept === (n >= 2 && ch != rj && margin >= 5L))
    }
  }

  test("marginMine: deterministic under repartition; margins scale-invariant") {
    val rnd = new Random(59)
    def vecs(n: Int, idOff: Long, scale: Double) = (0 until n).map { i =>
      (idOff + i, Seq.fill(6)((rnd.nextInt(9) + 1).toDouble * scale))
    }
    val srcRows = vecs(20, 0L, 1.0)
    val tgtRows = vecs(20, 100L, 1.0)
    val src = srcRows.toDF("src_id", "embedding")
    val tgt = tgtRows.toDF("tgt_id", "embedding")
    val a = Bitext.marginMineExact(src, tgt, k = 3, marginThresholdU = 0L)
    val b = Bitext.marginMineExact(src.repartition(5), tgt.repartition(3),
      k = 3, marginThresholdU = 0L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // cosine is scale-invariant, so doubling every vector changes nothing
    val src2 = srcRows.map { case (i, v) => (i, v.map(_ * 2.0)) }
      .toDF("src_id", "embedding")
    val c = Bitext.marginMineExact(src2, tgt, k = 3, marginThresholdU = 0L)
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
  }

  test("curriculum: stages are difficulty-monotone and sizes differ by at most one") {
    val rnd = new Random(67)
    val docs = (0L until 237L).map(i => (i, rnd.nextInt(1000).toLong))
      .toDF("doc_id", "d")
    val got = Sampling.curriculum(docs, col("doc_id"), col("d"), nStages = 5)
      .select("doc_id", "difficulty", "stage").as[(Long, Long, Long)].collect()
    val byStage = got.groupBy(_._3)
    val sizes = byStage.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1)
    // monotone: every difficulty in stage s <= every difficulty in s+1
    (1L to 4L).foreach { s =>
      assert(byStage(s).map(_._2).max <= byStage(s + 1).map(_._2).min)
    }
  }

  test("lengthBuckets: batch_max is the true max; pads non-negative; batches contiguous in rank") {
    val rnd = new Random(71)
    val docs = (0L until 321L).map(i => (i, (1 + rnd.nextInt(500)).toLong))
      .toDF("doc_id", "nt")
    val got = Sampling.lengthBuckets(docs, col("doc_id"), col("nt"), batchSize = 16)
      .as[(Long, Long, Long, Long, Long)].collect()
    got.groupBy(_._3).foreach { case (_, g) =>
      assert(g.map(_._2).max === g.head._4)
      assert(g.forall(r => r._5 === r._4 - r._2 && r._5 >= 0))
      assert(g.length <= 16)
    }
    // batches partition the length-sorted order: max length of batch b
    // never exceeds min length of batch b+1
    val byBatch = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    (0L until byBatch.keys.max).foreach { b =>
      assert(byBatch(b).max <= byBatch(b + 1).min)
    }
  }
}
