package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("curriculum stages are contiguous difficulty-rank quarters") {
    val docs = (0L until 8L).map(i => (i, 100L - i)).toDF("doc_id", "d")
    val got = Sampling.curriculum(docs, col("doc_id"), col("d"), nStages = 2)
      .orderBy("doc_id").select("doc_id", "stage").as[(Long, Long)].collect()
    // difficulty DECREASES with doc_id, so the hardest docs are the
    // lowest ids: rank order is doc_id 7,6,5,4 (easy half = stage 1).
    assert(got.toSeq === Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L),
      (4L, 1L), (5L, 1L), (6L, 1L), (7L, 1L)))
  }

  test("curriculum positions are a 1..n permutation per stage, id-pure") {
    val docs = (0L until 100L).map(i => (i, i % 13)).toDF("doc_id", "d")
    val out = Sampling.curriculum(docs, col("doc_id"), col("d"), nStages = 4)
    val byStage = out.groupBy("stage").agg(count(lit(1)).as("n"),
        min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("np"))
      .as[(Long, Long, Int, Int, Long)].collect()
    assert(byStage.length === 4)
    byStage.foreach { case (_, n, lo, hi, np) =>
      assert(n === 25L && lo === 1 && hi === 25 && np === 25L)
    }
    // partitioning-independence: same assignment under a repartition
    val re = Sampling.curriculum(docs.repartition(7), col("doc_id"), col("d"), 4)
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty)
  }

  test("lengthBuckets: rank-cut batches and per-row padding vs batch max") {
    val docs = Seq((0L, 5L), (1L, 3L), (2L, 9L), (3L, 3L), (4L, 7L), (5L, 1L))
      .toDF("doc_id", "nt")
    val got = Sampling.lengthBuckets(docs, col("doc_id"), col("nt"), batchSize = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(
      (0L, 5L, 1L, 5L, 0L), (1L, 3L, 0L, 3L, 0L), (2L, 9L, 2L, 9L, 0L),
      (3L, 3L, 1L, 5L, 2L), (4L, 7L, 2L, 9L, 2L), (5L, 1L, 0L, 3L, 2L)))
  }

  test("annealPhase: top-quality ppm cut, mass-preserving weights, id tie-break") {
    val docs = (0L until 20L).map(i => (i, (i % 10) * 10L)).toDF("doc_id", "q")
    val got = Sampling.annealPhase(docs, col("doc_id"), col("q"),
        annealFracPpm = 200000L) // top 20% of 20 docs = 4
      .as[(Long, Long, Boolean, Long)].collect().map(r => r._1 -> r).toMap
    val anneal = got.values.filter(_._3).toSeq
    assert(anneal.size === 4)
    // scores 90,90,80,80 win; ties broken toward the lower doc_id
    assert(anneal.map(_._1).toSet === Set(9L, 19L, 8L, 18L))
    assert(anneal.forall(_._4 === 1000000L * 20L / 4L))
    assert(got.values.filterNot(_._3).forall(_._4 === 0L))
    // the phase mass is preserved: sum of anneal weights == total docs * 1e6
    assert(anneal.map(_._4).sum === 20L * 1000000L)
  }

  test("domainReweight replays the hand-computed ppm ladder") {
    val dl = Seq(("a", 200L), ("b", 100L)).toDF("source", "loss_u")
    val got = Sampling.domainReweight(dl, rounds = 1, etaPpm = 1000000L)
      .orderBy("source").as[(String, Long, Long, Long)].collect()
    // norm: a=1e6, b=500000; w0=500000 each.
    // raw_a = 500000 * 2e6 div 1e6 = 1000000; raw_b = 750000.
    // w_a = 1e6*1e6 div 1.75e6 = 571428; w_b = 750000*1e6 div 1.75e6 = 428571.
    assert(got.toSeq === Seq(("a", 200L, 1000000L, 571428L),
      ("b", 100L, 500000L, 428571L)))
  }

  test("domainReweight: hard domains gain share monotonically, sums stay ~1e6") {
    val dl = Seq(("web", 900L), ("code", 400L), ("books", 100L))
      .toDF("source", "loss_u")
    val out = Sampling.domainReweight(dl, rounds = 3, etaPpm = 200000L)
    val rows = out.orderBy("source")
      .select("source", "w_round_1", "w_round_2", "w_round_3")
      .as[(String, Long, Long, Long)].collect().toSeq
    val web = rows.find(_._1 == "web").get
    val books = rows.find(_._1 == "books").get
    assert(web._2 < web._3 && web._3 < web._4) // hardest keeps gaining
    assert(books._2 > books._3 && books._3 > books._4) // easiest keeps losing
    Seq(rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum).foreach {
      s => assert(s >= 999997L && s <= 1000000L, s"round sum $s")
    }
  }
}
