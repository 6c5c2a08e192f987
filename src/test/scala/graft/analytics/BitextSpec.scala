package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def side(name: String, rows: (Long, Seq[Double])*) =
    rows.toDF(name, "embedding")

  test("marginMineExact: hand-checked integer margins on unit-checkable vectors") {
    // s0=(1,0) aligns with t1=(1,0); s2=(3,4) aligns with t3=(0,1)
    // (cos 4/5) over t1 (cos 3/5). With k=1 every mined margin is
    // exactly cos*2e6/(cos+cos) = 1e6.
    val src = side("src_id", 0L -> Seq(1.0, 0.0), 2L -> Seq(3.0, 4.0))
    val tgt = side("tgt_id", 1L -> Seq(1.0, 0.0), 3L -> Seq(0.0, 1.0))
    val got = Bitext.marginMineExact(src, tgt, k = 1, marginThresholdU = 1000000L)
      .orderBy("src_id").as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 1L, 100000L, 1000000L),
      (2L, 3L, 80000L, 1000000L)))
  }

  test("marginMineExact: hubby target is penalized by its neighborhood average") {
    // t1 is a hub (cos 1/sqrt(2) = 0.70711 to BOTH sources); t3 is
    // close only to s2 (cos 0.6). For s2, raw cosine prefers the hub
    // (70711 > 60000) but the margin divides by the neighborhood
    // average — the hub's is 70711, the specific target's only 30000 —
    // so margins are 1039444 (t1) vs 1258455 (t3): t3 wins.
    val src = side("src_id", 0L -> Seq(1.0, 0.0, 0.0), 2L -> Seq(0.0, 1.0, 0.0))
    val tgt = side("tgt_id", 1L -> Seq(1.0, 1.0, 0.0), 3L -> Seq(0.0, 3.0, 4.0))
    val pairs = Bitext.marginMineExact(src, tgt, k = 2, marginThresholdU = 0L)
      .orderBy("src_id").select("src_id", "tgt_id").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((0L, 1L), (2L, 3L)))
  }

  test("marginMineIvf equals the exact leg when every list is probed") {
    // 24 deterministic vectors per side, ids disjoint; candK covers the
    // whole other side and nProbe == nLists, so the candidate set is
    // all pairs and the production path must reproduce the exact leg.
    val src = side("src_id", (0L until 24L).map(i =>
      i -> Seq((i % 7 + 1).toDouble, (i % 5 + 1).toDouble,
        (i % 3 + 1).toDouble, 1.0)): _*)
    val tgt = side("tgt_id", (0L until 24L).map(i =>
      (i + 100L) -> Seq((i % 5 + 1).toDouble, (i % 7 + 1).toDouble,
        1.0, (i % 3 + 1).toDouble)): _*)
    val exact = Bitext.marginMineExact(src, tgt, k = 3, marginThresholdU = 1000000L)
    val ivf = Bitext.marginMineIvf(src, tgt, k = 3, marginThresholdU = 1000000L,
      candK = 24, nLists = 4, nProbe = 4)
    assert(exact.count() > 0)
    assert(ivf.exceptAll(exact).isEmpty && exact.exceptAll(ivf).isEmpty)
  }

  test("anti-correlated neighborhoods mine nothing: non-positive denominator is a sentinel, not a clamp") {
    // s0's target neighborhood is entirely non-positive (cos -1 and 0),
    // so the ratio margin is undefined/negative for every pair. A
    // denominator clamp would score the cos=0 pair margin 0 (and a
    // tiny positive cosine ~2e9) and mine it; the sentinel must not.
    val src = side("src_id", 0L -> Seq(1.0, 0.0))
    val tgt = side("tgt_id", 1L -> Seq(-1.0, 0.0), 3L -> Seq(0.0, -1.0))
    val got = Bitext.marginMineExact(src, tgt, k = 2, marginThresholdU = 0L)
    assert(got.isEmpty)
  }

  test("mined pairs are at most one per source and clear the threshold") {
    val src = side("src_id", (0L until 10L).map(i =>
      i -> Seq((i + 1).toDouble, (10 - i).toDouble, 2.0)): _*)
    val tgt = side("tgt_id", (0L until 10L).map(i =>
      (i + 50L) -> Seq((10 - i).toDouble, (i + 1).toDouble, 3.0)): _*)
    val got = Bitext.marginMineExact(src, tgt, k = 2, marginThresholdU = 1000000L)
    val bySrc = got.groupBy("src_id").count().select("count").as[Long].collect()
    assert(bySrc.forall(_ == 1L))
    assert(got.select("margin_u").as[Long].collect().forall(_ >= 1000000L))
  }
}
