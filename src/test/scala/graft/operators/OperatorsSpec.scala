package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("session windows: gap > threshold closes a session, gap <= merges; groups isolated") {
    val ev = Seq(
      ("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 10:20:00"), // 20m < 30m: same session
      ("a", "2024-01-01 10:50:00"),                               // exactly 30m: still MERGES
      ("a", "2024-01-01 11:21:00"),                               // 31m > 30m: NEW session
      ("b", "2024-01-01 10:05:00"))                               // other group untouched
      .toDF("grp", "ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Operators.sessionWindows(ev, col("ts"), col("grp"), "30 minutes")
      .select(date_format(col("session_start"), "HH:mm").as("s"), col("grp"), col("n_events"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("10:00", "a", 3L), ("11:21", "a", 1L), ("10:05", "b", 1L)))
  }

  test("asof join: latest right row at or before each left timestamp, per key") {
    val trades = Seq(
      ("A", 10L, 1), ("A", 20L, 2), ("A", 5L, 3), ("B", 10L, 4), ("C", 10L, 5))
      .toDF("k", "ts", "trade_id")
    val quotes = Seq(
      ("A", 5L, 1.0), ("A", 15L, 2.0), ("B", 10L, 9.0)) // B quote exactly at trade ts
      .toDF("k", "ts", "px")
    val got = Operators.asofJoin(trades, quotes, Seq("k"), "ts", Seq("px"))
      .select("trade_id", "px").as[(Int, Option[Double])].collect().toMap
    assert(got === Map(
      1 -> Some(1.0),  // A@10 -> quote@5
      2 -> Some(2.0),  // A@20 -> quote@15
      3 -> Some(1.0),  // A@5  -> quote@5 (inclusive tie)
      4 -> Some(9.0),  // B@10 -> quote@10 (inclusive tie)
      5 -> None))      // C has no quotes
  }

  test("asof join carries null-valued right FIELDS correctly") {
    val left = Seq(("A", 10L, 1)).toDF("k", "ts", "id")
    val right = Seq(("A", 1L, Some(5.0)), ("A", 5L, Option.empty[Double]))
      .toDF("k", "ts", "px")
    // latest right row (ts=5) has a null px; the join must return that
    // null, not skip back to ts=1's value
    val got = Operators.asofJoin(left, right, Seq("k"), "ts", Seq("px"))
      .select("px").as[Option[Double]].head()
    assert(got === None)
  }

  test("range join pairs points with containing intervals only, per key") {
    val points = Seq(("A", 5L, 1), ("A", 15L, 2), ("A", 99L, 3), ("B", 5L, 4))
      .toDF("k", "t", "pt_id")
    val intervals = Seq(("A", 0L, 10L, "i1"), ("A", 4L, 20L, "i2"), ("B", 50L, 60L, "i3"))
      .toDF("k", "lo", "hi", "iv_id")
    val got = Operators.rangeJoin(points, intervals, Seq("k"), "t", "lo", "hi", bucketWidth = 7)
      .select("pt_id", "iv_id").as[(Int, String)].collect().toSet
    assert(got === Set((1, "i1"), (1, "i2"), (2, "i2"))) // 99 and B@5 match nothing
    // bucket width must not change results
    val wide = Operators.rangeJoin(points, intervals, Seq("k"), "t", "lo", "hi", bucketWidth = 1000)
      .select("pt_id", "iv_id").as[(Int, String)].collect().toSet
    assert(wide === got)
  }

  test("salted skew join equals the plain join") {
    val big = (0 until 2000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i))
      .toDF("k", "v")
    val small = Seq(("hot", 100), ("k1", 1), ("k2", 2)).toDF("k", "w")
    val plain = big.join(small, "k").select("k", "v", "w")
      .as[(String, Int, Int)].collect().toSet
    val salted = Operators.skewSaltedJoin(big, small, Seq("k"), salts = 8,
        saltSource = col("v"))
      .select("k", "v", "w").as[(String, Int, Int)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == "hot") === 200)
  }
  test("usage ring: interval snap, unaligned flag, and newest-N retention") {
    import spark.implicits._
    // hourly interval: fires at +60 (snaps back), -90 (snaps forward),
    // +400 (stays raw, unaligned), exact
    val fires = Seq(3600L + 60, 7200L - 90, 10800L + 400, 14400L)
      .toDF("fire_s")
    val ev = Seq((3700L, 10L, 1L), (7300L, 20L, 2L), (11300L, 30L, 3L),
      (14500L, 40L, 4L)).toDF("ts_s", "sent", "recv")
    val got = Operators.usageRing(fires, ev, col("ts_s"), col("sent"),
        col("recv"), intervalS = 3600L, numWindows = 3)
      .orderBy("begin_s").collect()
    // ring keeps 3 of 4 windows: 7200, 11200 (unaligned), 14400
    assert(got.map(_.getLong(1)).toSeq === Seq(7200L, 11200L, 14400L))
    assert(got.map(_.getBoolean(2)).toSeq === Seq(true, false, true))
    // the dropped 3600-window's bytes are gone; the rest roll up
    assert(got.map(_.getLong(3)).toSeq === Seq(20L, 30L, 40L))
    assert(got.last.getBoolean(5)) // newest window is open
  }
}
