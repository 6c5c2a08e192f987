package graft.log

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Incremental fetch session scenarios (kafka/server/fetch_session_cache.cc):
 * epoch FSM decisions, partition-state folding with forgets and session
 * re-creation, and the delta-shipping response rule.
 */
class FetchSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def decide(rows: Seq[(String, Long, Int)]): Map[Long, String] =
    FetchSessions.validateEpochs(
        rows.toDF("session_id", "seq", "epoch"),
        col("session_id"), col("seq"), col("epoch"))
      .collect().map(r => r.getAs[Long]("seq") -> r.getAs[String]("decision")).toMap

  test("epoch FSM: create, ok chain, wrong epoch, recovery by full fetch") {
    val d = decide(Seq(
      ("s1", 1L, 0),  // full fetch -> created, expects 1
      ("s1", 2L, 1),  // ok, expects 2
      ("s1", 3L, 2),  // ok, expects 3
      ("s1", 4L, 5),  // wrong epoch -> invalid, state untouched
      ("s1", 5L, 4),  // still wrong (expected is 3)
      ("s1", 6L, 3),  // matches -> ok
      ("s1", 7L, 0),  // client gives up, full fetch -> created again
      ("s1", 8L, 1))) // ok in the new era
    assert(d === Map(1L -> "created", 2L -> "ok", 3L -> "ok",
      4L -> "invalid_epoch", 5L -> "invalid_epoch", 6L -> "ok",
      7L -> "created", 8L -> "ok"))
  }

  test("epoch FSM: unknown session, close, and post-close not_found") {
    val d = decide(Seq(
      ("s1", 1L, 3),   // never created -> not_found
      ("s1", 2L, 0),   // created
      ("s1", 3L, -1),  // FINAL_EPOCH -> closed
      ("s1", 4L, 1),   // session gone -> not_found
      ("s2", 5L, -1))) // close of a session that never existed: no error
    assert(d === Map(1L -> "not_found", 2L -> "created", 3L -> "closed",
      4L -> "not_found", 5L -> "closed"))
  }

  private val parts = Seq(
    // (session_id, seq, topic, partition, fetch_offset, forget)
    ("s1", 1L, "t", 0, 0L, false),
    ("s1", 1L, "t", 1, 0L, false),
    ("s1", 2L, "t", 0, 50L, false),  // advance p0
    ("s1", 3L, "t", 1, 0L, true),    // forget p1
    ("s1", 4L, "t", 2, 10L, false),  // invalid request: must NOT apply
    ("s2", 6L, "t", 0, 0L, false),   // pre-recreate era: must NOT survive
    ("s2", 7L, "t", 1, 7L, false)
  ).toDF("session_id", "seq", "topic", "partition", "fetch_offset", "forget")

  private val reqs = Seq(
    ("s1", 1L, 0), ("s1", 2L, 1), ("s1", 3L, 2), ("s1", 4L, 9),
    ("s2", 6L, 0), ("s2", 7L, 0)
  ).toDF("session_id", "seq", "epoch")

  private lazy val decisions = FetchSessions.validateEpochs(
    reqs, col("session_id"), col("seq"), col("epoch"))

  test("session state: LWW with forgets, invalid requests ignored, era reset") {
    val st = FetchSessions.sessionState(parts, decisions)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    // s1: p0 at offset 50 (seq 2 wins), p1 forgotten, p2 never applied
    // (seq 4 was invalid_epoch); s2: re-created at seq 7, so only p1.
    assert(st === Set(("s1", "t", 0, 50L), ("s2", "t", 1, 7L)))
  }

  test("responses ship only partitions with data past the fetch offset") {
    val hwms = Seq(("t", 0, 100L), ("t", 1, 40L)).toDF("topic", "partition", "hwm")
    val resp = FetchSessions.incrementalResponses(parts, decisions, hwms)
      .collect().map(r => (r.getAs[Long]("seq"), r.getAs[Int]("partition"),
        r.getAs[Long]("fetch_offset"))).toSet
    // seq 1 (s1 full fetch): p0@0 and p1@0 both have data.
    // seq 2: p0 advanced to 50 (hwm 100 -> included), p1 still at 0.
    // seq 3: p1 forgotten -> only p0@50.
    // seq 4: invalid, no response row.
    // seq 6 (s2 first create): p0@0. seq 7 re-create: p1@7 only.
    assert(resp === Set(
      (1L, 0, 0L), (1L, 1, 0L),
      (2L, 0, 50L), (2L, 1, 0L),
      (3L, 0, 50L),
      (6L, 0, 0L),
      (7L, 1, 7L)))
  }

  test("streaming epoch FSM matches the batch fold across micro-batch boundaries") {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    // s1's ok-chain and s2's session both straddle the seq<=3 boundary —
    // the carried checkpoint state must resume them mid-chain
    val rows = Seq(
      ("s1", 1L, 0), ("s1", 2L, 1), ("s1", 3L, 2),
      ("s2", 1L, 5), ("s2", 2L, 0), ("s2", 3L, 1),
      ("s1", 4L, 3), ("s1", 5L, 9), ("s1", 6L, 0),
      ("s2", 4L, -1), ("s2", 5L, 1))
    val typed = rows.toDF("session_id", "seq", "epoch")
      .select(col("session_id"), col("seq").cast("long").as("seq"),
        col("epoch").cast("int").as("epoch"))
    val inDir = Files.createTempDirectory("fsn_stream_in")
    Seq((col("seq") <= 3, "b0", 1700000000000L),
        (col("seq") > 3, "b1", 1700000001000L)).foreach {
      case (cond, name, mt) =>
        val tmp = Files.createTempDirectory("fsn_stream_half")
        typed.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val ls = Files.list(tmp)
        val part = try ls.filter(p => p.getFileName.toString.startsWith("part-"))
          .findFirst().get finally ls.close()
        val dst = inDir.resolve(s"$name.parquet")
        Files.copy(part, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(mt))
    }
    val out = Files.createTempDirectory("fsn_stream_out").toString
    val stream = graft.streaming.Transforms.PathInput(
      inDir.toString, typed.schema, maxFilesPerTrigger = Some(1)).stream(spark)
    FetchSessions.validateEpochsStream(stream, s"$out/data", s"$out/ckpt")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("session_id"), r.getAs[Long]("seq")) ->
        r.getAs[String]("decision")).toMap
    val streamed = key(spark.read.parquet(s"$out/data"))
    val batch = key(FetchSessions.validateEpochs(typed,
      col("session_id"), col("seq"), col("epoch")))
    assert(streamed === batch)
    // boundary carries: s1 seq 4 resumes the chain (expected=3 -> ok);
    // s2 seq 4 closes; s2 seq 5 is sessionless
    assert(streamed(("s1", 4L)) === "ok")
    assert(streamed(("s1", 5L)) === "invalid_epoch")
    assert(streamed(("s2", 4L)) === "closed")
    assert(streamed(("s2", 5L)) === "not_found")
  }

  private def cacheDecide(rows: Seq[(String, Long, Int, Long)],
      evictionMs: Long, maxSessions: Int = Int.MaxValue): Map[(String, Long), String] =
    FetchSessions.sessionCacheFold(
        rows.toDF("session_id", "seq", "epoch", "ts"),
        col("session_id"), col("seq"), col("epoch"), col("ts"),
        evictionMs, maxSessions)
      .collect().map(r => (r.getAs[String]("session_id"), r.getAs[Long]("seq")) ->
        r.getAs[String]("decision")).toMap

  test("gc sweep: idle session evicted -> not_found; recently-used survives") {
    val d = cacheDecide(Seq(
      ("s1", 1L, 0, 100L),   // created, last_used 100
      ("s2", 2L, 0, 105L),   // created, last_used 105
      ("s1", 3L, 1, 150L),   // gap 50 >= 50: swept before handling -> not_found
      ("s2", 4L, 1, 150L),   // gap 45 < 50: survives -> ok, last_used 150
      ("s1", 5L, 0, 151L),   // recreate after eviction
      ("s1", 6L, 1, 160L),   // ok
      ("s2", 7L, 2, 210L)),  // gap 60 >= 50: evicted despite correct epoch
      evictionMs = 50L)
    assert(d(("s1", 3L)) === "not_found")
    assert(d(("s2", 4L)) === "ok")
    assert(d(("s1", 5L)) === "created")
    assert(d(("s1", 6L)) === "ok")
    assert(d(("s2", 7L)) === "not_found")
  }

  test("invalid_epoch does not advance last_used — retries cannot keep a session alive") {
    val d = cacheDecide(Seq(
      ("s1", 1L, 0, 100L),
      ("s1", 2L, 9, 130L),   // wrong epoch: session untouched (h:218-221)
      ("s1", 3L, 9, 140L),   // still wrong, still not refreshed
      ("s1", 4L, 1, 155L)),  // 155 - 100 >= 50: swept -> not_found
      evictionMs = 50L)
    assert(d(("s1", 2L)) === "invalid_epoch")
    assert(d(("s1", 3L)) === "invalid_epoch")
    assert(d(("s1", 4L)) === "not_found")
  }

  test("capacity guard: cache at max sessions serves new creates sessionless (:137-145)") {
    val d = cacheDecide(Seq(
      ("s1", 1L, 0, 100L),
      ("s2", 2L, 0, 101L),
      ("s3", 3L, 0, 102L),   // cache full (max 2) -> sessionless
      ("s3", 4L, 1, 103L),   // no session was created -> not_found
      ("s1", 5L, 0, 104L),   // existing id replaces in place: no capacity hit
      ("s2", 6L, -1, 105L),  // close frees a slot
      ("s3", 7L, 0, 106L),   // now fits
      ("s3", 8L, 1, 107L)),
      evictionMs = 1000L, maxSessions = 2)
    assert(d(("s3", 3L)) === "sessionless_full")
    assert(d(("s3", 4L)) === "not_found")
    assert(d(("s1", 5L)) === "created")
    assert(d(("s3", 7L)) === "created")
    assert(d(("s3", 8L)) === "ok")
  }

  test("eviction frees capacity: the sweep runs before the create decision") {
    val d = cacheDecide(Seq(
      ("s1", 1L, 0, 100L),
      ("s2", 2L, 0, 200L),   // s1 idle 100 >= 50: swept; s2 takes the slot
      ("s1", 3L, 1, 201L)),  // s1 is gone
      evictionMs = 50L, maxSessions = 1)
    assert(d(("s2", 2L)) === "created")
    assert(d(("s1", 3L)) === "not_found")
  }
}
