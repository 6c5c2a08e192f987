package graft.log

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.BatchType

/**
 * Transaction semantics replayed from the reference's test shapes
 * (`tests/rptest/transactions/transactions_test.py`,
 * `cluster/rm_stm.h:144-192`): two producers interleaving on one
 * partition, one committing, one aborting, one left open; marker fan-out
 * to every touched partition; read_committed visibility.
 */
class TxnEngineSpec extends SparkSpec {
  import spark.implicits._

  // pid 0 txn A: data arr 1,3 on p0; commit at arr 5.
  // pid 1 txn B: data arr 2,4 on p0 AND arr 2 on p1; abort at arr 6.
  // pid 0 txn C: data arr 7 on p0; open (no end command).
  private def mkData() = Seq(
    (0, 1L, 0L, 0, 0L, "a"),
    (0, 2L, 1L, 0, 0L, "b"),
    (0, 3L, 0L, 0, 0L, "c"),
    (0, 4L, 1L, 0, 0L, "d"),
    (1, 2L, 1L, 0, 0L, "e"),
    (0, 7L, 0L, 0, 1L, "f"))
    .toDF("partition", "arrival", "pid", "epoch", "txn_seq", "v")

  private def mkEnds() = Seq(
    (0L, 0L, "commit", 5L),
    (1L, 0L, "abort", 6L))
    .toDF("pid", "txn_seq", "decision", "arrival")

  private def mkLog() = TxnEngine.interleaveMarkers(mkData(), mkEnds())

  test("init_producer_id allocates dense monotonic pids") {
    val got = TxnEngine.initProducerIds(
      Seq("b", "a", "c").toDF("name").distinct(), col("name"), base = 100L)
      .select("name", "pid").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 100L), ("b", 101L), ("c", 102L)))
  }

  test("interleave stamps dense offsets across fences, data, and markers") {
    val log = mkLog()
    val p0 = log.where($"partition" === 0).orderBy("offset")
      .select("offset", "batch_type", "is_control", "pid", "v")
      .as[(Long, Int, Boolean, Long, Option[String])].collect().toSeq
    // arr1: fence(A) then data a; arr2: fence(B) then data b; arr3 c;
    // arr4 d; arr5 commit(A); arr6 abort(B); arr7 fence(C) then data f.
    assert(p0.map(_._1) === (0L until 10L))
    assert(p0.map(r => (r._2, r._3, r._5)) === Seq(
      (BatchType.TxFence, false, None), (BatchType.RaftData, false, Some("a")),
      (BatchType.TxFence, false, None), (BatchType.RaftData, false, Some("b")),
      (BatchType.RaftData, false, Some("c")), (BatchType.RaftData, false, Some("d")),
      (BatchType.RaftData, true, None), (BatchType.RaftData, true, None),
      (BatchType.TxFence, false, None), (BatchType.RaftData, false, Some("f"))))
    // marker fan-out reached partition 1 too (T3 add_partitions semantics)
    val p1 = log.where($"partition" === 1).orderBy("offset")
      .select("is_control", "decision").as[(Boolean, Option[String])].collect()
    assert(p1.toSeq === Seq((false, None), (false, None), (true, Some("abort"))))
  }

  test("aborted ranges cover fence-to-last-data of aborted txns only") {
    val got = TxnEngine.abortedRanges(mkLog())
      .select("partition", "pid", "first", "last")
      .as[(Int, Long, Long, Long)].collect().toSet
    // p0: B's fence at off 2, data at 3 and 5 => [2, 5]; p1: fence 0, data 1 => [0, 1]
    assert(got === Set((0, 1L, 2L, 5L), (1, 1L, 0L, 1L)))
  }

  test("LSO = first offset of open txn, else high watermark") {
    val lso = TxnEngine.lastStableOffsets(mkLog())
      .as[(Int, Long)].collect().toMap
    // p0: open txn C's fence at offset 8; p1: nothing open => hwm 3
    assert(lso === Map(0 -> 8L, 1 -> 3L))
  }

  test("read_committed sees only committed data below the LSO") {
    val got = TxnEngine.readCommitted(mkLog())
      .select("v").as[String].collect().toSet
    // A committed (a, c); B aborted (b, d, e dropped); C open (f beyond LSO)
    assert(got === Set("a", "c"))
  }

  test("offset translation: kafka offsets are the dense rank of data rows") {
    val got = TxnEngine.offsetTranslation(mkLog())
      .where($"kafka_offset".isNotNull)
      .select("partition", "offset", "kafka_offset")
      .as[(Int, Long, Long)].collect().toSet
    // p0 data rows at raft offsets 1,3,4,5,9 -> kafka 0..4; p1 e@1 -> 0
    assert(got === Set(
      (0, 1L, 0L), (0, 3L, 1L), (0, 4L, 2L), (0, 5L, 3L), (0, 9L, 4L),
      (1, 1L, 0L)))
  }

  test("list_transactions reports state, fan-out breadth, and footprint") {
    val got = TxnEngine.listTransactions(mkLog())
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    // p0 log: fence(A)@0 a@1 fence(B)@2 b@3 c@4 d@5 commit@6 abort@7 fence(C)@8 f@9
    // p1 log: fence(B)@0 e@1 abort@2
    assert(got === Set(
      (0L, 0L, "CompleteCommit", 1L, 2L, 1L),
      (1L, 0L, "CompleteAbort", 2L, 3L, 1L),
      (0L, 1L, "Ongoing", 1L, 1L, 9L)))
  }

  test("expiry sweep aborts hung txns, fences their late commits, advances LSO") {
    // txn C (pid 0, seq 1) idle since arr 7; txn D (pid 1, seq 1) still
    // active at arr 18. Sweep at 20 with timeout 5: C expired (7+5 < 20),
    // D fresh. Both producers then attempt late commits at arr 25.
    val data = mkData().unionByName(
      Seq((0, 18L, 1L, 0, 1L, "g")).toDF("partition", "arrival", "pid", "epoch", "txn_seq", "v"))
    val allEnds = mkEnds().unionByName(
      Seq((0L, 1L, "commit", 25L), (1L, 1L, "commit", 25L))
        .toDF("pid", "txn_seq", "decision", "arrival"))
    val exp = TxnEngine.expiredTransactions(data, allEnds, 5L, 20L)
      .select("pid", "txn_seq", "last_update").as[(Long, Long, Long)].collect().toSet
    assert(exp === Set((0L, 1L, 7L)))
    val (applied, rejected) = TxnEngine.expireSweep(data, allEnds, 5L, 20L)
    // C's producer is fenced: its late commit is rejected, not applied
    assert(rejected.select("pid", "txn_seq", "error").as[(Long, Long, String)]
      .collect().toSet === Set((0L, 1L, "invalid_producer_epoch")))
    val log = TxnEngine.interleaveMarkers(data, applied)
    // C carries a coordinator abort; D's late commit applied normally
    val states = TxnEngine.listTransactions(log)
      .select("pid", "txn_seq", "state").as[(Long, Long, String)].collect().toSet
    assert(states === Set(
      (0L, 0L, "CompleteCommit"), (1L, 0L, "CompleteAbort"),
      (0L, 1L, "CompleteAbort"), (1L, 1L, "CompleteCommit")))
    // nothing is open after the sweep: LSO = HWM everywhere, and
    // read_committed no longer stalls behind the hung txn
    val lso = TxnEngine.lastStableOffsets(log).as[(Int, Long)].collect().toMap
    val hwm = log.groupBy("partition").agg((max("offset") + 1).as("hwm"))
      .as[(Int, Long)].collect().toMap
    assert(lso === hwm)
    val visible = TxnEngine.readCommitted(log).select("v").as[String].collect().toSet
    assert(visible === Set("a", "c", "g"))
  }

  test("initProducerIds: chunked large path matches the small-input gate") {
    val producers = (0L until 500L).map(i => f"tx-${(i * 131) % 500}%04d")
      .distinct.toDF("name")
    val small = TxnEngine.initProducerIds(producers, col("name"))
      .select("name", "pid").as[(String, Long)].collect().toSet
    val large = TxnEngine.initProducerIds(producers, col("name"), smallInputMaxRows = 0)
      .select("name", "pid").as[(String, Long)].collect().toSet
    assert(small === large)
    assert(small.map(_._2) === (0L until 500L).toSet)
  }

  test("describe_producers reports last offset and open-txn start per partition") {
    val got = TxnEngine.describeProducers(mkLog())
      .as[(Int, Long, Int, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (0, 0L, 0, 9L, 3L, Some(8L)),   // pid 0 on p0: a,c,f; open txn C starts at its fence@8
      (0, 1L, 0, 5L, 2L, None),       // pid 1 on p0: b,d; aborted, not open
      (1, 1L, 0, 1L, 1L, None)))      // pid 1 on p1: e
  }
}
