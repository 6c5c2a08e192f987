package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * U4 management-plane folds (`transform/transform_manager.cc` replay,
 * `model/transform.h:320-344` report): the lifecycle command-log fold and
 * the per-(transform, partition) processor status report, on scenarios
 * small enough to reason about by hand.
 */
class TransformPlaneSpec extends SparkSpec {
  import spark.implicits._

  private def fold(cmds: (Long, String, String)*): Map[String, (String, Long, Long, Long, Long)] =
    Transforms.lifecycle(cmds.toDF("seq", "transform", "op"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("lifecycle: deploy/pause/resume/delete replay to final states") {
    val got = fold(
      // t1: deploy, pause, resume — running
      (1L, "t1", "deploy"), (2L, "t1", "pause"), (3L, "t1", "resume"),
      // t2: deploy then pause — paused
      (4L, "t2", "deploy"), (5L, "t2", "pause"),
      // t3: deploy, delete, deploy — fresh incarnation, running
      (6L, "t3", "deploy"), (7L, "t3", "pause"), (8L, "t3", "delete"), (9L, "t3", "deploy"),
      // t4: deploy then delete — gone
      (10L, "t4", "deploy"), (11L, "t4", "delete"),
      // t5: pause arrives between delete and redeploy — no-op on a dead
      // transform, so the redeployed incarnation is running
      (12L, "t5", "deploy"), (13L, "t5", "delete"), (14L, "t5", "pause"), (15L, "t5", "deploy"))
    assert(got.keySet === Set("t1", "t2", "t3", "t5")) // t4 stays deleted
    assert(got("t1") === (("running", 1L, 0L, 1L, 3L)))
    assert(got("t2") === (("paused", 1L, 0L, 4L, 5L)))
    assert(got("t3") === (("running", 2L, 1L, 9L, 9L)))
    assert(got("t5") === (("running", 2L, 1L, 15L, 15L)))
  }

  test("lifecycle: redeploy of a live transform keeps it running and counts") {
    val got = fold((1L, "t", "deploy"), (2L, "t", "pause"), (3L, "t", "deploy"))
    assert(got("t") === (("running", 2L, 0L, 1L, 3L)))
  }

  test("statusReport: errored until a later start/commit; lag vs partition HWM") {
    val proc = Seq(
      // (seq, transform, partition, kind, committed_offset)
      (1L, "t", 0, "start", None),
      (2L, "t", 0, "commit", Some(4L)),
      (3L, "t", 0, "error", None),            // last event is error -> errored
      (1L, "t", 1, "error", None),
      (2L, "t", 1, "start", None),
      (3L, "t", 1, "commit", Some(9L)),       // recovered -> running
      (1L, "u", 0, "start", None))            // no commits yet -> lag = hwm
      .toDF("seq", "transform", "partition", "kind", "committed_offset")
    val hwm = Seq((0, 10L), (1, 10L)).toDF("partition", "hwm")
    val got = Transforms.statusReport(proc, hwm).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(("t", 0)) === (("errored", Some(4L), 5L, 1L)))
    assert(got(("t", 1)) === (("running", Some(9L), 0L, 1L)))
    assert(got(("u", 0)) === (("running", None, 10L, 0L)))
  }

  test("commit batcher coalesces each interval to its last offset; coordinator is murmur2-routed") {
    // key (t0,0,0): enqueues at seq 1,2,3 (interval 0) then 12 (interval 1)
    // -> 2 flushes, 4 enqueued, committed = offset at seq 12.
    // key (t1,1,0): one enqueue -> 1 flush, committed = its own offset.
    val prog = Seq(
      ("t0", 0, 0, 1L, 10L), ("t0", 0, 0, 2L, 20L), ("t0", 0, 0, 3L, 30L),
      ("t0", 0, 0, 12L, 120L),
      ("t1", 1, 0, 5L, 55L))
      .toDF("transform", "partition", "output_topic", "seq", "offset")
    val got = Transforms.commitBatcher(prog, intervalLen = 10L, nCoordinators = 16)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))))
      .toMap
    val (c0, f0, e0, coord0) = got(("t0", 0))
    assert((c0, f0, e0) === ((120L, 2L, 4L)))
    val (c1, f1, e1, coord1) = got(("t1", 1))
    assert((c1, f1, e1) === ((55L, 1L, 1L)))
    // coordinator = unsigned murmur2 of the key string mod 16
    def route(k: String): Int = {
      val h = graft.functions.Murmur2.hash(k.getBytes("UTF-8")) & 0xffffffffL
      (h % 16).toInt
    }
    assert(coord0 === route("t0/0/0"))
    assert(coord1 === route("t1/1/0"))
  }

  test("applyStart FromEnd snapshots per-partition HWMs; FromCommitted resumes after commits") {
    val dir = java.nio.file.Files.createTempDirectory("u2spec").toString
    val snapshot = Seq((0, 0L), (0, 1L), (1, 0L)).toDF("partition", "offset")
    snapshot.write.parquet(s"$dir/in")
    val input = Transforms.PathInput(s"$dir/in", snapshot.schema)
    // the stream later sees partition 2, absent from the snapshot entirely
    val full = Seq((0, 0L), (0, 1L), (0, 2L), (1, 0L), (1, 1L), (2, 0L))
      .toDF("partition", "offset")
    val end = Transforms.applyStart(spark, input, Transforms.FromEnd, full)
      .select("partition", "offset").as[(Int, Long)].collect().toSet
    assert(end === Set((0, 2L), (1, 1L), (2, 0L)))
    val committed = Seq((0, 0L)).toDF("partition", "committed_offset")
    val resumed = Transforms.applyStart(spark, input, Transforms.FromCommitted, full,
        committed = Some(committed))
      .select("partition", "offset").as[(Int, Long)].collect().toSet
    assert(resumed === Set((0, 1L), (0, 2L), (1, 0L), (1, 1L), (2, 0L)))
  }
}
