package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.groups.GroupEngine

/**
 * Stateful Structured Streaming coverage (SURVEY §2.5): the group FSM as
 * a continuous coordinator (mapGroupsWithState), watermarked usage
 * windows (A5), and watermark-bounded idempotent-producer dedup (G5) —
 * state survives across micro-batches exactly as the reference's STMs
 * survive across raft batches.
 */
class StreamingStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("sss").toString

  test("group FSM state evolves across micro-batches (continuous coordinator)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[GroupEngine.Cmd]
    val q = GroupEngine.describeGroupsStream(in.toDS())
      .writeStream.format("memory").queryName("groups_state")
      .outputMode("update")
      .option("checkpointLocation", tmp())
      .start()
    try {
      in.addData(
        GroupEngine.Cmd("gA", 1, "m1", "join", Seq("range")),
        GroupEngine.Cmd("gA", 2, "m2", "join", Seq("range")))
      q.processAllAvailable()
      val b1 = spark.table("groups_state").orderBy(col("generation").desc)
        .select("group", "generation", "n_members", "leader")
        .as[(String, Long, Long, String)].head()
      assert(b1 === (("gA", 2L, 2L, "m1")))

      // second micro-batch: leader leaves; state carried over, not reset
      in.addData(GroupEngine.Cmd("gA", 3, "m1", "leave", Seq("range")))
      q.processAllAvailable()
      val b2 = spark.table("groups_state").orderBy(col("generation").desc)
        .select("group", "generation", "n_members", "leader")
        .as[(String, Long, Long, String)].head()
      assert(b2 === (("gA", 3L, 1L, "m2")))
    } finally q.stop()
  }

  test("usage windows aggregate under a watermark (A5 streaming)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val agg = in.toDS().toDF("ts", "grp", "bytes")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("grp"))
      .agg(sum("bytes").as("bytes"), count(lit(1)).as("records"))
    val q = agg.writeStream.format("memory").queryName("usage_state")
      .outputMode("update").option("checkpointLocation", tmp()).start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "a", 100L),
        (Timestamp.valueOf("2024-01-01 10:45:00"), "a", 50L),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "b", 10L))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 10:59:00"), "a", 1L)) // late but in-watermark
      q.processAllAvailable()
      val got = spark.table("usage_state")
        .groupBy("grp").agg(max("bytes").as("bytes"))
        .as[(String, Long)].collect().toMap
      assert(got("a") === 151L) // 100 + 50 + late 1 merged into the 10:00 window
      assert(got("b") === 10L)
    } finally q.stop()
  }

  test("producer dedup within watermark drops duplicate (pid, seq) across batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long, String)]
    val deduped = in.toDS().toDF("ts", "pid", "seq", "v")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("pid", "seq")
    val q = deduped.writeStream.format("memory").queryName("dedup_state")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 0L, "first"),
        (Timestamp.valueOf("2024-01-01 10:00:10"), 1L, 0L, "dup-same-batch"),
        (Timestamp.valueOf("2024-01-01 10:00:20"), 1L, 1L, "ok"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 10:05:00"), 1L, 0L, "dup-next-batch"))
      q.processAllAvailable()
      val got = spark.table("dedup_state").select("v").as[String].collect().toSet
      assert(got === Set("first", "ok"))
    } finally q.stop()
  }
}
