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

  test("exactly-once produce: a redelivered batch id commits nothing twice") {
    val out = tmp()
    val state = scala.collection.mutable.Map.empty[Int, Long]
    val b1 = Seq((0, 10L, "a"), (0, 11L, "b"), (1, 20L, "c"))
      .toDF("pt", "arrival", "value")
    val n1 = Produce.appendBatchExactlyOnce(b1, 0L, out, state,
      col("pt"), col("arrival"))
    assert(n1 === 3L)
    assert(state.toMap === Map(0 -> 2L, 1 -> 1L))
    // crash-replay: same batch id delivered again — a committed marker
    // makes it a no-op (no re-append, no HWM advance)
    val n2 = Produce.appendBatchExactlyOnce(b1, 0L, out, state,
      col("pt"), col("arrival"))
    assert(n2 === 0L)
    assert(state.toMap === Map(0 -> 2L, 1 -> 1L))
    assert(spark.read.parquet(out).count() === 3L)
    // next batch id lands on the advanced HWMs
    val b2 = Seq((0, 12L, "d")).toDF("pt", "arrival", "value")
    assert(Produce.appendBatchExactlyOnce(b2, 1L, out, state,
      col("pt"), col("arrival")) === 1L)
    val offsets = spark.read.parquet(out)
      .where(col("partition") === 0).select("offset")
      .as[Long].collect().sorted
    assert(offsets === Array(0L, 1L, 2L)) // dense, no duplicate offsets
  }

  test("exactly-once produce stream end-to-end equals one batch assignment") {
    val dir = tmp()
    val out = s"$dir/log"; val ckpt = s"$dir/ckpt"
    val in = s"$dir/in"
    val rows = (0L until 500L).map(i => (i % 4, i, s"v$i"))
    rows.toDF("pt", "arrival", "value").write.parquet(in)
    val schema = spark.read.parquet(in).schema
    Produce.appendStreamExactlyOnce(spark,
      Transforms.PathInput(in, schema, maxFilesPerTrigger = Some(1)),
      out, ckpt, col("pt"), col("arrival")).awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() === 500L)
    // dense per-partition offsets across all micro-batches
    val perPart = got.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .select("n", "lo", "hi").as[(Long, Long, Long)].collect()
    assert(perPart.forall { case (n, lo, hi) => lo == 0L && hi == n - 1 })
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
