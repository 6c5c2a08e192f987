package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 log source: segment pruning against the sidecar index,
  * batch-header seeking, header-only projection, and decode parity of
  * key/value bytes. */
class LogSourceSpec extends SparkSpec {

  // 2 partitions x 2 segments x (2 batches of 3 records)
  private lazy val root: String = {
    val dir = Files.createTempDirectory("logsource_spec").toString
    def rows(base: Long, ts0: Long): Seq[(Long, Long, Array[Byte], Array[Byte])] =
      (0 until 6).map(i => (base + i, ts0 + i * 10,
        s"k${base + i}".getBytes("UTF-8"), s"v${base + i}".getBytes("UTF-8")))
    val lines = Seq(
      LogSource.writeSegment(dir, 0, rows(0, 100), batchRecords = 3),
      LogSource.writeSegment(dir, 0, rows(6, 160), batchRecords = 3),
      LogSource.writeSegment(dir, 1, rows(0, 500), batchRecords = 3),
      LogSource.writeSegment(dir, 1, rows(6, 560), batchRecords = 3))
    LogSource.writeIndex(dir, lines)
    dir
  }

  private def table = spark.read.format("graft.sources.LogSource")
    .option("path", root).load()

  test("full scan decodes every record with key/value bytes intact") {
    val out = table.orderBy("partition", "offset")
      .select(col("partition"), col("offset"), col("timestamp"),
        col("key").cast("string"), col("value").cast("string"))
      .collect()
    assert(out.length === 24)
    assert(out.head.toSeq === Seq(0, 0L, 100L, "k0", "v0"))
    assert(out.last.toSeq === Seq(1, 11L, 610L, "k11", "v11"))
  }

  test("partition + offset pushdown prunes segments at plan time") {
    val q = table.where(col("partition") === 1 && col("offset") >= 7 &&
      col("offset") <= 9)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftLogScan segments=1/4"), plan)
    val offsets = q.select("offset").collect().map(_.getLong(0)).sorted
    assert(offsets === Array(7L, 8L, 9L))
  }

  test("timestamp pushdown prunes on the index time bounds") {
    val q = table.where(col("timestamp") >= 500L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("segments=2/4"), plan)
    assert(q.count() === 12)
    // residual bound inside a surviving segment is exact
    assert(table.where(col("timestamp") === 560L).count() === 1)
  }

  test("header-only projection answers offset aggregates") {
    val agg = table.where(col("offset") < 6).groupBy("partition")
      .agg(count(lit(1)).as("n"), max("offset").as("mx"))
      .orderBy("partition").collect()
    assert(agg.map(_.toSeq).toSeq ===
      Seq(Seq(0, 6L, 5L), Seq(1, 6L, 5L)))
  }

  test("a torn segment tail fails loudly instead of decoding padding") {
    val dir = Files.createTempDirectory("logsource_torn").toString
    val line = LogSource.writeSegment(dir, 0,
      (0 until 6).map(i => (i.toLong, 100L + i,
        s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"))), batchRecords = 3)
    LogSource.writeIndex(dir, Seq(line))
    val seg = java.nio.file.Paths.get(dir, "p0").toFile.listFiles().head.toPath
    val bytes = Files.readAllBytes(seg)
    Files.write(seg, java.util.Arrays.copyOf(bytes, bytes.length - 5))
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("graftlog").option("path", dir).load().count()
    }
    assert(ex.getMessage.contains("truncated") ||
      Option(ex.getCause).exists(_.getMessage.contains("truncated")))
  }

  test("streaming resume reads appended segments exactly once") {
    val dir = Files.createTempDirectory("logsource_stream").toString
    val ckpt = Files.createTempDirectory("logsource_ckpt").toString
    def phase(base: Long, ts0: Long): Unit = {
      val line = LogSource.writeSegment(dir, 0,
        (0 until 6).map(i => (base + i, ts0 + i,
          s"k${base + i}".getBytes("UTF-8"), Array.emptyByteArray)),
        batchRecords = 3)
      val prior = if (Files.exists(java.nio.file.Paths.get(dir, "_index.jsonl")))
        LogSource.parseIndex(dir).map(s =>
          s"""{"path":"${s.path}","partition":${s.partition},""" +
            s""""base_offset":${s.baseOffset},"last_offset":${s.lastOffset},""" +
            s""""min_ts":${s.minTs},"max_ts":${s.maxTs}}""")
      else Nil
      LogSource.writeIndex(dir, prior :+ line)
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("graftlog").option("path", dir).load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val offs = df.select("offset").collect().map(_.getLong(0))
          seen.synchronized { seen ++= offs }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    phase(0, 100); drain()
    assert(seen.sorted.toSeq === (0L until 6L))
    phase(6, 200); drain()
    assert(seen.sorted.toSeq === (0L until 12L)) // no re-read of 0-5
  }

  test("write path: Spark plans the clustering/sort the writer declares; round-trip is exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("logsource_write").toString
    val rows = (0 until 3).flatMap(p => (0L until 25L).map(o =>
      (p, o, 1000L + o, s"k$o".getBytes("UTF-8"), s"v$p-$o".getBytes("UTF-8"))))
    val df = spark.createDataFrame(
      rows.toDF("partition", "offset", "timestamp", "key", "value").rdd,
      LogSource.Schema)
    // deliberately unsorted, un-clustered input: the source's
    // RequiresDistributionAndOrdering must make Spark fix it
    df.repartition(7).write.format("graftlog").mode("append")
      .option("path", dir).save()
    val back = spark.read.format("graftlog").option("path", dir).load()
    assert(back.count() === 75)
    val one = back.where(col("partition") === 1 && col("offset") === 7)
      .select(col("timestamp"), col("value").cast("string")).collect()
    assert(one.map(_.toSeq).toSeq === Seq(Seq(1007L, "v1-7")))
    // append merges the index atomically; both generations readable
    spark.createDataFrame(
        Seq((0, 25L, 1025L, "k25".getBytes("UTF-8"), "late".getBytes("UTF-8")))
          .toDF("partition", "offset", "timestamp", "key", "value").rdd,
        LogSource.Schema)
      .write.format("graftlog").mode("append").option("path", dir).save()
    assert(spark.read.format("graftlog").option("path", dir).load().count() === 76)
    assert(spark.read.format("graftlog").option("path", dir).load()
      .where(col("offset") === 25).select(col("value").cast("string"))
      .head().getString(0) === "late")
  }

  test("unsupported filters stay with Spark, supported ones bind exactly") {
    // value-based predicate is NOT pushable; correctness must hold
    val n = table.where(col("value").cast("string") === "v3").count()
    assert(n === 2) // one per partition
    val mixed = table.where(col("partition") === 0 &&
      col("value").cast("string") === "v3")
    assert(mixed.count() === 1)
    assert(mixed.queryExecution.executedPlan.toString
      .contains("segments=2/4"))
  }
}
