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
