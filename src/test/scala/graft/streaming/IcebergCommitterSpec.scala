package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.IcebergCommitter.{CommitMetaProp, PendingFiles}

/**
 * End-to-end datalake committer: coordinator pending entries → one
 * Iceberg merge-append per pass with the `redpanda.commit-metadata`
 * crash-recovery property (`iceberg_file_committer.cc:101-258`,
 * `commit_offset_metadata.cc`), including the crash-retry replay where
 * the Iceberg commit landed but the coordinator's marks were lost.
 */
class IcebergCommitterSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("iceberg_committer").toString + "/t"

  /** Log rows of one partition over offsets [lo, hi]. */
  private def logRows(p: Int, lo: Long, hi: Long): DataFrame =
    (lo to hi).map(o => (p, o, s"payload-$p-$o")).toDF("partition", "offset", "value")

  private val identityPart: Column => Column = c => c

  private def stage(t: String, p: Int, lo: Long, hi: Long) =
    IcebergFormat.stageAppend(logRows(p, lo, hi), col("partition"), t, identityPart)

  private def tableOffsets(t: String): Seq[(Int, Long)] =
    IcebergFormat.readTable(spark, t).select("partition", "offset")
      .as[(Int, Long)].collect().toSeq.sorted

  test("fresh table: all entries append in one snapshot, property stamped, full updates") {
    val t = freshTable()
    assert(IcebergFormat.ensureTable(spark, t, logRows(0, 0, 0).schema, "partition"))
    assert(!IcebergFormat.ensureTable(spark, t, logRows(0, 0, 0).schema, "partition"))
    val pending = Seq(
      PendingFiles(0, addedAt = 2, entryEnd = 49, stage(t, 0, 0, 49)),
      PendingFiles(0, addedAt = 3, entryEnd = 99, stage(t, 0, 50, 99)),
      PendingFiles(1, addedAt = 4, entryEnd = 29, stage(t, 1, 0, 29)))
    val pass = IcebergCommitter.commitTopicFiles(spark, t, pending)
    assert(pass.icebergTxn && pass.appended === 3 && pass.dedupSkipped === 0)
    // every partition marks committed at its LAST pending end (:203-216)
    assert(pass.updates === Seq((0, 99L), (1, 29L)))
    // property = max appended added_pending_at (:176-178,230)
    assert(IcebergCommitter.committedOffset(spark, t) === Some(4L))
    assert(tableOffsets(t) ===
      ((0L to 99L).map((0, _)) ++ (0L to 29L).map((1, _))))
  }

  test("crash-retry replay: identical pass dedups all, table version untouched") {
    val t = freshTable()
    IcebergFormat.ensureTable(spark, t, logRows(0, 0, 0).schema, "partition")
    val pending = Seq(
      PendingFiles(0, addedAt = 2, entryEnd = 49, stage(t, 0, 0, 49)),
      PendingFiles(1, addedAt = 3, entryEnd = 19, stage(t, 1, 0, 19)))
    val pass1 = IcebergCommitter.commitTopicFiles(spark, t, pending)
    assert(pass1.icebergTxn)
    val hintAfter1 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/metadata/version-hint.text"))).trim
    // crash between Iceberg commit and coordinator mark application:
    // the retry re-presents the SAME pending entries
    val pass2 = IcebergCommitter.commitTopicFiles(spark, t, pending)
    assert(!pass2.icebergTxn && pass2.snapshotId.isEmpty)
    assert(pass2.appended === 0 && pass2.dedupSkipped === 2)
    // the updates are still emitted so the coordinator can replicate
    // the fact the files committed (:152-158)
    assert(pass2.updates === pass1.updates)
    // catalog untouched: same metadata version, no duplicate rows
    val hintAfter2 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/metadata/version-hint.text"))).trim
    assert(hintAfter2 === hintAfter1)
    assert(tableOffsets(t).size === 70)
  }

  test("partial retry: entries at or below the table offset skip, newer append") {
    val t = freshTable()
    IcebergFormat.ensureTable(spark, t, logRows(0, 0, 0).schema, "partition")
    val first = Seq(
      PendingFiles(0, addedAt = 2, entryEnd = 49, stage(t, 0, 0, 49)),
      PendingFiles(0, addedAt = 5, entryEnd = 99, stage(t, 0, 50, 99)))
    assert(IcebergCommitter.commitTopicFiles(spark, t, first).icebergTxn)
    // retry presents the old entries PLUS one admitted after the crash
    val retry = first :+
      PendingFiles(1, addedAt = 8, entryEnd = 9, stage(t, 1, 0, 9))
    val pass = IcebergCommitter.commitTopicFiles(spark, t, retry)
    assert(pass.icebergTxn && pass.appended === 1 && pass.dedupSkipped === 2)
    assert(pass.updates === Seq((0, 99L), (1, 9L)))
    // property advances to the newest appended entry
    assert(IcebergCommitter.committedOffset(spark, t) === Some(8L))
    assert(tableOffsets(t).size === 110) // no duplicates from the retry
  }

  test("no pending entries: no transaction, no updates (:105-110)") {
    val t = freshTable()
    IcebergFormat.ensureTable(spark, t, logRows(0, 0, 0).schema, "partition")
    val pass = IcebergCommitter.commitTopicFiles(spark, t, Seq.empty)
    assert(!pass.icebergTxn && pass.updates.isEmpty)
  }

  test("property codec: round-trip and malformed inputs reject (commit_offset_metadata.cc)") {
    assert(IcebergCommitter.parseOffsetJson(
      IcebergCommitter.offsetToJson(1234L)) === Some(1234L))
    assert(IcebergCommitter.parseOffsetJson("not json") === None)
    assert(IcebergCommitter.parseOffsetJson("[1]") === None)
    assert(IcebergCommitter.parseOffsetJson("{}") === None)
    assert(IcebergCommitter.parseOffsetJson("""{"offset": "x"}""") === None)
  }

  test("property survives later snapshots without it and metadata rewrites") {
    val t = freshTable()
    IcebergFormat.ensureTable(spark, t, logRows(0, 0, 0).schema, "partition")
    IcebergCommitter.commitTopicFiles(spark, t, Seq(
      PendingFiles(0, addedAt = 2, entryEnd = 9, stage(t, 0, 0, 9))))
    // an unrelated append (no property) becomes the current snapshot:
    // the walk falls back to the most recent ancestor carrying it (:61-96)
    IcebergFormat.commitStaged(spark, t, stage(t, 1, 0, 4))
    assert(IcebergCommitter.committedOffset(spark, t) === Some(2L))
    // a rename (metadata rewrite) must not drop the summary property
    IcebergFormat.renameColumn(spark, t, "value", "payload")
    assert(IcebergCommitter.committedOffset(spark, t) === Some(2L))
  }
}
