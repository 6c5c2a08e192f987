package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Iceberg v2 format round-trips: metadata.json structure, avro
 * manifest-list/manifest decoding, version-hint commit protocol,
 * metadata-driven reads, and snapshot expiry.
 */
class IcebergFormatSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("iceberg_spec").toString + "/t"

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"u$i", s"2024-01-0${1 + i % 3} 0$i:00:00"))
      .toDF("id", "user", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("commit writes v2 metadata.json, avro manifests, and a version hint") {
    val t = freshTable()
    val snap = IcebergFormat.commit(batch(0, 6), col("ts"), t)
    assert(snap === 1L)
    val meta = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/metadata/v1.metadata.json")))
    assert(meta.contains(""""format-version": 2"""), meta)
    assert(meta.contains(""""current-snapshot-id": 1"""), meta)
    assert(meta.contains(""""transform": "identity""""), meta)
    assert(meta.contains(""""field-id": 1000"""), meta)
    val hint = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/metadata/version-hint.text"))).trim
    assert(hint === "1")
    assert(Files.exists(java.nio.file.Paths.get(s"$t/metadata/snap-1.avro")))
    assert(Files.exists(java.nio.file.Paths.get(s"$t/metadata/manifest-1.avro")))
  }

  test("multi-snapshot append: catalog counts and metadata-driven read") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 6), col("ts"), t)
    IcebergFormat.commit(batch(6, 10), col("ts"), t)
    val cat = IcebergFormat.snapshotCatalog(spark, t)
      .orderBy("snapshot_id").collect()
    assert(cat.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ===
      Seq((1L, 1L, 6L), (2L, 2L, 4L)))
    // current snapshot's manifest list carries BOTH manifests, so the
    // read sees all appended rows
    val rows = IcebergFormat.readTable(spark, t)
    assert(rows.count() === 10L)
    assert(rows.select("id").as[Long].collect().sorted === (0L until 10L).toArray)
    // partition column materialized from the hour transform
    assert(rows.select("p_key").distinct().count() >= 2)
  }

  test("staged commits: conflict detected, rebase keeps both append sets") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    // both writers stage against base version 1
    val a = IcebergFormat.stageAppend(batch(4, 7), col("ts"), t)
    val b = IcebergFormat.stageAppend(batch(7, 10), col("ts"), t)
    assert(a.baseVersion === 1 && b.baseVersion === 1)
    // staged appends are invisible until published
    assert(IcebergFormat.readTable(spark, t).count() === 4L)
    val (snapA, rebasedA) = IcebergFormat.commitStaged(spark, t, a)
    val (snapB, rebasedB) = IcebergFormat.commitStaged(spark, t, b)
    assert((snapA, rebasedA) === (2L, false))
    assert((snapB, rebasedB) === (3L, true)) // version moved under b -> rebase
    // linear history, both writers' rows survive
    val cat = IcebergFormat.snapshotCatalog(spark, t).orderBy("snapshot_id").collect()
    assert(cat.map(r => (r.getLong(0), r.getLong(3))).toSeq ===
      Seq((1L, 4L), (2L, 3L), (3L, 3L)))
    assert(IcebergFormat.readTable(spark, t).select("id").as[Long].collect().sorted
      === (0L until 10L).toArray)
    // time travel to writer A's snapshot excludes writer B's rows
    assert(IcebergFormat.timeTravel(spark, t, 2L).count() === 7L)
  }

  test("staged commit refuses a schema that drifted from the table") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    val drift = batch(4, 6).withColumn("extra", lit(1L))
    assertThrows[IllegalArgumentException](
      IcebergFormat.stageAppend(drift, col("ts"), t))
  }

  test("expire removes time travel but keeps data referenced by survivors") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    IcebergFormat.commit(batch(4, 7), col("ts"), t)
    IcebergFormat.commit(batch(7, 9), col("ts"), t)
    val expired = IcebergFormat.expireSnapshots(spark, t, keepLast = 2)
    assert(expired === Seq(1L))
    val cat = IcebergFormat.snapshotCatalog(spark, t).orderBy("snapshot_id").collect()
    assert(cat.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // hint advanced to v4 (3 commits + 1 expiry)
    val hint = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/metadata/version-hint.text"))).trim
    assert(hint === "4")
    // snapshot 1's manifest is still EXISTING in the survivors' manifest
    // lists, so its data files were NOT deleted: the current read still
    // sees every appended row (expiry = no more time travel, not data loss)
    assert(IcebergFormat.readTable(spark, t).count() === 9L)
  }

  test("time travel resolves each snapshot's own manifest list") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    IcebergFormat.commit(batch(4, 7), col("ts"), t)
    IcebergFormat.commit(batch(7, 9), col("ts"), t)
    assert(IcebergFormat.timeTravel(spark, t, 1L).count() === 4L)
    assert(IcebergFormat.timeTravel(spark, t, 2L).count() === 7L)
    assert(IcebergFormat.timeTravel(spark, t, 3L).count() === 9L)
    // travel to snapshot 2 sees exactly ids 0..6
    assert(IcebergFormat.timeTravel(spark, t, 2L)
      .select("id").as[Long].collect().sorted === (0L until 7L).toArray)
    // expired snapshot refuses (expiry removes time travel)
    IcebergFormat.expireSnapshots(spark, t, keepLast = 2)
    intercept[IllegalArgumentException] {
      IcebergFormat.timeTravel(spark, t, 1L).count()
    }
  }

  test("rewriteDataFiles bin-packs multi-file partitions, content unchanged") {
    val t = freshTable()
    // three appends land 3 files in each day partition
    IcebergFormat.commit(batch(0, 3), col("ts"), t, Datalake.dayPartition)
    IcebergFormat.commit(batch(3, 6), col("ts"), t, Datalake.dayPartition)
    IcebergFormat.commit(batch(6, 9), col("ts"), t, Datalake.dayPartition)
    val before = IcebergFormat.fileInventory(spark, t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.values.max > 1, s"setup should produce multi-file partitions: $before")
    val contentBefore = IcebergFormat.readTable(spark, t)
      .select("id").as[Long].collect().sorted

    val snap = IcebergFormat.rewriteDataFiles(spark, t)
    assert(snap === Some(4L))
    val after = IcebergFormat.fileInventory(spark, t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet === before.keySet)
    assert(after.values.forall(_ === 1L), s"compaction should leave one file/partition: $after")
    // table content is bit-identical
    val contentAfter = IcebergFormat.readTable(spark, t)
      .select("id").as[Long].collect().sorted
    assert(contentAfter === contentBefore)
    // the pre-rewrite snapshot still time-travels to the old layout
    assert(IcebergFormat.timeTravel(spark, t, 3L).count() === 9L)
    // idempotent: nothing left to compact
    assert(IcebergFormat.rewriteDataFiles(spark, t) === None)
    // expiry after rewrite must NOT delete carried files still referenced
    // by the replace snapshot (file-level reachability)
    IcebergFormat.expireSnapshots(spark, t, keepLast = 1)
    assert(IcebergFormat.readTable(spark, t)
      .select("id").as[Long].collect().sorted === contentBefore)
  }

  test("streaming sink: one snapshot per batch; redelivered batch ids are no-ops") {
    import java.nio.file.attribute.FileTime
    val stage = Files.createTempDirectory("ice_sink")
    val in = Files.createDirectory(stage.resolve("in"))
    def stageHalf(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("ice_half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.copy(p, in.resolve(name)); moved = true
        }
      }
      Files.setLastModifiedTime(in.resolve(name), FileTime.fromMillis(mtime))
    }
    stageHalf("a.parquet", batch(0, 5), 1700000000000L)
    stageHalf("b.parquet", batch(5, 9), 1700000060000L)
    val t = freshTable()
    val schema = spark.read.parquet(in.toString).schema
    def deliver(ck: String): Unit =
      IcebergFormat.icebergSink(
        Transforms.PathInput(in.toString, schema, maxFilesPerTrigger = Some(1))
          .stream(spark),
        col("ts"), t, s"$stage/$ck", Datalake.dayPartition).awaitTermination()
    deliver("ck1")
    val cat1 = IcebergFormat.snapshotCatalog(spark, t).orderBy("snapshot_id").collect()
    assert(cat1.map(r => (r.getLong(0), r.getLong(3))).toSeq === Seq((1L, 5L), (2L, 4L)))
    assert(IcebergFormat.readTable(spark, t).count() === 9L)
    // full redelivery with a fresh checkpoint: batch ids 0,1 repeat and
    // their committed snapshots make both commits no-ops
    deliver("ck2")
    val cat2 = IcebergFormat.snapshotCatalog(spark, t).orderBy("snapshot_id").collect()
    assert(cat2.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(IcebergFormat.readTable(spark, t).count() === 9L)
  }

  test("streaming upsert sink: latest version per key; replay cannot re-delete") {
    import java.nio.file.attribute.FileTime
    val stage = Files.createTempDirectory("ice_upsert")
    val in = Files.createDirectory(stage.resolve("in"))
    def stageHalf(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("ice_uhalf")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.copy(p, in.resolve(name)); moved = true
        }
      }
      Files.setLastModifiedTime(in.resolve(name), FileTime.fromMillis(mtime))
    }
    // batch 0: ids 0-5 (v1); batch 1: ids 3-7 updated (user suffixed -v2)
    stageHalf("a.parquet", batch(0, 6), 1700000000000L)
    stageHalf("b.parquet", batch(3, 8).withColumn("user", concat(col("user"), lit("-v2"))),
      1700000060000L)
    val t = freshTable()
    val schema = spark.read.parquet(in.toString).schema
    def deliver(ck: String): Unit =
      IcebergFormat.icebergUpsertSink(
        Transforms.PathInput(in.toString, schema, maxFilesPerTrigger = Some(1))
          .stream(spark),
        col("ts"), t, s"$stage/$ck", keyCols = Seq("id"),
        partFn = Datalake.dayPartition).awaitTermination()
    deliver("ck1")
    val got = IcebergFormat.readTable(spark, t)
      .select("id", "user").as[(Long, String)].collect().toSet
    val want = (0L until 3L).map(i => (i, s"u$i")).toSet ++
      (3L until 8L).map(i => (i, s"u$i-v2")).toSet
    assert(got === want)
    // full redelivery: batch-id dedup fires BEFORE the delete — the
    // replayed batch 1 must not equality-delete its own appended rows
    deliver("ck2")
    assert(IcebergFormat.readTable(spark, t)
      .select("id", "user").as[(Long, String)].collect().toSet === want)
  }

  test("a reader never sees a half-committed version (hint flips last)") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 3), col("ts"), t)
    // simulate a crash AFTER metadata write but BEFORE hint flip by
    // writing a garbage future metadata file: readers must stay on v1
    Files.write(java.nio.file.Paths.get(s"$t/metadata/v9.metadata.json"),
      "{not json".getBytes)
    assert(IcebergFormat.readTable(spark, t).count() === 3L)
  }

  test("position deletes: merge-on-read, time travel unaffected, later appends intact") {
    val t = freshTable()
    val s1 = IcebergFormat.commit(batch(0, 10), col("ts"), t)
    val del = IcebergFormat.deleteWhere(spark, t, col("id") % 3 === 0)
    assert(del.nonEmpty)
    // current read drops ids 0,3,6,9
    val now = IcebergFormat.readTable(spark, t).select("id").as[Long].collect().toSet
    assert(now === (0L until 10L).filterNot(_ % 3 == 0).toSet)
    // time travel to the pre-delete snapshot sees every row
    val then_ = IcebergFormat.timeTravel(spark, t, s1).select("id").as[Long].collect().toSet
    assert(then_ === (0L until 10L).toSet)
    // an append after the delete: old deletes still apply, new rows whole
    val more = (10 until 15).map(i => (i.toLong, s"u$i", f"2024-01-01 ${i % 24}%02d:00:00"))
      .toDF("id", "user", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    IcebergFormat.commit(more, col("ts"), t)
    val after = IcebergFormat.readTable(spark, t).select("id").as[Long].collect().toSet
    assert(after === ((0L until 10L).filterNot(_ % 3 == 0) ++ (10L until 15L)).toSet)
  }

  test("equality deletes: key-scoped, older-commits-only — the upsert pattern") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 8), col("ts"), t) // v1 of ids 0-7
    // upsert ids 2,5: equality-delete the old rows, append new versions
    val del = IcebergFormat.deleteWhereEquality(spark, t,
      Seq(2L, 5L).toDF("id"))
    assert(del.nonEmpty)
    val fresh = Seq((2L, "u2-v2", "2024-01-01 05:00:00"), (5L, "u5-v2", "2024-01-01 06:00:00"))
      .toDF("id", "user", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    IcebergFormat.commit(fresh, col("ts"), t)
    val got = IcebergFormat.readTable(spark, t)
      .select("id", "user").as[(Long, String)].collect().toSet
    // old 2/5 gone (older commit than the delete), new 2/5 present
    // (newer sequence number — the spec's scoping rule)
    assert(got === ((0L until 8L).filterNot(Set(2L, 5L)).map(i => (i, s"u$i")) ++
      Seq((2L, "u2-v2"), (5L, "u5-v2"))).toSet)
  }

  test("schema evolution: appended optional column merges as null for old rows") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    val wider = batch(4, 8).withColumn("score", col("id").cast("double") * 2)
    IcebergFormat.commit(wider, col("ts"), t)
    val got = IcebergFormat.readTable(spark, t)
      .select("id", "score").as[(Long, Option[Double])].collect().toMap
    (0L until 4L).foreach(i => assert(got(i).isEmpty))
    (4L until 8L).foreach(i => assert(got(i).contains(i * 2.0)))
    // metadata carries the widened schema
    val meta = new String(Files.readAllBytes(java.nio.file.Paths.get(
      s"$t/metadata/v2.metadata.json")))
    assert(meta.contains(""""name": "score""""), meta)
  }

  test("schema evolution rejects drops, retypes, and required additions") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    intercept[IllegalArgumentException] { // drop a column
      IcebergFormat.commit(batch(4, 6).drop("user"), col("ts"), t)
    }
    intercept[IllegalArgumentException] { // retype id long -> string
      IcebergFormat.commit(batch(4, 6).withColumn("id", col("id").cast("string")),
        col("ts"), t)
    }
    assert(IcebergFormat.readTable(spark, t).count() === 4L) // table intact
  }

  test("deleteWhere with no matches commits nothing; bin-pack refuses pending deletes") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 6), col("ts"), t)
    assert(IcebergFormat.deleteWhere(spark, t, col("id") > 1000).isEmpty)
    assert(IcebergFormat.deleteWhere(spark, t, col("id") === 2L).nonEmpty)
    // rewriteDataFiles must refuse while a delete manifest is live —
    // rewritten file paths would orphan the position deletes
    assert(IcebergFormat.rewriteDataFiles(spark, t, targetFileBytes = 1L << 20).isEmpty)
    assert(IcebergFormat.readTable(spark, t).count() === 5L)
  }

  test("compactDeletes folds both delete flavors into a replace snapshot") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 8), col("ts"), t)
    IcebergFormat.deleteWhere(spark, t, col("id") === 1L)         // position
    IcebergFormat.deleteWhereEquality(spark, t, Seq(4L).toDF("id")) // equality
    val before = IcebergFormat.readTable(spark, t)
      .select("id").as[Long].collect().toSet
    assert(before === Set(0L, 2L, 3L, 5L, 6L, 7L))
    val snap = IcebergFormat.compactDeletes(spark, t)
    assert(snap.nonEmpty)
    // content identical, merge-on-read cost gone, bin-pack unblocked
    val after = IcebergFormat.readTable(spark, t).select("id").as[Long].collect().toSet
    assert(after === before)
    assert(IcebergFormat.compactDeletes(spark, t).isEmpty) // nothing pends
    // bin-pack no longer blocked by deletes — and with one consolidated
    // file per partition it correctly finds no work to do
    assert(IcebergFormat.fileInventory(spark, t)
      .agg(max("n_files")).collect()(0).getLong(0) === 1L)
    // a fresh append creates a second file per touched partition; the
    // previously-refusing bin-pack now runs
    IcebergFormat.commit(batch(0, 4).withColumn("id", col("id") + 100), col("ts"), t)
    assert(IcebergFormat.rewriteDataFiles(spark, t, targetFileBytes = 1L << 20).nonEmpty)
    assert(IcebergFormat.readTable(spark, t).select("id").as[Long].collect().toSet ===
      before ++ Set(100L, 101L, 102L, 103L))
  }

  test("rename: field id survives, old files read under the new name, time travel keeps the old") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    val sid = IcebergFormat.renameColumn(spark, t, "user", "username")
    assert(sid === 1)
    // new-name writes commit; old-name writes are refused
    IcebergFormat.commit(batch(4, 6).withColumnRenamed("user", "username"), col("ts"), t)
    intercept[IllegalArgumentException] {
      IcebergFormat.commit(batch(6, 8), col("ts"), t)
    }
    val rows = IcebergFormat.readTable(spark, t)
    assert(rows.columns.contains("username") && !rows.columns.contains("user"))
    // pre-rename rows surface under the NEW name (id-aligned, not null)
    assert(rows.where(col("id") < 4 && col("username").isNotNull).count() === 4L)
    assert(rows.count() === 6L)
    // time travel to snapshot 1 reads with ITS schema: old name
    val tt = IcebergFormat.timeTravel(spark, t, 1L)
    assert(tt.columns.contains("user") && !tt.columns.contains("username"))
    // history records both generations with the same field id
    val hist = IcebergFormat.schemaHistory(spark, t)
      .where(col("field_id") === 2).select("schema_id", "name", "is_current")
      .as[(Int, String, Boolean)].collect().toSet
    assert(hist === Set((0, "user", false), (1, "username", true)))
  }

  test("drop: column disappears from reads; id retired so re-add gets a fresh id") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)
    IcebergFormat.dropColumn(spark, t, "user")
    // subsequent batches must not carry the dropped column
    IcebergFormat.commit(batch(4, 6).drop("user"), col("ts"), t)
    val rows = IcebergFormat.readTable(spark, t)
    assert(!rows.columns.contains("user"))
    assert(rows.count() === 6L)
    // re-adding a column of the same name is an add-column evolution
    // with a FRESH field id (ids never reused)
    IcebergFormat.commit(batch(6, 8).drop("user")
      .withColumn("user", lit("fresh")), col("ts"), t)
    val ids = IcebergFormat.schemaHistory(spark, t)
      .where(col("name") === "user").select("field_id")
      .as[Int].collect().toSet
    assert(ids === Set(2, 4)) // 2 retired, 4 fresh (after id 3 = ts)
    val again = IcebergFormat.readTable(spark, t)
    // old rows: null; new rows: "fresh"
    assert(again.where(col("user") === "fresh").count() === 2L)
    assert(again.where(col("user").isNull).count() === 6L)
  }

  test("partition-spec evolution: new writes use the new layout, old files keep theirs") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 4), col("ts"), t)      // hour layout
    val spec = IcebergFormat.evolveSpec(spark, t, "day", "ts")
    assert(spec === 1)
    IcebergFormat.commit(batch(4, 8), col("ts"), t)      // day layout
    val rows = IcebergFormat.readTable(spark, t)
    assert(rows.count() === 8L)
    val pk = rows.select("id", "p_key").as[(Long, String)].collect().toMap
    assert(pk(0L).length === "yyyy-MM-dd-HH".length)     // old hour dirs
    assert(pk(5L).length === "yyyy-MM-dd".length)        // new day dirs
    // bucket + truncate transforms are part of the vocabulary
    assert(IcebergFormat.applyTransform("bucket[4]", lit(7L)) != null)
    intercept[IllegalArgumentException] {
      IcebergFormat.evolveSpec(spark, t, "spiral", "ts")
    }
    // dropping the spec's source column is refused
    intercept[IllegalArgumentException] {
      IcebergFormat.dropColumn(spark, t, "ts")
    }
  }
}
