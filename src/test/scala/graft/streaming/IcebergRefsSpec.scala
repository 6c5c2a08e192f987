package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Named snapshot refs (iceberg/snapshot.h): tags, branches, ref reads,
  * survival across commits/evolutions, and expiry pinning. */
class IcebergRefsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("iceberg_refs").toString + "/t"

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"u$i", s"2024-01-0${1 + i % 3} 0$i:00:00"))
      .toDF("id", "user", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("a tag pins its snapshot view while main advances") {
    val t = freshTable()
    val s1 = IcebergFormat.commit(batch(0, 4), col("ts"), t)
    IcebergFormat.createTag(spark, t, "v1.0", s1)
    IcebergFormat.commit(batch(4, 9), col("ts"), t)
    assert(IcebergFormat.readRef(spark, t, "v1.0").count() === 4L)
    assert(IcebergFormat.readRef(spark, t, "main").count() === 9L)
    val refs = IcebergFormat.listRefs(spark, t)
      .select("name", "type", "snapshot_id")
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(refs === Map("main" -> (("branch", 2L)), "v1.0" -> (("tag", 1L))))
  }

  test("refs survive commits and schema evolution; drop removes them") {
    val t = freshTable()
    val s1 = IcebergFormat.commit(batch(0, 3), col("ts"), t)
    IcebergFormat.createBranch(spark, t, "audit", s1)
    IcebergFormat.renameColumn(spark, t, "user", "username")
    val names = IcebergFormat.listRefs(spark, t).select("name")
      .as[String].collect().toSet
    assert(names === Set("main", "audit"))
    IcebergFormat.dropRef(spark, t, "audit")
    assert(IcebergFormat.listRefs(spark, t).select("name")
      .as[String].collect().toSet === Set("main"))
  }

  test("expiry spares ref-pinned snapshots until the ref drops") {
    val t = freshTable()
    val s1 = IcebergFormat.commit(batch(0, 2), col("ts"), t)
    IcebergFormat.commit(batch(2, 4), col("ts"), t)
    IcebergFormat.commit(batch(4, 6), col("ts"), t)
    IcebergFormat.createTag(spark, t, "keepme", s1)
    // keepLast=1 would expire snapshots 1 and 2; the tag pins 1
    val expired = IcebergFormat.expireSnapshots(spark, t, keepLast = 1)
    assert(expired === Seq(2L))
    // the pinned snapshot still time-travels
    assert(IcebergFormat.readRef(spark, t, "keepme").count() === 2L)
    // dropping the ref unpins: the next expiry takes it
    IcebergFormat.dropRef(spark, t, "keepme")
    assert(IcebergFormat.expireSnapshots(spark, t, keepLast = 1) === Seq(1L))
  }

  test("age-policy expiry: stale refs drop first, tags pin, branches keep min count") {
    val t = freshTable()
    (0 until 5).foreach(i => IcebergFormat.commit(batch(i * 2, i * 2 + 2), col("ts"), t))
    IcebergFormat.createTag(spark, t, "pin2", 2L)
    IcebergFormat.createTag(spark, t, "stale1", 1L, maxRefAgeMs = Some(0L))
    IcebergFormat.createBranch(spark, t, "dev", 4L,
      maxSnapshotAgeMs = Some(0L), minSnapshotsToKeep = Some(2))
    val expired = IcebergFormat.expireSnapshotsByPolicy(spark, t,
      nowMs = System.currentTimeMillis() + 3600000L,
      defaultMaxAgeMs = 0L, defaultMinToKeep = 1)
    // stale1 (max-ref-age 0) dropped -> snap 1 unpinned and expired;
    // pin2 keeps 2; dev (min-keep 2) keeps {3,4}; main default keeps {5}
    assert(expired === Seq(1L))
    assert(IcebergFormat.listRefs(spark, t).select("name")
      .as[String].collect().toSet === Set("main", "pin2", "dev"))
    assert(IcebergFormat.readRef(spark, t, "pin2").count() === 4L)
    assert(IcebergFormat.readRef(spark, t, "dev").count() === 8L)
    assert(IcebergFormat.readRef(spark, t, "main").count() === 10L)
    // large age thresholds retain everything: a second sweep is a no-op
    assert(IcebergFormat.expireSnapshotsByPolicy(spark, t,
      nowMs = System.currentTimeMillis() + 3600000L,
      defaultMaxAgeMs = Long.MaxValue / 2, defaultMinToKeep = 1) === Seq.empty)
  }

  test("ref-only sweep: a stale ref on a still-kept snapshot drops without expiring it") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 2), col("ts"), t)
    IcebergFormat.commit(batch(2, 4), col("ts"), t)
    // stale ref points at the CURRENT head — main keeps the snapshot,
    // so only the refs map shrinks
    IcebergFormat.createTag(spark, t, "stale_head", 2L, maxRefAgeMs = Some(0L))
    val expired = IcebergFormat.expireSnapshotsByPolicy(spark, t,
      nowMs = System.currentTimeMillis() + 3600000L,
      defaultMaxAgeMs = Long.MaxValue / 2, defaultMinToKeep = 1)
    assert(expired === Seq.empty)
    assert(IcebergFormat.listRefs(spark, t).select("name")
      .as[String].collect().toSet === Set("main"))
    assert(IcebergFormat.readRef(spark, t, "main").count() === 4L)
  }

  test("branch history is the linear id-prefix of its head (documented model)") {
    // Pins the linear-history contract of expireSnapshotsByPolicy
    // (IcebergFormat `snapshots.filter(_.snapshotId <= head)`): this
    // engine's commit() assigns monotone ids on ONE line of history, so
    // a branch's history is exactly the snapshots with id <= its head —
    // snapshots numbered after the head belong to main's continuation,
    // not the branch. Real Iceberg permits divergent branch histories;
    // if branches ever gain independent commits, this test forces the
    // history computation to be revisited (else it would silently
    // over-retain the other branch's line).
    val t = freshTable()
    (0 until 6).foreach(i => IcebergFormat.commit(batch(i, i + 1), col("ts"), t))
    // branch at snapshot 3: its history must be {1,2,3}, NOT {1..5};
    // min-keep 2 counts back from the BRANCH head -> keeps {2,3}
    IcebergFormat.createBranch(spark, t, "b3", 3L,
      maxSnapshotAgeMs = Some(0L), minSnapshotsToKeep = Some(2))
    val expired = IcebergFormat.expireSnapshotsByPolicy(spark, t,
      nowMs = System.currentTimeMillis() + 3600000L,
      defaultMaxAgeMs = 0L, defaultMinToKeep = 1)
    // main keeps {6}; b3 keeps {2,3}; 4 and 5 sit AFTER the branch head
    // on main's line and are claimed by no rule -> expired with 1
    assert(expired === Seq(1L, 4L, 5L))
    assert(IcebergFormat.readRef(spark, t, "b3").count() === 3L)
    assert(IcebergFormat.readRef(spark, t, "main").count() === 6L)
  }

  test("setRef validates the target and protects main") {
    val t = freshTable()
    IcebergFormat.commit(batch(0, 2), col("ts"), t)
    intercept[IllegalArgumentException] {
      IcebergFormat.createTag(spark, t, "ghost", 99L)
    }
    intercept[IllegalArgumentException] {
      IcebergFormat.createBranch(spark, t, "main", 1L)
    }
  }
}
