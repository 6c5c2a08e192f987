package graft.entries

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.analytics.{CleanPipeline, Decontaminate, Dedup, Sampling, Similarity, Sketches, TextAnalysis}
import graft.functions.GraftFunctions
import graft.groups.ConsumerGroups
import graft.log.{Compaction, RecordLog, TieredStorage, Transactions, TxnEngine}
import graft.model.BatchType
import graft.operators.Operators

import graft.SparkEntry._

/** Driver-contract entries: D1-D7 datalake, U1-U6 transforms, as-of join, murmur2 routing.
  *
  * Pure move out of the SparkEntry registry (round 15): the entry and
  * oracle text is byte-identical to its former in-line spelling; the
  * combined maps are assembled back in [[graft.SparkEntry]].
  */
private[graft] object DatalakeTransformEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- §2.7 datalake materialization (real write path) -----
    "d1_materialize" -> ((s, dir) => {
      // Run the record multiplexer for real: route events to per-type
      // output tables, then read the outputs back. Daily partition
      // granularity: this corpus carries ~1 MB/day — hourly dirs would
      // be the small-files anti-pattern (Datalake.dayPartition scaladoc).
      val base = java.nio.file.Files.createTempDirectory("graft_d1").toString
      val ev = events(s, dir).select(col("event_id"), col("ts"), col("event_type"), col("user_id"))
      val written = graft.streaming.Datalake.writeMultiplexed(
        ev, concat(lit("events_"), col("event_type")), col("ts"), base,
        partFn = graft.streaming.Datalake.dayPartition)
      written.map { case (o, _) =>
          s.read.parquet(s"$base/$o").withColumn("output", lit(o)) }
        .reduce(_ unionByName _)
        .groupBy("output", "p_key")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("output", "p_key")
    }),

    "d1_dlq" -> ((s, dir) => {
      // Invalid-record dead-letter route (record_multiplexer.cc:236):
      // events wrapped in the registry wire envelope with a deterministic
      // defect mix — event_id%10==0 bad magic, ==1 unregistered id 99,
      // ==2 registered-but-incompatible id 7, rest valid id 1. Valid rows
      // take the normal multiplexed write; invalid rows land in _dlq with
      // their intended output + error_code. The summary unions both sides.
      val base = java.nio.file.Files.createTempDirectory("graft_d1dlq").toString
      val ev = events(s, dir).select(col("event_id"), col("ts"), col("event_type"))
      val m = pmod(col("event_id"), lit(10))
      val env = when(m === 0, lit(Array[Byte](1, 0, 0, 0, 1)))
        .when(m === 1, lit(Array[Byte](0, 0, 0, 0, 99)))
        .when(m === 2, lit(Array[Byte](0, 0, 0, 0, 7)))
        .otherwise(lit(Array[Byte](0, 0, 0, 0, 1)))
      val batch = ev.withColumn("value", concat(env, encode(col("event_type"), "UTF-8")))
      val written = graft.streaming.Datalake.writeMultiplexedWithDlq(
        batch, concat(lit("events_"), col("event_type")), col("ts"), base,
        col("value"), registered = Seq(1, 7), incompatible = Seq(7),
        partFn = graft.streaming.Datalake.dayPartition)
      val dlqDir = graft.streaming.Datalake.DlqDir
      val mains = written.collect { case (o, _) if o != dlqDir =>
        s.read.parquet(s"$base/$o")
          .select(col("event_id"), lit(o).as("output"), lit("ok").as("error_code")) }
      val dlq = s.read.parquet(s"$base/$dlqDir")
        .select(col("event_id"), col("_output").as("output"), col("error_code"))
      (mains :+ dlq).reduce(_ unionByName _)
        .groupBy("output", "error_code")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("output", "error_code")
    }),

    "d1_dlq_stream" -> ((s, dir) => {
      // The invalid-record route as it actually runs — continuously:
      // the same defect mix as d1_dlq streams in as two mtime-ordered
      // micro-batches; each batch appends its valid rows and dead
      // letters, and the accumulated tables must equal the one-shot
      // batch run (the d1_dlq oracle, shared verbatim below).
      import java.nio.file.Files
      import java.nio.file.attribute.FileTime
      val stage = Files.createTempDirectory("graft_d1dlqS")
      val in = Files.createDirectory(stage.resolve("in"))
      val ev = events(s, dir).select(col("event_id"), col("ts"), col("event_type"))
      val m = pmod(col("event_id"), lit(10))
      val env = when(m === 0, lit(Array[Byte](1, 0, 0, 0, 1)))
        .when(m === 1, lit(Array[Byte](0, 0, 0, 0, 99)))
        .when(m === 2, lit(Array[Byte](0, 0, 0, 0, 7)))
        .otherwise(lit(Array[Byte](0, 0, 0, 0, 1)))
      val batch = ev.withColumn("value", concat(env, encode(col("event_type"), "UTF-8")))
      def stageHalf(name: String, rem: Int, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft_d1dlqS_half")
        batch.where(pmod(col("event_id"), lit(2)) === rem)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        Files.copy(firstParquetPart(tmp), in.resolve(name))
        Files.setLastModifiedTime(in.resolve(name), FileTime.fromMillis(mtime))
      }
      stageHalf("a.parquet", 0, 1700000000000L)
      stageHalf("b.parquet", 1, 1700000060000L)
      val base = s"$stage/out"
      val schema = s.read.parquet(in.toString).schema
      graft.streaming.Datalake.multiplexedDlqSink(
        graft.streaming.Transforms.PathInput(in.toString, schema,
          maxFilesPerTrigger = Some(1)).stream(s),
        concat(lit("events_"), col("event_type")), col("ts"), base, s"$stage/ckpt",
        col("value"), registered = Seq(1, 7), incompatible = Seq(7),
        partFn = graft.streaming.Datalake.dayPartition).awaitTermination()
      val types = ev.select("event_type").distinct().collect().map(_.getString(0))
      val mains = types.toSeq.map { t =>
        s.read.parquet(s"$base/events_$t")
          .select(col("event_id"), lit(s"events_$t").as("output"), lit("ok").as("error_code")) }
      val dlq = s.read.parquet(s"$base/${graft.streaming.Datalake.DlqDir}")
        .select(col("event_id"), col("_output").as("output"), col("error_code"))
      (mains :+ dlq).reduce(_ unionByName _)
        .groupBy("output", "error_code")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("output", "error_code")
    }),

    "d6_commit_conflict" -> ((s, dir) => {
      // Optimistic-concurrency commit (merge_append_action.cc /
      // rest_catalog.cc): two writers stage appends against the SAME
      // base snapshot; the first publishes cleanly (no rebase), the
      // second detects the moved table version and rebases its manifest
      // onto the new current — both append sets survive, the snapshot
      // history stays linear, and the full read equals the union. A
      // last-write-wins metadata overwrite would drop writer 1's rows.
      val t = java.nio.file.Files.createTempDirectory("graft_icecc").toString + "/t"
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      def slice(i: Int) = ev.where(pmod(col("event_id"), lit(3)) === i)
      val fmt = graft.streaming.IcebergFormat
      fmt.commit(slice(0), col("ts"), t, partFn = graft.streaming.Datalake.dayPartition)
      val a = fmt.stageAppend(slice(1), col("ts"), t, partFn = graft.streaming.Datalake.dayPartition)
      val b = fmt.stageAppend(slice(2), col("ts"), t, partFn = graft.streaming.Datalake.dayPartition)
      val (_, rebasedA) = fmt.commitStaged(s, t, a)
      val (_, rebasedB) = fmt.commitStaged(s, t, b)
      import s.implicits._
      val catalog = fmt.snapshotCatalog(s, t)
        .select(concat(lit("snap_"), col("snapshot_id")).as("kind"), col("n_rows").as("n"))
      val readBack = fmt.readTable(s, t)
        .agg(count(lit(1)).as("n")).select(lit("read_rows").as("kind"), col("n"))
      val flags = Seq(
        ("rebase_a", if (rebasedA) 1L else 0L),
        ("rebase_b", if (rebasedB) 1L else 0L)).toDF("kind", "n")
      catalog.unionByName(readBack).unionByName(flags).orderBy("kind")
    }),

    "d6_rest_catalog" -> ((s, dir) => {
      // The Iceberg REST catalog protocol (rest_catalog.cc commit with
      // requirements at :170; route/body shapes from the public REST
      // OpenAPI spec) scripted over real testdata: namespace/table
      // lifecycle with the 404/409 ladder, then the OCC conversation —
      // two writers stage events slices against the same base, writer A
      // commits, writer B's stale assert-ref-snapshot-id requirement
      // 409s with CommitFailedException, B reloads and the retry
      // publishes as a metadata-only rebase. Detail strings parse the
      // RESPONSE bodies; the final read proves no snapshot was dropped.
      import s.implicits._
      import graft.streaming.{IcebergFormat, IcebergRestCatalog}
      import com.fasterxml.jackson.databind.ObjectMapper
      val m = new ObjectMapper()
      val root = java.nio.file.Files.createTempDirectory("graft_restcat").toString
      val srv = new IcebergRestCatalog.Server(s, root)
      val table = s"$root/lake/events"
      val ev = events(s, dir).select(col("event_id"), col("ts"))
      def stage(i: Int) = IcebergFormat.stageAppend(
        ev.where(pmod(col("event_id"), lit(2)) === i), col("ts"), table,
        partFn = graft.streaming.Datalake.dayPartition)
      def commitBody(st: IcebergFormat.StagedAppend, baseSnap: Long): String = {
        val files = st.files.map { case (p, k, l) => s"""["$p","$k",$l]""" }
          .mkString("[", ",", "]")
        val snap = if (baseSnap < 0) "null" else baseSnap.toString
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$snap}],
           |"updates":[{"action":"add-snapshot","snapshot":{
           |"stage-dir":"${st.stageDir}","base-version":${st.baseVersion},
           |"files":$files}}]}""".stripMargin
      }
      def j(b: String) = m.readTree(b)
      var stagedA: IcebergFormat.StagedAppend = null
      var stagedB: IcebergFormat.StagedAppend = null
      val script: Seq[(String, String, () => Option[String],
          IcebergRestCatalog.Resp => String)] = Seq(
        ("GET", "/v1/namespaces/lake", () => None,
          r => "type=" + j(r.body).get("error").get("type").asText()),
        ("POST", "/v1/namespaces", () => Some("""{"namespace":["lake"]}"""),
          r => "ns=" + j(r.body).get("namespace").get(0).asText()),
        ("POST", "/v1/namespaces", () => Some("""{"namespace":["lake"]}"""),
          r => "type=" + j(r.body).get("error").get("type").asText()),
        ("POST", "/v1/namespaces/lake/tables", () =>
          Some("""{"name":"events","schema":[["event_id","long"],["ts","timestamp"]]}"""),
          r => s"snap=${j(r.body).get("metadata").get("current-snapshot-id").asLong()}"),
        ("POST", "/v1/namespaces/lake/tables", () =>
          Some("""{"name":"events","schema":[["event_id","long"]]}"""),
          r => "type=" + j(r.body).get("error").get("type").asText()),
        ("POST", "/v1/namespaces/lake/tables/events/commit", () => {
          stagedA = stage(0); stagedB = stage(1)
          Some(commitBody(stagedA, -1L))
        }, r => s"snap=${j(r.body).get("commit").get("snapshot-id").asLong()}"),
        ("POST", "/v1/namespaces/lake/tables/events/commit", () =>
          Some(commitBody(stagedB, -1L)),
          r => s"type=${j(r.body).get("error").get("type").asText()};" +
            s"msg=${j(r.body).get("error").get("message").asText()}"),
        ("GET", "/v1/namespaces/lake/tables/events", () => None,
          r => s"snap=${j(r.body).get("metadata").get("current-snapshot-id").asLong()}"),
        ("POST", "/v1/namespaces/lake/tables/events/commit", () =>
          Some(commitBody(stagedB, 1L)),
          r => s"snap=${j(r.body).get("commit").get("snapshot-id").asLong()}"),
        ("GET", "/v1/namespaces/lake/tables/events", () =>
          None, r => {
            val md = j(r.body).get("metadata")
            s"snapshots=${md.get("snapshots").size()}" +
              s",main=${md.get("refs").get("main").get("snapshot-id").asLong()}"
          }))
      val steps = script.zipWithIndex.map { case ((method, path, b, extract), i) =>
        val resp = srv.handle(method, path, b())
        (i + 1, method, path, resp.status, extract(resp))
      }
      // the OCC retry preserved both writers' rows: read equals source
      val total = IcebergFormat.readTable(s, table).count()
      val expected = ev.count()
      val rows = steps :+ ((steps.size + 1, "READ", "/table", 200,
        s"complete=${total == expected}"))
      rows.toDF("step", "method", "path", "status", "detail").orderBy("step")
    }),

    "d6_iceberg_catalog" -> ((s, dir) => {
      // Real Iceberg v2 format: three appends (event_id % 3 slices) into
      // a spec-faithful table (metadata.json + avro manifest lists +
      // manifests + version hint); the catalog readback resolves row
      // counts purely from manifest metadata — no data scan.
      val t = icebergTable(s, dir)
      graft.streaming.IcebergFormat.snapshotCatalog(s, t)
        .select("snapshot_id", "sequence_number", "n_rows")
        .orderBy("snapshot_id")
    }),

    "d6_iceberg_read" -> ((s, dir) => {
      // Metadata-driven scan (version hint -> metadata.json -> manifest
      // list -> manifests -> file set): per-day counts over all three
      // appended snapshots, partition values reconstituted from metadata.
      val t = icebergTable(s, dir)
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("p_key").agg(count(lit(1)).as("n"))
        .orderBy("p_key")
    }),

    "d6_iceberg_travel" -> ((s, dir) => {
      // Time travel: the table exactly as of snapshot 2 (the first two
      // event_id % 3 slices) — resolved from that snapshot's own
      // manifest list, so the third append is invisible.
      val t = icebergTable(s, dir)
      graft.streaming.IcebergFormat.timeTravel(s, t, 2L)
        .groupBy("p_key")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("p_key")
    }),

    "d6_refs" -> ((s, dir) => {
      // Named snapshot refs (iceberg/snapshot.h): tag v1 pins the first
      // append, branch dev pins the first two, main advances to all
      // three; snapshot expiry with keepLast=1 spares the ref-pinned
      // snapshots, so all three views stay readable. The oracle
      // recomputes each view from the event slices.
      val t = java.nio.file.Files.createTempDirectory("graft_icerefs").toString + "/t"
      // month partitioning + the two consumed columns: ref semantics are
      // partition-agnostic; day granularity only measured small-file IO
      val ev = events(s, dir).select(col("event_id"), col("ts"))
      (0 until 3).foreach { i =>
        graft.streaming.IcebergFormat.commit(
          ev.where(pmod(col("event_id"), lit(3)) === i), col("ts"), t,
          partFn = graft.streaming.Datalake.monthPartition)
      }
      graft.streaming.IcebergFormat.createTag(s, t, "v1", 1L)
      graft.streaming.IcebergFormat.createBranch(s, t, "dev", 2L)
      graft.streaming.IcebergFormat.expireSnapshots(s, t, keepLast = 1)
      Seq("dev", "main", "v1").map { r =>
        graft.streaming.IcebergFormat.readRef(s, t, r)
          .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
          .select(lit(r).as("ref"), col("n"), col("sum_id"))
      }.reduce(_ unionAll _).orderBy("ref")
    }),

    "d6_expire_policy" -> ((s, dir) => {
      // Age-policy snapshot expiration (snapshot.h:95-118 retention
      // fields through the remove_snapshots applier,
      // table_update_applier.cc:108-127): five commits (snap 1..5);
      // tag pin2 pins snap 2 forever; tag stale1 (max-ref-age-ms=0)
      // expires at the sweep and unpins snap 1; branch dev@4
      // (max-snapshot-age-ms=0, min-snapshots-to-keep=2) keeps {3,4};
      // main under the table defaults (maxAge=0, minKeep=1) keeps {5}.
      // Snap 1 alone expires. Age thresholds of 0 make every decision
      // count-driven — deterministic under any wall clock.
      import s.implicits._
      val t = java.nio.file.Files.createTempDirectory("graft_icepol").toString + "/t"
      // two columns only: the ref views read n + sum(event_id); ts
      // drives the month partitioning — writing more would just tax
      // the 5-commit fixture, not the operator under test
      val ev = events(s, dir).select(col("event_id"), col("ts"))
      // month granularity: the retention policy is partition-agnostic,
      // and 5 commits x ~300 day-files would measure small-file IO, not
      // the expiry operator
      (0 until 5).foreach { i =>
        graft.streaming.IcebergFormat.commit(
          ev.where(pmod(col("event_id"), lit(5)) === i), col("ts"), t,
          partFn = graft.streaming.Datalake.monthPartition)
      }
      graft.streaming.IcebergFormat.createTag(s, t, "pin2", 2L)
      graft.streaming.IcebergFormat.createTag(s, t, "stale1", 1L,
        maxRefAgeMs = Some(0L))
      graft.streaming.IcebergFormat.createBranch(s, t, "dev", 4L,
        maxSnapshotAgeMs = Some(0L), minSnapshotsToKeep = Some(2))
      val expired = graft.streaming.IcebergFormat.expireSnapshotsByPolicy(
        s, t, nowMs = System.currentTimeMillis() + 3600000L,
        defaultMaxAgeMs = 0L, defaultMinToKeep = 1)
      val nRefs = graft.streaming.IcebergFormat.listRefs(s, t).count()
      Seq("dev", "main", "pin2").map { r =>
        graft.streaming.IcebergFormat.readRef(s, t, r)
          .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
          .select(lit(r).as("ref"), col("n"), col("sum_id"))
      }.reduce(_ unionAll _)
        .unionAll(Seq(("expired", expired.size.toLong, expired.sum),
          ("live_refs", nRefs, 0L)).toDF("ref", "n", "sum_id"))
        .orderBy("ref")
    }),

    "d6_iceberg_deletes" -> ((s, dir) => {
      // Iceberg v2 merge-on-read position deletes on a fresh 2-snapshot
      // table: DELETE WHERE user_id % 7 = 0, then the current read
      // reflects the delete while time travel to snapshot 1 still sees
      // its full half — deletes are scan-time, no data file rewritten.
      val t = java.nio.file.Files.createTempDirectory("graft_icedel").toString + "/t"
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      (0 until 2).foreach { i =>
        graft.streaming.IcebergFormat.commit(
          ev.where(pmod(col("event_id"), lit(2)) === i), col("ts"), t,
          partFn = graft.streaming.Datalake.dayPartition)
      }
      graft.streaming.IcebergFormat.deleteWhere(s, t, pmod(col("user_id"), lit(7)) === 0)
      val now = graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("p_key")
        .agg(count(lit(1)).as("n_now"), sum("event_id").as("sum_id_now"))
      val snap1 = graft.streaming.IcebergFormat.timeTravel(s, t, 1L)
        .groupBy("p_key").agg(count(lit(1)).as("n_snap1"))
      now.join(snap1, Seq("p_key"), "left").orderBy("p_key")
    }),

    "d6_iceberg_evolution" -> ((s, dir) => {
      // Add-column schema evolution (catalog_schema_manager.cc leg of
      // D3, on the real v2 metadata): the even-event_id half commits with
      // 4 columns, the odd half adds `value`; the merged read surfaces
      // the old rows' missing column as null and the metadata carries the
      // widened schema. Incompatible evolutions (drop/retype) reject.
      val t = java.nio.file.Files.createTempDirectory("graft_icevo").toString + "/t"
      val ev = events(s, dir)
      val narrow = ev.select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val wide = ev.select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      graft.streaming.IcebergFormat.commit(
        narrow.where(pmod(col("event_id"), lit(2)) === 0), col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.commit(
        wide.where(pmod(col("event_id"), lit(2)) === 1), col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("value")).as("n_with_value"),
          sum(when(col("value").isNotNull, col("event_id"))).as("sum_id_with_value"))
        .orderBy("event_type")
    }),

    "d6_iceberg_rename_drop" -> ((s, dir) => {
      // Column rename + drop on the real v2 metadata (iceberg/
      // compatibility.cc struct evolution): field ids carry identity, so
      // files written before the rename surface under the NEW name, and
      // a dropped column disappears from reads while its id is retired.
      // Both halves of the data land in one aggregate under the renamed
      // column — the oracle sees plain events.
      val t = java.nio.file.Files.createTempDirectory("graft_icern").toString + "/t"
      val ev = events(s, dir)
      val base = ev.select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      graft.streaming.IcebergFormat.commit(
        base.where(pmod(col("event_id"), lit(2)) === 0), col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.renameColumn(s, t, "event_type", "kind")
      graft.streaming.IcebergFormat.commit(
        base.where(pmod(col("event_id"), lit(2)) === 1)
          .withColumnRenamed("event_type", "kind"), col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.dropColumn(s, t, "user_id")
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("kind")
    }),

    "d6_iceberg_schema_history" -> ((s, dir) => {
      // The schema-generation catalog after rename + drop + re-add: ids
      // never reused (the re-added name gets a fresh id), every
      // generation retained, current marked. Oracle pins the full
      // history table.
      val t = java.nio.file.Files.createTempDirectory("graft_icehist").toString + "/t"
      val ev = events(s, dir).limit(64)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      graft.streaming.IcebergFormat.commit(ev, col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.renameColumn(s, t, "event_type", "kind")
      graft.streaming.IcebergFormat.dropColumn(s, t, "user_id")
      graft.streaming.IcebergFormat.commit(
        ev.withColumnRenamed("event_type", "kind").drop("user_id")
          .withColumn("user_id", concat(lit("u"), col("event_id") % 3)),
        col("ts"), t, partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.schemaHistory(s, t)
        .orderBy("schema_id", "field_id")
    }),

    "d6_iceberg_spec_evolution" -> ((s, dir) => {
      // Partition-spec evolution (iceberg/transform.h): the first half
      // lands under the day layout, the spec evolves to month(ts), the
      // second half lands under month dirs — one table, two live
      // layouts, readers scan both. Output: rows and id-sum per layout
      // (distinguished by the p_key shape). Day/month granularity, not
      // hour: partition count must match data volume (an hour layout at
      // this row density means hundreds of near-empty files).
      val t = java.nio.file.Files.createTempDirectory("graft_icspec").toString + "/t"
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      graft.streaming.IcebergFormat.commit(
        ev.where(pmod(col("event_id"), lit(2)) === 0), col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.evolveSpec(s, t, "month", "ts")
      graft.streaming.IcebergFormat.commit(
        ev.where(pmod(col("event_id"), lit(2)) === 1), col("ts"), t)
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy(length(col("p_key")).as("layout_len"))
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"),
          countDistinct("p_key").as("n_partitions"))
        .orderBy("layout_len")
    }),

    "d6_iceberg_rewrite_manifests" -> ((s, dir) => {
      // Metadata-only manifest consolidation: three append commits
      // accumulate three data manifests; rewrite_manifests folds them
      // into ONE all-EXISTING manifest as a replace snapshot — no data
      // moves, the table reads identically, and time travel to the
      // first commit still resolves its own rows.
      import s.implicits._
      val t = java.nio.file.Files.createTempDirectory("graft_icerw").toString + "/t"
      val ev = events(s, dir).where(col("event_id") < 3000)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      (0 until 3).foreach { i =>
        graft.streaming.IcebergFormat.commit(
          ev.where(pmod(col("event_id"), lit(3)) === i), col("ts"), t,
          partFn = graft.streaming.Datalake.dayPartition)
      }
      val before = graft.streaming.IcebergFormat.manifestCounts(s, t)._1
      graft.streaming.IcebergFormat.rewriteManifests(s, t)
      val after = graft.streaming.IcebergFormat.manifestCounts(s, t)._1
      val nRows = graft.streaming.IcebergFormat.readTable(s, t).count()
      val firstSnap = graft.streaming.IcebergFormat.snapshotCatalog(s, t)
        .agg(min("snapshot_id")).collect()(0).getLong(0)
      val travelRows = graft.streaming.IcebergFormat
        .timeTravel(s, t, firstSnap).count()
      Seq((before, after, nRows, travelRows))
        .toDF("before_manifests", "after_manifests", "n_rows", "travel_rows")
    }),

    "d6_iceberg_orphans" -> ((s, dir) => {
      // Orphan-file cleanup: plant three unreachable files under the
      // table location; the DEFAULT (3-day guard) run removes nothing
      // because the plants are fresh — the age guard doing its job —
      // then an explicit-cutoff run removes exactly the plants, and
      // the table still reads every committed row afterwards.
      import s.implicits._
      val t = java.nio.file.Files.createTempDirectory("graft_iceorph").toString + "/t"
      val ev = events(s, dir).where(col("event_id") < 2000)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      graft.streaming.IcebergFormat.commit(ev, col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      Seq("data/stray-0.parquet", "data/stray-1.tmp", "metadata/stray-manifest.avro")
        .foreach { rel =>
          java.nio.file.Files.write(java.nio.file.Paths.get(s"$t/$rel"),
            "orphan".getBytes)
        }
      val guarded = graft.streaming.IcebergFormat.removeOrphanFiles(s, t)
      val removed = graft.streaming.IcebergFormat
        .removeOrphanFiles(s, t, olderThanMs = Long.MaxValue)
      val nRows = graft.streaming.IcebergFormat.readTable(s, t).count()
      Seq((guarded.size, removed.mkString(","), nRows))
        .toDF("n_guarded", "removed", "n_rows")
    }),

    "d6_iceberg_eq_deletes" -> ((s, dir) => {
      // Equality deletes, the CDC/upsert flavor: delete-by-key the
      // user_id % 10 = 4 cohort (no data scan at delete time), then
      // append corrected rows for a subset of it. The delete applies only
      // to the OLDER commit (sequence scoping), so the corrections
      // survive — exactly the delete-old/append-new upsert contract.
      val t = java.nio.file.Files.createTempDirectory("graft_iceeq").toString + "/t"
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      graft.streaming.IcebergFormat.commit(ev, col("ts"), t,
        partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.deleteWhereEquality(s, t,
        ev.where(pmod(col("user_id"), lit(10)) === 4).select("user_id").distinct())
      graft.streaming.IcebergFormat.commit(
        ev.where(pmod(col("user_id"), lit(10)) === 4 && pmod(col("event_id"), lit(5)) === 0),
        col("ts"), t, partFn = graft.streaming.Datalake.dayPartition)
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("event_type")
    }),

    "d6_iceberg_compaction" -> ((s, dir) => {
      // rewrite_data_files maintenance: three day-partitioned appends
      // leave up to 3 files per day partition; bin-pack compaction
      // rewrites each multi-file partition to one file via a `replace`
      // snapshot. Content is unchanged and the file inventory (from
      // manifest metadata alone, no listing) shows one file/partition.
      val t = java.nio.file.Files.createTempDirectory("graft_ice_rw").toString + "/t"
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      (0 until 3).foreach { i =>
        graft.streaming.IcebergFormat.commit(
          ev.where(pmod(col("event_id"), lit(3)) === i), col("ts"), t,
          partFn = graft.streaming.Datalake.dayPartition)
      }
      graft.streaming.IcebergFormat.rewriteDataFiles(s, t)
      val inv = graft.streaming.IcebergFormat.fileInventory(s, t)
        .select(col("p_key"), col("n_files"))
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("p_key")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .join(inv, Seq("p_key"))
        .orderBy("p_key")
    }),

    "d6_iceberg_stream" -> ((s, dir) => {
      // Continuous Iceberg ingestion, DELIVERED TWICE: two event halves
      // stream in as separate micro-batches, each committing a snapshot
      // tagged with its batch id; a second full delivery (fresh
      // checkpoint) replays both batch ids and must commit nothing — the
      // table equals the events table exactly once.
      import java.nio.file.{Files, Paths}
      import java.nio.file.attribute.FileTime
      val stage = Files.createTempDirectory("graft_iceS")
      val in = Files.createDirectory(stage.resolve("in"))
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      def stageHalf(name: String, rem: Int, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft_iceS_half")
        ev.where(pmod(col("event_id"), lit(2)) === rem)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        Files.copy(firstParquetPart(tmp), in.resolve(name))
        Files.setLastModifiedTime(in.resolve(name), FileTime.fromMillis(mtime))
      }
      stageHalf("a.parquet", 0, 1700000000000L)
      stageHalf("b.parquet", 1, 1700000060000L)
      val t = s"$stage/table"
      val schema = s.read.parquet(in.toString).schema
      def deliver(ck: String): Unit =
        graft.streaming.IcebergFormat.icebergSink(
          graft.streaming.Transforms.PathInput(in.toString, schema,
            maxFilesPerTrigger = Some(1)).stream(s),
          col("ts"), t, s"$stage/$ck",
          graft.streaming.Datalake.dayPartition).awaitTermination()
      deliver("ck1")
      deliver("ck2") // full redelivery: both batch ids repeat, zero new snapshots
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("p_key")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("p_key")
    }),

    "d6_iceberg_upsert_stream" -> ((s, dir) => {
      // Streaming CDC upsert, keyed on event_id: batch 1 inserts every
      // event, batch 2 re-delivers ALL of them as "updates" (equality-
      // delete each key, append the new version). If the delete half were
      // broken the table would double; if the sequence scoping were wrong
      // the update would delete itself — either way the oracle (exactly
      // one copy of events) catches it.
      import java.nio.file.Files
      import java.nio.file.attribute.FileTime
      val stage = Files.createTempDirectory("graft_iceU")
      val in = Files.createDirectory(stage.resolve("in"))
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      def stageCopy(name: String, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft_iceU_half")
        ev.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        Files.copy(firstParquetPart(tmp), in.resolve(name))
        Files.setLastModifiedTime(in.resolve(name), FileTime.fromMillis(mtime))
      }
      stageCopy("a.parquet", 1700000000000L)
      stageCopy("b.parquet", 1700000060000L)
      val t = s"$stage/table"
      val schema = s.read.parquet(in.toString).schema
      graft.streaming.IcebergFormat.icebergUpsertSink(
        graft.streaming.Transforms.PathInput(in.toString, schema,
          maxFilesPerTrigger = Some(1)).stream(s),
        col("ts"), t, s"$stage/ck", keyCols = Seq("event_id"),
        partFn = graft.streaming.Datalake.dayPartition).awaitTermination()
      graft.streaming.IcebergFormat.readTable(s, t)
        .groupBy("p_key")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("p_key")
    }),

    "d6_snapshots" -> ((s, dir) => {
      // Three real snapshot commits (10-day chunks), then expiry to the
      // last two; the readback sees exactly the surviving snapshots.
      val out = java.nio.file.Files.createTempDirectory("graft_d6").toString
      val ev = events(s, dir).withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      val days = ev.select("day").distinct().orderBy("day").collect().map(_.getString(0))
      days.zipWithIndex.groupBy(_._2 / 10).toSeq.sortBy(_._1).foreach { case (_, ds) =>
        graft.streaming.Datalake.commit(
          ev.where(col("day").isin(ds.toIndexedSeq.map(_._1): _*)).select("event_id", "ts", "event_type"),
          col("ts"), out, partFn = graft.streaming.Datalake.dayPartition)
      }
      graft.streaming.Datalake.expireSnapshots(s, out, keepLast = 2)
      graft.streaming.Datalake.readTable(s, out)
        .groupBy(col("snapshot_id").cast("long").as("snapshot_id"))
        .agg(count(lit(1)).as("n"), min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("snapshot_id")
    }),

    // ----- §2.7 datalake translation / partition transforms -----
    "d2_record_translation" -> ((s, dir) => {
      // Full default-translator path: canonical binary log rows (key,
      // value, headers as bytes) -> redpanda system struct + value
      // (record_translator.h:28-66), then verifiable projections of BOTH
      // the struct fields and the decoded payload.
      val log = eventLog(s, dir).select(
        col("partition"), col("offset"), col("ts").as("timestamp"),
        array(struct(
          encode(lit("type"), "UTF-8").as("key"),
          encode(col("event_type"), "UTF-8").as("value"))).as("headers"),
        encode(col("user_id").cast("string"), "UTF-8").as("key"),
        encode(col("props"), "UTF-8").as("value"))
      graft.streaming.Datalake.translateDefault(log)
        .select(
          col("redpanda.partition").as("p"),
          col("redpanda.offset").as("o"),
          decode(col("redpanda.headers")(0)("value"), "UTF-8").as("h_type"),
          length(col("redpanda.key")).as("key_len"),
          get_json_object(decode(col("value"), "UTF-8"), "$.k").cast("int").as("k"))
        .groupBy("h_type")
        .agg(count(lit(1)).as("n"), max("o").as("max_offset"),
          sum("key_len").as("sum_key_len"), sum("k").as("sum_k"))
        .orderBy("h_type")
    }),

    "d4_partition_transforms" -> ((s, dir) =>
      Operators.icebergTransforms(events(s, dir), col("ts"), col("user_id"), col("event_type"), 16)
        .groupBy("t_year", "t_month", "t_day", "t_hour", "t_bucket", "t_truncate")
        .agg(count(lit(1)).as("n"))
        .orderBy("t_year", "t_month", "t_day", "t_hour", "t_bucket", "t_truncate")),

    // ----- §2.8 transform corpus (U1/U3) -----
    "u1_transform_mirror" -> ((s, dir) =>
      Operators.transformMirror(events(s, dir))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy("event_id")),

    "u2_transform_filter" -> ((s, dir) =>
      Operators.transformRegexFilter(events(s, dir), col("props"), "\"k\": 4[0-9]")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    "u3_transform_transcode" -> ((s, dir) =>
      events(s, dir).where(col("event_id") < 1000)
        .select(col("event_id"),
          concat(lit("user="), col("user_id").cast("string"),
            lit(";type="), col("event_type")).as("value"))
        .orderBy("event_id")),

    "u1_wasm_mirror" -> ((s, dir) => {
      // A REAL .wasm guest binary — GuestModules.mirror, assembled to
      // the wasm 1.0 spec and executed per executor task by the graft
      // interpreter against the reference's redpanda_transform host ABI
      // (wasm/transform_module.h:137-158) — not a Scala re-statement of
      // the transform. The guest loops read_batch_header /
      // read_next_record / write_record exactly like an SDK build; the
      // emitted payloads come back through the validated-write path
      // (model/transform.cc:324) and are decoded for the oracle.
      val in = storedLog(s, dir).select(col("partition"), col("offset"),
        unix_millis(col("ts")).as("timestamp"),
        col("event_id").cast("string").cast("binary").as("key"),
        col("event_type").cast("binary").as("value"))
      graft.wasm.WasmTransform(in, graft.wasm.GuestModules.mirror)
        .select(col("partition"),
          decode(col("key"), "UTF-8").cast("bigint").as("event_id"),
          decode(col("value"), "UTF-8").as("event_type"))
        .orderBy("event_id")
    }),

    "u3_wasm_upper" -> ((s, dir) => {
      // The transcoding example as guest BYTECODE: GuestModules.
      // upperValue parses the payload's zigzag-varint key/value framing
      // and uppercases the value's ASCII letters inside wasm linear
      // memory — the host only sees the already-transformed payload.
      val in = storedLog(s, dir).select(col("partition"), col("offset"),
        unix_millis(col("ts")).as("timestamp"),
        col("event_id").cast("string").cast("binary").as("key"),
        concat(lit("type="), col("event_type")).cast("binary").as("value"))
      graft.wasm.WasmTransform(in, graft.wasm.GuestModules.upperValue)
        .select(decode(col("key"), "UTF-8").cast("bigint").as("event_id"),
          decode(col("value"), "UTF-8").as("value"))
        .orderBy("event_id")
    }),

    "u1_wasm_wasi" -> ((s, dir) => {
      // The WASI ABI surface end-to-end: GuestModules.wasiStartup runs
      // the exact wasi_snapshot_preview1 startup sequence a TinyGo SDK
      // build's runtime emits (args_sizes_get/args_get, environ_sizes_
      // get/environ_get, two monotonic clock_time_get reads, random_
      // get) against the host's reference-shaped serialization
      // (wasi.cc:125-148 NUL-terminated ptr tables; wasmtime.cc:465
      // args=[name], environ=deploy env + REDPANDA_INPUT_TOPIC/
      // REDPANDA_OUTPUT_TOPIC_n), reports what it saw via multi-iovec
      // fd_write(2), and mirrors the feed. The fd_write lines land in
      // the U6 transform-log path (enqueue admission → OTel JSON →
      // murmur2 routing); n_mirrored binds the transform half.
      import s.implicits._
      import graft.wasm.{TransformAbi, GuestModules}
      import graft.functions.RecordBatchCodec.Rec
      // bounded fixture feed (3 rows) from the events table
      val rows = T(s, dir, "events").where(col("event_id") < 3)
        .select(col("event_id"), col("event_type")).orderBy("event_id")
        .collect()
        .map(r => (r.getLong(0).toString.getBytes("UTF-8"),
          r.getString(1).getBytes("UTF-8")))
      val hdr = TransformAbi.BatchHeader(0L, rows.length, 0, 0,
        rows.length - 1, 1700000000000L, 1700000000000L + rows.length - 1,
        -1L, -1, -1)
      val feed = Iterator(TransformAbi.position(hdr,
        rows.zipWithIndex.map { case ((k, v), i) => Rec(i, i.toLong, k, v, Nil) }))
      val (emitted, logs) = TransformAbi.run(GuestModules.wasiStartup, feed,
        args = Seq("wasi-demo"),
        environ = Seq("REDPANDA_INPUT_TOPIC=events",
          "REDPANDA_OUTPUT_TOPIC_0=events_out"))
      val logDf = logs.zipWithIndex.map { case (line, i) =>
        (i.toLong, "wasi-demo", 2, 1700000000000L + i, "info", line) }
        .toDF("seq", "transform_name", "source_id", "ts_ms", "level", "message")
      graft.streaming.TransformLogs.publish(
        graft.streaming.TransformLogs.enqueue(logDf, lineMaxBytes = 256,
          bufferCapacityBytes = 16384, flushIntervalMs = 100000L),
        nPartitions = 8)
        .select(col("seq"), col("transform_name"), col("partition"),
          col("severity_number"), col("body_json"))
        .withColumn("n_mirrored", lit(emitted.size))
        .orderBy("seq")
    }),

    "u1_wasm_router" -> ((s, dir) => {
      // write_record_with_options from guest code: odd log offsets are
      // routed to topic "odd" (options frame 0x01 + vint-sized name,
      // wasm/transform_module.cc:40-55), even offsets to the default
      // output; the fold counts per route.
      val in = storedLog(s, dir).select(col("partition"), col("offset"),
        unix_millis(col("ts")).as("timestamp"),
        col("event_id").cast("string").cast("binary").as("key"),
        col("event_type").cast("binary").as("value"))
      graft.wasm.WasmTransform(in, graft.wasm.GuestModules.oddEvenRouter)
        .groupBy(coalesce(col("topic"), lit("default")).as("route"))
        .agg(count(lit(1)).as("n"))
        .orderBy("route")
    }),

    "u1_wasm_filter" -> ((s, dir) => {
      // STATEFUL guest: a counter in linear memory keeps every 3rd
      // record per partition, running straight through batch boundaries
      // (256-record batches) — one long-lived VM per partition run, as
      // the reference keeps one VM per partition processor. The counter
      // resets only at the documented 8192-record run boundary, which
      // the oracle reproduces with ((rank mod 8192) mod 3).
      val in = storedLog(s, dir).select(col("partition"), col("offset"),
        unix_millis(col("ts")).as("timestamp"),
        col("event_id").cast("string").cast("binary").as("key"),
        col("event_type").cast("binary").as("value"))
      graft.wasm.WasmTransform(in, graft.wasm.GuestModules.everyThird)
        .select(col("partition"),
          decode(col("key"), "UTF-8").cast("bigint").as("event_id"),
          decode(col("value"), "UTF-8").as("event_type"))
        .orderBy("event_id")
    }),

    "u5_wasm_schema" -> ((s, dir) => {
      // U5 as an ACTUAL guest capability: the schemaEcho wasm binary
      // imports the redpanda_schema_registry host module
      // (wasm/schema_registry_module.h:37-44), fetches schema id 1 at
      // startup, parses the encoded-def framing with its own varint
      // reader, and emits the raw definition as every record's value —
      // payload varints encoded in guest bytecode. Each executor task
      // rebuilds the SR node from the broadcast schema list, as every
      // reference shard holds its own SR replica.
      val raw = """{"type":"record","name":"Ev","fields":[{"name":"a","type":"string"}]}"""
      val expect = graft.registry.AvroCanonical.sanitize(raw)
      val factory: () => Map[(String, String), graft.wasm.WasmInterp.HostFunc] =
        () => {
          val srv = new graft.registry.RestApi.Server()
          srv.handle("POST", "/subjects/ev-value/versions",
            Some(s"""{"schema":${new com.fasterxml.jackson.databind.ObjectMapper()
              .writeValueAsString(new com.fasterxml.jackson.databind.ObjectMapper()
                .getNodeFactory.textNode(raw))}}"""))
          graft.wasm.SchemaRegistryAbi.hostFuncs(srv)
        }
      val in = storedLog(s, dir).where(col("offset") < 50)
        .select(col("partition"), col("offset"),
          unix_millis(col("ts")).as("timestamp"),
          col("event_id").cast("string").cast("binary").as("key"),
          col("event_type").cast("binary").as("value"))
      graft.wasm.WasmTransform(in, graft.wasm.GuestModules.schemaEcho,
          extraHostFactory = Some(factory))
        .groupBy(decode(col("value"), "UTF-8").as("schema"))
        .agg(count(lit(1)).as("n"))
        .withColumn("matches_registered", col("schema") === lit(expect))
        .select("matches_registered", "n")
        .orderBy("n")
    }),

    "u1_wasm_stream" -> ((s, dir) => {
      // The guest VM in its ACTUAL deployment shape — a continuous
      // per-partition processor over arriving batches
      // (transform/transform_processor.cc run loops): the events table
      // streams in as two mtime-ordered micro-batches, each runs the
      // SAME wasm mirror binary distributed via foreachBatch, and the
      // accumulated output must equal two mirrored copies of the table.
      // Per-batch-id overwrite dirs keep a replay from duplicating.
      val inDir = stagedEventsStream(s, dir, sentinel = false)
      val out = cleanupOnExit(
        java.nio.file.Files.createTempDirectory("graft_wasm_stream")).toString
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = withLtzTs(graft.streaming.Transforms.PathInput(
        inDir, schema, maxFilesPerTrigger = Some(1)).stream(s))
      val q = stream.writeStream
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val in = batch.select(
            pmod(col("user_id"), lit(EventPartitions)).cast("int").as("partition"),
            col("event_id").as("offset"),
            unix_millis(col("ts")).as("timestamp"),
            col("event_id").cast("string").cast("binary").as("key"),
            col("event_type").cast("binary").as("value"))
          graft.wasm.WasmTransform(in, graft.wasm.GuestModules.mirror)
            .write.mode("overwrite").parquet(s"$out/data/batch=$id")
          ()
        }.start()
      q.awaitTermination()
      s.read.parquet(s"$out/data")
        .select(decode(col("key"), "UTF-8").cast("bigint").as("event_id"),
          decode(col("value"), "UTF-8").as("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("event_type")
    }),

    "u3_sdk_vectors" -> ((s, dir) => {
      // The SDK example corpus replayed over its golden vectors through
      // the transform surface (example_{mirror,regexp_filter,
      // transcoding,validation}_test.go — see
      // graft.streaming.SdkExamples): byte-level outputs incl. Go
      // Marshal's < HTML escape, RFC-4180 quoted CSV fields, and
      // json.Valid's trailing-garbage rejection. Oracle pins the
      // vectors (the semantics are the Go SDK's, not re-derivable from
      // the tables).
      import s.implicits._
      import graft.streaming.SdkExamples
      import SdkExamples.Rec
      def b(x: String): Array[Byte] = if (x == null) null else x.getBytes("UTF-8")
      def str(x: Array[Byte]): String = if (x == null) null else new String(x, "UTF-8")
      val in = (
        Seq(("mirror", "k1", "v1"), ("mirror", null, "v2"), ("mirror", "k3", null)) ++
        Seq(("filter_key", "order-17", "a"), ("filter_key", "xx order-9 yy", "b"),
          ("filter_key", "ORDER-17", "c"), ("filter_key", "order-", "d"),
          ("filter_key", null, "order-3")) ++
        Seq(("filter_value", "order-17", "a"), ("filter_value", null, "order-3")) ++
        Seq(("transcode", "r1", "k1,hello,42\n"),
          ("transcode", "r2", "k2,\"x,y\",3\nk3,z,7"),
          ("transcode", "r3", "k4,a<b,-5\r\n")) ++
        Seq(("validate", "a", "{\"x\": 1}"), ("validate", "b", "[1, 2]"),
          ("validate", "c", "123"), ("validate", "e", "{x: 1}"),
          ("validate", "f", "{\"x\": 1} extra"), ("validate", "h", ""))
      ).toDF("example", "key", "value")
      graft.streaming.Transforms.applyBatch(in, (row: org.apache.spark.sql.Row) => {
        val rec = Rec(b(row.getAs[String]("key")), b(row.getAs[String]("value")))
        row.getAs[String]("example") match {
          case "mirror" =>
            SdkExamples.mirror(rec).map(r => ("mirror", str(r.key), str(r.value)))
          case "filter_key" =>
            SdkExamples.regexFilter("order-\\d+", matchValue = false)(rec)
              .map(r => ("filter_key", str(r.key), str(r.value)))
          case "filter_value" =>
            SdkExamples.regexFilter("order-\\d+", matchValue = true)(rec)
              .map(r => ("filter_value", str(r.key), str(r.value)))
          case "transcode" =>
            SdkExamples.csvToJson(rec).map(r => ("transcode", str(r.key), str(r.value)))
          case "validate" =>
            SdkExamples.jsonValidate(rec).map { case (topic, r) =>
              (s"validate_$topic", str(r.key), str(r.value))
            }
        }
      })
        .toDF("example", "out_key", "out_value")
        .orderBy("example", "out_key", "out_value")
    }),

    "u4_transform_validate" -> ((s, dir) =>
      Operators.transformValidate(events(s, dir), col("value") <= 30.0)
        .groupBy("route").agg(count(lit(1)).as("n"))
        .orderBy("route")),

    // ----- §2.8 U2: offset start options -----
    "u2_start_options" -> ((s, dir) => {
      // All four transform start options against the same topic: the log
      // as stored at deploy time (a per-partition prefix of varying
      // length) vs the full log the stream eventually sees. Each option's
      // cut is re-derived by the oracle. FromEnd snapshots per-partition
      // HWMs from the STORED input; FromCommitted resumes after an
      // explicit per-partition commit table (odd partitions have no
      // commit and start from scratch).
      import graft.streaming.Transforms
      val log = eventLog(s, dir).withColumnRenamed("ts", "timestamp")
      // schema read back from the materialized snapshot — the cut
      // formula lives only in u2SnapshotPath
      val snapPath = u2SnapshotPath(s, dir)
      val input = Transforms.PathInput(snapPath, s.read.parquet(snapPath).schema)
      val committed = log.where(col("partition") % 2 === 0)
        .groupBy("partition")
        .agg(floor(max("offset") / 2).cast("long").as("committed_offset"))
      def cut(option: String, start: Transforms.OffsetStart,
          commits: Option[DataFrame] = None): DataFrame =
        Transforms.applyStart(s, input, start, log, commits)
          .groupBy("partition")
          .agg(count(lit(1)).as("n"), min("offset").as("first_offset"),
            max("offset").as("last_offset"))
          .withColumn("start_option", lit(option))
      cut("from_start", Transforms.FromStart)
        .unionByName(cut("from_end", Transforms.FromEnd))
        .unionByName(cut("from_timestamp", Transforms.FromTimestamp(
          java.sql.Timestamp.valueOf("2024-01-20 00:00:00").getTime)))
        .unionByName(cut("from_committed", Transforms.FromCommitted, Some(committed)))
        .select("start_option", "partition", "n", "first_offset", "last_offset")
        .orderBy("start_option", "partition")
    }),

    // ----- §2.8 U4: management-plane lifecycle + error-state report -----
    "u4_lifecycle" -> ((s, dir) => {
      // Command log derived from events: each user_id%16 bucket is a
      // transform whose deploy/pause/resume/delete commands arrive in
      // event order — interleaved lifecycles with deletes and redeploys.
      val cmds = events(s, dir)
        .where(col("event_type").isin("signup", "view", "click", "purchase"))
        .select(col("event_id").as("seq"),
          concat(lit("tr-"), pmod(col("user_id"), lit(16)).cast("string")).as("transform"),
          when(col("event_type") === "signup", "deploy")
            .when(col("event_type") === "view", "pause")
            .when(col("event_type") === "click", "resume")
            .otherwise("delete").as("op"))
      graft.streaming.Transforms.lifecycle(cmds).orderBy("transform")
    }),

    "u4_report" -> ((s, dir) => {
      // Processor event log: commits carry the record's log offset,
      // errors flip the partition to errored until a later start/commit;
      // lag is measured against the partition HWM of the real log.
      val log = eventLog(s, dir)
      val proc = log
        .where(col("event_type").isin("click", "error", "signup"))
        .select(col("event_id").as("seq"),
          concat(lit("tr-"), pmod(col("user_id"), lit(5)).cast("string")).as("transform"),
          col("partition"),
          when(col("event_type") === "click", "commit")
            .when(col("event_type") === "error", "error")
            .otherwise("start").as("kind"),
          when(col("event_type") === "click", col("offset")).as("committed_offset"))
      graft.streaming.Transforms.statusReport(proc, RecordLog.latestOffsets(log))
        .orderBy("transform", "partition")
    }),

    // ----- §2.5 G6: transform offset tracking / commit batcher -----
    "g6_commit_batcher" -> ((s, dir) => {
      // Progress events for 32 (transform, partition) keys; flush
      // interval = 500 seq ticks. The fold must coalesce every interval's
      // enqueues to its LAST offset and carry one row per key per flush —
      // the oracle re-derives flush counts and committed state in SQL.
      // (Coordinator routing is murmur2 — golden-checked in the spec and
      // by adm_find_coordinator, not SQL-expressible.)
      val prog = events(s, dir).select(
        concat(lit("t"), pmod(col("user_id"), lit(4)).cast("string")).as("transform"),
        pmod(col("event_id"), lit(8)).cast("int").as("partition"),
        lit(0).as("output_topic"),
        col("event_id").as("seq"),
        col("event_id").as("offset"))
      graft.streaming.Transforms.commitBatcher(prog, intervalLen = 500L)
        .drop("coordinator")
        .orderBy("transform", "partition")
    }),

    "u5_transform_sr_decode" -> ((s, dir) => {
      // U5: the schema-registry client in the guest
      // (`wasm/schema_registry_module.h`) — the transform resolves its
      // writer schemas from the registry schema LOG (bounded,
      // driver-resolved, shipped with the task closure exactly like the
      // guest's SR client cache), runs the per-partition decode loop
      // (one resolving reader per schema id per task), and drops rows
      // that fail to type — the guest's dead-letter path. The oracle
      // re-derives the typed projection from the plaintext columns.
      import s.implicits._
      val schemaLog = Seq((1, AvroV1), (2, AvroV2)).toDF("id", "schema")
      val resolved = graft.registry.AvroDecode.schemasById(schemaLog)
      graft.registry.AvroDecode.decode(
          avroLog(s, dir).select("value_bin"), "value_bin", resolved, AvroV2)
        .where(col("decoded").isNotNull)
        .select(col("decoded.event_id").as("event_id"),
          col("decoded.event_type").as("event_type"),
          col("decoded.value").as("value"))
        .where(col("event_id") < 500)
        .orderBy("event_id")
    }),

    "u6_transform_logs" -> ((s, dir) =>
      // U6: WASM transform log manager end-to-end
      // (transform/logging/log_manager.cc): stdout/stderr lines →
      // byte-truncate at line-max → per-flush-window greedy semaphore
      // admission (fit checked BEFORE validity, non-fitting events
      // consume no units) → control-char/UTF-8 validation → OTel
      // LogRecord JSON (event.cc:81-99) routed to
      // murmur2(name) % 8 (rpc_client.cc:92). The oracle replays the
      // admission fold as a recursive CTE and pins the murmur2 routing
      // with golden partition values.
      graft.streaming.TransformLogs.publish(
        graft.streaming.TransformLogs.enqueue(xformLogEvents(s, dir),
          lineMaxBytes = 256, bufferCapacityBytes = 16384,
          flushIntervalMs = 100000L),
        nPartitions = 8)
        .select("seq", "transform_name", "partition", "time_unix_nano",
          "severity_number", "body_json")
        .orderBy("seq")),

    "u6_transform_logs_stream" -> ((s, dir) => {
      // The flusher as it actually runs — continuous: log lines stream
      // in, each flush interval is an event-time window, the greedy
      // semaphore fold runs inside the windowed aggregate, and append
      // mode emits each window's decisions exactly once. Two far-future
      // sentinel batches close every real window (the second closes the
      // first's); output is the per-(window, transform, status) batch
      // rollup, oracle-recomputed from the batch CTE.
      import s.implicits._
      val docSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val inDir = java.nio.file.Files.createTempDirectory("graft_u6s")
      val b0 = inDir.resolve("batch0.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/documents.parquet"), b0)
      java.nio.file.Files.setLastModifiedTime(b0,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L))
      Seq(9000000L, 9100000L).zipWithIndex.foreach { case (id, i) =>
        val tmp = inDir.resolve(s"__sent$i")
        Seq((id, "sentinel", "xx", "sent", 8L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .selectExpr(docSchema.fieldNames.map(n => n): _*)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val dst = inDir.resolve(s"batch${i + 1}.parquet")
        java.nio.file.Files.move(firstParquetPart(tmp), dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1700000001000L + i * 1000L))
      }
      val raw = graft.streaming.Transforms.PathInput(
        inDir.toString, docSchema, maxFilesPerTrigger = Some(1)).stream(s)
      val out = java.nio.file.Files.createTempDirectory("graft_u6out").toString
      graft.streaming.TransformLogs.publishStream(
        xformLogProjection(raw), s"$out/data", s"$out/ckpt",
        lineMaxBytes = 256, bufferCapacityBytes = 16384,
        flushIntervalMs = 100000L, nPartitions = 8)
      s.read.parquet(s"$out/data")
        .where(col("seq") < 9000000L)
        .groupBy("win", "transform_name", "partition", "status")
        .agg(count(lit(1)).as("n"), sum("sz").as("bytes"))
        .orderBy("win", "transform_name", "status")
    }),

    "u6_log_probes" -> ((s, dir) =>
      // The per-transform probe counters (transform/logging/probes.h):
      // log_event per attempt, dropped_log_event ONLY on buffer-full —
      // validation failures are logged but not drop-counted
      // (log_manager.cc:322,335), which the status split makes exact.
      graft.streaming.TransformLogs.probes(
        graft.streaming.TransformLogs.enqueue(xformLogEvents(s, dir),
          lineMaxBytes = 256, bufferCapacityBytes = 16384,
          flushIntervalMs = 100000L))
        .orderBy("transform_name")),

    "g6_commit_stream" -> ((s, dir) => {
      // The commit batcher as the continuous loop the reference runs:
      // progress events stream in, each flush interval is an event-time
      // window on the seq clock, and append mode emits each
      // (key, interval) flush exactly once; the still-open final
      // interval is flushed from checkpointed state by
      // commitBatcherStream's built-in drain (no sentinel staging).
      // The oracle recomputes the flush log with the batch twin's fold.
      val inDir = stagedEventsStream(s, dir, sentinel = false, single = true)
      val out = java.nio.file.Files.createTempDirectory("graft_g6s").toString
      val raw = graft.streaming.Transforms.PathInput(
        inDir, s.read.parquet(s"$dir/events.parquet").schema,
        maxFilesPerTrigger = Some(1)).stream(s)
      val prog = raw.select(
        concat(lit("t"), pmod(col("user_id"), lit(4)).cast("string")).as("transform"),
        pmod(col("event_id"), lit(8)).cast("int").as("partition"),
        lit(0).as("output_topic"),
        col("event_id").as("seq"),
        col("event_id").as("offset"))
      graft.streaming.Transforms.commitBatcherStream(
        prog, s"$out/data", s"$out/ckpt", intervalLen = 500L).awaitTermination()
      s.read.parquet(s"$out/data")
        .orderBy("transform", "partition", "interval")
    }),

    // ----- log-native extensions: as-of join -----
    "op_asof_join" -> ((s, dir) => {
      // For every purchase, the user's latest signup at or before it —
      // the classic as-of shape, as one window pass (no range scan).
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val signups = Compaction.compact(
        ev.where(col("event_type") === "signup")
          .select(col("user_id"), col("ts"),
            col("event_id").as("signup_event"), col("value").as("signup_value")),
        Seq("user_id", "ts"), "signup_event")
      Operators.asofJoin(purchases, signups, Seq("user_id"), "ts",
          Seq("signup_event", "signup_value"))
        .select(col("event_id"), col("user_id"), col("signup_event"), col("signup_value"))
        .orderBy("event_id")
    }),

    "op_range_join" -> ((s, dir) => {
      // Purchases inside a 3-day window after any signup of the same
      // user: interval-containment via the bucketed equi-join plan.
      val ev = events(s, dir)
      val points = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), unix_timestamp(col("ts")).as("t"),
          col("event_id").as("purchase_id"))
      val intervals = ev.where(col("event_type") === "signup")
        .select(col("user_id"), unix_timestamp(col("ts")).as("lo"),
          (unix_timestamp(col("ts")) + 3 * 86400L).as("hi"),
          col("event_id").as("signup_id"))
      Operators.rangeJoin(points, intervals, Seq("user_id"), "t", "lo", "hi", 86400L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum("purchase_id").as("sum_purchase"), sum("signup_id").as("sum_signup"))
        .orderBy("user_id")
    }),

    // ----- §4 murmur2 partition routing (parity-critical custom expr) -----
    "op_murmur2_routing" -> ((s, dir) => {
      // Golden-vector conformance: the SQL expression must reproduce the
      // published Kafka murmur2 values and the REFERENCE's unsigned-mod
      // routing (kafka/client/partitioners.cc:41-44) at a non-power-of-2
      // partition count — where Kafka-Java's toPositive would diverge.
      GraftFunctions.register(s)
      import s.implicits._
      Seq("", "0123456789", "a", "ab", "abc", "hello-kafka", "redpanda", "user-42")
        .toDF("key")
        .selectExpr("key", "murmur2(encode(key, 'UTF-8')) AS hash")
        .withColumn("route6",
          pmod(col("hash").cast("long").bitwiseAND(lit(0xffffffffL)), lit(6)).cast("int"))
        .orderBy("key")
    }),
  )

  def oracleSql: Map[String, String] = Map(

    "d2_record_translation" ->
      s"""$LogCte SELECT event_type AS h_type, count(*) AS n, max("offset") AS max_offset,
         |        CAST(sum(length(CAST(user_id AS VARCHAR))) AS BIGINT) AS sum_key_len,
         |        CAST(sum(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS BIGINT) AS sum_k
         | FROM log GROUP BY 1 ORDER BY 1""".stripMargin,

    "d1_materialize" ->
      """SELECT 'events_' || event_type AS output,
        |       strftime(date_trunc('day', ts), '%Y-%m-%d') AS p_key,
        |       count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // accumulated stream == one-shot batch: same derivation as d1_dlq
    "d1_dlq_stream" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 10 = 0 THEN 'bad_input'
        |         WHEN event_id % 10 = 1 THEN 'translation_error'
        |         WHEN event_id % 10 = 2 THEN 'incompatible_schema'
        |         ELSE 'ok' END AS error_code
        |  FROM events)
        |SELECT 'events_' || event_type AS output, error_code,
        |       count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "d1_dlq" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 10 = 0 THEN 'bad_input'
        |         WHEN event_id % 10 = 1 THEN 'translation_error'
        |         WHEN event_id % 10 = 2 THEN 'incompatible_schema'
        |         ELSE 'ok' END AS error_code
        |  FROM events)
        |SELECT 'events_' || event_type AS output, error_code,
        |       count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Golden pin of the Iceberg REST catalog protocol script (route
    // grammar, error types, requirement-failed OCC retry).
    "d6_rest_catalog" ->
      """SELECT * FROM (VALUES
        |  (1, 'GET', '/v1/namespaces/lake', 404, 'type=NoSuchNamespaceException'),
        |  (2, 'POST', '/v1/namespaces', 200, 'ns=lake'),
        |  (3, 'POST', '/v1/namespaces', 409, 'type=AlreadyExistsException'),
        |  (4, 'POST', '/v1/namespaces/lake/tables', 200, 'snap=-1'),
        |  (5, 'POST', '/v1/namespaces/lake/tables', 409, 'type=AlreadyExistsException'),
        |  (6, 'POST', '/v1/namespaces/lake/tables/events/commit', 200, 'snap=1'),
        |  (7, 'POST', '/v1/namespaces/lake/tables/events/commit', 409, 'type=CommitFailedException;msg=Requirement failed: branch main was created concurrently'),
        |  (8, 'GET', '/v1/namespaces/lake/tables/events', 200, 'snap=1'),
        |  (9, 'POST', '/v1/namespaces/lake/tables/events/commit', 200, 'snap=2'),
        |  (10, 'GET', '/v1/namespaces/lake/tables/events', 200, 'snapshots=2,main=2'),
        |  (11, 'READ', '/table', 200, 'complete=true'))
        | t(step, method, path, status, detail) ORDER BY step""".stripMargin,

    // writer 1 (slice 1) publishes first -> snap_2, no rebase; writer 2
    // (slice 2) rebases -> snap_3; the read sees every slice.
    "d6_commit_conflict" ->
      """WITH c AS (SELECT event_id % 3 AS slice, count(*) AS n FROM events GROUP BY 1)
        |SELECT 'snap_' || CAST(slice + 1 AS VARCHAR) AS kind, CAST(n AS BIGINT) AS n FROM c
        |UNION ALL SELECT 'read_rows', CAST((SELECT count(*) FROM events) AS BIGINT)
        |UNION ALL SELECT 'rebase_a', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'rebase_b', CAST(1 AS BIGINT)
        |ORDER BY kind""".stripMargin,

    "d6_iceberg_catalog" ->
      """SELECT CAST(event_id % 3 + 1 AS BIGINT) AS snapshot_id,
        |       CAST(event_id % 3 + 1 AS BIGINT) AS sequence_number,
        |       count(*) AS n_rows
        | FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "d6_iceberg_read" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_key, count(*) AS n
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6_iceberg_evolution" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_with_value,
        |  CAST(sum(CASE WHEN event_id % 2 = 1 THEN event_id END) AS BIGINT) AS sum_id_with_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Rename is metadata-only: every row (both halves) aggregates under
    // the new name; the dropped column never surfaces.
    "d6_iceberg_rename_drop" ->
      """SELECT event_type AS kind, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Field ids carry identity: rename keeps id 3, drop retires id 2,
    // the re-added user_id gets fresh id 5. Every generation retained.
    "d6_iceberg_schema_history" ->
      """SELECT * FROM (VALUES
        |  (0, 1, 'event_id',   FALSE, 'long',        FALSE),
        |  (0, 2, 'user_id',    FALSE, 'long',        FALSE),
        |  (0, 3, 'event_type', FALSE, 'string',      FALSE),
        |  (0, 4, 'ts',         FALSE, 'timestamptz', FALSE),
        |  (1, 1, 'event_id',   FALSE, 'long',        FALSE),
        |  (1, 2, 'user_id',    FALSE, 'long',        FALSE),
        |  (1, 3, 'kind',       FALSE, 'string',      FALSE),
        |  (1, 4, 'ts',         FALSE, 'timestamptz', FALSE),
        |  (2, 1, 'event_id',   FALSE, 'long',        FALSE),
        |  (2, 3, 'kind',       FALSE, 'string',      FALSE),
        |  (2, 4, 'ts',         FALSE, 'timestamptz', FALSE),
        |  (3, 1, 'event_id',   FALSE, 'long',        TRUE),
        |  (3, 3, 'kind',       FALSE, 'string',      TRUE),
        |  (3, 4, 'ts',         FALSE, 'timestamptz', TRUE),
        |  (3, 5, 'user_id',    FALSE, 'string',      TRUE))
        | t(schema_id, field_id, name, required, type, is_current)
        | ORDER BY schema_id, field_id""".stripMargin,

    // Two live layouts: odd ids under month dirs (p_key length 7) after
    // the spec evolved, even ids under the original day dirs (length 10).
    "d6_iceberg_spec_evolution" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 10 ELSE 7 END AS layout_len,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id,
        |  CAST(count(DISTINCT CASE WHEN event_id % 2 = 0
        |    THEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |    ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m') END) AS BIGINT) AS n_partitions
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6_iceberg_rewrite_manifests" ->
      """SELECT 3 AS before_manifests, 1 AS after_manifests,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN event_id % 3 = 0 THEN 1 END) AS BIGINT) AS travel_rows
        |FROM events WHERE event_id < 3000""".stripMargin,

    "d6_iceberg_orphans" ->
      """SELECT 0 AS n_guarded,
        |  'stray-0.parquet,stray-1.tmp,stray-manifest.avro' AS removed,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM events WHERE event_id < 2000""".stripMargin,

    "d6_iceberg_eq_deletes" ->
      """WITH fin AS (
        |  SELECT event_id, event_type FROM events WHERE user_id % 10 <> 4
        |  UNION ALL
        |  SELECT event_id, event_type FROM events
        |  WHERE user_id % 10 = 4 AND event_id % 5 = 0)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6_iceberg_deletes" ->
      """WITH now AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_key,
        |    CAST(count(*) AS BIGINT) AS n_now,
        |    CAST(sum(event_id) AS BIGINT) AS sum_id_now
        |  FROM events WHERE user_id % 7 <> 0 GROUP BY 1),
        | s1 AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_key,
        |    CAST(count(*) AS BIGINT) AS n_snap1
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1)
        |SELECT p_key, n_now, sum_id_now, n_snap1
        |FROM now LEFT JOIN s1 USING (p_key) ORDER BY p_key""".stripMargin,

    "d6_iceberg_travel" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_key, count(*) AS n,
        |       CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM events WHERE event_id % 3 < 2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6_refs" ->
      """SELECT 'dev' AS ref, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM events WHERE event_id % 3 < 2
        |UNION ALL
        |SELECT 'main', count(*), CAST(sum(event_id) AS BIGINT) FROM events
        |UNION ALL
        |SELECT 'v1', count(*), CAST(sum(event_id) AS BIGINT)
        | FROM events WHERE event_id % 3 = 0
        |ORDER BY ref""".stripMargin,

    "d6_expire_policy" ->
      """SELECT 'dev' AS ref, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM events WHERE event_id % 5 < 4
        |UNION ALL
        |SELECT 'expired', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
        |UNION ALL
        |SELECT 'live_refs', CAST(3 AS BIGINT), CAST(0 AS BIGINT)
        |UNION ALL
        |SELECT 'main', count(*), CAST(sum(event_id) AS BIGINT) FROM events
        |UNION ALL
        |SELECT 'pin2', count(*), CAST(sum(event_id) AS BIGINT)
        | FROM events WHERE event_id % 5 < 2
        |ORDER BY ref""".stripMargin,

    "d6_iceberg_stream" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_key, count(*) AS n,
        |       CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6_iceberg_upsert_stream" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_key,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6_iceberg_compaction" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_key, count(*) AS n,
        |       CAST(sum(event_id) AS BIGINT) AS sum_id, CAST(1 AS BIGINT) AS n_files
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6_snapshots" ->
      """WITH dr AS (
        |  SELECT event_id,
        |         CAST((dense_rank() OVER (ORDER BY date_trunc('day', ts)) - 1) // 10 + 1 AS BIGINT) AS snapshot_id
        |  FROM events)
        | SELECT snapshot_id, count(*) AS n, min(event_id) AS min_id, max(event_id) AS max_id
        | FROM dr WHERE snapshot_id > (SELECT max(snapshot_id) - 2 FROM dr)
        | GROUP BY 1 ORDER BY 1""".stripMargin,

    "d4_partition_transforms" ->
      """SELECT CAST(year(ts) AS INTEGER) AS t_year, CAST(month(ts) AS INTEGER) AS t_month,
        |       CAST(day(ts) AS INTEGER) AS t_day, CAST(hour(ts) AS INTEGER) AS t_hour,
        |       CAST(user_id % 16 AS INTEGER) AS t_bucket, substr(event_type, 1, 3) AS t_truncate,
        |       count(*) AS n
        | FROM events GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,

    "u1_transform_mirror" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",

    "u2_transform_filter" ->
      """SELECT event_type, count(*) AS n FROM events
        | WHERE regexp_matches(props, '"k": 4[0-9]') GROUP BY 1 ORDER BY 1""".stripMargin,

    "u3_transform_transcode" ->
      """SELECT event_id, 'user=' || CAST(user_id AS VARCHAR) || ';type=' || event_type AS value
        | FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,

    "u4_transform_validate" ->
      """SELECT CASE WHEN value <= 30.0 THEN 'output' ELSE 'dead_letter' END AS route, count(*) AS n
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "u1_wasm_mirror" ->
      """SELECT CAST(user_id % 8 AS INTEGER) AS partition, event_id, event_type
        | FROM events ORDER BY event_id""".stripMargin,

    // Golden pin of the WASI startup surface: the guest's fd_write(2)
    // report lines as published OTel log rows (murmur2('wasi-demo')%8
    // = 2, severity info = 9), plus the mirrored-record count.
    "u1_wasm_wasi" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'wasi-demo', 2, 9, '{"body":{"stringValue":"init wasi-demo"},"timeUnixNano":1700000000000000000,"severityNumber":9,"attributes":[{"key":"transform_name","value":{"stringValue":"wasi-demo"}},{"key":"node","value":{"intValue":2}}]}', 3),
        |  (CAST(1 AS BIGINT), 'wasi-demo', 2, 9, '{"body":{"stringValue":"env REDPANDA_INPUT_TOPIC=events"},"timeUnixNano":1700000000001000000,"severityNumber":9,"attributes":[{"key":"transform_name","value":{"stringValue":"wasi-demo"}},{"key":"node","value":{"intValue":2}}]}', 3),
        |  (CAST(2 AS BIGINT), 'wasi-demo', 2, 9, '{"body":{"stringValue":"clock ok"},"timeUnixNano":1700000000002000000,"severityNumber":9,"attributes":[{"key":"transform_name","value":{"stringValue":"wasi-demo"}},{"key":"node","value":{"intValue":2}}]}', 3),
        |  (CAST(3 AS BIGINT), 'wasi-demo', 2, 9, '{"body":{"stringValue":"rand ok"},"timeUnixNano":1700000000003000000,"severityNumber":9,"attributes":[{"key":"transform_name","value":{"stringValue":"wasi-demo"}},{"key":"node","value":{"intValue":2}}]}', 3))
        | t(seq, transform_name, partition, severity_number, body_json, n_mirrored)
        | ORDER BY seq""".stripMargin,

    "u3_wasm_upper" ->
      """SELECT event_id, UPPER('type=' || event_type) AS value
        | FROM events ORDER BY event_id""".stripMargin,

    "u1_wasm_filter" ->
      s"""$LogCte, r AS (
         |  SELECT partition, event_id, event_type,
         |         CAST(row_number() OVER (PARTITION BY partition ORDER BY "offset") - 1
         |           AS BIGINT) AS rk
         |  FROM log)
         | SELECT partition, event_id, event_type FROM r
         | WHERE (rk % 8192) % 3 = 0 ORDER BY event_id""".stripMargin,

    // 8 partitions × first 50 offsets, every record carrying the one
    // registered schema.
    "u5_wasm_schema" ->
      s"""$LogCte SELECT TRUE AS matches_registered,
         |  CAST(count(*) AS BIGINT) AS n FROM log WHERE "offset" < 50""".stripMargin,

    "u1_wasm_stream" ->
      """SELECT event_type, CAST(2 * count(*) AS BIGINT) AS n,
        |       CAST(2 * sum(event_id) AS BIGINT) AS sum_id
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "u1_wasm_router" ->
      """SELECT CASE WHEN ("offset" % 2) = 1 THEN 'odd' ELSE 'default' END AS route,
        |       count(*) AS n
        | FROM (SELECT row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id) - 1 AS "offset"
        |       FROM events) GROUP BY 1 ORDER BY 1""".stripMargin,

    // Golden pins of the Go SDK example behaviors (the semantics live
    // in the SDK's example tests, not in the data tables).
    "u3_sdk_vectors" ->
      """SELECT example, CAST(out_key AS VARCHAR) AS out_key,
        |       CAST(out_value AS VARCHAR) AS out_value
        | FROM (VALUES
        |  ('mirror', 'k1', 'v1'),
        |  ('mirror', NULL, 'v2'),
        |  ('mirror', 'k3', NULL),
        |  ('filter_key', 'order-17', 'a'),
        |  ('filter_key', 'xx order-9 yy', 'b'),
        |  ('filter_value', NULL, 'order-3'),
        |  ('transcode', 'k1', '{"a":"hello","b":42}'),
        |  ('transcode', 'k2', '{"a":"x,y","b":3}'),
        |  ('transcode', 'k3', '{"a":"z","b":7}'),
        |  ('transcode', 'k4', '{"a":"a' || chr(92) || 'u003cb","b":-5}'),
        |  ('validate_output', 'a', '{"x": 1}'),
        |  ('validate_output', 'b', '[1, 2]'),
        |  ('validate_output', 'c', '123'),
        |  ('validate_invalid_json', 'e', '{x: 1}'),
        |  ('validate_invalid_json', 'f', '{"x": 1} extra'),
        |  ('validate_invalid_json', 'h', ''))
        |  t(example, out_key, out_value)
        | ORDER BY example, out_key, out_value""".stripMargin,

    "u2_start_options" ->
      (LogCte +
      """, snap AS (SELECT partition, max("offset") AS hwm FROM log
        |     WHERE "offset" < 50 + partition * 13 GROUP BY 1),
        | comm AS (SELECT partition, CAST(floor(max("offset") / 2) AS BIGINT) AS coff
        |     FROM log WHERE partition % 2 = 0 GROUP BY 1)
        | SELECT * FROM (
        |  SELECT 'from_start' AS start_option, partition, count(*) AS n,
        |         min("offset") AS first_offset, max("offset") AS last_offset
        |  FROM log GROUP BY 2
        |  UNION ALL
        |  SELECT 'from_end', l.partition, count(*), min(l."offset"), max(l."offset")
        |  FROM log l LEFT JOIN snap s ON l.partition = s.partition
        |  WHERE s.hwm IS NULL OR l."offset" > s.hwm GROUP BY 2
        |  UNION ALL
        |  SELECT 'from_timestamp', partition, count(*), min("offset"), max("offset")
        |  FROM log WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' GROUP BY 2
        |  UNION ALL
        |  SELECT 'from_committed', l.partition, count(*), min(l."offset"), max(l."offset")
        |  FROM log l LEFT JOIN comm c ON l.partition = c.partition
        |  WHERE c.coff IS NULL OR l."offset" > c.coff GROUP BY 2
        | ) ORDER BY start_option, partition""").stripMargin,

    "u4_lifecycle" ->
      """WITH cmd AS (
        |  SELECT event_id AS seq, 'tr-' || CAST(user_id % 16 AS VARCHAR) AS transform,
        |    CASE event_type WHEN 'signup' THEN 'deploy' WHEN 'view' THEN 'pause'
        |      WHEN 'click' THEN 'resume' ELSE 'delete' END AS op
        |  FROM events WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        | bounds AS (
        |  SELECT transform,
        |    coalesce(max(CASE WHEN op = 'delete' THEN seq END), -1) AS last_del,
        |    count(CASE WHEN op = 'deploy' THEN 1 END) AS n_deploys,
        |    count(CASE WHEN op = 'delete' THEN 1 END) AS n_deletes
        |  FROM cmd GROUP BY 1),
        | dep AS (
        |  SELECT c.transform, min(c.seq) AS deployed_seq
        |  FROM cmd c JOIN bounds b ON c.transform = b.transform
        |  WHERE c.seq > b.last_del AND c.op = 'deploy' GROUP BY 1)
        | SELECT c.transform,
        |  CASE WHEN arg_max(c.op, c.seq) = 'pause' THEN 'paused' ELSE 'running' END AS state,
        |  any_value(b.n_deploys) AS n_deploys, any_value(b.n_deletes) AS n_deletes,
        |  any_value(d.deployed_seq) AS deployed_seq, max(c.seq) AS last_seq
        | FROM cmd c JOIN bounds b ON c.transform = b.transform
        |  JOIN dep d ON c.transform = d.transform
        | WHERE c.seq >= d.deployed_seq AND c.op IN ('deploy', 'pause', 'resume')
        | GROUP BY 1 ORDER BY 1""".stripMargin,

    "u4_report" ->
      (LogCte +
      """, proc AS (
        |  SELECT event_id AS seq, 'tr-' || CAST(user_id % 5 AS VARCHAR) AS transform,
        |    partition,
        |    CASE event_type WHEN 'click' THEN 'commit' WHEN 'error' THEN 'error'
        |      ELSE 'start' END AS kind,
        |    CASE WHEN event_type = 'click' THEN "offset" END AS committed_offset
        |  FROM log WHERE event_type IN ('click', 'error', 'signup')),
        | hwm AS (SELECT partition, max("offset") + 1 AS hwm FROM log GROUP BY 1)
        | SELECT p.transform, p.partition,
        |  CASE WHEN arg_max(p.kind, p.seq) = 'error' THEN 'errored' ELSE 'running' END AS status,
        |  max(CASE WHEN p.kind = 'commit' THEN p.committed_offset END) AS last_committed,
        |  any_value(h.hwm) - coalesce(max(CASE WHEN p.kind = 'commit' THEN p.committed_offset END) + 1, 0) AS lag,
        |  count(CASE WHEN p.kind = 'error' THEN 1 END) AS n_errors
        | FROM proc p JOIN hwm h ON p.partition = h.partition
        | GROUP BY 1, 2 ORDER BY 1, 2""").stripMargin,

    // Commit-batcher fold: per (key, interval) the LAST enqueued offset
    // survives the flush; per key the last flush is the committed state.
    "g6_commit_batcher" ->
      """WITH prog AS (
        |  SELECT 't' || CAST(user_id % 4 AS VARCHAR) AS transform,
        |         CAST(event_id % 8 AS INTEGER) AS partition,
        |         0 AS output_topic, event_id AS seq, event_id AS "offset"
        |  FROM events),
        | fl AS (
        |  SELECT transform, partition, output_topic, seq // 500 AS iv,
        |         arg_max("offset", seq) AS flush_off, count(*) AS n_enq
        |  FROM prog GROUP BY 1, 2, 3, 4)
        | SELECT transform, partition, output_topic,
        |        arg_max(flush_off, iv) AS committed_offset,
        |        count(*) AS n_flushes, CAST(sum(n_enq) AS BIGINT) AS n_enqueued
        | FROM fl GROUP BY 1, 2, 3 ORDER BY transform, partition""".stripMargin,

    // v1 writers (even event_id) have no `value` field: the v2 reader
    // surfaces its null default — re-derived here from plaintext.
    "u5_transform_sr_decode" ->
      """SELECT event_id, event_type,
        |  CASE WHEN event_id % 2 = 1 THEN value END AS value
        | FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "u6_transform_logs" ->
      s"""$XformLogCte
         |SELECT t.seq, t.transform_name,
         |  CASE t.transform_name WHEN 'xform-0' THEN 4 WHEN 'xform-1' THEN 5
         |    WHEN 'xform-2' THEN 2 ELSE 6 END AS partition,
         |  CAST(t.ts_ms * 1000000 AS BIGINT) AS time_unix_nano,
         |  t.sev AS severity_number,
         |  '{"body":{"stringValue":"'
         |    || replace(replace(replace(replace(t.msg, '\\', '\\\\'), '"', '\\"'),
         |         chr(10), '\\n'), chr(9), '\\t')
         |    || '"},"timeUnixNano":' || CAST(CAST(t.ts_ms * 1000000 AS BIGINT) AS VARCHAR)
         |    || ',"severityNumber":' || CAST(t.sev AS VARCHAR)
         |    || ',"attributes":[{"key":"transform_name","value":{"stringValue":"'
         |    || t.transform_name
         |    || '"}},{"key":"node","value":{"intValue":' || CAST(t.source_id AS VARCHAR)
         |    || '}}]}' AS body_json
         |FROM adm a JOIN t ON t.win = a.win AND t.seq = a.seq
         |WHERE a.status = 'ok' ORDER BY t.seq""".stripMargin,

    "u6_transform_logs_stream" ->
      s"""$XformLogCte
         |SELECT t.win, t.transform_name,
         |  CASE t.transform_name WHEN 'xform-0' THEN 4 WHEN 'xform-1' THEN 5
         |    WHEN 'xform-2' THEN 2 ELSE 6 END AS partition,
         |  a.status, count(*) AS n, CAST(sum(t.sz) AS BIGINT) AS bytes
         |FROM adm a JOIN t ON t.win = a.win AND t.seq = a.seq
         |GROUP BY 1, 2, 3, 4
         |ORDER BY t.win, t.transform_name, a.status""".stripMargin,

    "u6_log_probes" ->
      s"""$XformLogCte
         |SELECT t.transform_name, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN a.status = 'dropped_buffer_full' THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN a.status = 'dropped_invalid' THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
         |  CAST(sum(CASE WHEN a.status = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_published
         |FROM adm a JOIN t ON t.win = a.win AND t.seq = a.seq
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The streaming twin emits the flush LOG itself (one row per key per
    // interval) — the same fold, asserted row-for-row.
    "g6_commit_stream" ->
      """WITH prog AS (
        |  SELECT 't' || CAST(user_id % 4 AS VARCHAR) AS transform,
        |         CAST(event_id % 8 AS INTEGER) AS partition,
        |         0 AS output_topic, event_id AS seq, event_id AS "offset"
        |  FROM events)
        | SELECT transform, partition, output_topic, seq // 500 AS interval,
        |        arg_max("offset", seq) AS flush_off, count(*) AS n_enq
        | FROM prog GROUP BY 1, 2, 3, 4
        | ORDER BY transform, partition, interval""".stripMargin,

    "op_range_join" ->
      """WITH p AS (SELECT user_id, epoch(ts) AS t, event_id AS purchase_id
        |           FROM events WHERE event_type = 'purchase'),
        | i AS (SELECT user_id, epoch(ts) AS lo, epoch(ts) + 259200 AS hi,
        |              event_id AS signup_id
        |       FROM events WHERE event_type = 'signup')
        | SELECT p.user_id, count(*) AS n_pairs,
        |        CAST(sum(purchase_id) AS BIGINT) AS sum_purchase,
        |        CAST(sum(signup_id) AS BIGINT) AS sum_signup
        | FROM p JOIN i ON p.user_id = i.user_id AND p.t BETWEEN i.lo AND i.hi
        | GROUP BY 1 ORDER BY 1""".stripMargin,

    "op_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        | s0 AS (SELECT user_id, ts, event_id AS signup_event, value AS signup_value
        |        FROM events WHERE event_type = 'signup'),
        | s AS (SELECT user_id, ts, signup_event, signup_value FROM s0
        |       QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY signup_event DESC) = 1)
        | SELECT p.event_id, p.user_id, s.signup_event, s.signup_value
        | FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
        | ORDER BY p.event_id""".stripMargin,

    "op_murmur2_routing" ->
      """SELECT * FROM (VALUES
        |  ('', 275646681, 3), ('0123456789', -631703640, 4), ('a', -1563381124, 0),
        |  ('ab', 316155434, 2), ('abc', 479470107, 3), ('hello-kafka', -540832233, 1),
        |  ('redpanda', -232303994, 2), ('user-42', 1459644460, 4))
        | t(key, hash, route6) ORDER BY key""".stripMargin,
  )
}
