package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Real Iceberg v2 table format, written against the PUBLIC Iceberg table
 * spec (https://iceberg.apache.org/spec/) — no Iceberg runtime jars in
 * this environment, so the metadata files are authored directly:
 *
 *  - `metadata/v{N}.metadata.json` — format-version 2 table metadata
 *    (schemas with field ids, partition specs with transforms, snapshot
 *    list, snapshot log, refs) plus the `version-hint.text` pointer —
 *    the same commit protocol the reference drives through its REST
 *    catalog (`iceberg/table_metadata.cc`, `iceberg/rest_catalog.cc`);
 *  - `metadata/snap-{id}.avro` — the snapshot's manifest LIST: one avro
 *    record per manifest with spec field-ids 500-519
 *    (`iceberg/manifest_list.h`, `manifest_io.cc`);
 *  - `metadata/manifest-{id}.avro` — the manifest: one `manifest_entry`
 *    per data file (status/snapshot/sequence + a `data_file` struct with
 *    field-ids 100-104/134), record counts from the parquet footers
 *    (`iceberg/manifest.h`, `manifest_entry.h`);
 *  - `data/...` — hour-partitioned parquet written by Spark's
 *    partitioning writer (`datalake/partitioning_writer.h` analogue).
 *
 * The read path is metadata-driven exactly like an Iceberg reader:
 * version-hint → metadata.json → current snapshot → manifest list →
 * manifests → data file paths, so a scan plans from the manifest file
 * set (planning-time pruning; expired-but-undeleted data is invisible)
 * rather than directory listing. [[Datalake]] keeps the parquet-native
 * emulation for the high-volume bench paths; this module is the
 * format-faithful catalog surface.
 *
 * Scale note: all metadata here is bounded (one avro record per file /
 * manifest / snapshot — the reference's manifests are the same); the
 * data write is the standard clustered dynamic-partition write. Driver
 * code touches only metadata, never rows.
 */
object IcebergFormat {

  // ------------------------------------------------------------- field ids

  /** Iceberg type name for a Spark type (spec "Primitive Types"). */
  private def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case StringType => "string"
    case BooleanType => "boolean"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(s"unsupported iceberg type: $other")
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Iceberg schema JSON: fields get ids 1..n in declaration order. */
  private def schemaJson(schema: StructType): String = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id": ${i + 1}, "name": ${jsonStr(f.name)}, "required": ${!f.nullable}, "type": ${jsonStr(icebergType(f.dataType))}}"""
    }
    s"""{"type": "struct", "schema-id": 0, "fields": [${fields.mkString(", ")}]}"""
  }

  // ------------------------------------------------------------- avro io

  /** manifest_entry schema with the spec's reserved field ids (status 0,
    * snapshot_id 1, sequence_number 3, file_sequence_number 4,
    * data_file 2; data_file fields 134/100/101/102/103/104). The
    * partition struct carries the single hour/day field (id 1000) as its
    * human-readable value — transform output as string for transparency. */
  private val ManifestEntrySchema: Schema = new Schema.Parser().parse(
    """{
      |  "type": "record", "name": "manifest_entry", "fields": [
      |    {"name": "status", "type": "int", "field-id": 0},
      |    {"name": "snapshot_id", "type": ["null", "long"], "default": null, "field-id": 1},
      |    {"name": "sequence_number", "type": ["null", "long"], "default": null, "field-id": 3},
      |    {"name": "file_sequence_number", "type": ["null", "long"], "default": null, "field-id": 4},
      |    {"name": "data_file", "field-id": 2, "type": {
      |      "type": "record", "name": "r2", "fields": [
      |        {"name": "content", "type": "int", "field-id": 134},
      |        {"name": "file_path", "type": "string", "field-id": 100},
      |        {"name": "file_format", "type": "string", "field-id": 101},
      |        {"name": "partition", "field-id": 102, "type": {
      |          "type": "record", "name": "r102", "fields": [
      |            {"name": "p_key", "type": ["null", "string"], "default": null, "field-id": 1000}
      |          ]}},
      |        {"name": "record_count", "type": "long", "field-id": 103},
      |        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
      |        {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}], "default": null, "field-id": 135}
      |      ]}}
      |  ]
      |}""".stripMargin)

  /** manifest_file (manifest list) schema, spec field ids 500-517. */
  private val ManifestFileSchema: Schema = new Schema.Parser().parse(
    """{
      |  "type": "record", "name": "manifest_file", "fields": [
      |    {"name": "manifest_path", "type": "string", "field-id": 500},
      |    {"name": "manifest_length", "type": "long", "field-id": 501},
      |    {"name": "partition_spec_id", "type": "int", "field-id": 502},
      |    {"name": "content", "type": "int", "field-id": 517},
      |    {"name": "sequence_number", "type": "long", "field-id": 515},
      |    {"name": "min_sequence_number", "type": "long", "field-id": 516},
      |    {"name": "added_snapshot_id", "type": "long", "field-id": 503},
      |    {"name": "added_files_count", "type": "int", "field-id": 504},
      |    {"name": "existing_files_count", "type": "int", "field-id": 505},
      |    {"name": "deleted_files_count", "type": "int", "field-id": 506},
      |    {"name": "added_rows_count", "type": "long", "field-id": 512},
      |    {"name": "existing_rows_count", "type": "long", "field-id": 513},
      |    {"name": "deleted_rows_count", "type": "long", "field-id": 514}
      |  ]
      |}""".stripMargin)

  private def writeAvro(fs: FileSystem, path: Path, schema: Schema,
      records: Seq[GenericRecord]): Long = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    val out = fs.create(path, true)
    try {
      w.create(schema, out)
      records.foreach(w.append)
      w.close()
    } finally out.close()
    fs.getFileStatus(path).getLen
  }

  private def readAvro(fs: FileSystem, path: Path, schema: Schema): Seq[GenericRecord] = {
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    val buf = new Array[Byte](len.toInt)
    try in.readFully(0, buf) finally in.close()
    val reader = new DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(buf),
      new GenericDatumReader[GenericRecord](schema))
    try reader.iterator().asScala.toSeq finally reader.close()
  }

  // ------------------------------------------------------- table metadata

  private def metaDir(table: String) = s"$table/metadata"
  private def dataDir(table: String) = s"$table/data"

  private def fsOf(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current metadata version from version-hint.text (the HadoopCatalog
    * commit pointer); None for a fresh table. */
  private def currentVersion(fs: FileSystem, table: String): Option[Int] = {
    val hint = new Path(s"${metaDir(table)}/version-hint.text")
    if (!fs.exists(hint)) None
    else {
      val in = fs.open(hint)
      try Some(new String(in.readAllBytes(), UTF_8).trim.toInt) finally in.close()
    }
  }

  private def readMetadataJson(fs: FileSystem, table: String, v: Int): String = {
    val in = fs.open(new Path(s"${metaDir(table)}/v$v.metadata.json"))
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  /** Jackson (already on the Spark classpath) parses the metadata JSON —
    * the same library the Iceberg reference implementation uses. */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def jsonStrField(json: String, key: String): Option[String] = {
    val n = mapper.readTree(json).path(key)
    if (n.isTextual) Some(n.asText) else None
  }

  final case class SnapshotInfo(snapshotId: Long, sequenceNumber: Long,
      manifestList: String, addedRows: Long, op: String = "append",
      sourceBatchId: Option[Long] = None)

  /** Parse the snapshots array out of the metadata JSON. */
  private def parseSnapshots(json: String): Seq[SnapshotInfo] =
    mapper.readTree(json).path("snapshots").elements().asScala.toSeq.map { s =>
      val bid = s.path("summary").path("streaming-batch-id")
      SnapshotInfo(
        s.path("snapshot-id").asLong,
        s.path("sequence-number").asLong,
        s.path("manifest-list").asText,
        s.path("summary").path("added-rows").asText("0").toLong,
        s.path("summary").path("operation").asText("append"),
        if (bid.isMissingNode) None else Some(bid.asText.toLong))
    }

  private def writeMetadataJson(fs: FileSystem, table: String, v: Int,
      schema: StructType, snaps: Seq[SnapshotInfo], uuid: String,
      partitionField: String): Unit = {
    val now = System.currentTimeMillis()
    val current = snaps.lastOption.map(_.snapshotId).getOrElse(-1L)
    val lastSeq = snaps.lastOption.map(_.sequenceNumber).getOrElse(0L)
    val snapJson = snaps.map { s =>
      val bid = s.sourceBatchId
        .map(b => s""", "streaming-batch-id": "$b"""").getOrElse("")
      s"""{"snapshot-id": ${s.snapshotId}, "sequence-number": ${s.sequenceNumber},
         |     "timestamp-ms": $now, "manifest-list": ${jsonStr(s.manifestList)},
         |     "summary": {"operation": "${s.op}", "added-rows": "${s.addedRows}"$bid},
         |     "schema-id": 0}""".stripMargin
    }.mkString("[", ", ", "]")
    val logJson = snaps.map(s => s"""{"timestamp-ms": $now, "snapshot-id": ${s.snapshotId}}""")
      .mkString("[", ", ", "]")
    val refs =
      if (current >= 0) s"""{"main": {"snapshot-id": $current, "type": "branch"}}"""
      else "{}"
    val json =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": ${jsonStr(uuid)},
         |  "location": ${jsonStr(table)},
         |  "last-sequence-number": $lastSeq,
         |  "last-updated-ms": $now,
         |  "last-column-id": ${schema.fields.length},
         |  "current-schema-id": 0,
         |  "schemas": [${schemaJson(schema)}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "p_key", "transform": "identity", "source-id": ${schema.fieldIndex(partitionField) + 1}, "field-id": 1000}]}],
         |  "last-partition-id": 1000,
         |  "default-sort-order-id": 0,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "properties": {"write.format.default": "parquet"},
         |  "current-snapshot-id": $current,
         |  "snapshots": $snapJson,
         |  "snapshot-log": $logJson,
         |  "metadata-log": [],
         |  "refs": $refs
         |}""".stripMargin
    val p = new Path(s"${metaDir(table)}/v$v.metadata.json")
    val out = fs.create(p, true)
    try out.write(json.getBytes(UTF_8)) finally out.close()
    // the version hint flips LAST — readers never see a version without
    // its metadata file (same ordering as HadoopTableOperations.commit)
    val hint = fs.create(new Path(s"${metaDir(table)}/version-hint.text"), true)
    try hint.write(v.toString.getBytes(UTF_8)) finally hint.close()
  }

  // ------------------------------------------------------------- commits

  /** Parquet footer record count (bounded metadata read, one footer per
    * written file — the figure the manifest's `record_count` carries). */
  private def footerRowCount(spark: SparkSession, file: Path): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try reader.getRecordCount finally reader.close()
  }

  /**
   * Commit `df` as the next snapshot of an Iceberg v2 table at
   * `table`: data files first, then manifest avro, manifest-list avro,
   * metadata.json, and the version hint last — each step atomic w.r.t.
   * readers, exactly the Iceberg commit order.
   * The partition column is `partFn(tsCol)` as `p_key` (hour transform
   * by default). Returns the new snapshot id.
   */
  def commit(df: DataFrame, tsCol: Column, table: String,
      partFn: Column => Column = Datalake.hourPartition,
      sourceBatchId: Option[Long] = None): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, table)
    val prior = currentVersion(fs, table)
    val priorJson = prior.map(readMetadataJson(fs, table, _))
    val priorSnaps = priorJson.map(parseSnapshots).getOrElse(Seq.empty)
    // exactly-once streaming ingestion: a snapshot carrying this source
    // batch id is already committed — the redelivery is a no-op (the
    // datalake-coordinator dedup the reference keeps per offset range)
    sourceBatchId.foreach { bid =>
      priorSnaps.find(_.sourceBatchId.contains(bid))
        .foreach(s => return s.snapshotId)
    }
    val uuid = priorJson.flatMap(jsonStrField(_, "table-uuid"))
      .getOrElse(java.util.UUID.randomUUID().toString)
    // Schema evolution gate (catalog_schema_manager.cc / iceberg/
    // compatibility.cc): the batch schema must be a SUPERSET of the
    // table's — prior columns in the same positions with identical
    // types (field ids are positional, so prefix identity preserves
    // every existing id — Iceberg's ids-never-reused rule), appended
    // columns optional (old rows cannot supply a required value).
    // Anything else (drop, rename, retype) is an incompatible evolution.
    priorJson.foreach { pj =>
      val prior = mapper.readTree(pj).path("schemas").path(0).path("fields")
        .elements().asScala.map(f =>
          (f.path("name").asText, f.path("type").asText)).toSeq
      val cur = df.schema.fields.toSeq
      require(cur.length >= prior.length,
        s"incompatible evolution: cannot drop columns (table has ${prior.map(_._1)})")
      prior.zip(cur).foreach { case ((pn, pt), f) =>
        require(pn == f.name && pt == icebergType(f.dataType),
          s"incompatible evolution: column $pn:$pt became ${f.name}:${icebergType(f.dataType)}")
      }
    }
    // Appended columns are recorded OPTIONAL regardless of the batch
    // schema's inferred nullability — old rows cannot supply a value, so
    // Iceberg's union-by-name evolution always adds fields as optional.
    val priorLen = priorJson.map(pj =>
      mapper.readTree(pj).path("schemas").path(0).path("fields").size).getOrElse(0)
    val snapId = priorSnaps.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val seq = priorSnaps.map(_.sequenceNumber).maxOption.getOrElse(0L) + 1

    // 1. data files, clustered by partition, under a per-snapshot dir so
    // a crashed retry can clear its own orphans (see Datalake.commit)
    val snapData = new Path(s"${dataDir(table)}/snap=$snapId")
    if (fs.exists(snapData)) fs.delete(snapData, true)
    val out = df.withColumn("p_key", partFn(tsCol))
    out.repartition(col("p_key"))
      .write.mode("overwrite").partitionBy("p_key").parquet(snapData.toString)

    // 2. manifest: one entry per data file (status 1 = ADDED)
    val files =
      if (!fs.exists(snapData)) Seq.empty
      else fs.listStatus(snapData).toSeq.filter(_.isDirectory).flatMap { pdir =>
        val pKey = pdir.getPath.getName.stripPrefix("p_key=")
        fs.listStatus(pdir.getPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(st => (st.getPath, pKey, st.getLen))
      }
    val entries = files.map { case (p, pKey, len) =>
      val e = new GenericData.Record(ManifestEntrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      val part = new GenericData.Record(
        ManifestEntrySchema.getField("data_file").schema().getField("partition").schema())
      part.put("p_key", pKey)
      val d = new GenericData.Record(ManifestEntrySchema.getField("data_file").schema())
      d.put("content", 0)
      d.put("file_path", p.toString)
      d.put("file_format", "PARQUET")
      d.put("partition", part)
      d.put("record_count", footerRowCount(spark, p))
      d.put("file_size_in_bytes", len)
      e.put("data_file", d)
      e
    }
    val manifestPath = new Path(s"${metaDir(table)}/manifest-$snapId.avro")
    val manifestLen = writeAvro(fs, manifestPath, ManifestEntrySchema, entries)
    val addedRows = entries.map(_.get("data_file")
      .asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]).sum

    // 3. manifest list: prior snapshots' manifests stay EXISTING; the
    // new manifest is ADDED (merge-append, iceberg/merge_append_action.cc)
    val priorList = priorSnaps.lastOption.toSeq.flatMap(s =>
      readAvro(fs, new Path(s.manifestList), ManifestFileSchema))
    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", manifestPath.toString)
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", seq)
    mf.put("min_sequence_number", seq)
    mf.put("added_snapshot_id", snapId)
    mf.put("added_files_count", files.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", addedRows)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val listPath = new Path(s"${metaDir(table)}/snap-$snapId.avro")
    writeAvro(fs, listPath, ManifestFileSchema, priorList :+ mf)

    // 4. metadata.json + version hint (appended columns forced optional)
    val rawSchema = out.drop("p_key").schema
    val schema = StructType(rawSchema.fields.zipWithIndex.map { case (f, i) =>
      if (priorLen > 0 && i >= priorLen) f.copy(nullable = true) else f
    })
    writeMetadataJson(fs, table, prior.map(_ + 1).getOrElse(1), schema,
      priorSnaps :+ SnapshotInfo(snapId, seq, listPath.toString, addedRows,
        sourceBatchId = sourceBatchId),
      uuid, schema.fields.head.name)
    snapId
  }

  /**
   * Continuous Iceberg ingestion: every micro-batch commits one
   * snapshot, tagged with its replay-stable streaming batch id so a
   * crash-replayed batch is recognized and skipped — exactly-once table
   * contents over at-least-once delivery, the contract the reference's
   * datalake coordinator enforces per committed offset range
   * (`datalake/coordinator/`).
   */
  def icebergSink(stream: DataFrame, tsCol: Column, table: String,
      ckptDir: String,
      partFn: Column => Column = Datalake.hourPartition)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(s"iceberg:$table")
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commit(batch, tsCol, table, partFn, sourceBatchId = Some(batchId))
        ()
      }
      .start()

  /**
   * One CDC upsert batch: delete-by-key then append, the classic
   * equality-delete upsert. Replay-safe: if a snapshot already carries
   * `sourceBatchId` the whole batch (delete AND append) is a no-op — the
   * check runs BEFORE the delete, so a crash-replayed batch can never
   * equality-delete the rows its own first delivery appended.
   */
  def upsertBatch(batch: DataFrame, tsCol: Column, table: String,
      keyCols: Seq[String], sourceBatchId: Long,
      partFn: Column => Column = Datalake.hourPartition): Long = {
    val spark = batch.sparkSession
    val fs = fsOf(spark, table)
    currentVersion(fs, table).foreach { v =>
      val snaps = parseSnapshots(readMetadataJson(fs, table, v))
      snaps.find(_.sourceBatchId.contains(sourceBatchId))
        .foreach(s => return s.snapshotId)
      if (snaps.nonEmpty)
        deleteWhereEquality(spark, table,
          batch.select(keyCols.map(col): _*).distinct())
    }
    commit(batch, tsCol, table, partFn, sourceBatchId = Some(sourceBatchId))
  }

  /**
   * Continuous CDC ingestion — the upsert flavor of [[icebergSink]]:
   * every micro-batch equality-deletes its keys then appends, so the
   * table always holds each key's latest version (delete-old/append-new
   * under the v2 sequence-scoping rule). Exactly-once table contents
   * over at-least-once delivery via the same batch-id dedup.
   */
  def icebergUpsertSink(stream: DataFrame, tsCol: Column, table: String,
      ckptDir: String, keyCols: Seq[String],
      partFn: Column => Column = Datalake.hourPartition)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(s"iceberg-upsert:$table")
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, tsCol, table, keyCols, batchId, partFn)
        ()
      }
      .start()

  /**
   * Expire all but the newest `keepLast` snapshots — Iceberg
   * `expireSnapshots` semantics: expiry removes TIME TRAVEL, not data.
   * A new metadata version without the expired snapshots commits first;
   * then only files no SURVIVING snapshot references are deleted (in an
   * append-only table the current snapshot's manifest list carries every
   * prior manifest as EXISTING, so data survives — exactly why Iceberg
   * expiry is safe under concurrent reads). Readers on the old hint
   * still resolve until the unreferenced-file delete lands.
   */
  def expireSnapshots(spark: SparkSession, table: String, keepLast: Int): Seq[Long] = {
    val fs = fsOf(spark, table)
    val v = currentVersion(fs, table).getOrElse(return Seq.empty)
    val json = readMetadataJson(fs, table, v)
    val snaps = parseSnapshots(json)
    if (snaps.size <= keepLast) return Seq.empty
    val (expire, keep) = snaps.splitAt(snaps.size - keepLast)
    val uuid = jsonStrField(json, "table-uuid").get
    // metadata version first
    writeMetadataJsonKeeping(fs, table, v + 1, json, keep, uuid)
    // then physical cleanup by FILE-level reachability: a data file
    // survives iff ANY kept snapshot's manifests still reference it.
    // (Manifest-level reachability is not enough once rewriteDataFiles
    // has run — an untouched file appears both in an old append manifest
    // and in the rewrite's consolidated manifest.)
    val keptManifests = keep.flatMap(s =>
      readAvro(fs, new Path(s.manifestList), ManifestFileSchema)
        .map(_.get("manifest_path").toString)).toSet
    val keptFiles = keptManifests.flatMap(m =>
      readAvro(fs, new Path(m), ManifestEntrySchema).map(
        _.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString))
    // union the expired snapshots' manifest sets FIRST (append commits
    // accumulate manifests, so consecutive expired snapshots share them —
    // each manifest must be read and deleted exactly once)
    val expiredManifests = expire.flatMap(s =>
      readAvro(fs, new Path(s.manifestList), ManifestFileSchema)
        .map(_.get("manifest_path").toString)).toSet -- keptManifests
    expiredManifests.foreach { m =>
      readAvro(fs, new Path(m), ManifestEntrySchema).foreach { e =>
        val f = e.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString
        if (!keptFiles.contains(f)) fs.delete(new Path(f), false)
      }
      fs.delete(new Path(m), false)
    }
    expire.foreach(s => fs.delete(new Path(s.manifestList), false))
    expire.map(_.snapshotId)
  }

  /** Rewrite metadata keeping a snapshot subset (schema/spec copied from
    * the prior version by re-parsing its schema fields). */
  private def writeMetadataJsonKeeping(fs: FileSystem, table: String, v: Int,
      priorJson: String, keep: Seq[SnapshotInfo], uuid: String): Unit = {
    // recover the Spark schema from the prior metadata's field list
    val root = mapper.readTree(priorJson)
    val fields = root.path("schemas").path(0).path("fields").elements().asScala.map { f =>
      val dt = f.path("type").asText match {
        case "long" => LongType
        case "int" => IntegerType
        case "double" => DoubleType
        case "float" => FloatType
        case "boolean" => BooleanType
        case "binary" => BinaryType
        case "date" => DateType
        case "timestamptz" => TimestampType
        case _ => StringType
      }
      StructField(f.path("name").asText, dt, nullable = !f.path("required").asBoolean)
    }.toSeq
    val partitionField = fields.headOption.map(_.name).getOrElse("id")
    writeMetadataJson(fs, table, v, StructType(fields), keep, uuid, partitionField)
  }

  // ------------------------------------------------------------- reading

  /** Snapshot catalog of the table: (snapshot_id, sequence_number,
    * n_files, n_rows) from the CURRENT metadata version's manifest
    * lists — all bounded metadata. */
  def snapshotCatalog(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, table)
    val rows = currentVersion(fs, table).toSeq.flatMap { v =>
      parseSnapshots(readMetadataJson(fs, table, v)).map { s =>
        val mfs = readAvro(fs, new Path(s.manifestList), ManifestFileSchema)
        val added = mfs.filter(_.get("added_snapshot_id").asInstanceOf[Long] == s.snapshotId)
        (s.snapshotId, s.sequenceNumber,
          added.map(_.get("added_files_count").asInstanceOf[Int]).sum,
          added.map(_.get("added_rows_count").asInstanceOf[Long]).sum)
      }
    }
    rows.toDF("snapshot_id", "sequence_number", "n_files", "n_rows")
  }

  /** Metadata-driven scan: resolve the current snapshot's manifest list
    * → manifests → data-file paths, and plan the scan over exactly that
    * file set (Iceberg's manifest pruning; no directory listing). */
  def readTable(spark: SparkSession, table: String): DataFrame =
    readSnapshot(spark, table, None)

  /** Time travel: the table exactly as of `snapshotId` — resolved from
    * that snapshot's own manifest list, so later appends, rewrites, and
    * deletes are invisible. Fails if the snapshot has been expired
    * (expiry removes time travel — the Iceberg contract). */
  def timeTravel(spark: SparkSession, table: String, snapshotId: Long): DataFrame =
    readSnapshot(spark, table, Some(snapshotId))

  private def readSnapshot(spark: SparkSession, table: String,
      snapshotId: Option[Long]): DataFrame = {
    val fs = fsOf(spark, table)
    val v = currentVersion(fs, table).getOrElse(
      throw new IllegalStateException(s"no iceberg metadata at $table"))
    val snaps = parseSnapshots(readMetadataJson(fs, table, v))
    val chosen = snapshotId match {
      case Some(id) => snaps.find(_.snapshotId == id).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot $id not found at $table (expired or never committed)"))
      case None => snaps.lastOption.getOrElse(return spark.emptyDataFrame)
    }
    // manifest-list `content` (field-id 517) splits data manifests (0)
    // from delete manifests (1); inside a delete manifest,
    // data_file.content distinguishes position (1) from equality (2)
    // delete files — the two v2 row-level delete flavors
    val manifestRecs = readAvro(fs, new Path(chosen.manifestList), ManifestFileSchema)
    def entriesOf(content: Int): Seq[(String, Int, Long)] = manifestRecs
      .filter(_.get("content").asInstanceOf[Int] == content)
      .map(_.get("manifest_path").toString)
      .flatMap(m => readAvro(fs, new Path(m), ManifestEntrySchema)
        .filter(_.get("status").asInstanceOf[Int] != 2) // not DELETED
        .map { e =>
          val d = e.get("data_file").asInstanceOf[GenericRecord]
          (d.get("file_path").toString, d.get("content").asInstanceOf[Int],
            Option(e.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(0L))
        })
    val dataEntries = entriesOf(0)
    val delEntries = entriesOf(1)
    val posDeleteFiles = delEntries.filter(_._2 == 1).map(_._1)
    val eqDeleteFiles = delEntries.filter(_._2 == 2) // (path, _, seq)
    if (dataEntries.isEmpty) spark.emptyDataFrame
    else {
      // basePath reconstitutes the partition columns (snap, p_key) from
      // the k=v path segments — Iceberg readers likewise materialize
      // partition values from metadata, not from the data file bytes
      // mergeSchema: after an add-column evolution, older files lack the
      // appended columns — the merged read surfaces them as nulls (the
      // Iceberg read contract for added optional fields)
      val base = spark.read.option("basePath", dataDir(table))
        .option("mergeSchema", "true")
        .parquet(dataEntries.map(_._1): _*)
        .drop("snap")
      if (posDeleteFiles.isEmpty && eqDeleteFiles.isEmpty) base
      else {
        import spark.implicits._
        var cur = base
          .withColumn("__fp", col("_metadata.file_path"))
          .withColumn("__pos", col("_metadata.row_index"))
        if (posDeleteFiles.nonEmpty) {
          // position deletes: anti-join (file_path, pos) — the exact v2
          // application rule. Delete sets are tiny vs the table (AQE
          // broadcasts them); the data side never shuffles.
          val dels = spark.read.parquet(posDeleteFiles: _*)
            .select(col("file_path").as("__dfp"), col("pos").as("__dpos"))
          cur = cur.join(dels,
            col("__fp") === col("__dfp") && col("__pos") === col("__dpos"), "left_anti")
        }
        if (eqDeleteFiles.nonEmpty) {
          // equality deletes apply only to data files with a STRICTLY
          // OLDER sequence number (spec: "an equality delete file must be
          // applied to data files from older commits") — attach each data
          // file's seq via a bounded (file_path, seq) map, then anti-join
          // on the key columns with the sequence bound.
          val seqMap = dataEntries.map { case (p, _, sq) => (p, sq) }
            .toDF("__sfp", "__seq")
          cur = cur.join(broadcast(seqMap), col("__fp") === col("__sfp"), "left")
            .drop("__sfp")
          // equality_ids are PER FILE: two commits may delete by
          // different key sets. Group delete files by key-column set and
          // apply one anti-join per group (a single unionByName across
          // heterogeneous key schemas would throw at read time).
          eqDeleteFiles.map { case (p, _, sq) =>
            spark.read.parquet(p).withColumn("__dseq", lit(sq))
          }.groupBy(_.columns.filterNot(_ == "__dseq").sorted.toSeq)
            .foreach { case (keyCols, dfs) =>
              val keys = dfs.reduce(_ unionByName _)
              val cond = keyCols.map(k => cur(k) <=> keys(k)).reduce(_ && _) &&
                col("__seq") < col("__dseq")
              cur = cur.join(keys, cond, "left_anti")
            }
          cur = cur.drop("__seq")
        }
        cur.drop("__fp", "__pos", "__seq")
      }
    }
  }

  /**
   * Row-level DELETE by key — Iceberg v2 EQUALITY deletes: `keys` rows
   * (one column per key field) are written as a content=2 delete file
   * whose `equality_ids` list the key field ids; at scan time every data
   * row from a STRICTLY OLDER commit whose key columns match any delete
   * row is dropped. Unlike position deletes no data scan happens at
   * delete time at all — the CDC/upsert-friendly flavor (a streaming
   * writer deletes by primary key without knowing file layout).
   * Later appends are unaffected by earlier equality deletes (their
   * sequence number is higher — the spec's scoping rule, which is what
   * makes "delete old value, append new value" upserts correct).
   */
  def deleteWhereEquality(spark: SparkSession, table: String, keys: DataFrame): Option[Long] = {
    val fs = fsOf(spark, table)
    val v = currentVersion(fs, table).getOrElse(
      throw new IllegalStateException(s"no iceberg metadata at $table"))
    val json = readMetadataJson(fs, table, v)
    val snaps = parseSnapshots(json)
    if (snaps.isEmpty) return None
    val uuid = jsonStrField(json, "table-uuid").get
    val current = snaps.last
    val snapId = snaps.map(_.snapshotId).max + 1
    val seq = snaps.map(_.sequenceNumber).max + 1
    val delDir = new Path(s"${dataDir(table)}/deletes/snap=$snapId")
    if (fs.exists(delDir)) fs.delete(delDir, true)
    keys.distinct().coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val delFiles = fs.listStatus(delDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath, st.getLen, footerRowCount(spark, st.getPath)))
      .filter(_._3 > 0)
    if (delFiles.isEmpty) { fs.delete(delDir, true); return None }
    // field ids of the key columns in the table schema (ids are 1..n in
    // declaration order — schemaJson's assignment)
    val tableFields = mapper.readTree(json).path("schemas").path(0).path("fields")
      .elements().asScala.map(_.path("name").asText).toSeq
    val eqIds = keys.columns.toSeq.map(c =>
      Integer.valueOf(tableFields.indexOf(c) + 1))
    require(eqIds.forall(_ > 0), s"key columns ${keys.columns.mkString(",")} not in table schema")
    val entrySchema = ManifestEntrySchema
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val entries = delFiles.map { case (p, len, rows) =>
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      val part = new GenericData.Record(dataFileSchema.getField("partition").schema())
      part.put("p_key", null)
      val d = new GenericData.Record(dataFileSchema)
      d.put("content", 2) // EQUALITY_DELETES
      d.put("file_path", p.toString)
      d.put("file_format", "PARQUET")
      d.put("partition", part)
      d.put("record_count", rows)
      d.put("file_size_in_bytes", len)
      d.put("equality_ids", new java.util.ArrayList[Integer](eqIds.asJava))
      e.put("data_file", d)
      e
    }
    val manifestPath = new Path(s"${metaDir(table)}/manifest-$snapId.avro")
    val manifestLen = writeAvro(fs, manifestPath, entrySchema, entries)
    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", manifestPath.toString)
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 1)
    mf.put("sequence_number", seq)
    mf.put("min_sequence_number", seq)
    mf.put("added_snapshot_id", snapId)
    mf.put("added_files_count", delFiles.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", 0L)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", delFiles.map(_._3).sum)
    val listPath = new Path(s"${metaDir(table)}/snap-$snapId.avro")
    val priorList = readAvro(fs, new Path(current.manifestList), ManifestFileSchema)
    writeAvro(fs, listPath, ManifestFileSchema, priorList :+ mf)
    writeMetadataJsonKeeping(fs, table, v + 1, json,
      snaps :+ SnapshotInfo(snapId, seq, listPath.toString, 0L, op = "delete"), uuid)
    Some(snapId)
  }

  /**
   * Row-level DELETE — Iceberg v2 merge-on-read position deletes: rows of
   * the CURRENT snapshot matching `predicate` are recorded as
   * (file_path, pos) pairs in position-delete files (spec field-ids
   * 2147483546/2147483545), committed as a new snapshot whose manifest
   * list carries the prior data manifests EXISTING plus one `content=1`
   * delete manifest. No data file is rewritten — readers apply deletes at
   * scan time ([[readTable]]); time travel to a pre-delete snapshot still
   * sees every row, and [[expireSnapshots]] reclaims delete files by the
   * same file-level reachability as data files.
   *
   * Scale: the match scan is one planned file-set read with the predicate
   * pushed down; positions come from the parquet reader's own
   * `_metadata.row_index` (no window, no shuffle); delete files are
   * written sorted by (file_path, pos) as the spec requires.
   * Returns the delete snapshot id, or None when nothing matched.
   */
  def deleteWhere(spark: SparkSession, table: String, predicate: Column): Option[Long] = {
    val fs = fsOf(spark, table)
    val v = currentVersion(fs, table).getOrElse(
      throw new IllegalStateException(s"no iceberg metadata at $table"))
    val json = readMetadataJson(fs, table, v)
    val snaps = parseSnapshots(json)
    val current = snaps.lastOption.getOrElse(return None)
    val uuid = jsonStrField(json, "table-uuid").get
    val manifestRecs = readAvro(fs, new Path(current.manifestList), ManifestFileSchema)
    val dataFiles = manifestRecs
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .map(_.get("manifest_path").toString)
      .flatMap(m => readAvro(fs, new Path(m), ManifestEntrySchema)
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString))
      .distinct
    if (dataFiles.isEmpty) return None
    val snapId = snaps.map(_.snapshotId).max + 1
    val seq = snaps.map(_.sequenceNumber).max + 1
    val delDir = new Path(s"${dataDir(table)}/deletes/snap=$snapId")
    if (fs.exists(delDir)) fs.delete(delDir, true)
    spark.read.option("basePath", dataDir(table)).parquet(dataFiles: _*)
      .drop("snap")
      .withColumn("file_path", col("_metadata.file_path"))
      .withColumn("pos", col("_metadata.row_index"))
      .where(predicate)
      .select("file_path", "pos")
      .sortWithinPartitions("file_path", "pos")
      .write.mode("overwrite").parquet(delDir.toString)
    val delFiles = fs.listStatus(delDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath, st.getLen, footerRowCount(spark, st.getPath)))
      .filter(_._3 > 0)
    if (delFiles.isEmpty) { fs.delete(delDir, true); return None }
    val entrySchema = ManifestEntrySchema
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val entries = delFiles.map { case (p, len, rows) =>
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      val part = new GenericData.Record(dataFileSchema.getField("partition").schema())
      part.put("p_key", null) // position deletes are partition-unscoped here
      val d = new GenericData.Record(dataFileSchema)
      d.put("content", 1) // POSITION_DELETES
      d.put("file_path", p.toString)
      d.put("file_format", "PARQUET")
      d.put("partition", part)
      d.put("record_count", rows)
      d.put("file_size_in_bytes", len)
      e.put("data_file", d)
      e
    }
    val manifestPath = new Path(s"${metaDir(table)}/manifest-$snapId.avro")
    val manifestLen = writeAvro(fs, manifestPath, entrySchema, entries)
    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", manifestPath.toString)
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 1) // DELETES manifest
    mf.put("sequence_number", seq)
    mf.put("min_sequence_number", seq)
    mf.put("added_snapshot_id", snapId)
    mf.put("added_files_count", delFiles.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", 0L)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", delFiles.map(_._3).sum)
    val listPath = new Path(s"${metaDir(table)}/snap-$snapId.avro")
    val priorList = readAvro(fs, new Path(current.manifestList), ManifestFileSchema)
    writeAvro(fs, listPath, ManifestFileSchema, priorList :+ mf)
    writeMetadataJsonKeeping(fs, table, v + 1, json,
      snaps :+ SnapshotInfo(snapId, seq, listPath.toString, 0L, op = "delete"), uuid)
    Some(snapId)
  }

  // -------------------------------------------------------- maintenance

  /**
   * Bin-pack small-file compaction — Iceberg `rewriteDataFiles`
   * semantics: partitions holding more than one data file have their
   * files rewritten into ~`targetFileBytes`-sized files; untouched
   * partitions' files are carried over unchanged. The commit is a
   * `replace` snapshot whose single consolidated manifest lists the new
   * files as ADDED and the carried files as EXISTING — table content is
   * bit-identical before and after, only the file layout changes.
   * Old files are NOT deleted (prior snapshots still reference them for
   * time travel); [[expireSnapshots]] reclaims them once unreachable.
   *
   * Scale shape: the rewrite reads only the affected partitions' files
   * (a planned file-set scan, no directory listing) and writes them back
   * through the standard clustered partition writer, splitting output at
   * `targetFileBytes` via `maxRecordsPerFile` derived from the measured
   * bytes/row of the input — driver code touches only manifest metadata.
   * This is the datalake answer to the log world's segment compaction:
   * streaming commits produce file counts proportional to commit
   * frequency, and scan cost at 100 TB is dominated by file count until
   * they are bin-packed.
   *
   * Returns the new snapshot id, or None if no partition needed work.
   */
  def rewriteDataFiles(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Option[Long] = {
    val fs = fsOf(spark, table)
    val v = currentVersion(fs, table).getOrElse(
      throw new IllegalStateException(s"no iceberg metadata at $table"))
    val json = readMetadataJson(fs, table, v)
    val snaps = parseSnapshots(json)
    val current = snaps.lastOption.getOrElse(return None)
    val uuid = jsonStrField(json, "table-uuid").get

    // current file inventory: (path, p_key, bytes, rows) per entry.
    // A pending delete manifest makes bin-pack unsafe (the rewrite would
    // resurrect deleted rows — new file paths invalidate position
    // deletes); Iceberg's RewriteDataFiles likewise special-cases delete
    // files. Fold deletes first (out of scope here) or expire them.
    val manifestRecs0 = readAvro(fs, new Path(current.manifestList), ManifestFileSchema)
    if (manifestRecs0.exists(_.get("content").asInstanceOf[Int] == 1)) return None
    val manifests = manifestRecs0.map(_.get("manifest_path").toString)
    val entries = manifests.flatMap(m =>
      readAvro(fs, new Path(m), ManifestEntrySchema)
        .filter(_.get("status").asInstanceOf[Int] != 2))
      .map { e =>
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        val pKey = d.get("partition").asInstanceOf[GenericRecord].get("p_key")
        (d.get("file_path").toString, String.valueOf(pKey),
          d.get("file_size_in_bytes").asInstanceOf[Long],
          d.get("record_count").asInstanceOf[Long])
      }.distinct
    val byPart = entries.groupBy(_._2)
    val rewritten = byPart.filter { case (_, fsLst) =>
      fsLst.size > 1 && fsLst.map(_._3).sum <= targetFileBytes * fsLst.size
    }
    if (rewritten.isEmpty) return None
    val rewriteFiles = rewritten.values.flatten.toSeq
    val carried = entries.filterNot(e => rewritten.contains(e._2))

    val snapId = snaps.map(_.snapshotId).max + 1
    val seq = snaps.map(_.sequenceNumber).max + 1

    // rewrite: planned scan over exactly the affected files, clustered
    // write split at targetFileBytes via measured bytes/row
    val totBytes = rewriteFiles.map(_._3).sum
    val totRows = math.max(1L, rewriteFiles.map(_._4).sum)
    val maxRecords = math.max(1L, targetFileBytes * totRows / math.max(1L, totBytes))
    val snapData = new Path(s"${dataDir(table)}/snap=$snapId")
    if (fs.exists(snapData)) fs.delete(snapData, true)
    spark.read.option("basePath", dataDir(table))
      .parquet(rewriteFiles.map(_._1): _*)
      .drop("snap")
      .repartition(col("p_key"))
      .write.mode("overwrite").partitionBy("p_key")
      .option("maxRecordsPerFile", maxRecords)
      .parquet(snapData.toString)

    val entrySchema = ManifestEntrySchema
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    def mkEntry(status: Int, path: String, pKey: String, bytes: Long, rows: Long) = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", status)
      e.put("snapshot_id", snapId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      val part = new GenericData.Record(partSchema)
      part.put("p_key", pKey)
      val d = new GenericData.Record(dataFileSchema)
      d.put("content", 0)
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", part)
      d.put("record_count", rows)
      d.put("file_size_in_bytes", bytes)
      e.put("data_file", d)
      e
    }
    val newFiles = fs.listStatus(snapData).toSeq.filter(_.isDirectory).flatMap { pdir =>
      val pKey = pdir.getPath.getName.stripPrefix("p_key=")
      fs.listStatus(pdir.getPath).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => mkEntry(1, st.getPath.toString, pKey, st.getLen,
          footerRowCount(spark, st.getPath)))
    }
    val carriedEntries = carried.map { case (p, pKey, bytes, rows) =>
      mkEntry(0, p, pKey, bytes, rows) // status 0 = EXISTING
    }
    val manifestPath = new Path(s"${metaDir(table)}/manifest-$snapId.avro")
    val manifestLen = writeAvro(fs, manifestPath, entrySchema,
      newFiles ++ carriedEntries)

    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", manifestPath.toString)
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", seq)
    mf.put("min_sequence_number", current.sequenceNumber)
    mf.put("added_snapshot_id", snapId)
    mf.put("added_files_count", newFiles.size)
    mf.put("existing_files_count", carriedEntries.size)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", newFiles.map(
      _.get("data_file").asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]).sum)
    mf.put("existing_rows_count", carriedEntries.map(
      _.get("data_file").asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]).sum)
    mf.put("deleted_rows_count", 0L)
    val listPath = new Path(s"${metaDir(table)}/snap-$snapId.avro")
    writeAvro(fs, listPath, ManifestFileSchema, Seq(mf))

    // metadata: the replace snapshot appended to the log, hint flips last
    val root = mapper.readTree(json)
    val fields = root.path("schemas").path(0).path("fields").elements().asScala.map { f =>
      val dt = f.path("type").asText match {
        case "long" => LongType
        case "int" => IntegerType
        case "double" => DoubleType
        case "float" => FloatType
        case "boolean" => BooleanType
        case "binary" => BinaryType
        case "date" => DateType
        case "timestamptz" => TimestampType
        case _ => StringType
      }
      StructField(f.path("name").asText, dt, nullable = !f.path("required").asBoolean)
    }.toSeq
    writeMetadataJson(fs, table, v + 1, StructType(fields),
      snaps :+ SnapshotInfo(snapId, seq, listPath.toString, 0L, op = "replace"),
      uuid, fields.headOption.map(_.name).getOrElse("id"))
    Some(snapId)
  }

  /**
   * Major compaction — fold row-level deletes into the data: rewrites the
   * CURRENT snapshot's net content (position and equality deletes
   * applied) as a `replace` snapshot whose manifest list carries ONLY the
   * consolidated data manifest — no delete manifests survive, so
   * subsequent scans pay zero merge-on-read cost and
   * [[rewriteDataFiles]] bin-packing is unblocked. Table content is
   * bit-identical before and after ([[readTable]] already applied the
   * deletes); prior snapshots keep their manifest lists, so time travel
   * across the compaction still resolves, and [[expireSnapshots]]
   * reclaims the obsolete data + delete files once unreachable.
   * Returns the new snapshot id, or None when no delete manifest pends.
   */
  def compactDeletes(spark: SparkSession, table: String): Option[Long] = {
    val fs = fsOf(spark, table)
    val v = currentVersion(fs, table).getOrElse(
      throw new IllegalStateException(s"no iceberg metadata at $table"))
    val json = readMetadataJson(fs, table, v)
    val snaps = parseSnapshots(json)
    val current = snaps.lastOption.getOrElse(return None)
    val uuid = jsonStrField(json, "table-uuid").get
    val manifestRecs = readAvro(fs, new Path(current.manifestList), ManifestFileSchema)
    if (!manifestRecs.exists(_.get("content").asInstanceOf[Int] == 1)) return None
    val snapId = snaps.map(_.snapshotId).max + 1
    val seq = snaps.map(_.sequenceNumber).max + 1
    // net content with deletes applied — the read path IS the merge
    val materialized = readSnapshot(spark, table, None)
    val snapData = new Path(s"${dataDir(table)}/snap=$snapId")
    if (fs.exists(snapData)) fs.delete(snapData, true)
    materialized.repartition(col("p_key"))
      .write.mode("overwrite").partitionBy("p_key").parquet(snapData.toString)
    val entrySchema = ManifestEntrySchema
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val entries =
      if (!fs.exists(snapData)) Seq.empty
      else fs.listStatus(snapData).toSeq.filter(_.isDirectory).flatMap { pdir =>
        val pKey = pdir.getPath.getName.stripPrefix("p_key=")
        fs.listStatus(pdir.getPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map { st =>
            val e = new GenericData.Record(entrySchema)
            e.put("status", 1)
            e.put("snapshot_id", snapId)
            e.put("sequence_number", seq)
            e.put("file_sequence_number", seq)
            val part = new GenericData.Record(dataFileSchema.getField("partition").schema())
            part.put("p_key", pKey)
            val d = new GenericData.Record(dataFileSchema)
            d.put("content", 0)
            d.put("file_path", st.getPath.toString)
            d.put("file_format", "PARQUET")
            d.put("partition", part)
            d.put("record_count", footerRowCount(spark, st.getPath))
            d.put("file_size_in_bytes", st.getLen)
            e.put("data_file", d)
            e
          }
      }
    val manifestPath = new Path(s"${metaDir(table)}/manifest-$snapId.avro")
    val manifestLen = writeAvro(fs, manifestPath, entrySchema, entries)
    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", manifestPath.toString)
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", seq)
    mf.put("min_sequence_number", seq)
    mf.put("added_snapshot_id", snapId)
    mf.put("added_files_count", entries.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", entries.map(
      _.get("data_file").asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]).sum)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val listPath = new Path(s"${metaDir(table)}/snap-$snapId.avro")
    writeAvro(fs, listPath, ManifestFileSchema, Seq(mf))
    writeMetadataJsonKeeping(fs, table, v + 1, json,
      snaps :+ SnapshotInfo(snapId, seq, listPath.toString, 0L, op = "replace"), uuid)
    Some(snapId)
  }

  /** Data-file inventory of the CURRENT snapshot: (p_key, n_files,
    * n_rows, bytes) per partition, from manifest metadata only. */
  def fileInventory(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, table)
    val rows = currentVersion(fs, table).toSeq.flatMap { v =>
      val snaps = parseSnapshots(readMetadataJson(fs, table, v))
      snaps.lastOption.toSeq.flatMap { s =>
        readAvro(fs, new Path(s.manifestList), ManifestFileSchema)
          .filter(_.get("content").asInstanceOf[Int] == 0) // data manifests only
          .map(_.get("manifest_path").toString)
          .flatMap(m => readAvro(fs, new Path(m), ManifestEntrySchema))
          .filter(_.get("status").asInstanceOf[Int] != 2)
          .map { e =>
            val d = e.get("data_file").asInstanceOf[GenericRecord]
            (String.valueOf(d.get("partition").asInstanceOf[GenericRecord].get("p_key")),
              d.get("file_path").toString,
              d.get("record_count").asInstanceOf[Long],
              d.get("file_size_in_bytes").asInstanceOf[Long])
          }.distinct
      }
    }
    rows.toDF("p_key", "file_path", "n_rows", "bytes")
      .groupBy("p_key")
      .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
        sum("bytes").as("bytes"))
  }
}
