package graft.registry

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.log.Compaction

/**
 * Schema registry (SURVEY §1.3): subjects with version chains and a
 * compatibility algebra.
 *
 * Reference: `pandaproxy/schema_registry/types.h:67` (schema_type
 * {avro, json, protobuf}), `types.h:481-488` (compatibility_level),
 * checking in `schema_registry/compatibility.cc` / `avro.cc`; schemas are
 * persisted in the compacted `_schemas` topic (`schema_registry/storage.h`)
 * — in this engine, a compacted table keyed by (subject, version) whose
 * read path is exactly the log-compaction operator.
 */
object SchemaRegistry {

  sealed trait SchemaType
  case object AvroType extends SchemaType
  case object JsonType extends SchemaType
  case object ProtobufType extends SchemaType

  /** types.h:481-488 */
  sealed abstract class CompatibilityLevel(val transitive: Boolean, val checkBackward: Boolean, val checkForward: Boolean)
  case object None_ extends CompatibilityLevel(false, false, false)
  case object Backward extends CompatibilityLevel(false, true, false)
  case object BackwardTransitive extends CompatibilityLevel(true, true, false)
  case object Forward extends CompatibilityLevel(false, false, true)
  case object ForwardTransitive extends CompatibilityLevel(true, false, true)
  case object Full extends CompatibilityLevel(false, true, true)
  case object FullTransitive extends CompatibilityLevel(true, true, true)

  /** A checker decides pairwise read-compatibility: can `reader` read data
    * written with `writer`? */
  trait Checker[S] {
    def canRead(reader: S, writer: S): Boolean
  }

  /** Avro compatibility via the canonical Avro resolution rules. */
  object AvroChecker extends Checker[Schema] {
    def canRead(reader: Schema, writer: Schema): Boolean =
      SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
        .getType == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE
  }

  /**
   * Structural compatibility for the engine's native typed layer
   * (Spark StructTypes, the Iceberg-side schema of §1.2). `reader` can
   * read `writer` data iff every reader field either exists in the
   * writer with a promotable type, or is nullable (acts as the default).
   */
  object StructChecker extends Checker[StructType] {
    private def promotable(from: DataType, to: DataType): Boolean = (from, to) match {
      case (a, b) if a == b => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (IntegerType, DoubleType) => true
      case (LongType, DoubleType) => false // lossy: not allowed (iceberg/compatibility.cc)
      case (a: StructType, b: StructType) => canRead(b, a)
      case (ArrayType(a, _), ArrayType(b, _)) => promotable(a, b)
      case (MapType(ak, av, _), MapType(bk, bv, _)) => promotable(ak, bk) && promotable(av, bv)
      case _ => false
    }

    def canRead(reader: StructType, writer: StructType): Boolean =
      reader.fields.forall { rf =>
        writer.fields.find(_.name == rf.name) match {
          case Some(wf) => promotable(wf.dataType, rf.dataType)
          case None     => rf.nullable // missing in writer: needs a default
        }
      }
  }

  /**
   * The compatibility algebra: is `proposed` acceptable as the next
   * version after `history` (oldest-first), under `level`?
   * Non-transitive levels check only the latest version; transitive
   * levels check all (types.h:481-488 semantics).
   */
  def isCompatible[S](proposed: S, history: Seq[S], level: CompatibilityLevel)(
      implicit checker: Checker[S]): Boolean = {
    if (history.isEmpty) true
    else {
      val against = if (level.transitive) history else Seq(history.last)
      against.forall { prev =>
        (!level.checkBackward || checker.canRead(proposed, prev)) &&
        (!level.checkForward || checker.canRead(prev, proposed))
      }
    }
  }

  /** JSON-schema read-compatibility (subset of schema_registry/json.cc
    * rules; see [[JsonSchemaCompat]]). Schemas are JSON strings. */
  object JsonChecker extends Checker[String] {
    def canRead(reader: String, writer: String): Boolean =
      JsonSchemaCompat.canRead(reader, writer)
  }

  implicit val avroChecker: Checker[Schema] = AvroChecker
  implicit val structChecker: Checker[StructType] = StructChecker
  implicit val jsonChecker: Checker[String] = JsonChecker

  /**
   * Subject store read path: latest schema per subject from the
   * compacted `_schemas`-style commit log (columns: subject, version,
   * schema, seq). Same operator as topic compaction (A1).
   */
  def latestSchemas(schemaLog: DataFrame): DataFrame =
    Compaction.compact(schemaLog, Seq("subject"), "seq")

  /**
   * Subject/version delete semantics
   * (`pandaproxy/schema_registry/types.h:33-35,475` — `is_deleted` per
   * version, `permanent_delete`, `include_deleted`; the public SR API's
   * soft-vs-hard delete): fold the registration log and the
   * admin-sized delete log into the subject-version view.
   *
   *  - a SOFT delete (version-scoped, or subject-wide when `version`
   *    is null) marks versions registered before it `is_deleted`:
   *    hidden from the default listing, visible with `includeDeleted`,
   *    still resolvable by id (the decode path is unaffected);
   *  - a HARD (permanent) delete removes such versions outright;
   *  - a registration sequenced AFTER a delete re-creates the version.
   *
   * `deleteLog` columns: (seq, subject, version nullable, hard). The
   * delete log broadcasts; the registration side takes one LWW compact
   * plus one aggregate — no extra shuffle of the schema log.
   */
  def subjectVersions(schemaLog: DataFrame, deleteLog: DataFrame,
      includeDeleted: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val regs = Compaction.compact(schemaLog, Seq("subject", "version"), "seq")
      .withColumnRenamed("seq", "__reg_seq")
    val d = broadcast(deleteLog.select(col("seq").as("__d_seq"),
      col("subject").as("__d_subject"), col("version").as("__d_version"),
      col("hard").as("__d_hard")))
    val agg = regs.join(d,
        col("__d_subject") === col("subject") &&
          (col("__d_version").isNull || col("__d_version") === col("version")),
        "left")
      .groupBy(regs.columns.toIndexedSeq.map(col): _*)
      .agg(max(when(!col("__d_hard"), col("__d_seq"))).as("__soft_seq"),
        max(when(col("__d_hard"), col("__d_seq"))).as("__hard_seq"))
      .where(col("__hard_seq").isNull || col("__hard_seq") < col("__reg_seq"))
      .withColumn("is_deleted",
        col("__soft_seq").isNotNull && col("__soft_seq") > col("__reg_seq"))
      .drop("__soft_seq", "__hard_seq", "__reg_seq")
    if (includeDeleted) agg else agg.where(!col("is_deleted")).drop("is_deleted")
  }

  /** Parse an Avro schema (the subject payload format of the reference). */
  def parseAvro(json: String): Schema = new Schema.Parser().parse(json)

  /**
   * D3 schema evolution: rewrite rows written under an old schema to the
   * current reader schema — missing nullable fields become nulls,
   * promotable types are cast (`datalake/catalog_schema_manager.cc`,
   * `iceberg/compatibility.cc` semantics). Refuses evolutions the
   * compatibility checker rejects.
   */
  def evolve(df: org.apache.spark.sql.DataFrame, target: StructType): org.apache.spark.sql.DataFrame = {
    require(StructChecker.canRead(target, df.schema),
      s"target schema cannot read rows written as ${df.schema.simpleString}")
    import org.apache.spark.sql.functions.{col, lit}
    df.select(target.fields.toIndexedSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Wire names ↔ levels (types.h:490-508 to_string_view). */
  val Levels: Map[String, CompatibilityLevel] = Map(
    "NONE" -> None_, "BACKWARD" -> Backward,
    "BACKWARD_TRANSITIVE" -> BackwardTransitive, "FORWARD" -> Forward,
    "FORWARD_TRANSITIVE" -> ForwardTransitive, "FULL" -> Full,
    "FULL_TRANSITIVE" -> FullTransitive)

  private val levelName: Map[CompatibilityLevel, String] = Levels.map(_.swap)

  /** The store's initial global level (`store.h:902`). */
  val DefaultGlobalLevel: CompatibilityLevel = Backward

  /**
   * Per-subject compatibility configuration
   * (`store.h:579-618` — `get/set/clear_compatibility(sub)`, subject
   * level falling back to the global level; persisted as config records
   * in the `_schemas` topic like every other registry mutation).
   *
   * `configLog` columns: `(seq, subject nullable, level nullable)` —
   * a null `subject` sets the GLOBAL level; a null `level` CLEARS the
   * subject's override (fallback to global thereafter). Returns the
   * driver-side view the registration gate consults: chronological
   * (seq, subject-or-null, level-or-null) — control-plane-bounded, so
   * the collect is the same bounded read the reference's store does.
   */
  def compatibilityConfigs(configLog: DataFrame): Seq[(Long, Option[String], Option[CompatibilityLevel])] =
    configLog.select("seq", "subject", "level").collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)).map(l => Levels.getOrElse(l,
          throw new IllegalArgumentException(s"unknown level $l")))))
      .sortBy(_._1)

  /** Effective level for `subject` considering only config records with
    * `seq < asOfSeq` (the level in force when a registration at
    * `asOfSeq` is checked); `asOfSeq = Long.MaxValue` reads the end
    * state. Subject override wins; a clear falls back to global;
    * no config at all means [[DefaultGlobalLevel]]. */
  def levelAt(configs: Seq[(Long, Option[String], Option[CompatibilityLevel])],
      subject: String, asOfSeq: Long = Long.MaxValue): CompatibilityLevel = {
    val visible = configs.filter(_._1 < asOfSeq)
    val subjectLevel = visible.filter(_._2.contains(subject)).lastOption.flatMap(_._3)
    val globalLevel = visible.filter(_._2.isEmpty).lastOption.flatMap(_._3)
    subjectLevel.orElse(globalLevel).getOrElse(DefaultGlobalLevel)
  }

  /**
   * The registration gate over a chronological attempt log: each attempt
   * `(seq, subject, schema)` is checked against the subject's ACCEPTED
   * history under the level in force at its seq (rejected schemas never
   * enter the history — `sharded_store::is_compatible` consults stored
   * versions only). Returns one decision per attempt:
   * `(seq, subject, level, accepted, version)` with `version` the
   * 1-based assigned version for accepted attempts, null otherwise.
   */
  def registerChain[S](configs: Seq[(Long, Option[String], Option[CompatibilityLevel])],
      attempts: Seq[(Long, String, S)])(implicit checker: Checker[S]):
      Seq[(Long, String, String, Boolean, Option[Int])] = {
    val history = scala.collection.mutable.Map.empty[String, Vector[S]]
    attempts.sortBy(_._1).map { case (seq, sub, schema) =>
      val level = levelAt(configs, sub, seq)
      val prior = history.getOrElse(sub, Vector.empty)
      val ok = isCompatible(schema, prior, level)
      if (ok) history(sub) = prior :+ schema
      (seq, sub, levelName(level), ok, if (ok) Some(history(sub).length) else None)
    }
  }

  /**
   * Registry MODE (`types.h:45` — `mode { import, read_only,
   * read_write }`; per-subject store in `store.h:532-547`
   * `get_mode(sub, fallback)`): same compacted-config shape as the
   * compatibility store — a null `subject` sets the GLOBAL mode, a null
   * `mode` clears the subject override. Default READWRITE (the store's
   * initial `_mode`). `import` permits registration (it exists to admit
   * migrated schemas with explicit ids); `read_only` refuses writes.
   */
  val Modes: Set[String] = Set("IMPORT", "READONLY", "READWRITE")
  val DefaultMode: String = "READWRITE"

  def modeConfigs(configLog: DataFrame): Seq[(Long, Option[String], Option[String])] =
    configLog.select("seq", "subject", "mode").collect().toSeq
      .map { r =>
        val m = Option(r.getString(2))
        m.foreach(v => require(Modes.contains(v), s"unknown mode $v"))
        (r.getLong(0), Option(r.getString(1)), m)
      }.sortBy(_._1)

  /** Effective mode for `subject` from config records with
    * `seq < asOfSeq` — subject override, else global, else READWRITE. */
  def modeAt(configs: Seq[(Long, Option[String], Option[String])],
      subject: String, asOfSeq: Long = Long.MaxValue): String = {
    val visible = configs.filter(_._1 < asOfSeq)
    val subjectMode = visible.filter(_._2.contains(subject)).lastOption.flatMap(_._3)
    val globalMode = visible.filter(_._2.isEmpty).lastOption.flatMap(_._3)
    subjectMode.orElse(globalMode).getOrElse(DefaultMode)
  }

  /**
   * [[registerChain]] with the mode gate in front (the order the
   * reference applies them: a read-only subject refuses the write
   * before any compatibility check runs). Returns one decision per
   * attempt: `(seq, subject, mode, level, outcome, version)` with
   * `outcome` ∈ accepted | readonly | incompatible.
   */
  def registerChainWithModes[S](
      levels: Seq[(Long, Option[String], Option[CompatibilityLevel])],
      modes: Seq[(Long, Option[String], Option[String])],
      attempts: Seq[(Long, String, S)])(implicit checker: Checker[S]):
      Seq[(Long, String, String, String, String, Option[Int])] = {
    val history = scala.collection.mutable.Map.empty[String, Vector[S]]
    attempts.sortBy(_._1).map { case (seq, sub, schema) =>
      val mode = modeAt(modes, sub, seq)
      val level = levelAt(levels, sub, seq)
      val levelN = levelName(level)
      if (mode == "READONLY")
        (seq, sub, mode, levelN, "readonly", Option.empty[Int])
      else {
        val prior = history.getOrElse(sub, Vector.empty)
        val ok = isCompatible(schema, prior, level)
        if (ok) history(sub) = prior :+ schema
        (seq, sub, mode, levelN, if (ok) "accepted" else "incompatible",
          if (ok) Some(history(sub).length) else None)
      }
    }
  }

  /** Validate a version chain under one level; returns first bad index or -1. */
  def validateChain[S](chain: Seq[S], level: CompatibilityLevel)(implicit c: Checker[S]): Int = {
    var i = 1
    while (i < chain.length) {
      if (!isCompatible(chain(i), chain.take(i), level)) return i
      i += 1
    }
    -1
  }

  locally { val _ = (JsonType, ProtobufType, AvroType) } // exhaustiveness anchor
}
