package graft.registry

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * Registry-driven typed payload decode (SURVEY §1.3 / §2.7 D2).
 *
 * The reference resolves each record's embedded schema id to a writer
 * schema and projects the payload to the subject's current (reader)
 * schema before handing typed values to the datalake writer:
 * `datalake/record_schema_resolver.h` (id → resolved schema),
 * `datalake/schema_avro.cc` (Avro → typed struct translation, field
 * defaults for ids the writer lacked). This is that path on Spark:
 *
 *  - wire format: `[magic 0x00][int32 BE schema id][avro binary payload]`
 *    (the same frame Ingest.validateSchemaIds checks on produce);
 *  - per-id writer schemas come from the registry's compacted schema log
 *    (a small metadata table — collected and closed over, never joined);
 *  - Avro schema resolution (`GenericDatumReader(writer, reader)`)
 *    performs exactly the reference's projection: renamed-by-alias,
 *    promoted, and defaulted fields land in reader-schema order;
 *  - decoding runs in `mapPartitions`, so readers/parsed schemas are
 *    built once per task, not per record — the hot loop is
 *    decode-and-convert only, and the operator scales with partitions.
 *
 * No spark-avro module is present in this environment, so the
 * GenericRecord → Catalyst Row conversion is implemented here against the
 * public avro-java API; the subset covered (records of primitives,
 * nullable unions, arrays, maps, enums, fixed, nested records) is the
 * subset the reference's Avro → Iceberg translator handles.
 */
object AvroDecode {

  /** Avro schema → Spark type (the §1.2 typed-layer mapping). */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.NULL    => NullType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.FIXED   => BinaryType
    case Schema.Type.ARRAY   => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP     => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.RECORD  =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), sparkType(f.schema()), nullable = isNullable(f.schema()))))
    case Schema.Type.UNION   =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only nullable unions supported, got $s")
      sparkType(nonNull.head)
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** Avro runtime value → Catalyst external value, per the reader schema. */
  private def toCatalyst(v: Any, s: Schema): Any = v match {
    case null          => null
    case u: Utf8       => u.toString
    case e: GenericData.EnumSymbol => e.toString
    case b: ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: GenericData.Fixed => f.bytes().clone()
    case r: GenericRecord =>
      val rs = resolveUnion(s, r)
      Row.fromSeq(rs.getFields.asScala.toSeq.map(f => toCatalyst(r.get(f.pos()), f.schema())))
    case l: java.util.Collection[_] =>
      val el = elementSchema(s)
      l.asScala.toSeq.map(toCatalyst(_, el))
    case m: java.util.Map[_, _] =>
      val vs = valueSchema(s)
      m.asScala.map { case (k, mv) => (k.toString, toCatalyst(mv, vs)) }.toMap
    case other => other // int/long/float/double/boolean
  }

  private def nonNullOf(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def resolveUnion(s: Schema, r: GenericRecord): Schema = {
    val nn = nonNullOf(s)
    if (nn.getType == Schema.Type.RECORD) nn else r.getSchema
  }
  private def elementSchema(s: Schema): Schema = nonNullOf(s).getElementType
  private def valueSchema(s: Schema): Schema = nonNullOf(s).getValueType

  /**
   * Decode a wire-framed binary `valueCol` into a typed `decoded` struct
   * column under `readerSchemaJson`, resolving each record's writer schema
   * by the embedded id via `writerSchemasById` (from the registry's schema
   * log). Rows whose magic/id are invalid or that fail Avro decoding get a
   * null struct — the produce path has already routed those to the dead
   * letter output (P5), so here they are simply not typed.
   */
  def decode(df: DataFrame, valueCol: String, writerSchemasById: Map[Int, String],
      readerSchemaJson: String): DataFrame = {
    val inSchema = df.schema
    val readerType = sparkType(new Schema.Parser().parse(readerSchemaJson))
    val outSchema = inSchema.add(StructField("decoded", readerType, nullable = true))
    val valueIdx = inSchema.fieldIndex(valueCol)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      // one-time per task: parse schemas, build a resolving reader per id
      val reader = new Schema.Parser().parse(readerSchemaJson)
      val readers: Map[Int, GenericDatumReader[GenericRecord]] =
        writerSchemasById.map { case (id, json) =>
          id -> new GenericDatumReader[GenericRecord](
            new Schema.Parser().parse(json), reader)
        }
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](valueIdx)
        val decoded: Any =
          if (bytes == null || bytes.length < 5 || bytes(0) != 0x00) null
          else {
            val id = ByteBuffer.wrap(bytes, 1, 4).getInt
            readers.get(id).flatMap { r =>
              try {
                val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
                Option(toCatalyst(r.read(null, dec), reader))
              } catch {
                // Avro resolution/corruption failures surface as
                // AvroTypeException/AvroRuntimeException (RuntimeExceptions),
                // not just IOException — all map to the documented null struct.
                case scala.util.control.NonFatal(_) => None
              }
            }.orNull
          }
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }
  }

  /**
   * Scenario-side encoder: frame each row's named columns as
   * `[0x00][BE id][avro binary]` under `writerSchemaJson`, appended as
   * `valueCol`. Used to construct engine-produced Avro corpora for the
   * correctness gate (the oracle re-derives from the plaintext columns);
   * also the producer-side serializer a real ingest would run.
   */
  def encode(df: DataFrame, valueCol: String, writerSchemaJson: String, schemaId: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(valueCol, BinaryType, nullable = true))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      val writerSchema = new Schema.Parser().parse(writerSchemaJson)
      val fields = writerSchema.getFields.asScala.toSeq
      val fieldIdx = fields.map(f => inSchema.fieldIndex(f.name()))
      val writer = new GenericDatumWriter[GenericRecord](writerSchema)
      val header = ByteBuffer.allocate(5).put(0x00.toByte).putInt(schemaId).array()
      it.map { row =>
        val rec = new GenericData.Record(writerSchema)
        fields.zip(fieldIdx).foreach { case (f, i) =>
          rec.put(f.pos(), fromCatalyst(row.get(i), f.schema()))
        }
        val bos = new ByteArrayOutputStream()
        bos.write(header)
        val e = EncoderFactory.get().binaryEncoder(bos, null)
        writer.write(rec, e)
        e.flush()
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }
  }

  private def fromCatalyst(v: Any, s: Schema): Any = v match {
    case null              => null
    case str: String       => str
    case b: Array[Byte]    => ByteBuffer.wrap(b)
    case r: Row            =>
      val rs = nonNullOf(s)
      val rec = new GenericData.Record(rs)
      rs.getFields.asScala.foreach(f => rec.put(f.pos(), fromCatalyst(r.get(f.pos()), f.schema())))
      rec
    case seq: Seq[_]       => seq.map(fromCatalyst(_, elementSchema(s))).asJava
    case m: Map[_, _]      =>
      m.map { case (k, mv) => (k.toString, fromCatalyst(mv, valueSchema(s))) }.asJava
    case other             => other
  }

  /** Convenience: build the id → schema map from a registry schema log
    * (columns: id, schema). Registry metadata is tiny — this collect is
    * the same bounded read the reference's schema cache does. */
  def schemasById(schemaLog: DataFrame): Map[Int, String] =
    schemaLog.select(col("id").cast("int"), col("schema"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
}
