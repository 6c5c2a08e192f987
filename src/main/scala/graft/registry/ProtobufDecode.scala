package graft.registry

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

import ProtobufCompat.{EnumRef, MessageRef, PField, PMap, PMessage, Scalar}

/**
 * Registry-driven typed Protobuf payload decode (SURVEY §1.3 / §2.7 D2) —
 * the sibling of [[AvroDecode]] for protobuf-framed values.
 *
 * Reference: `datalake/schema_protobuf.cc` translates protobuf payloads to
 * typed Iceberg structs via the resolved descriptor;
 * `pandaproxy/schema_registry/protobuf.cc` owns the descriptor model.
 * The wire frame is the registry envelope
 * `[magic 0x00][int32 BE schema id][message-index varints][proto bytes]`
 * (same prefix Ingest.validateSchemaIds checks; the index list selects a
 * nested message — `0x00` means the first top-level message, the common
 * case and the subset supported here).
 *
 * No protobuf-java runtime exists in this environment, so decoding is
 * implemented directly against the PUBLIC protobuf wire format (varint /
 * zigzag / fixed32 / fixed64 / length-delimited), driven by the
 * [[ProtobufCompat]] descriptor parsed from `.proto` text. That matches
 * protobuf's own resolution model: the READER descriptor decodes writer
 * bytes directly — field numbers carry identity (renames invisible),
 * unknown writer fields are skipped by wire type, absent reader fields
 * take proto3 defaults. Per-record the embedded id is resolved against
 * the registry's schema log and checked readable
 * ([[ProtobufCompat.canRead]]) before decoding — unknown ids,
 * incompatible writers, and malformed payloads yield a null struct, as
 * in [[AvroDecode.decode]].
 *
 * Scale shape: `mapPartitions` with descriptors parsed once per task;
 * the hot loop is a single forward scan of each payload. No shuffle.
 */
object ProtobufDecode {

  /** Scalar proto type → Spark type, the `schema_protobuf.cc` translator
    * mapping: 32-bit signed forms → int; unsigned-32 and all 64-bit
    * forms → long (uint64 kept as its two's-complement long). */
  def scalarSparkType(name: String): DataType = name match {
    case "int32" | "sint32" | "sfixed32" => IntegerType
    case "uint32" | "fixed32"            => LongType
    case "int64" | "uint64" | "sint64" | "fixed64" | "sfixed64" => LongType
    case "bool"   => BooleanType
    case "float"  => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "bytes"  => BinaryType
    case other    => throw new IllegalArgumentException(s"unsupported scalar: $other")
  }

  /** Descriptor → Spark struct type. Message fields are nullable (absent
    * sub-message = null); scalars always materialize (proto3 default). */
  def sparkType(msg: PMessage, env: Map[String, PMessage]): StructType =
    StructType(msg.fields.map { f =>
      val base = f.tpe match {
        case Scalar(n)     => scalarSparkType(n)
        case MessageRef(n) =>
          sparkType(env.getOrElse(n, sys.error(s"unresolved message: $n")), env)
        case PMap(_, _) | EnumRef(_) =>
          sys.error("map/enum fields are outside the typed-decode subset (compat/normal form support them)")
      }
      val t = if (f.repeated) ArrayType(base) else base
      StructField(f.name, t, nullable = f.tpe.isInstanceOf[MessageRef] || f.repeated)
    })

  private def defaultOf(f: PField): Any =
    if (f.repeated) Seq.empty
    else f.tpe match {
      case MessageRef(_) => null
      case PMap(_, _) | EnumRef(_) =>
        sys.error("map/enum fields are outside the typed-decode subset")
      case Scalar(n) => scalarSparkType(n) match {
        case IntegerType => 0
        case LongType    => 0L
        case FloatType   => 0f
        case DoubleType  => 0d
        case BooleanType => false
        case StringType  => ""
        case BinaryType  => Array.empty[Byte]
        case t           => sys.error(s"no default for $t")
      }
    }

  // ------------------------------------------------------------ wire reader

  private final class WireReader(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (pos >= end) throw new java.io.EOFException("varint past end")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new java.io.IOException("varint too long")
      }
      v
    }
    def readFixed32(): Int = {
      if (pos + 4 > end) throw new java.io.EOFException("fixed32 past end")
      val v = ByteBuffer.wrap(bytes, pos, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def readFixed64(): Long = {
      if (pos + 8 > end) throw new java.io.EOFException("fixed64 past end")
      val v = ByteBuffer.wrap(bytes, pos, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8; v
    }
    def readDelimited(): (Int, Int) = { // (start, end) of the sub-range
      val len = readVarint().toInt
      if (len < 0 || pos + len > end) throw new java.io.EOFException("length past end")
      val r = (pos, pos + len); pos += len; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => readFixed64()
      case 2 => readDelimited()
      case 5 => readFixed32()
      case w => throw new java.io.IOException(s"unknown wire type $w")
    }
  }

  private def zigzag32(v: Long): Int = { val n = v.toInt; (n >>> 1) ^ -(n & 1) }
  private def zigzag64(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Wire type a scalar is encoded with when not packed. */
  private def wireOf(scalar: String): Int = scalar match {
    case "fixed64" | "sfixed64" | "double" => 1
    case "string" | "bytes"                => 2
    case "fixed32" | "sfixed32" | "float"  => 5
    case _                                 => 0 // varint family
  }

  private def readScalar(r: WireReader, name: String): Any = name match {
    case "int32"            => r.readVarint().toInt
    case "sint32"           => zigzag32(r.readVarint())
    case "sfixed32"         => r.readFixed32()
    case "uint32"           => r.readVarint() & 0xffffffffL
    case "fixed32"          => r.readFixed32().toLong & 0xffffffffL
    case "int64" | "uint64" => r.readVarint()
    case "sint64"           => zigzag64(r.readVarint())
    case "fixed64" | "sfixed64" => r.readFixed64()
    case "bool"             => r.readVarint() != 0
    case "float"            => java.lang.Float.intBitsToFloat(r.readFixed32())
    case "double"           => java.lang.Double.longBitsToDouble(r.readFixed64())
    case "string" =>
      val (s, e) = r.readDelimited(); new String(r.bytes, s, e - s, UTF_8)
    case "bytes" =>
      val (s, e) = r.readDelimited(); java.util.Arrays.copyOfRange(r.bytes, s, e)
    case other => throw new java.io.IOException(s"unsupported scalar: $other")
  }

  /** Decode one message body over `[start, end)`. */
  private def readMessage(msg: PMessage, env: Map[String, PMessage],
      bytes: Array[Byte], start: Int, endPos: Int): Row = {
    val byNum = msg.fields.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap
    val values = Array.tabulate[Any](msg.fields.length)(i => defaultOf(msg.fields(i)))
    val repeated = scala.collection.mutable.Map.empty[Int, ArrayBuffer[Any]]
    val r = new WireReader(bytes, start, endPos)
    while (r.hasMore) {
      val tag = r.readVarint()
      val (num, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      byNum.get(num) match {
        case None => r.skip(wire) // unknown writer field: skipped, as the reference does
        case Some((f, i)) =>
          def one(): Any = f.tpe match {
            case Scalar(n) => readScalar(r, n)
            case PMap(_, _) | EnumRef(_) =>
              throw new java.io.IOException("map/enum fields are outside the typed-decode subset")
            case MessageRef(n) =>
              val m = env.getOrElse(n, throw new java.io.IOException(s"unresolved message $n"))
              val (s, e) = r.readDelimited()
              readMessage(m, env, bytes, s, e)
          }
          if (f.repeated) {
            val buf = repeated.getOrElseUpdate(i, ArrayBuffer.empty[Any])
            f.tpe match {
              case Scalar(n) if wire == 2 && wireOf(n) != 2 =>
                // packed repeated scalars (proto3 default encoding)
                val (s, e) = r.readDelimited()
                val pr = new WireReader(bytes, s, e)
                while (pr.hasMore) buf += readScalar(pr, n)
              case _ => buf += one()
            }
          } else values(i) = one()
      }
    }
    repeated.foreach { case (i, buf) => values(i) = buf.toSeq }
    Row.fromSeq(values.toIndexedSeq)
  }

  // ----------------------------------------------------------- wire writer

  private def writeVarint(out: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += (v & 0x7f).toByte
  }
  private def writeFixed32(out: ArrayBuffer[Byte], v: Int): Unit =
    out ++= ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def writeFixed64(out: ArrayBuffer[Byte], v: Long): Unit =
    out ++= ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def writeScalar(out: ArrayBuffer[Byte], name: String, v: Any): Unit = name match {
    case "int32" | "int64" | "uint64" => writeVarint(out, v match {
      case i: Int => i.toLong; case l: Long => l })
    case "uint32"   => writeVarint(out, v.asInstanceOf[Long] & 0xffffffffL)
    case "sint32"   => val n = v.asInstanceOf[Int]; writeVarint(out, ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL)
    case "sint64"   => val n = v.asInstanceOf[Long]; writeVarint(out, (n << 1) ^ (n >> 63))
    case "sfixed32" => writeFixed32(out, v.asInstanceOf[Int])
    case "fixed32"  => writeFixed32(out, v.asInstanceOf[Long].toInt)
    case "fixed64" | "sfixed64" => writeFixed64(out, v.asInstanceOf[Long])
    case "bool"     => writeVarint(out, if (v.asInstanceOf[Boolean]) 1 else 0)
    case "float"    => writeFixed32(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case "double"   => writeFixed64(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case "string"   =>
      val b = v.asInstanceOf[String].getBytes(UTF_8); writeVarint(out, b.length.toLong); out ++= b
    case "bytes"    =>
      val b = v.asInstanceOf[Array[Byte]]; writeVarint(out, b.length.toLong); out ++= b
    case other => sys.error(s"unsupported scalar: $other")
  }

  /** Encode one Row (fields in descriptor order) as a message body. */
  private def writeMessage(msg: PMessage, env: Map[String, PMessage], row: Row): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    msg.fields.zipWithIndex.foreach { case (f, i) =>
      val v = row.get(i)
      def field(value: Any): Unit = f.tpe match {
        case PMap(_, _) | EnumRef(_) =>
          sys.error("map/enum fields are outside the typed-decode subset")
        case Scalar(n) =>
          writeVarint(out, (f.number.toLong << 3) | wireOf(n)); writeScalar(out, n, value)
        case MessageRef(n) =>
          val body = writeMessage(env(n), env, value.asInstanceOf[Row])
          writeVarint(out, (f.number.toLong << 3) | 2)
          writeVarint(out, body.length.toLong); out ++= body
      }
      if (f.repeated) {
        val items: scala.collection.Seq[Any] =
          if (v == null) Nil else v.asInstanceOf[scala.collection.Seq[Any]]
        f.tpe match {
          case Scalar(n) if wireOf(n) != 2 && items.nonEmpty =>
            // packed (proto3 default for numeric repeated)
            val body = ArrayBuffer.empty[Byte]
            items.foreach(writeScalar(body, n, _))
            writeVarint(out, (f.number.toLong << 3) | 2)
            writeVarint(out, body.length.toLong); out ++= body
          case _ => items.foreach(field)
        }
      } else if (v != null) field(v)
    }
    out.toArray
  }

  // ------------------------------------------------------------- operators

  /**
   * Decode a wire-framed binary `valueCol` into a typed `decoded` struct
   * under `readerProto`, resolving each record's writer descriptor by the
   * embedded id via `writerProtosById` (the registry's schema log).
   * Unknown ids, writers the reader cannot read, and malformed payloads
   * get a null struct.
   */
  def decode(df: DataFrame, valueCol: String, writerProtosById: Map[Int, String],
      readerProto: String): DataFrame = {
    val (readerMsg0, readerEnv0) = ProtobufCompat.parse(readerProto)
    decodeResolved(df, valueCol,
      writerProtosById.map { case (id, p) => id -> ProtobufCompat.parse(p) },
      (readerMsg0, readerEnv0))
  }

  /**
   * [[decode]] over already-resolved descriptors — the path for schemas
   * with cross-subject references ([[SchemaRefs.resolveProtobuf]]),
   * where the message environment spans imported files and cannot be
   * re-parsed from one `.proto` string inside the task. Descriptors are
   * plain case classes and ship in the task closure.
   */
  def decodeResolved(df: DataFrame, valueCol: String,
      writersById: Map[Int, (PMessage, Map[String, PMessage])],
      readerResolved: (PMessage, Map[String, PMessage])): DataFrame = {
    val inSchema = df.schema
    val readerType = sparkType(readerResolved._1, readerResolved._2)
    val outSchema = inSchema.add(StructField("decoded", readerType, nullable = true))
    val valueIdx = inSchema.fieldIndex(valueCol)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      val (reader, readerEnv) = readerResolved
      val readableIds: Set[Int] = writersById.filter { case (_, (w, wEnv)) =>
        ProtobufCompat.canRead(reader, w, readerEnv, wEnv)
      }.keySet
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](valueIdx)
        val decoded: Any =
          if (bytes == null || bytes.length < 6 || bytes(0) != 0x00) null
          else {
            val id = ByteBuffer.wrap(bytes, 1, 4).getInt
            if (!readableIds.contains(id)) null
            else
              try {
                val r = new WireReader(bytes, 5, bytes.length)
                // message-index list: 0x00 = first top-level message (the
                // supported subset); anything else is an unsupported path
                if (r.readVarint() != 0L) null
                else readMessage(reader, readerEnv, bytes, r.pos, bytes.length)
              } catch { case scala.util.control.NonFatal(_) => null }
          }
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }
  }

  /**
   * Scenario-side encoder: frame each row's named columns (matched to the
   * writer descriptor's field names) as
   * `[0x00][BE id][0x00 message-index][proto body]`, appended as `valueCol`.
   * The producer-side serializer a real ingest would run; the correctness
   * oracle re-derives results from the plaintext columns.
   */
  def encode(df: DataFrame, valueCol: String, writerProto: String, schemaId: Int): DataFrame =
    encodeResolved(df, valueCol, ProtobufCompat.parse(writerProto), schemaId)

  /** [[encode]] over an already-resolved writer descriptor (imports in
    * scope via [[SchemaRefs.resolveProtobuf]]). */
  def encodeResolved(df: DataFrame, valueCol: String,
      writerResolved: (PMessage, Map[String, PMessage]), schemaId: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(valueCol, BinaryType, nullable = true))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      val (writer, env) = writerResolved
      val fieldIdx = writer.fields.map(f => inSchema.fieldIndex(f.name))
      val header = ByteBuffer.allocate(5).put(0x00.toByte).putInt(schemaId).array()
      it.map { row =>
        val body = writeMessage(writer, env,
          Row.fromSeq(fieldIdx.map(row.get).toIndexedSeq))
        val out = ArrayBuffer.empty[Byte]
        out ++= header
        out += 0x00.toByte // message-index list: first top-level message
        out ++= body
        Row.fromSeq(row.toSeq :+ out.toArray)
      }
    }
  }
}
