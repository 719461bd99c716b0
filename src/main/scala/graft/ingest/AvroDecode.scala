package graft.ingest

import java.io.ByteArrayInputStream

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Schemaful Avro value decoding (reference S7: delegated to the Confluent
  * AvroConverter out-of-repo; here implemented directly on avro-core since
  * the engine owns its wire formats).
  *
  * Supports raw Avro binary with a configured reader schema, plus the
  * Confluent framing (magic 0x00 + 4-byte schema id — id ignored, reader
  * schema used) and Avro single-object encoding (0xC3 0x01 + 8-byte
  * fingerprint). Executed per-partition in `mapPartitions`; one reader per
  * partition, no per-record reflection.
  *
  * Type mapping: record→struct, union[null,T]→nullable T, enum→string,
  * fixed/bytes→binary, logical timestamp-millis/micros→timestamp,
  * date→date, array/map recursive; unsupported unions throw.
  */
object AvroDecode {

  def toSparkType(s: ASchema): DataType = s.getType match {
    case ASchema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = isNullable(f.schema()))).toSeq)
    case ASchema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case ASchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros => TimestampType
      case _ => LongType
    }
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
    case ASchema.Type.BYTES | ASchema.Type.FIXED => BinaryType
    case ASchema.Type.ARRAY => ArrayType(toSparkType(s.getElementType), containsNull = true)
    case ASchema.Type.MAP => MapType(StringType, toSparkType(s.getValueType), valueContainsNull = true)
    case ASchema.Type.UNION => nonNullBranch(s) match {
      case Some(b) => toSparkType(b)
      case None => throw new IllegalArgumentException(s"Unsupported Avro union: $s")
    }
    case ASchema.Type.NULL => NullType
    case t => throw new IllegalArgumentException(s"Unsupported Avro type: $t")
  }

  private def isNullable(s: ASchema): Boolean =
    s.getType == ASchema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == ASchema.Type.NULL)

  private def nonNullBranch(s: ASchema): Option[ASchema] = {
    val branches = s.getTypes.asScala.filterNot(_.getType == ASchema.Type.NULL)
    if (branches.size == 1) Some(branches.head) else None
  }

  def readerSchema(json: String): ASchema = new ASchema.Parser().parse(json)

  private def convert(v: Any, s: ASchema, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, st: StructType) =>
      val rs = resolve(s)
      Row.fromSeq(st.fields.toSeq.map { f =>
        val af = rs.getField(f.name)
        if (af == null) null else convert(r.get(f.name), af.schema(), f.dataType)
      })
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes()
    case (l: java.lang.Long, TimestampType) =>
      val micros = resolve(s).getLogicalType match {
        case _: LogicalTypes.TimestampMicros => l.longValue()
        case _ => l.longValue() * 1000L // millis (reference unit, §1.2)
      }
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (arr: java.util.Collection[_], ArrayType(et, _)) =>
      val es = resolve(s).getElementType
      arr.asScala.map(convert(_, es, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      val vs = resolve(s).getValueType
      m.asScala.map { case (k, x) => String.valueOf(k) -> convert(x, vs, vt) }.toMap
    case (other, _) => other
  }

  /** Resolve through union wrappers to the value branch. */
  private def resolve(s: ASchema): ASchema =
    if (s.getType == ASchema.Type.UNION) nonNullBranch(s).getOrElse(s) else s

  private[ingest] def convertRecord(
      r: GenericRecord, s: ASchema, sparkSchema: StructType): Row =
    convert(r, s, sparkSchema).asInstanceOf[Row]

  /** Decode one Avro value with the given reader schema (convenience /
    * test entry; hot paths use [[AvroRowDecoder]]). */
  def decode(bytes: Array[Byte], schema: ASchema, sparkSchema: StructType): Row =
    new AvroRowDecoder(schema.toString, sparkSchema).decode(bytes)
}

/** Reusable per-partition decoder: one parsed schema + GenericDatumReader +
  * recycled BinaryDecoder for all records of a partition.
  *
  * Framing: the payload is decoded RAW first (records arrive unframed from
  * the Connect-converter-equivalent path — a leading 0x00 byte is a
  * perfectly valid first field like `long 0` or `false`); only when the raw
  * decode fails does the decoder retry past Confluent (0x00 + 4-byte id)
  * or single-object (0xC3 0x01 + 8-byte fingerprint) framing. */
final class AvroRowDecoder(schemaJson: String, sparkSchema: StructType)
    extends Serializable {
  @transient private lazy val schema = AvroDecode.readerSchema(schemaJson)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](schema)
  @transient private var binDecoder: org.apache.avro.io.BinaryDecoder = _

  private def decodeAt(bytes: Array[Byte], off: Int): Row = {
    binDecoder = DecoderFactory.get()
      .binaryDecoder(bytes, off, bytes.length - off, binDecoder)
    AvroDecode.convertRecord(
      reader.read(null, binDecoder), schema, sparkSchema)
  }

  def decode(bytes: Array[Byte]): Row =
    try decodeAt(bytes, 0)
    catch {
      case e: Exception =>
        if (bytes.length > 5 && bytes(0) == 0x00.toByte)
          try decodeAt(bytes, 5) catch { case _: Exception => throw e }
        else if (bytes.length > 10 && bytes(0) == 0xC3.toByte && bytes(1) == 0x01.toByte)
          try decodeAt(bytes, 10) catch { case _: Exception => throw e }
        else throw e
    }
}
