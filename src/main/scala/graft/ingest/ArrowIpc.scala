package graft.ingest

import java.io.ByteArrayInputStream
import java.time.ZoneOffset

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AField}
import org.apache.arrow.vector.types.FloatingPointPrecision

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Arrow IPC (stream format) value decoding — the S4/S6 operators.
  *
  * Behavior contract (reference: connect/ArrowToKafkaConverter.java:49-257):
  * IPC bytes may contain multiple batches (concatenated); the Arrow schema
  * maps to the engine schema including logical types, struct/list/map and
  * optionality; unsupported Arrow types throw.
  *
  * Spark realization: executed inside `mapPartitions` on the binary value
  * column (one allocator per partition, closed after use) — the idiomatic
  * landing for a per-record imperative decode that Catalyst cannot express.
  */
object ArrowIpc {

  /** Fast sniff for Arrow IPC stream bytes: encapsulated-message framing
    * starts with the 0xFFFFFFFF continuation marker (all Arrow ≥ 0.15
    * writers). Legacy pre-0.15 streams (bare metadata length, no marker)
    * are NOT recognized and would route to the JSON path → DLQ. JSON
    * objects/arrays never match the marker. */
  def looksLikeIpc(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      bytes(0) == -1 && bytes(1) == -1 && bytes(2) == -1 && bytes(3) == -1

  def toSparkType(t: ArrowType): DataType = t match {
    case i: ArrowType.Int => (i.getBitWidth, i.getIsSigned) match {
      case (8, true) => ByteType
      case (16, true) => ShortType
      case (32, true) => IntegerType
      case (64, true) => LongType
      case _ => throw new IllegalArgumentException(s"Unsupported Arrow int: $i")
    }
    case f: ArrowType.FloatingPoint => f.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
      case p => throw new IllegalArgumentException(s"Unsupported Arrow float: $p")
    }
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.Date => DateType
    case t: ArrowType.Time => IntegerType // millis-of-day (no Spark TIME type)
    case _ => throw new IllegalArgumentException(s"Unsupported Arrow type: $t")
  }

  def toSparkField(f: AField): StructField = {
    val dt = f.getType match {
      case _: ArrowType.Struct =>
        StructType(f.getChildren.asScala.map(toSparkField).toSeq)
      case _: ArrowType.List =>
        ArrayType(toSparkField(f.getChildren.get(0)).dataType, containsNull = true)
      case _: ArrowType.Map =>
        val entries = f.getChildren.get(0)
        MapType(
          toSparkField(entries.getChildren.get(0)).dataType,
          toSparkField(entries.getChildren.get(1)).dataType,
          valueContainsNull = true)
      case t => toSparkType(t)
    }
    StructField(f.getName, dt, f.isNullable)
  }

  /** Convert an Arrow getObject value to the Spark external type for `dt`. */
  private def toExternal(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: org.apache.arrow.vector.util.Text, _) => t.toString
    case (ldt: java.time.LocalDateTime, TimestampType) =>
      java.sql.Timestamp.from(ldt.toInstant(ZoneOffset.UTC))
    case (ld: java.time.LocalDate, DateType) => java.sql.Date.valueOf(ld)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
    case (l: java.util.List[_], ArrayType(et, _)) =>
      l.asScala.map(toExternal(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(kt, vt, _)) =>
      m.asScala.map { case (k, x) => toExternal(k, kt) -> toExternal(x, vt) }.toMap
    case (m: java.util.Map[_, _], st: StructType) =>
      Row.fromSeq(st.map(f => toExternal(m.asScala.asInstanceOf[
        scala.collection.Map[Any, Any]].get(f.name).orNull, f.dataType)))
    case (other, _) => other
  }

  /** Decode IPC stream bytes into (schema, rows). Multi-batch streams
    * concatenate. */
  def decode(bytes: Array[Byte]): (StructType, Seq[Row]) = {
    val allocator = new RootAllocator(Long.MaxValue)
    try {
      val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
      try {
        val root: VectorSchemaRoot = reader.getVectorSchemaRoot
        val schema = StructType(
          root.getSchema.getFields.asScala.map(toSparkField).toSeq)
        val rows = Seq.newBuilder[Row]
        while (reader.loadNextBatch()) {
          val vectors = root.getFieldVectors.asScala.toSeq
          val types = schema.fields.map(_.dataType)
          var i = 0
          while (i < root.getRowCount) {
            rows += Row.fromSeq(vectors.zip(types).map { case (vec, dt) =>
              toExternal(vec.getObject(i), dt)
            })
            i += 1
          }
        }
        (schema, rows.result())
      } finally reader.close()
    } finally allocator.close()
  }

  /** Encode rows to Arrow IPC stream bytes (S5 — the producer-side
    * utility; reference ArrowIpcConverter.fromConnectData). Supports the
    * flat primitive/temporal subset; one batch per call. */
  def encode(schema: StructType, rows: Seq[Row]): Array[Byte] = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AF, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.types.{FloatingPointPrecision => FPP, TimeUnit => ATU, DateUnit}
    def toArrowField(f: StructField): AF = {
      val t = f.dataType match {
        case ByteType => new ArrowType.Int(8, true)
        case ShortType => new ArrowType.Int(16, true)
        case IntegerType => new ArrowType.Int(32, true)
        case LongType => new ArrowType.Int(64, true)
        case FloatType => new ArrowType.FloatingPoint(FPP.SINGLE)
        case DoubleType => new ArrowType.FloatingPoint(FPP.DOUBLE)
        case BooleanType => ArrowType.Bool.INSTANCE
        case StringType => ArrowType.Utf8.INSTANCE
        case BinaryType => ArrowType.Binary.INSTANCE
        case TimestampType => new ArrowType.Timestamp(ATU.MICROSECOND, null)
        case DateType => new ArrowType.Date(DateUnit.DAY)
        case other => throw new IllegalArgumentException(
          s"encode supports flat primitive columns, got $other")
      }
      new AF(f.name, FieldType.nullable(t), null)
    }
    val aSchema = new ASchema(schema.fields.map(toArrowField).toList.asJava)
    val allocator = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(aSchema, allocator)
      try {
        root.allocateNew()
        rows.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, j) =>
            val vec = root.getVector(j)
            if (row.isNullAt(j)) vec.setNull(i)
            else (f.dataType, vec) match {
              case (ByteType, v: TinyIntVector) => v.setSafe(i, row.getByte(j))
              case (ShortType, v: SmallIntVector) => v.setSafe(i, row.getShort(j))
              case (IntegerType, v: IntVector) => v.setSafe(i, row.getInt(j))
              case (LongType, v: BigIntVector) => v.setSafe(i, row.getLong(j))
              case (FloatType, v: Float4Vector) => v.setSafe(i, row.getFloat(j))
              case (DoubleType, v: Float8Vector) => v.setSafe(i, row.getDouble(j))
              case (BooleanType, v: BitVector) => v.setSafe(i, if (row.getBoolean(j)) 1 else 0)
              case (StringType, v: VarCharVector) =>
                v.setSafe(i, row.getString(j).getBytes("UTF-8"))
              case (BinaryType, v: VarBinaryVector) =>
                v.setSafe(i, row.getAs[Array[Byte]](j))
              case (TimestampType, v: TimeStampMicroVector) =>
                // full microsecond fidelity (getTime alone truncates to ms)
                val t = row.getTimestamp(j).toInstant
                v.setSafe(i, t.getEpochSecond * 1000000L + t.getNano / 1000L)
              case (DateType, v: DateDayVector) =>
                v.setSafe(i, row.getDate(j).toLocalDate.toEpochDay.toInt)
              case (t, v) => throw new IllegalStateException(s"unexpected $t / ${v.getClass}")
            }
          }
        }
        root.setRowCount(rows.size)
        val out = new java.io.ByteArrayOutputStream()
        val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
          root, null, java.nio.channels.Channels.newChannel(out))
        w.start(); w.writeBatch(); w.end(); w.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Decode only the schema (cheap header read, for unification passes). */
  def decodeSchema(bytes: Array[Byte]): StructType = {
    val allocator = new RootAllocator(Long.MaxValue)
    try {
      val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
      try StructType(
        reader.getVectorSchemaRoot.getSchema.getFields.asScala.map(toSparkField).toSeq)
      finally reader.close()
    } finally allocator.close()
  }

  /** Align a decoded row to a unified schema: missing fields null, numeric
    * widening, recursive for nested rows. */
  def conformRow(row: Row, from: StructType, to: StructType): Row = {
    val idx = from.fieldNames.zipWithIndex.toMap
    Row.fromSeq(to.map { tf =>
      idx.get(tf.name) match {
        case None => null
        case Some(i) =>
          conformValue(row.get(i), from(tf.name).dataType, tf.dataType)
      }
    })
  }

  private def conformValue(v: Any, from: DataType, to: DataType): Any = {
    if (v == null) return null
    (from, to) match {
      case (f, t) if f == t => v
      // Boolean sources first: SchemaUnify legitimately promotes
      // bool+int/long/float fields, and java.lang.Boolean is not a Number —
      // a generic numeric arm matching first would MatchError the whole
      // micro-batch (round-2 fix; was dead code below the numeric arms).
      case (BooleanType, LongType) =>
        Long.box(if (v.asInstanceOf[java.lang.Boolean]) 1L else 0L)
      case (BooleanType, IntegerType) =>
        Int.box(if (v.asInstanceOf[java.lang.Boolean]) 1 else 0)
      case (BooleanType, DoubleType) =>
        Double.box(if (v.asInstanceOf[java.lang.Boolean]) 1.0 else 0.0)
      case (BooleanType, FloatType) =>
        Float.box(if (v.asInstanceOf[java.lang.Boolean]) 1.0f else 0.0f)
      case (_, LongType) => (v: @unchecked) match {
        case n: java.lang.Number => n.longValue()
      }
      case (_, IntegerType) => (v: @unchecked) match {
        case n: java.lang.Number => n.intValue()
      }
      case (_, DoubleType) => (v: @unchecked) match {
        case n: java.lang.Number => n.doubleValue()
      }
      case (_, FloatType) => (v: @unchecked) match {
        case n: java.lang.Number => n.floatValue()
      }
      case (DateType, TimestampType) =>
        java.sql.Timestamp.from(
          v.asInstanceOf[java.sql.Date].toLocalDate.atStartOfDay.toInstant(ZoneOffset.UTC))
      case (sf: StructType, st: StructType) =>
        conformRow(v.asInstanceOf[Row], sf, st)
      case (ArrayType(fe, _), ArrayType(te, _)) =>
        v.asInstanceOf[Seq[Any]].map(conformValue(_, fe, te))
      case (MapType(fk, fv, _), MapType(tk, tv, _)) =>
        v.asInstanceOf[Map[Any, Any]].map { case (k, x) =>
          conformValue(k, fk, tk) -> conformValue(x, fv, tv)
        }
      case (_, StringType) => String.valueOf(v)
      case _ => v
    }
  }
}
