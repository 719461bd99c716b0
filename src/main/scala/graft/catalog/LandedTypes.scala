package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Landed-type policy and evolution (widening) decisions.
  *
  * Behavior contract:
  *  - complex types (struct/array/map) land as JSON strings at the table
  *    boundary (reference: ingestor/DucklakeTableManager.java:419-423,
  *    README.md:8) and a JSON column never changes type again
  *    (DucklakeTableManager.java:334-336);
  *  - integral widening byte<short<int<long and float→double are upgrades;
  *    double→float is tolerated with no change; everything else is an
  *    incompatible-evolution error (DucklakeTableManager.java:324-364).
  */
object LandedTypes {

  /** Marker metadata for columns that hold JSON-serialized nested values. */
  val JsonMetaKey = "graft.landed.json"
  private val jsonMeta =
    new MetadataBuilder().putBoolean(JsonMetaKey, true).build()

  def isJsonColumn(f: StructField): Boolean =
    f.metadata.contains(JsonMetaKey) && f.metadata.getBoolean(JsonMetaKey)

  /** The schema as landed in the lake: nested types become JSON strings. */
  def landedSchema(schema: StructType): StructType = StructType(schema.map {
    case f @ StructField(_, _: StructType | _: ArrayType | _: MapType, _, _) =>
      StructField(f.name, StringType, nullable = true, metadata = jsonMeta)
    case f => f
  })

  /** Project a batch to its landed form (`to_json` on nested columns). */
  def toLanded(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = df.schema.map {
      case StructField(n, _: StructType | _: ArrayType | _: MapType, _, _) =>
        to_json(col(quoted(n))).as(n)
      case StructField(n, _, _, _) => col(quoted(n))
    }
    df.select(cols: _*)
  }

  private def quoted(n: String): String = s"`${n.replace("`", "``")}`"

  /** Result of comparing an existing table column with an incoming one. */
  sealed trait Evolution
  /** Types identical or tolerated narrower incoming — no DDL. */
  case object Keep extends Evolution
  /** Widen the table column to the given type (registry update). */
  final case class Widen(to: DataType) extends Evolution
  /** Incompatible evolution — record-level error (DLQ candidate). */
  final case class Incompatible(reason: String) extends Evolution

  private def intRank(t: DataType): Option[Int] = t match {
    case ByteType => Some(0)
    case ShortType => Some(1)
    case IntegerType => Some(2)
    case LongType => Some(3)
    case _ => None
  }

  /** Widening decision for an existing column receiving data of a new type. */
  def decide(table: StructField, incoming: DataType): Evolution = {
    val existing = table.dataType
    if (existing == incoming) return Keep
    if (isJsonColumn(table) || incoming.isInstanceOf[StructType] ||
        incoming.isInstanceOf[ArrayType] || incoming.isInstanceOf[MapType]) {
      // JSON columns never evolve to/from any other type
      return if (isJsonColumn(table) &&
          (incoming.isInstanceOf[StructType] || incoming.isInstanceOf[ArrayType] ||
            incoming.isInstanceOf[MapType] || incoming == StringType)) Keep
        else Incompatible(
          s"JSON column '${table.name}' cannot change type (existing=$existing, incoming=$incoming)")
    }
    (intRank(existing), intRank(incoming)) match {
      case (Some(e), Some(i)) =>
        if (i > e) Widen(incoming) else Keep // narrower int tolerated
      case (Some(e), None) if e <= 2 &&
          (incoming == DoubleType || incoming == FloatType) =>
        // engine improvement over the reference (which rejects int→float
        // types): byte/short/int widen to DOUBLE — safe because Spark 4's
        // parquet reader supports the int32→double widened read. int64 does
        // NOT widen to double (lossy + unsupported read), matching the
        // reference's rejection.
        Widen(DoubleType)
      case _ =>
        (existing, incoming) match {
          case (FloatType, DoubleType) => Widen(DoubleType)
          case (DoubleType, FloatType) => Keep // tolerated without change
          case _ => Incompatible(
            s"Incompatible type for column '${table.name}': table has $existing, batch has $incoming")
        }
    }
  }

  final class SchemaEvolutionException(msg: String) extends IllegalStateException(msg)

  /** Evolve a table schema against an incoming batch schema: new columns are
    * added, existing columns widen per [[decide]]; incompatible → throw.
    * Returns the evolved table schema (existing column order preserved, new
    * columns appended in batch order). */
  def evolve(table: StructType, incoming: StructType): StructType = {
    val existingNames = table.fieldNames.toSet
    val evolved = table.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case None => f
        case Some(in) => decide(f, in.dataType) match {
          case Keep => f
          case Widen(to) => f.copy(dataType = to)
          case Incompatible(reason) => throw new SchemaEvolutionException(reason)
        }
      }
    }
    val added = incoming.filterNot(f => existingNames.contains(f.name))
      .map(f => landedSchema(StructType(Seq(f))).head.copy(nullable = true))
    StructType(evolved ++ added)
  }

  /** Cast a landed batch to the table schema with the reference's
    * permissive vector-population fallbacks (C5,
    * SinkRecordToArrowConverter.java:627-653):
    *  - numeric → string column: rendered as string;
    *  - string → timestamp column: parsed, unparseable → null;
    *  - missing column → null;
    *  - otherwise a plain cast.
    */
  def conform(df: DataFrame, table: StructType): DataFrame = {
    val batch = df.schema
    val cols: Seq[Column] = table.map { f =>
      batch.fields.find(_.name == f.name) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(b) if b.dataType == f.dataType => col(quoted(f.name))
        case Some(b) =>
          (b.dataType, f.dataType) match {
            case (StringType, TimestampType) =>
              // permissive: unparseable strings become null (ANSI-safe)
              try_to_timestamp(col(quoted(f.name))).as(f.name)
            case _ =>
              // try_cast: reference vector-population is permissive — a
              // mismatched value nulls out rather than failing the batch
              col(quoted(f.name)).try_cast(f.dataType).as(f.name)
          }
      }
    }
    df.select(cols: _*)
  }
}
