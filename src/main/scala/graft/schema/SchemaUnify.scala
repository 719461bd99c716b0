package graft.schema

import org.apache.spark.sql.types._

/** Schema unification with numeric/temporal promotion — the engine's core
  * custom module (Spark's `StructType.merge` does not implement these rules).
  *
  * Behavior contract (reference: ingestor/ArrowSchemaMerge.java:51-311):
  *  - fields across input schemas are grouped by name; the result's fields
  *    (and all nested struct children) are sorted alphabetically by name;
  *  - numeric lattice (ints/floats/booleans): float beats int (double if any
  *    double else float); otherwise widest int, defaulting to int32 for
  *    byte/short/bool mixes (int64 only when an int64 participates);
  *  - temporal lattice: only Timestamp/Date (/Time) unify together —
  *    Timestamp preferred; a string never unifies with a timestamp: that is
  *    an error, caught at record level and routed to the DLQ;
  *  - string-likes → string; binary-likes → binary; all-array / all-map /
  *    all-struct → recursive child merge; anything else →
  *    `GraftSchemaException("Cannot unify incompatible types: …")`;
  *  - nullable if any input nullable.
  */
object SchemaUnify {

  final class GraftSchemaException(msg: String) extends IllegalArgumentException(msg)

  /** Unify many schemas into one (alphabetical field order). */
  def unify(schemas: Seq[StructType]): StructType = {
    require(schemas.nonEmpty, "Cannot unify an empty list of schemas")
    val grouped = schemas.flatMap(_.fields).groupBy(_.name)
    val merged = grouped.toSeq.map { case (name, fields) =>
      mergeFields(name, fields)
    }
    StructType(merged.sortBy(_.name))
  }

  def unify2(a: StructType, b: StructType): StructType = unify(Seq(a, b))

  private def mergeFields(name: String, fields: Seq[StructField]): StructField = {
    val nullable = fields.exists(_.nullable)
    val tpe = unifyTypes(name, fields.map(_.dataType))
    StructField(name, tpe, nullable)
  }

  def unifyTypes(fieldName: String, types: Seq[DataType]): DataType = {
    val unique = types.distinct
    if (unique.size == 1) return unique.head

    if (unique.forall(isTemporal)) return promoteTemporal(unique)
    if (unique.forall(isNumericLike)) return promoteNumeric(unique)
    if (unique.forall(_.isInstanceOf[StringType])) return StringType
    if (unique.forall(_.isInstanceOf[BinaryType])) return BinaryType

    if (unique.forall(_.isInstanceOf[ArrayType])) {
      val arrays = unique.map(_.asInstanceOf[ArrayType])
      val elem = unifyTypes(s"$fieldName.element", arrays.map(_.elementType))
      return ArrayType(elem, arrays.exists(_.containsNull))
    }
    if (unique.forall(_.isInstanceOf[MapType])) {
      val maps = unique.map(_.asInstanceOf[MapType])
      val k = unifyTypes(s"$fieldName.key", maps.map(_.keyType))
      val v = unifyTypes(s"$fieldName.value", maps.map(_.valueType))
      return MapType(k, v, maps.exists(_.valueContainsNull))
    }
    if (unique.forall(_.isInstanceOf[StructType])) {
      // Group nested children by name; structurally identical children pass
      // through, others merge recursively. Children sorted by name.
      val children = unique.map(_.asInstanceOf[StructType])
        .flatMap(_.fields).groupBy(_.name)
      val merged = children.toSeq.map { case (n, fs) =>
        if (fs.distinct.size == 1) fs.head else mergeFields(n, fs)
      }
      return StructType(merged.sortBy(_.name))
    }

    throw new GraftSchemaException(
      s"Cannot unify incompatible types for field '$fieldName': " +
        unique.map(_.simpleString).sorted.mkString("[", ", ", "]"))
  }

  private def isNumericLike(t: DataType): Boolean = t match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: BooleanType => true
    case _ => false
  }

  /** Timestamp/Date only — strings are deliberately NOT temporal here. */
  private def isTemporal(t: DataType): Boolean = t match {
    case _: TimestampType | _: DateType => true
    case _ => false
  }

  private def promoteNumeric(types: Seq[DataType]): DataType = {
    val hasFloat = types.exists(t => t.isInstanceOf[FloatType] || t.isInstanceOf[DoubleType])
    if (hasFloat) {
      if (types.exists(_.isInstanceOf[DoubleType])) DoubleType else FloatType
    } else if (types.exists(_.isInstanceOf[LongType])) LongType
    else IntegerType // default for byte/short/int/bool mixes
  }

  private def promoteTemporal(types: Seq[DataType]): DataType =
    if (types.exists(_.isInstanceOf[TimestampType])) TimestampType else DateType
}
