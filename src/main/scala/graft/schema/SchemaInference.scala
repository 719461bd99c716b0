package graft.schema

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Schema inference for schemaless values (JSON strings / parsed maps).
  *
  * Behavior contract (reference: connect/SinkRecordToArrowConverter.java
  * :113-152 preprocessing, :773-832 inference):
  *  - a JSON string value is parsed to a map; maps → STRUCT, collections →
  *    ARRAY with the element type of the first non-null element;
  *  - null values contribute NO field; an all-null array contributes none;
  *  - a struct that ends up with zero typed fields is dropped entirely
  *    (empty structs are ignored, not errors — KafkaSchemaToArrow.java:32-37);
  *  - ISO-8601-looking strings become timestamps UNLESS the field name has an
  *    ID-like suffix (`_id,id,_uuid,uuid,_key,key`, case-insensitive suffix
  *    match — so `distinct_id`, `userid`, `sessionkey` all stay strings);
  *  - unrecognized scalar types default to string.
  */
object SchemaInference {

  /** Reference ID_FIELD_SUFFIXES (SinkRecordToArrowConverter.java:69-70). */
  private val IdSuffixes = Seq("_id", "id", "_uuid", "uuid", "_key", "key")

  def isIdLikeField(fieldName: String): Boolean = {
    if (fieldName == null) false
    else {
      val lower = fieldName.toLowerCase(java.util.Locale.ROOT)
      IdSuffixes.exists(lower.endsWith)
    }
  }

  @transient private lazy val mapper = new ObjectMapper()

  /** Infer a struct schema from one schemaless JSON document.
    * None when the value is not a JSON object or yields no typed fields. */
  def inferFromJson(json: String): Option[StructType] = {
    if (json == null || json.trim.isEmpty) return None
    val parsed =
      try mapper.readValue(json, classOf[Object])
      catch { case _: Exception => return None }
    inferType(parsed, None) match {
      case Some(s: StructType) => Some(s)
      case _ => None
    }
  }

  /** Infer the engine type of a parsed value; None = no type information. */
  def inferType(value: Any, fieldName: Option[String]): Option[DataType] = value match {
    case null => None
    case m: java.util.Map[_, _] =>
      val fields = m.asScala.toSeq.flatMap { case (k, v) =>
        val name = String.valueOf(k)
        inferType(v, Some(name)).map(t => StructField(name, t, nullable = true))
      }
      if (fields.isEmpty) None else Some(StructType(fields))
    case m: scala.collection.Map[_, _] =>
      inferType(m.asJava, fieldName)
    case c: java.util.Collection[_] =>
      c.asScala.iterator.flatMap(e => inferType(e, None)).nextOption()
        .map(ArrayType(_, containsNull = true))
    case c: Iterable[_] =>
      c.iterator.flatMap(e => inferType(e, None)).nextOption()
        .map(ArrayType(_, containsNull = true))
    case _: java.lang.Integer => Some(IntegerType)
    case _: java.lang.Long => Some(LongType)
    case _: java.lang.Short => Some(ShortType)
    case _: java.lang.Byte => Some(ByteType)
    case _: java.lang.Float => Some(FloatType)
    case _: java.lang.Double => Some(DoubleType)
    case _: java.lang.Boolean => Some(BooleanType)
    case _: Array[Byte] => Some(BinaryType)
    case s: String if !fieldName.exists(isIdLikeField) && TimestampDetect.isTimestamp(s) =>
      Some(TimestampType)
    case _ => Some(StringType) // default to string (incl. big decimals etc.)
  }

  /** Distributed inference over a corpus of JSON documents: per-record
    * inference + tree-reduction through the unification lattice.
    *
    * Scale: the classic two-pass schemaless ingest — pass 1 is a map +
    * `treeAggregate` (O(log n) merge depth, only schemas cross the wire,
    * never data). At 100 TB the driver sees one StructType per partition
    * tree level, not per record.
    */
  def inferSchemaDistributed(jsons: Dataset[String], depth: Int = 2): Option[StructType] = {
    val schemas = jsons.rdd.flatMap(j => inferFromJson(j))
    val zero: StructType = StructType(Nil)
    val merged = schemas.treeAggregate(zero)(
      (acc, s) => if (acc.isEmpty) s else SchemaUnify.unify2(acc, s),
      (a, b) =>
        if (a.isEmpty) b else if (b.isEmpty) a else SchemaUnify.unify2(a, b),
      depth)
    if (merged.isEmpty) None else Some(merged)
  }

}
