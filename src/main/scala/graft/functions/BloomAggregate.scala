package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-group Bloom filter of a column's values, as serialized bytes —
  * the build side of the lake's per-file bloom skipping index
  * ([[graft.catalog.GraftLake.buildBloomIndex]]).
  *
  * Scale shape: a [[TypedImperativeAggregate]] over `spark-sketch`'s
  * [[BloomFilter]] builds map-side (each task inserts its partition's
  * values into a local filter) and merges filters by OR — one shuffle of
  * fixed-size bitsets, never of values. Grouped by file key, that turns
  * "bloom per data file over 100 TB" into one pass over the table.
  *
  * Hash domain contract (probe side must mirror it,
  * [[graft.catalog.GraftLake]] bloom pruning): integral and temporal
  * values insert via `putLong` on their natural long form (byte/short/
  * int/long widen; DATE = epoch days; TIMESTAMP/_NTZ = epoch micros —
  * the SAME epoch domain the manifest min/max bounds use), strings via
  * `putBinary` on UTF-8 bytes. Fractional and complex types are not
  * supported — equality pruning on floats is a fiction anyway. NULLs are
  * skipped (a bloom answers `= literal`, and `= NULL` is never true).
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, s"need expectedItems > 0, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"need 0 < fpp < 1, got $fpp")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           DateType | TimestampType | TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom requires an integral, temporal or string column, " +
            s"got ${other.sql}")
    }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buffer.putBinary(s.getBytes)
      case l: Long => buffer.putLong(l) // long, timestamp (µs)
      case i: Int => buffer.putLong(i.toLong) // int, date (days)
      case s: Short => buffer.putLong(s.toLong)
      case b: Byte => buffer.putLong(b.toLong)
    }
    buffer
  }

  override def merge(buffer: BloomFilter, input: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(input)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomAggregate {
  /** Bloom-filter aggregate as a Column (engine-internal build path). */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    PlanBridge.column(
      BloomAgg(PlanBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())
}
