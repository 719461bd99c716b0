package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** `graft_topk_distinct(x, k)` — the k largest DISTINCT values of a
  * numeric column per group, as a descending array.
  *
  * The point is the SCALE SHAPE, not the arithmetic: a native
  * [[TypedImperativeAggregate]] keeps a BOUNDED (≤ k entries) buffer that
  * partially aggregates map-side and merges as sorted sets, so a
  * per-group top-k costs one shuffle of k-element buffers. The
  * window-function formulation (`row_number() ≤ k`) shuffles and sorts
  * EVERY row of every group — at 100 TB that is the difference between
  * kilobytes and the whole table on the wire. (Spark's builtin
  * TakeOrderedAndProject does this globally; this aggregate does it per
  * group.)
  *
  * Distinct values make the result total-order deterministic (ties in
  * raw top-k would otherwise make "which copy" engine-dependent).
  */
case class TopKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Double]] {

  require(k > 0, s"need k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // numeric-only domain, enforced at ANALYSIS time: values order and merge
  // as doubles, so strings/dates/arrays would need a different buffer —
  // checking here turns a would-be runtime MatchError into a clear
  // AnalysisException naming the function and the offending type.
  // (NumericType/AbstractDataType are private[sql] in Spark 4, so match
  // the public concrete numeric types instead of using ExpectsInputTypes.)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk_distinct requires a numeric column, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[Double] =
    new java.util.TreeSet[Double]()

  private def bound(s: java.util.TreeSet[Double]): Unit =
    while (s.size > k) s.pollFirst() // drop the smallest beyond k

  override def update(buffer: java.util.TreeSet[Double],
      input: InternalRow): java.util.TreeSet[Double] = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
      })
      bound(buffer)
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[Double],
      input: java.util.TreeSet[Double]): java.util.TreeSet[Double] = {
    buffer.addAll(input)
    bound(buffer)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[Double]): Any =
    new GenericArrayData(descending(buffer))

  private def descending(s: java.util.TreeSet[Double]): Array[Double] = {
    val out = new Array[Double](s.size)
    val it = s.descendingIterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  override def serialize(buffer: java.util.TreeSet[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Double]()
    var i = 0
    while (i < n) { s.add(bb.getDouble); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKAggregate {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk_distinct",
      exprs => {
        require(exprs.length == 2,
          s"graft_topk_distinct(x, k) takes 2 arguments, got ${exprs.length}")
        val kExpr = exprs(1)
        require(kExpr.foldable,
          s"graft_topk_distinct's k must be a literal, got ${kExpr.sql}")
        val k = kExpr.eval(null) match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"graft_topk_distinct's k must be a positive integer, got " +
              s"${if (other == null) "NULL" else other.toString})")
        }
        require(k > 0, s"graft_topk_distinct's k must be positive, got $k")
        TopKDistinct(exprs.head, k).toAggregateExpression()
      },
      "built-in")

  /** Top-k distinct values as a Column; registers on first use. */
  def topKDistinct(c: Column, k: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_topk_distinct", c,
      org.apache.spark.sql.functions.lit(k))
  }
}
