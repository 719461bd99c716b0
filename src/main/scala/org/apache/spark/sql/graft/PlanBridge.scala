package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow bridge into Spark's `private[sql]` plan/column APIs, placed in
  * `org.apache.spark.sql` the same way other Spark extension libraries do
  * (the DSv2 extension surface has no public LogicalPlan→DataFrame hook).
  * Everything graft-specific stays in the `graft.*` packages; this object
  * only re-exposes three conversions.
  */
/** [[org.apache.spark.sql.AnalysisException]] carrying a plain descriptive
  * message and NO error class. Spark 4 exposes only error-class-keyed
  * public constructors; routing a custom message through a legacy
  * `_LEGACY_ERROR_TEMP_*` template couples the message to templates Spark
  * deletes between releases. The primary constructor accepts a bare
  * message and is reachable from a subclass in this bridge package, so
  * this survives error-framework churn. */
class GraftAnalysisException(msg: String)
  extends org.apache.spark.sql.AnalysisException(
    message = msg, line = None, startPosition = None, cause = None,
    errorClass = None, messageParameters = Map.empty, context = Array.empty)

object PlanBridge {

  /** Materialize an analyzed LogicalPlan as a DataFrame (Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The analyzed logical plan behind a DataFrame. */
  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].logicalPlan

  /** Nullability-insensitive type equality (DataType.sameType). */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** The session's DSv2 catalog manager (private[sql] on SessionState). */
  def catalogManager(spark: SparkSession)
      : org.apache.spark.sql.connector.catalog.CatalogManager =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager

  /** Conservative lowering of a Column predicate into a comparison tree a
    * file-pruner can evaluate against min/max bounds. Spark 4 Columns
    * wrap `private[sql]` ColumnNode trees (the DSL's `>=`/`&&` become
    * `internal.UnresolvedFunction(">=")` / `("and")`), so the walk lives
    * in this bridge. Anything not a conjunction/disjunction of
    * `col <op> numeric-literal` lowers to [[PUnknown]]. */
  sealed trait SimplePred
  final case class PAnd(l: SimplePred, r: SimplePred) extends SimplePred
  final case class POr(l: SimplePred, r: SimplePred) extends SimplePred
  /** `op` ∈ <, <=, >, >=, = with the attribute on the LEFT. */
  final case class PCmp(op: String, col: String, value: Double) extends SimplePred
  case object PUnknown extends SimplePred

  def simplePredicate(c: Column): SimplePred = {
    import org.apache.spark.sql.internal._
    def flip(op: String): String = op match {
      case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
      case o => o
    }
    def attr(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.nameParts.head)
      case _ => None
    }
    def num(n: ColumnNode): Option[Double] = n match {
      case l: Literal => l.value match {
        case x: Number => Some(x.doubleValue())
        case d: scala.math.BigDecimal => Some(d.doubleValue)
        case _ => None
      }
      case _ => None
    }
    def walk(n: ColumnNode): SimplePred = n match {
      case f: UnresolvedFunction =>
        val args = f.arguments
        f.functionName match {
          case "and" if args.size == 2 => PAnd(walk(args(0)), walk(args(1)))
          case "or" if args.size == 2 => POr(walk(args(0)), walk(args(1)))
          case op @ ("<" | "<=" | ">" | ">=" | "=" | "==") if args.size == 2 =>
            val o = if (op == "==") "=" else op
            (attr(args(0)), num(args(1)), num(args(0)), attr(args(1))) match {
              case (Some(c0), Some(v), _, _) => PCmp(o, c0, v)
              case (_, _, Some(v), Some(c1)) => PCmp(flip(o), c1, v)
              case _ => PUnknown
            }
          case _ => PUnknown
        }
      case _ => PUnknown
    }
    walk(c.node)
  }
}
