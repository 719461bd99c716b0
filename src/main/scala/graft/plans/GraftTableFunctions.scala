package graft.plans

import graft.catalog.GraftLake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Table-valued SQL functions injected by [[GraftExtensions]].
  *
  * `table_changes('<cat>.<table>', <from_version>, <to_version>)` — the
  * SQL surface over [[GraftLake.tableChanges]], DuckLake parity with its
  * `ducklake_table_changes(...)` function (the repo's cited reference
  * for the metadata-derived feed): a SQL-only consumer can ask "what
  * changed between v3 and v7" without writing Scala or standing up a
  * stream. Returns the table's columns at `to_version` plus
  * `_change_type` and `_commit_version`, and composes relationally
  * (filters, joins, aggregates) like any other table function.
  *
  * The builder runs at ANALYSIS time (Spark's TableFunctionRegistry
  * contract), so the arguments must be literals — exactly the contract
  * of Delta's `table_changes` TVF. The identifier resolves through the
  * session's CatalogManager via the admin parser's shared resolution
  * (single-part names follow `USE <graft-catalog>`). */
object GraftTableFunctions {

  val tableChanges: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft", null, "table_changes",
        "table_changes(table, from_version, to_version) - row-level " +
          "change feed of a graft table between two retained snapshots",
        ""),
      buildTableChanges)

  private def buildTableChanges(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3,
      "table_changes takes exactly (table, from_version, to_version), " +
        s"got ${exprs.size} argument(s)")
    def literal(e: Expression, what: String): Any = {
      require(e.foldable,
        s"table_changes: $what must be a literal, got ${e.sql}")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    val table = literal(exprs(0), "table") match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"table_changes: table must be a string literal, got $other")
    }
    def version(e: Expression, what: String): Long =
      literal(e, what) match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case other => throw new IllegalArgumentException(
          s"table_changes: $what must be an integer version, got $other")
      }
    val from = version(exprs(1), "from_version")
    val to = version(exprs(2), "to_version")
    val spark = SparkSession.active
    val (wh, t) = GraftSqlParser.resolveRequired(spark,
      GraftSqlParser.parts(table))
    // the feed plan is fully analyzed already (manifest scans, change-file
    // reads, DV semi-joins) — hand the analyzer the analyzed form so
    // re-resolution is a no-op
    new GraftLake(spark, wh).tableChanges(t, from, to)
      .queryExecution.analyzed
  }
}
