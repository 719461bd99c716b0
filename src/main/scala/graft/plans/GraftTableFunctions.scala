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
  * (single-part names follow `USE <graft-catalog>`).
  *
  * `from`/`to` each accept EITHER an integer snapshot version OR a
  * point in time — a `TIMESTAMP`/`DATE` literal, or a string in
  * ISO-8601 instant / `yyyy-MM-dd HH:mm:ss[.f]` / `yyyy-MM-dd` form —
  * resolved to "the snapshot current AS OF that time" via
  * [[GraftLake.versionAt]] (the streaming source's `startingTimestamp`
  * semantics; DuckLake's `ducklake_table_changes` and Delta's
  * `table_changes` accept the same dual forms, and a SQL-only consumer
  * asking "what changed since yesterday" should not have to translate
  * time to version by hand through DESCRIBE HISTORY). Local date/time
  * forms are interpreted in the SESSION time zone; the two bounds may
  * mix forms. A time before the first commit fails loudly (versionAt's
  * contract), matching the integer form's retained-snapshot guard. */
object GraftTableFunctions {

  val tableChanges: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft", null, "table_changes",
        "table_changes(table, from, to) - row-level change feed of a " +
          "graft table between two retained snapshots; each bound is an " +
          "integer version or a timestamp/date (snapshot as of that time)",
        ""),
      buildTableChanges)

  private def buildTableChanges(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3,
      "table_changes takes exactly (table, from, to), " +
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
    val spark = SparkSession.active
    lazy val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    // Left(version) | Right(instant millis); the DataType disambiguates
    // (a DATE literal also evals to java.lang.Integer)
    def bound(e: Expression, what: String): Either[Long, Long] = {
      import org.apache.spark.sql.types._
      (literal(e, what), e.dataType) match {
        case (days: java.lang.Integer, DateType) =>
          Right(java.time.LocalDate.ofEpochDay(days.longValue())
            .atStartOfDay(zone).toInstant.toEpochMilli)
        case (micros: java.lang.Long, TimestampType) =>
          Right(micros / 1000L)
        case (micros: java.lang.Long, TimestampNTZType) =>
          Right(java.time.LocalDateTime.ofEpochSecond(
              micros / 1000000L, ((micros % 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
            .atZone(zone).toInstant.toEpochMilli)
        case (n: java.lang.Number,
            ByteType | ShortType | IntegerType | LongType) =>
          Left(n.longValue())
        case (s: org.apache.spark.unsafe.types.UTF8String, _) =>
          Right(parseTimeString(s.toString, zone, what))
        case (other, dt) => throw new IllegalArgumentException(
          s"table_changes: $what must be an integer version or a " +
            s"timestamp/date, got $other of type ${dt.sql}")
      }
    }
    val from = bound(exprs(1), "from")
    val to = bound(exprs(2), "to")
    val (wh, t) = GraftSqlParser.resolveRequired(spark,
      GraftSqlParser.parts(table))
    val lake = new GraftLake(spark, wh)
    def resolve(b: Either[Long, Long]): Long =
      b.fold(identity, ts => lake.versionAt(t, ts))
    // the feed plan is fully analyzed already (manifest scans, change-file
    // reads, DV semi-joins) — hand the analyzer the analyzed form so
    // re-resolution is a no-op
    lake.tableChanges(t, resolve(from), resolve(to))
      .queryExecution.analyzed
  }

  /** A string bound is always a TIME (Delta's contract — versions are
    * integer literals): ISO-8601 instant, local `yyyy-MM-dd HH:mm:ss[.f]`
    * or `yyyy-MM-dd`, local forms in the session zone. Digit-only
    * strings are refused with guidance rather than guessed at. */
  private def parseTimeString(raw: String, zone: java.time.ZoneId,
      what: String): Long = {
    val t = raw.trim
    if (t.nonEmpty && t.forall(_.isDigit))
      throw new IllegalArgumentException(
        s"table_changes: $what '$raw' is ambiguous — pass an integer " +
          "literal for a version, or a timestamp/date string " +
          "(e.g. '2026-08-16 10:00:00' or '2026-08-16T10:00:00Z') for a time")
    try java.time.Instant.parse(t).toEpochMilli
    catch { case _: java.time.format.DateTimeParseException =>
      try java.sql.Timestamp.valueOf(t).toLocalDateTime
        .atZone(zone).toInstant.toEpochMilli
      catch { case _: IllegalArgumentException =>
        try java.sql.Date.valueOf(t).toLocalDate
          .atStartOfDay(zone).toInstant.toEpochMilli
        catch { case _: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"table_changes: $what '$raw' is neither an ISO-8601 instant " +
              "nor 'yyyy-MM-dd HH:mm:ss[.f]' nor 'yyyy-MM-dd'")
        }
      }
    }
  }
}
