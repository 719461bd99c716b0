package graft.plans

import graft.catalog.{GraftCatalog, GraftLake}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** Delta-parity ADMIN SQL for graft tables, injected as a thin parser
  * delegate wrapper (the same mechanism Delta Lake uses for its extra
  * statements). Three statements Spark's grammar lacks are matched by
  * anchored regexes; everything else passes through to Spark's parser
  * verbatim:
  *
  *   RESTORE TABLE <cat>.<t> [TO] VERSION AS OF <n>   — [[GraftLake.restore]]
  *   VACUUM <cat>.<t> KEEP <n> SNAPSHOTS              — [[GraftLake.expireSnapshots]]
  *   OPTIMIZE <cat>.<t> [WHERE p] [ZORDER BY (c1, …)] — [[GraftLake.compact]]
  *   OPTIMIZE <cat>.<t> REBUCKET TO <n>               — [[GraftLake.rebucket]]
  *   ALTER TABLE <cat>.<t> SET PARTITIONED BY (specs) — [[GraftLake.evolvePartitions]]
  *
  * The table must be qualified with a catalog registered as a
  * [[GraftCatalog]]; resolution happens at run time through the session's
  * CatalogManager, so the statements follow catalog config like every
  * other graft command. */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseAdmin(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  private val Restore =
    """(?is)^\s*RESTORE\s+TABLE\s+([\w.`]+)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val Vacuum =
    """(?is)^\s*VACUUM\s+([\w.`]+)\s+KEEP\s+(\d+)\s+SNAPSHOTS\s*;?\s*$""".r
  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+([\w.`]+)(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val Rebucket =
    """(?is)^\s*OPTIMIZE\s+([\w.`]+)\s+REBUCKET\s+TO\s+(\d+)\s*;?\s*$""".r
  private val DescribeHistory =
    """(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+([\w.`]+)\s*;?\s*$""".r
  private val DescribeDetail =
    """(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+([\w.`]+)\s*;?\s*$""".r
  private val DescribePartitions =
    """(?is)^\s*DESC(?:RIBE)?\s+PARTITIONS\s+([\w.`]+)\s*;?\s*$""".r
  private val CreateBloom =
    """(?is)^\s*CREATE\s+BLOOM\s+INDEX\s+ON\s+([\w.`]+)\s*\(\s*([\w`]+)\s*\)(?:\s+OPTIONS\s*\(\s*items\s*=\s*(\d+)\s*,\s*fpp\s*=\s*([0-9.eE+-]+)\s*\))?\s*;?\s*$""".r
  private val RefreshBloom =
    """(?is)^\s*REFRESH\s+BLOOM\s+INDEX(?:ES)?\s+ON\s+([\w.`]+)\s*;?\s*$""".r
  private val ShowMetrics =
    """(?is)^\s*SHOW\s+GRAFT\s+METRICS\s*;?\s*$""".r
  private val CloneTable =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.`]+)\s+(SHALLOW\s+)?CLONE\s+([\w.`]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""".r
  private val ReplaceTable =
    """(?is)^\s*REPLACE\s+TABLE\s+([\w.`]+)\s+PARTITIONED\s+BY\s*\((.*?)\)(?:\s+AS\s+(.+?))?\s*;?\s*$""".r
  private val SetPartitioning =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+SET\s+PARTITIONED\s+BY\s*\((.*)\)\s*;?\s*$""".r
  private val AddConstraint =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+CONSTRAINT\s+([\w`]+)\s+CHECK\s*\((.*)\)\s*;?\s*$""".r
  private val DropConstraint =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+CONSTRAINT\s+([\w`]+)\s*;?\s*$""".r

  private[plans] def parts(ident: String): Seq[String] =
    ident.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))

  def parseAdmin(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Restore(ident, v) =>
      Some(GraftRestoreCommand(parts(ident), v.toLong, sqlText))
    case Vacuum(ident, n) =>
      Some(GraftVacuumCommand(parts(ident), n.toInt, sqlText))
    case Rebucket(ident, n) =>
      Some(GraftRebucketCommand(parts(ident), n.toInt, sqlText))
    case Optimize(ident, where, cols) =>
      val zorder = Option(cols).toSeq.flatMap(_.split(',')).map(_.trim)
        .filter(_.nonEmpty).map(_.stripPrefix("`").stripSuffix("`"))
      Some(GraftOptimizeCommand(parts(ident), zorder,
        Option(where).map(_.trim).filter(_.nonEmpty), sqlText))
    case DescribeHistory(ident) =>
      Some(GraftDescribeHistoryCommand(parts(ident), sqlText))
    case DescribeDetail(ident) =>
      Some(GraftDescribeDetailCommand(parts(ident), sqlText))
    case DescribePartitions(ident) =>
      Some(GraftDescribePartitionsCommand(parts(ident), sqlText))
    case CreateBloom(ident, column, items, fpp) =>
      Some(GraftCreateBloomIndexCommand(parts(ident),
        column.stripPrefix("`").stripSuffix("`"),
        Option(items).map(_.toLong).getOrElse(1000000L),
        Option(fpp).map(_.toDouble).getOrElse(0.01), sqlText))
    case RefreshBloom(ident) =>
      Some(GraftRefreshBloomCommand(parts(ident), sqlText))
    case ShowMetrics() => Some(GraftShowMetricsCommand())
    case CloneTable(dst, shallow, src, v) =>
      Some(GraftCloneCommand(parts(dst), parts(src),
        Option(v).map(_.toLong), sqlText, shallow = shallow != null))
    case ReplaceTable(ident, specs, select) =>
      Some(GraftReplaceTableCommand(parts(ident),
        graft.catalog.PartitionExpr.splitSpecs(specs),
        Option(select).map(_.trim).filter(_.nonEmpty), sqlText))
    case SetPartitioning(ident, specs) =>
      Some(GraftSetPartitioningCommand(parts(ident),
        graft.catalog.PartitionExpr.splitSpecs(specs), sqlText))
    case AddConstraint(ident, cname, check) =>
      Some(GraftAddConstraintCommand(parts(ident),
        cname.stripPrefix("`").stripSuffix("`"), check.trim, sqlText))
    case DropConstraint(ident, cname) =>
      Some(GraftDropConstraintCommand(parts(ident),
        cname.stripPrefix("`").stripSuffix("`"), sqlText))
    case _ => None
  }

  /** (warehouse, table) when `ident` names a graft table — resolved
    * through the session's CatalogManager at RUN time. A single-part
    * identifier resolves against the session's CURRENT catalog (so `USE
    * <graft-catalog>` makes unqualified OPTIMIZE/RESTORE/… work). None
    * when the identifier names an unknown catalog or resolves to a
    * NON-graft catalog: the statement then belongs to whoever else
    * handles it, and the command re-parses through Spark's NATIVE parser
    * instead of failing (the anchored regexes intercept session-wide, and
    * e.g. `ALTER TABLE … ADD CONSTRAINT` is also valid Spark grammar
    * against other DSv2 catalogs — interception must not eat it). */
  private[plans] def resolve(spark: SparkSession,
      ident: Seq[String]): Option[(String, String)] =
    ident.size match {
      case 1 =>
        // unqualified: graft behavior iff the session's CURRENT catalog is
        // a graft catalog (`USE <graft-catalog>` followed by `OPTIMIZE t`
        // must hit graft, not fall through to a generic Spark
        // ParseException for a statement Spark's grammar lacks)
        spark.sessionState.catalogManager.currentCatalog match {
          case g: GraftCatalog => Some((g.warehouseDir, ident.head))
          case _ => None
        }
      case 2 =>
        try {
          spark.sessionState.catalogManager.catalog(ident.head) match {
            case g: GraftCatalog => Some((g.warehouseDir, ident(1)))
            case _ => None
          }
        } catch { case _: org.apache.spark.sql.connector.catalog
            .CatalogNotFoundException => None }
      case _ => None
    }

  /** Fall-through half of [[resolve]]: run the intercepted statement
    * under Spark's OWN grammar — a fresh [[org.apache.spark.sql.execution
    * .SparkSqlParser]], NOT the session parser (which is this wrapper —
    * re-entering it would intercept the same text forever). Statements
    * Spark's grammar lacks (RESTORE/OPTIMIZE/VACUUM-KEEP/…) surface
    * Spark's native ParseException, which is the correct non-graft
    * behavior too. */
  private[plans] def delegateRun(spark: SparkSession,
      sqlText: String): Seq[Row] = {
    val plan = new org.apache.spark.sql.execution.SparkSqlParser()
      .parsePlan(sqlText)
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark, plan)
      .collect().toSeq
  }

  /** The shared run body of every ZERO-OUTPUT intercepted command: graft
    * behavior when the target resolves to a graft catalog, otherwise the
    * statement runs under Spark's native grammar (any delegated rows are
    * discarded — these statement shapes return none natively, and the
    * command's declared empty output could not convert them anyway). One
    * seam for the delegation contract instead of ten copies. */
  private[plans] def runOrDelegate(spark: SparkSession, ident: Seq[String],
      sql: String)(graftRun: (String, String) => Unit): Seq[Row] =
    resolve(spark, ident) match {
      case Some((wh, t)) => graftRun(wh, t); Seq.empty
      case None => delegateRun(spark, sql); Seq.empty
    }

  /** OUTPUT-CARRYING graft-only statements (DESCRIBE HISTORY/DETAIL/
    * PARTITIONS, REFRESH BLOOM INDEX) never delegate: Spark's grammar
    * would reinterpret the same text as `DESCRIBE <table> <column>` — a
    * semantically different statement whose result shape the command's
    * declared output schema cannot convert (a crash, or worse, a wrong
    * answer). They keep an explicit resolution error instead. */
  private[plans] def resolveRequired(spark: SparkSession,
      ident: Seq[String]): (String, String) =
    resolve(spark, ident).getOrElse(throw new IllegalArgumentException(
      s"'${ident.mkString(".")}' is not a <graft-catalog>.<table>-qualified " +
        "graft table — this statement exists only for graft tables"))
}

/** `REPLACE TABLE t PARTITIONED BY (…) [AS SELECT …]` — the guided
  * DEPTH-CHANGE rebuild ([[graft.catalog.GraftLake.rebuildPartitioned]]):
  * unlike CTAS it carries primary keys, CHECK constraints and table
  * properties forward and keeps the table's snapshot history. Without
  * AS SELECT the rebuild is content-preserving (a logical no-op to the
  * change feed); with it, the replace lands under the new layout with
  * the full replace semantics (PK dedup, cdf derived capture). For
  * NON-graft catalogs the statement delegates to Spark's native
  * REPLACE TABLE grammar untouched. */
final case class GraftReplaceTableCommand(ident: Seq[String],
    specs: Seq[String], select: Option[String], sql: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).rebuildPartitioned(t, specs,
        select.map(sel => spark.sql(sel)))
    }
}

/** `RESTORE TABLE t [TO] VERSION AS OF n` — roll the table back (or
  * forward) to snapshot `n` as a new commit, zero bytes copied. */
final case class GraftRestoreCommand(ident: Seq[String], version: Long,
    sql: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).restore(t, version)
    }
}

/** `VACUUM t KEEP n SNAPSHOTS` — retention-bounded snapshot expiry +
  * unreferenced-file vacuum (keepLast semantics rather than Delta's
  * RETAIN-hours: manifests are wall-clock-free by design). */
final case class GraftVacuumCommand(ident: Seq[String], keepLast: Int,
    sql: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).expireSnapshots(t, keepLast)
    }
}

/** `CREATE BLOOM INDEX ON t (col) [OPTIONS (items=N, fpp=F)]` — one-pass
  * per-file bloom skipping index build ([[GraftLake.buildBloomIndex]]). */
final case class GraftCreateBloomIndexCommand(ident: Seq[String],
    column: String, items: Long, fpp: Double,
    sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).buildBloomIndex(t, column, items, fpp)
    }
}

/** `REFRESH BLOOM INDEX ON t` — incremental extension covering only the
  * files no sidecar has yet ([[GraftLake.refreshBloomIndexes]]); returns
  * (column, files_indexed) rows. */
final case class GraftRefreshBloomCommand(ident: Seq[String], sql: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("files_indexed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (wh, t) = GraftSqlParser.resolveRequired(spark, ident)
    new GraftLake(spark, wh).refreshBloomIndexes(t)
      .toSeq.sortBy(_._1).map { case (c, n) => Row(c, n) }
  }
}

/** `DESCRIBE HISTORY t` — the commit log as a result set: one row per
  * snapshot with operation label, commit time, add/remove deltas, live
  * file and column counts (bounded by the retained version count). */
final case class GraftDescribeHistoryCommand(ident: Seq[String], sql: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("ts", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)(),
    AttributeReference("n_live_files", LongType, nullable = false)(),
    AttributeReference("n_columns", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (wh, t) = GraftSqlParser.resolveRequired(spark, ident)
    new GraftLake(spark, wh).history(t).collect().toSeq
  }
}

/** `OPTIMIZE t [ZORDER BY (c1, ...)]` — compaction, optionally Z-order
  * clustered for multi-column data skipping. */
final case class GraftOptimizeCommand(ident: Seq[String],
    zorderCols: Seq[String], where: Option[String],
    sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      // WHERE scopes the rewrite to the matched PARTITIONS (Delta's
      // OPTIMIZE ... WHERE): at 100 TB one compacts yesterday's
      // partition, never the table. On an UNPARTITIONED table there is
      // no scoping unit — any non-empty match would silently rewrite the
      // whole table, the exact accident the clause exists to prevent —
      // so it is refused (Delta errors on this shape too)
      val lake = new GraftLake(spark, wh)
      if (where.isDefined)
        require(lake.readMeta(t).partitionExprs.nonEmpty,
          s"OPTIMIZE ... WHERE needs a PARTITIONED table: '$t' has no " +
            "partitions, so the predicate could not scope the rewrite — " +
            "run OPTIMIZE without WHERE to compact the whole table")
      lake.compact(t,
        predicate = where.map(w => org.apache.spark.sql.functions.expr(w)),
        clusterBy = zorderCols)
    }
}

/** `OPTIMIZE t REBUCKET TO n` — online re-bucketing: rewrite the table
  * into a `bucket(n, …)` layout, lock-free against concurrent appends
  * (the layout is versioned in the manifest; see [[GraftLake.rebucket]]).
  * The knob behind the 100 TB layout policy: fix the bucket SIZE, grow
  * the bucket COUNT as the table grows. */
final case class GraftRebucketCommand(ident: Seq[String], n: Int,
    sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).rebucket(t, n)
    }
}

/** `ALTER TABLE t SET PARTITIONED BY (year(ts), bucket(8, id), …)` —
  * ONLINE partition-layout evolution ([[GraftLake.evolvePartitions]]):
  * flip + per-directory-group migration, completes under live writers;
  * same-depth specs only (file/DV keys are path-depth-derived). */
final case class GraftSetPartitioningCommand(ident: Seq[String],
    specs: Seq[String], sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).evolvePartitions(t, specs)
    }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — validates existing
  * rows, then every write enforces the check inside its own job
  * ([[GraftLake.addConstraint]]). */
final case class GraftAddConstraintCommand(ident: Seq[String],
    constraintName: String, check: String,
    sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).addConstraint(t, constraintName, check)
    }
}

/** `ALTER TABLE t DROP CONSTRAINT name` — metadata-only. */
final case class GraftDropConstraintCommand(ident: Seq[String],
    constraintName: String, sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, ident, sql) { (wh, t) =>
      new GraftLake(spark, wh).dropConstraint(t, constraintName)
    }
}

/** `DESCRIBE DETAIL t` — one-row admin summary: snapshot span, live
  * files/bytes, column/partition/PK/constraint surfaces, bloom indexes,
  * live DV entries, renamed columns ([[GraftLake.detail]], metadata
  * only). */
final case class GraftDescribeDetailCommand(ident: Seq[String], sql: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("n_versions", LongType, nullable = false)(),
    AttributeReference("latest_version", LongType, nullable = false)(),
    AttributeReference("n_live_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("total_bytes", LongType, nullable = false)(),
    AttributeReference("n_columns", LongType, nullable = false)(),
    AttributeReference("partition_exprs", StringType, nullable = false)(),
    AttributeReference("primary_keys", StringType, nullable = false)(),
    AttributeReference("constraints", StringType, nullable = false)(),
    AttributeReference("bloom_indexed", StringType, nullable = false)(),
    AttributeReference("n_dv_entries", LongType, nullable = false)(),
    AttributeReference("renamed_columns", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (wh, t) = GraftSqlParser.resolveRequired(spark, ident)
    new GraftLake(spark, wh).detail(t).collect().toSeq
  }
}

/** `DESCRIBE PARTITIONS t` — per-partition live file count, exact row
  * count and bytes, from manifest metadata ([[GraftLake.partitionStats]]).
  */
final case class GraftDescribePartitionsCommand(ident: Seq[String], sql: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("total_bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (wh, t) = GraftSqlParser.resolveRequired(spark, ident)
    new GraftLake(spark, wh).partitionStats(t).collect().toSeq
  }
}

/** `CREATE TABLE <cat>.<dst> CLONE <cat>.<src> [VERSION AS OF n]` — deep
  * clone of a snapshot as an independent table
  * ([[GraftLake.cloneTable]]: distributed file copy, stats carried, DVs
  * included, no reference back into the source). Both tables must live
  * in the SAME graft catalog — a cross-warehouse clone would silently
  * change storage placement. */
final case class GraftCloneCommand(dst: Seq[String], src: Seq[String],
    version: Option[Long], sql: String,
    shallow: Boolean = false) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.runOrDelegate(spark, dst, sql) { (wh, dstT) =>
      val (srcWh, srcT) = GraftSqlParser.resolveRequired(spark, src)
      require(srcWh == wh,
        s"CLONE source '${src.mkString(".")}' and target " +
          s"'${dst.mkString(".")}' must live in the same graft catalog")
      val lake = new GraftLake(spark, wh)
      if (shallow) lake.shallowClone(srcT, dstT, version)
      else lake.cloneTable(srcT, dstT, version)
    }
}

/** `SHOW GRAFT METRICS` — the engine's op sensors (reference §2.9,
  * DucklakeMetrics' JMX surface) as a result set: one row per recorded
  * operation with invocation count and total/avg/max latency. The
  * "GRAFT" keyword makes the shape collision-free: plain `SHOW METRICS`
  * or `DESCRIBE metrics` could be a statement about a table named
  * metrics, which interception must never eat. */
final case class GraftShowMetricsCommand() extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("n", LongType, nullable = false)(),
    AttributeReference("total_ms", DoubleType, nullable = false)(),
    AttributeReference("avg_ms", DoubleType, nullable = false)(),
    AttributeReference("max_ms", DoubleType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.metrics.GraftMetrics.totalsMs().toSeq.sortBy(_._1).map {
      case (op, (n, totalMs)) =>
        val st = graft.metrics.GraftMetrics.op(op)
        Row(op, n, totalMs, if (n == 0) 0.0 else totalMs / n, st.maxMs)
    }
}
