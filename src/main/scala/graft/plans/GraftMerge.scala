package graft.plans

import graft.catalog.{GraftCatalog, GraftLake, TableMeta}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Makes literal `MERGE INTO graft.t USING src ON ...` SQL execute against
  * graft lake tables (reference DucklakeWriter.java:151-168 — MERGE is the
  * reference's core write; here it becomes user-facing SQL).
  *
  * Spark's own row-level MERGE rewrite (`SupportsRowLevelOperations`) is a
  * group-based copy-on-write: the table scan defines replacement groups and
  * the whole scanned set is rewritten. Routing through the engine instead
  * keeps the *upsert-shaped* merge — the only form the reference emits, and
  * the overwhelmingly common form at ingest — on [[GraftLake.upsert]]'s
  * partition-pruned path (affected-partition discovery via a column-pruned
  * PK probe, staged rewrite of only those partitions). That is strictly
  * less I/O at 100 TB than a COW over the full scan. General-form merges
  * (extra conditions, DELETE actions, NOT MATCHED BY SOURCE, partial
  * update column lists) fall back to an explicit whole-table staged
  * rewrite, with ANSI multi-match detection.
  */
object RewriteGraftMerge extends Rule[LogicalPlan] {

  // `WITH SCHEMA EVOLUTION` merges are accepted too: the graft table
  // advertises AUTOMATIC_SCHEMA_EVOLUTION, so by the time this post-hoc
  // rule sees a resolved plan, Spark's ResolveMergeIntoSchemaEvolution has
  // already routed the source's new/wider columns through
  // GraftCatalog.alterTable (engine evolve path) and patched the target
  // relation — the merge itself then executes against the evolved schema.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable) match {
        case Some((cat, name)) =>
          GraftMergeCommand(cat.warehouseDir, name, m.targetTable, m.sourceTable,
            m.mergeCondition, m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions)
        case None => m
      }
    case d: DeleteFromTable if d.resolved =>
      graftTarget(d.table) match {
        case Some((cat, name)) =>
          GraftDeleteCommand(cat.warehouseDir, name, d.table,
            GraftDml.Shielded(d.condition))
        case None => d
      }
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table) match {
        case Some((cat, name)) =>
          GraftUpdateCommand(cat.warehouseDir, name, u.table,
            GraftDml.ShieldedAssignments(u.assignments),
            u.condition.map(GraftDml.Shielded))
        case None => u
      }
  }

  /** The graft (catalog, table-name) behind a resolved target relation. */
  private def graftTarget(p: LogicalPlan): Option[(GraftCatalog, String)] = p match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation =>
      r.catalog.collect { case c: GraftCatalog =>
        (c, r.identifier.map(_.name).getOrElse(r.table.name))
      }
    case _ => None
  }
}

/** Expands `UPDATE SET *` / `INSERT *` in a MERGE over a graft table into
  * explicit by-name assignments of the table's USER columns. Spark's own
  * star expansion assigns every *target* column from the source — including
  * the engine-managed `_inserted_at` (and `__p_*` partition columns), which
  * sources never carry — so it fails analysis for every graft table. The
  * engine stamps/preserves those system columns on write instead, exactly
  * as it does for an explicit-assignment merge.
  *
  * Injected as a hint-resolution rule: the Hints batch runs before the
  * Resolution batch, which is the only window where the star actions are
  * still visible (ResolveReferences expands-and-throws inside one
  * Resolution iteration, before any extended resolution rule runs). At
  * that point the target is usually still an [[UnresolvedRelation]], so
  * graft-ness is decided by looking the identifier up in the session's
  * catalog manager. */
final case class ExpandGraftMergeStars(spark: SparkSession)
    extends Rule[LogicalPlan] {

  // `WITH SCHEMA EVOLUTION` star merges are left untouched: under the
  // evolution flag Spark's own expansion derives the assignments from the
  // SOURCE's columns (not every target column), so the engine-managed
  // `_inserted_at` is never assigned and no pre-expansion is needed.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case m: MergeIntoTable if hasStar(m) && !m.withSchemaEvolution =>
      (graftUserColumns(m.targetTable), sourceAlias(m.sourceTable)) match {
        case (Some(cols), Some(alias)) =>
          def assigns = cols.map(c => Assignment(
            UnresolvedAttribute(Seq(c)), UnresolvedAttribute(Seq(alias, c))))
          m.copy(
            matchedActions = m.matchedActions.map {
              case UpdateStarAction(cond) => UpdateAction(cond, assigns)
              case a => a
            },
            notMatchedActions = m.notMatchedActions.map {
              case InsertStarAction(cond) => InsertAction(cond, assigns)
              case a => a
            })
        case (Some(_), None) =>
          // Spark's own expansion would assign every target column from the
          // source — including `_inserted_at`, which sources never carry —
          // and fail with an opaque unresolved-column error; say why early
          throw new org.apache.spark.sql.graft.GraftAnalysisException(
            "UPDATE SET * / INSERT * on a graft table requires an aliased " +
              "USING source (e.g. `USING src AS s`); without the alias the " +
              "star cannot be expanded against the table's user columns")
        case _ => m
      }
  }

  private def hasStar(m: MergeIntoTable): Boolean =
    (m.matchedActions ++ m.notMatchedActions).exists {
      case _: UpdateStarAction | _: InsertStarAction => true
      case _ => false
    }

  /** Qualifier for the USING side: its alias when present (`USING src AS
    * s`; subqueries always get one — the parser auto-aliases), else the
    * table name itself for a bare `USING tbl`. None only for plans built
    * programmatically (e.g. `Dataset.mergeInto` with star actions), which
    * get the descriptive error above instead of Spark's opaque
    * `_inserted_at` resolution failure. */
  private def sourceAlias(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case u: UnresolvedRelation => u.multipartIdentifier.lastOption
    case _ => None
  }

  /** User-facing columns of the merge target when it is a graft table
    * (system `_inserted_at` / `__p_*` excluded); None for non-graft. */
  private def graftUserColumns(p: LogicalPlan): Option[Seq[String]] = {
    def user(schema: org.apache.spark.sql.types.StructType) = Some(
      schema.fieldNames.toSeq.filterNot(n =>
        n == "_inserted_at" || n.startsWith("__p_")))
    p match {
      case SubqueryAlias(_, child) => graftUserColumns(child)
      case r: DataSourceV2Relation
          if r.catalog.exists(_.isInstanceOf[GraftCatalog]) =>
        user(r.schema)
      case u: UnresolvedRelation =>
        val mgr = PlanBridge.catalogManager(spark)
        val (catName, tbl) = u.multipartIdentifier match {
          case Seq(t) => (mgr.currentCatalog.name, t)
          case Seq(c, t) => (c, t)
          case _ => return None
        }
        try mgr.catalog(catName) match {
          case g: GraftCatalog =>
            user(g.loadTable(Identifier.of(Array.empty, tbl)).schema())
          case _ => None
        } catch { case _: Exception => None }
      case _ => None
    }
  }
}

/** Eagerly-executed command holding the resolved pieces of a MERGE over a
  * graft table. `target`/`source` are analyzed plans kept out of
  * `children` (leaf command) so the merge rewrite controls their use. */
final case class GraftMergeCommand(
    warehouse: String,
    table: String,
    target: LogicalPlan,
    source: LogicalPlan,
    cond: Expression,
    matched: Seq[MergeAction],
    notMatched: Seq[MergeAction],
    notMatchedBySource: Seq[MergeAction]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(target, source)

  private val InsertedAt = "_inserted_at"

  /** Under change capture, the `_inserted_at` of INSERT-path rows is
    * frozen driver-side: the table write and the change-file write are
    * separate jobs, and each would otherwise evaluate CurrentTimestamp()
    * to its own instant — the feed's postimage must equal the table's
    * row. None (the per-query CurrentTimestamp) when capture is off. */
  @transient private var insertNow: Option[Expression] = None

  override def run(spark: SparkSession): Seq[Row] = {
    val lake = new GraftLake(spark, warehouse)
    val meta = lake.readMeta(table)
    if (meta.cdfEnabled) {
      val now = java.time.Instant.now()
      insertNow = Some(Literal(
        now.getEpochSecond * 1000000L + now.getNano / 1000L, TimestampType))
    }
    (matched ++ notMatched ++ notMatchedBySource).foreach {
      case _: UpdateStarAction | _: InsertStarAction =>
        throw new UnsupportedOperationException(
          "unresolved star action reached the graft merge rewrite")
      case _ => ()
    }
    upsertBatch(meta) match {
      // GraftLake.upsert dedups duplicate source PKs last-wins (by an
      // arbitrary order for a SQL source) — but ANSI MERGE either raises
      // the cardinality error (key present in target) or inserts every
      // unmatched row (key absent). A duplicate-key source must therefore
      // leave the fast path: `upsertIfUniquePks` folds that duplicate
      // check into the upsert's own affected-partition probe (one job
      // answers both — a separate pre-check used to cost a whole action
      // per statement) and REFUSES a duplicate-key source untouched; the
      // general rewrite then reproduces both ANSI outcomes exactly —
      // including persisting duplicate-key INSERTs, because on the
      // general path PKs are advisory, not a uniqueness constraint
      // (README "Capability determinations").
      //
      // The projected source is cached for the whole fast path: the
      // probe's aggregation materializes it, and the upsert's own jobs
      // (affected-partition probe + rewrite) read the cache instead of
      // re-executing the source plan — one source execution per MERGE, so
      // an expensive or nondeterministic source is scanned once and the
      // probe and the upsert observe the SAME data. The footprint is the
      // projected batch (table columns only), spilling to disk if needed.
      case Some(batch) =>
        val src = PlanBridge.ofRows(spark, batch).cache()
        try {
          // `spark.graft.merge.probeFold=false` restores the separate
          // pre-check (A/B lever; the folded probe is the default).
          // Sensor contract: mergeSqlUpsertPath counts APPLIED fast-path
          // merges only — a refused probe's time is general-path cost.
          val t0 = System.nanoTime()
          val applied =
            if (spark.conf.get("spark.graft.merge.probeFold", "true").toBoolean)
              lake.upsertIfUniquePks(table, src)
            else if (!hasDuplicatePks(src, meta.pks)) {
              lake.upsert(table, src)
              true
            } else false
          if (applied)
            graft.metrics.GraftMetrics.op("mergeSqlUpsertPath")
              .record(System.nanoTime() - t0)
          else {
            generalMerge(spark, lake, meta)
            graft.metrics.GraftMetrics.op("mergeSqlGeneralPath")
              .record(System.nanoTime() - t0)
          }
        } finally src.unpersist()
      case _ =>
        graft.metrics.GraftMetrics.time("mergeSqlGeneralPath") {
          generalMerge(spark, lake, meta)
        }
    }
    Seq.empty
  }

  private def hasDuplicatePks(src: org.apache.spark.sql.DataFrame,
      pks: Seq[String]): Boolean =
    src.groupBy(pks.map(n => col(GraftLake.quoted(n))): _*)
      .count().filter(col("count") > 1).limit(1).count() > 0

  /** Opt-in strict-PK enforcement (`spark.graft.merge.strictPks=true`):
    * PKs are ADVISORY on the general merge path — ANSI semantics insert
    * every unmatched source row, duplicate key or not (README "Capability
    * determinations"). Under the flag, a statement that would persist
    * duplicate primary-key rows fails HERE, before any file is staged, so
    * the table is left untouched. `future` is the statement's output for
    * the slice of the table it rewrites; `rest` is the untouched remainder
    * (None when `future` IS the whole post-merge table). The price is one
    * extra execution of the merge plan plus PK-pruned probe scans — paid
    * only when the flag is on. */
  private def assertUniquePks(spark: SparkSession, meta: TableMeta,
      future: org.apache.spark.sql.DataFrame,
      rest: Option[org.apache.spark.sql.DataFrame]): Unit = {
    if (meta.pks.isEmpty ||
      !spark.conf.get("spark.graft.merge.strictPks", "false").toBoolean) return
    def fail(): Nothing = throw new IllegalStateException(
      s"MERGE into '$table': strict-pk mode (spark.graft.merge.strictPks) — " +
        s"the statement would persist duplicate primary-key rows on " +
        s"(${meta.pks.mkString(", ")}). Without the flag, PKs are advisory " +
        "on the general merge path and the duplicates would be inserted.")
    if (hasDuplicatePks(future, meta.pks)) fail()
    val pkCols = meta.pks.map(n => col(GraftLake.quoted(n)))
    rest.foreach { r =>
      if (!future.select(pkCols: _*)
        .join(r.select(pkCols: _*), meta.pks).isEmpty) fail()
    }
  }

  // ---- upsert-shaped fast path ----

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def castTo(e: Expression, dt: DataType): Expression =
    if (PlanBridge.sameType(e.dataType, dt)) e
    else Cast(e, dt, Option(SQLConf.get.sessionLocalTimeZone))

  /** When the merge is exactly the engine upsert — `ON` equates precisely
    * the table's PKs to source expressions, one unconditional
    * matched-UPDATE and one unconditional not-matched-INSERT assign every
    * data column the same source value, and nothing touches system or
    * partition columns — return the equivalent batch plan for
    * [[GraftLake.upsert]]. Otherwise None (general rewrite). */
  private def upsertBatch(meta: TableMeta): Option[LogicalPlan] = {
    if (notMatchedBySource.nonEmpty || meta.pks.isEmpty) return None
    val up = matched match {
      case Seq(UpdateAction(None, as, _)) => as
      case _ => return None
    }
    val ins = notMatched match {
      case Seq(InsertAction(None, as)) => as
      case _ => return None
    }
    val tOut = target.outputSet
    val sOut = source.outputSet
    val eqs = conjuncts(cond).map {
      case EqualTo(l: Attribute, r) if tOut.contains(l) && r.references.subsetOf(sOut) => (l, r)
      case EqualTo(l, r: Attribute) if tOut.contains(r) && l.references.subsetOf(sOut) => (r, l)
      case _ => return None
    }
    val pkMap = eqs.map { case (a, e) => a.name.toLowerCase -> e }.toMap
    if (pkMap.size != eqs.size) return None
    val lowerPks = meta.pks.map(_.toLowerCase).toSet
    if (pkMap.keySet != lowerPks) return None

    def asMap(as: Seq[Assignment]): Option[Map[String, Expression]] = {
      val pairs = as.map {
        case Assignment(k: Attribute, v) if v.references.subsetOf(sOut) =>
          k.name.toLowerCase -> v
        case _ => return None
      }
      if (pairs.map(_._1).distinct.size != pairs.size) None else Some(pairs.toMap)
    }
    val upM = asMap(up).getOrElse(return None)
    val insM = asMap(ins).getOrElse(return None)
    // system/partition/PK columns must not be explicitly updated
    val touched = upM.keySet ++ insM.keySet
    if (touched.exists(k => k == InsertedAt || k.startsWith("__p_"))) return None
    // a PK assignment is allowed only as the no-op `pk = <join key>` —
    // star expansion emits exactly that; anything else rewrites the key
    for (pk <- lowerPks.intersect(upM.keySet))
      if (!upM(pk).semanticEquals(pkMap(pk))) return None
    val upData = upM -- lowerPks
    // inserted PKs must be the join keys themselves
    for (pk <- lowerPks)
      if (!insM.get(pk).exists(_.semanticEquals(pkMap(pk)))) return None

    val dataFields = GraftLake.logicalSchema(meta.schema).fields.toSeq
      .filterNot(f => lowerPks(f.name.toLowerCase) || f.name == InsertedAt)
    // every data column must get the same source value on both paths
    for (f <- dataFields) {
      val u = upData.getOrElse(f.name.toLowerCase, return None)
      val i = insM.getOrElse(f.name.toLowerCase, return None)
      if (!u.semanticEquals(i)) return None
    }
    if (insM.size != lowerPks.size + dataFields.size || upData.size != dataFields.size)
      return None

    val aliases =
      meta.pks.map(pk =>
        Alias(castTo(pkMap(pk.toLowerCase), GraftLake.logicalSchema(meta.schema)(pk).dataType), pk)()) ++
        dataFields.map(f =>
          Alias(castTo(upData(f.name.toLowerCase), f.dataType), f.name)())
    Some(Project(aliases, source))
  }

  // ---- general path: staged copy-on-write rewrite ----

  /** Full MERGE semantics in one full-outer join + projection:
    * matched pairs take the first holding matched action (UPDATE assigns /
    * DELETE drops / none keeps the target row), source-only rows take the
    * first holding NOT MATCHED insert (else vanish), target-only rows take
    * the first holding NOT MATCHED BY SOURCE action (else pass through).
    * `_inserted_at` is preserved on update and stamped on insert unless
    * explicitly assigned. ANSI cardinality: with matched actions present,
    * >1 source match per target row is an error (pre-join aggregate
    * check); with NO matched actions the rewrite switches to semi/anti
    * joins so a multiply-matched target row passes through exactly once
    * instead of fanning out.
    *
    * Scope (100 TB): when the table is partitioned and there is no NOT
    * MATCHED BY SOURCE clause, only the partitions holding matched target
    * rows plus the partitions the inserts land in are rewritten —
    * untouched partitions keep their files. NOT MATCHED BY SOURCE can
    * touch every target row, so that form (and unpartitioned tables)
    * rewrites the whole table. */
  private def generalMerge(spark: SparkSession, lake: GraftLake, meta: TableMeta): Unit = {
    if (matched.isEmpty) { noMatchedActionsMerge(spark, lake, meta); return }

    val partCols = meta.partitionExprs.map(_.outputName)
    def q(n: String) = GraftLake.quoted(n)
    // (scoped target plan, affected dirs, untouched remainder) —
    // None = whole-table rewrite
    val scoping: Option[(LogicalPlan, Seq[String], org.apache.spark.sql.DataFrame)] =
      if (partCols.isEmpty || notMatchedBySource.nonEmpty) None
      else {
        val tdf = PlanBridge.ofRows(spark, target)
        val sdf = PlanBridge.ofRows(spark, source)
        val condCol = PlanBridge.column(cond)
        val matchedParts = tdf.join(sdf, condCol, "left_semi")
          .select(partCols.map(c => col(q(c))): _*).distinct()
        // partitions the kept insert rows will land in
        val keptInserts = sdf.join(tdf, condCol, "left_anti")
          .filter(PlanBridge.column(
            EqualNullSafe(keepOf(notMatched, default = false), Literal(true))))
          .select(GraftLake.logicalSchema(meta.schema).fields.toSeq.map(f => PlanBridge.column(
            valueOf(notMatched, f.name, f.dataType, Literal(null, f.dataType),
              insertPath = true)).as(f.name)): _*)
        val insertParts = lake.withPartitionCols(keptInserts, meta)
          .select(partCols.map(c => col(q(c))): _*).distinct()
        val parts = matchedParts.union(insertParts).distinct().collect()
        if (parts.isEmpty) return // nothing matched, nothing inserts: no-op
        val scope = GraftLake.partitionScope(partCols, parts)
        val scoped = tdf.filter(scope)
        // dirs via the lake's DV-free scan (input_file_name over a
        // DV-masked target plan has two file sources and is rejected)
        Some((PlanBridge.planOf(scoped),
          lake.partitionDirsFor(table, partCols, parts),
          tdf.filter(!scope)))
      }
    val scopedTarget = scoping.map(_._1).getOrElse(target)

    locally {
      val tid = Alias(MonotonicallyIncreasingID(), "__graft_tid")()
      val innerJ = Join(Project(scopedTarget.output :+ tid, scopedTarget), source,
        Inner, Some(cond), JoinHint.NONE)
      val dups = PlanBridge.ofRows(spark, innerJ)
        .groupBy(col("__graft_tid")).count()
        .filter(col("count") > 1).limit(1).count()
      if (dups > 0) throw new IllegalStateException(
        s"MERGE into '$table': a target row matched more than one source row " +
          "(ON condition must identify at most one source row per target row)")
    }

    val tPresent = Alias(Literal(true), "__graft_t_present")()
    val sPresent = Alias(Literal(true), "__graft_s_present")()
    val tProj = Project(scopedTarget.output :+ tPresent, scopedTarget)
    val sProj = Project(source.output :+ sPresent, source)
    val tp = tProj.output.last
    val sp = sProj.output.last
    val joined = Join(tProj, sProj, FullOuter, Some(cond), JoinHint.NONE)

    val matchedP = And(IsNotNull(tp), IsNotNull(sp))
    val sourceOnly = IsNull(tp)

    val tAttrByName = scopedTarget.output.map(a => a.name.toLowerCase -> a).toMap
    val outCols = GraftLake.logicalSchema(meta.schema).fields.toSeq.map { f =>
      val tAttr = tAttrByName.getOrElse(f.name.toLowerCase,
        throw new IllegalStateException(s"target output missing column ${f.name}"))
      val expr = CaseWhen(Seq(
        matchedP -> valueOf(matched, f.name, f.dataType, tAttr, insertPath = false),
        sourceOnly -> valueOf(notMatched, f.name, f.dataType,
          Literal(null, f.dataType), insertPath = true)),
        Some(valueOf(notMatchedBySource, f.name, f.dataType, tAttr, insertPath = false)))
      Alias(expr, f.name)()
    }
    val keep = CaseWhen(Seq(
      matchedP -> keepOf(matched, default = true),
      sourceOnly -> keepOf(notMatched, default = false)),
      Some(keepOf(notMatchedBySource, default = true)))

    val outPlan = Project(outCols, Filter(EqualNullSafe(keep, Literal(true)), joined))
    val result = PlanBridge.ofRows(spark, outPlan)
    assertUniquePks(spark, meta, result, scoping.map(_._3))
    // write-time change capture (CDF-enabled tables): the SAME full-outer
    // join classifies every row by its first applicable action — update
    // rows explode into preimage/postimage pairs (old side = target
    // attributes, null-padded on the insert side by the join itself),
    // delete rows carry their old values, insert rows their new ones.
    // One change-sized write; rows no action fires on emit nothing.
    val changes: Option[org.apache.spark.sql.DataFrame] =
      if (!meta.cdfEnabled) None
      else {
        def clsOf(actions: Seq[MergeAction]): Expression = {
          val branches = actions.map {
            case d: DeleteAction => condOf(d) -> Literal("delete")
            case u: UpdateAction => condOf(u) -> Literal("update")
            case i: InsertAction => condOf(i) -> Literal("insert")
            case a => throw new UnsupportedOperationException(
              s"MERGE into '$table': unsupported action $a")
          }
          if (branches.isEmpty) Literal("none")
          else CaseWhen(branches, Some(Literal("none")))
        }
        val cls = CaseWhen(Seq(
          matchedP -> clsOf(matched),
          sourceOnly -> clsOf(notMatched)),
          Some(clsOf(notMatchedBySource)))
        val fields = GraftLake.logicalSchema(meta.schema).fields.toSeq
        def tAttrOf(f: org.apache.spark.sql.types.StructField): Attribute =
          tAttrByName.getOrElse(f.name.toLowerCase,
            throw new IllegalStateException(
              s"target output missing column ${f.name}"))
        val chgProj = Project(
          fields.map(f =>
            Alias(tAttrOf(f), s"__graft_old_${f.name}")()) ++
          fields.map { f =>
            val expr = CaseWhen(Seq(
              matchedP -> valueOf(matched, f.name, f.dataType, tAttrOf(f),
                insertPath = false),
              sourceOnly -> valueOf(notMatched, f.name, f.dataType,
                Literal(null, f.dataType), insertPath = true)),
              Some(valueOf(notMatchedBySource, f.name, f.dataType, tAttrOf(f),
                insertPath = false)))
            Alias(expr, s"__graft_new_${f.name}")()
          } :+ Alias(cls, "__graft_cls")(), joined)
        val cdf = PlanBridge.ofRows(spark, chgProj)
        val ctCol = GraftLake.ChangeTypeCol
        def proj(prefix: String) = fields.map(f =>
          col(GraftLake.quoted(s"__graft_${prefix}_${f.name}")).as(f.name))
        val clsC = col("__graft_cls")
        val pre = cdf.filter(clsC === "update").select(proj("old"): _*)
          .withColumn(ctCol, lit("update_preimage"))
        val post = cdf.filter(clsC === "update").select(proj("new"): _*)
          .withColumn(ctCol, lit("update_postimage"))
        val del = cdf.filter(clsC === "delete").select(proj("old"): _*)
          .withColumn(ctCol, lit("delete"))
        val ins = cdf.filter(clsC === "insert").select(proj("new"): _*)
          .withColumn(ctCol, lit("insert"))
        Some(pre.unionByName(post).unionByName(del).unionByName(ins))
      }
    scoping match {
      case Some((_, dirs, _)) =>
        lake.replaceScoped(table, result, dirs, changes = changes)
      case None => lake.overwriteContents(table, result, changes = changes)
    }
  }

  /** MERGE with no WHEN MATCHED clauses: matched target rows pass through
    * unchanged, and they must do so exactly ONCE even when several source
    * rows match (a full-outer fanout would duplicate them, and the ANSI
    * cardinality error does not apply when no matched action fires).
    *
    * Without NOT MATCHED BY SOURCE the statement is insert-only — no
    * target row changes at all, so it lands as a plain APPEND of the
    * unmatched source rows (no rewrite of any existing file, the cheapest
    * possible plan at scale). With NOT MATCHED BY SOURCE the target side
    * is rewritten via semi/anti joins. */
  private def noMatchedActionsMerge(spark: SparkSession, lake: GraftLake,
      meta: TableMeta): Unit = {
    val sourceOnlyS = Join(source, target, LeftAnti, Some(cond), JoinHint.NONE)
    val inserts = Project(
      GraftLake.logicalSchema(meta.schema).fields.toSeq.map(f => Alias(valueOf(notMatched, f.name,
        f.dataType, Literal(null, f.dataType), insertPath = true), f.name)()),
      Filter(EqualNullSafe(keepOf(notMatched, default = false),
        Literal(true)), sourceOnlyS))

    if (notMatchedBySource.isEmpty) {
      val df = PlanBridge.ofRows(spark, inserts)
      if (!df.isEmpty) {
        // insert-only append: the rest of the table is the WHOLE table
        assertUniquePks(spark, meta, df, Some(lake.read(table)))
        lake.appendPrepared(table, df)
      }
      return
    }

    val matchedT = Join(target, source, LeftSemi, Some(cond), JoinHint.NONE)
    val unmatchedT = Join(target, source, LeftAnti, Some(cond), JoinHint.NONE)

    val tAttrByName = target.output.map(a => a.name.toLowerCase -> a).toMap
    def tAttr(f: org.apache.spark.sql.types.StructField): Attribute =
      tAttrByName.getOrElse(f.name.toLowerCase,
        throw new IllegalStateException(s"target output missing column ${f.name}"))

    val passThrough = Project(
      GraftLake.logicalSchema(meta.schema).fields.toSeq.map(f => Alias(tAttr(f), f.name)()), matchedT)
    val nmbsApplied = Project(
      GraftLake.logicalSchema(meta.schema).fields.toSeq.map(f => Alias(valueOf(notMatchedBySource,
        f.name, f.dataType, tAttr(f), insertPath = false), f.name)()),
      Filter(EqualNullSafe(keepOf(notMatchedBySource, default = true),
        Literal(true)), unmatchedT))

    val union = Union(Seq(passThrough, nmbsApplied, inserts))
    val result = PlanBridge.ofRows(spark, union)
    assertUniquePks(spark, meta, result, None)
    // write-time change capture: unmatched-by-source rows classify by
    // their first applicable NMBS action; kept inserts are the third leg
    val changes: Option[org.apache.spark.sql.DataFrame] =
      if (!meta.cdfEnabled) None
      else {
        val fields = GraftLake.logicalSchema(meta.schema).fields.toSeq
        val cls = {
          val branches = notMatchedBySource.map {
            case d: DeleteAction => condOf(d) -> Literal("delete")
            case u: UpdateAction => condOf(u) -> Literal("update")
            case a => throw new UnsupportedOperationException(
              s"MERGE into '$table': unsupported NMBS action $a")
          }
          if (branches.isEmpty) Literal("none")
          else CaseWhen(branches, Some(Literal("none")))
        }
        val chgProj = Project(
          fields.map(f => Alias(tAttr(f), s"__graft_old_${f.name}")()) ++
          fields.map(f => Alias(valueOf(notMatchedBySource, f.name,
            f.dataType, tAttr(f), insertPath = false),
            s"__graft_new_${f.name}")()) :+
          Alias(cls, "__graft_cls")(), unmatchedT)
        val cdf = PlanBridge.ofRows(spark, chgProj)
        val ctCol = GraftLake.ChangeTypeCol
        def proj(prefix: String) = fields.map(f =>
          col(GraftLake.quoted(s"__graft_${prefix}_${f.name}")).as(f.name))
        val clsC = col("__graft_cls")
        val pre = cdf.filter(clsC === "update").select(proj("old"): _*)
          .withColumn(ctCol, lit("update_preimage"))
        val post = cdf.filter(clsC === "update").select(proj("new"): _*)
          .withColumn(ctCol, lit("update_postimage"))
        val del = cdf.filter(clsC === "delete").select(proj("old"): _*)
          .withColumn(ctCol, lit("delete"))
        val ins = PlanBridge.ofRows(spark, inserts)
          .withColumn(ctCol, lit("insert"))
        Some(pre.unionByName(post).unionByName(del).unionByName(ins))
      }
    lake.overwriteContents(table, result, changes = changes)
  }

  // ---- shared action application ----

  private def condOf(a: MergeAction): Expression =
    a.condition.getOrElse(Literal.TrueLiteral)

  /** Whether the row survives the first applicable action (DELETE drops). */
  private def keepOf(actions: Seq[MergeAction], default: Boolean): Expression = {
    val branches = actions.map {
      case d: DeleteAction => condOf(d) -> Literal(false)
      case a => condOf(a) -> Literal(true)
    }
    if (branches.isEmpty) Literal(default)
    else CaseWhen(branches, Some(Literal(default)))
  }

  private def assigned(as: Seq[Assignment], name: String): Option[Expression] =
    as.collectFirst {
      case Assignment(k: Attribute, v) if k.name.equalsIgnoreCase(name) => v
      case Assignment(k, _) if !k.isInstanceOf[Attribute] =>
        throw new UnsupportedOperationException(
          s"MERGE into '$table': nested-field assignment '${k.sql}' is not supported")
    }

  /** Column value under the first applicable action. */
  private def valueOf(actions: Seq[MergeAction], name: String, dt: DataType,
      fallback: Expression, insertPath: Boolean): Expression = {
    def insertDefault: Expression =
      if (name == InsertedAt) insertNow.getOrElse(
        Cast(CurrentTimestamp(), TimestampType,
          Option(SQLConf.get.sessionLocalTimeZone)))
      else Literal(null, dt)
    val branches = actions.map {
      case UpdateAction(c, as, _) =>
        c.getOrElse(Literal.TrueLiteral) ->
          assigned(as, name).map(castTo(_, dt)).getOrElse(fallback)
      case InsertAction(c, as) =>
        c.getOrElse(Literal.TrueLiteral) ->
          assigned(as, name).map(castTo(_, dt)).getOrElse(insertDefault)
      case d: DeleteAction =>
        condOf(d) -> fallback // dropped by keep expr; value irrelevant
      case a => throw new UnsupportedOperationException(
        s"MERGE into '$table': unsupported action $a")
    }
    val default = if (insertPath) Literal(null, dt) else fallback
    if (branches.isEmpty) default else CaseWhen(branches, Some(default))
  }
}
