package graft.catalog

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table metadata persisted alongside the data (the engine's schema
  * registry). The registry — not the parquet footers — is the source of
  * truth for column types, which is what makes in-place type *widening*
  * possible on an immutable file format: the logical type widens in the
  * registry and Spark 4's parquet reader performs the widened read
  * (int32 files under an int64 logical column, float under double).
  */
final case class TableMeta(
    schema: StructType,
    partitions: Seq[String],
    pks: Seq[String]) {
  def partitionExprs: Seq[PartitionExpr] = PartitionExpr.parseList(partitions)
}

/** A minimal lakehouse table manager + writer: auto-create, schema
  * evolution (ADD COLUMN + type widening + incompatibility rejection),
  * expression partitioning, PK upsert with MERGE semantics, and the
  * `_inserted_at` system column.
  *
  * Reference behavior reproduced (SURVEY §2.5-2.6):
  *  - ensureTable: exists-check with engine-side caches and per-table
  *    locking; create-or-evolve; returns pre-existence which drives
  *    upsert-vs-append (DucklakeTableManager.java:91-179);
  *  - `_inserted_at TIMESTAMP` injected into every table, set at insert
  *    time, never modified by a merge-update (DucklakeWriter.java:146-148,
  *    205-214);
  *  - upsert = per-batch PK dedup (last wins) + MERGE INTO rewrite
  *    (DucklakeWriter.java:98-187); executed only when the table
  *    pre-existed AND PKs are configured, else plain append
  *    (DucklakeWriter.java:89-95);
  *  - nested types land as JSON strings ([[LandedTypes]]).
  *
  * Scale design (100 TB): the merge rewrite never touches the whole table —
  * affected partitions are discovered with a column-pruned scan of (pk,
  * partition) columns semi-joined against the batch keys, and only those
  * partitions are rewritten via staged write + directory swap. Unpartitioned
  * tables degrade to full rewrite (documented; partition your 100 TB
  * tables). All joins/dedups are shuffle-on-PK; the batch side of the
  * `_inserted_at` resolution join is the (small) incoming batch.
  */
final class GraftLake(spark: SparkSession, warehouse: String) {
  import GraftLake._

  val InsertedAtCol = "_inserted_at"

  private def tableDir(name: String) = s"$warehouse/$name"
  private def dataDir(name: String) = s"$warehouse/$name/data"
  private def metaPath(name: String) = new Path(s"$warehouse/$name/_graft_meta.json")

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- metadata registry ----

  def tableExists(name: String): Boolean = {
    val cacheKey = s"$warehouse/$name"
    if (verifiedTables.containsKey(cacheKey)) true
    else {
      val exists = fs(metaPath(name)).exists(metaPath(name))
      if (exists) verifiedTables.put(cacheKey, java.lang.Boolean.TRUE)
      exists
    }
  }

  def readMeta(name: String): TableMeta = {
    val cacheKey = s"$warehouse/$name"
    val cached = metaCache.get(cacheKey)
    if (cached != null) return cached
    val p = metaPath(name)
    val in = fs(p).open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val meta = parseMeta(raw)
    metaCache.put(cacheKey, meta)
    meta
  }

  private def writeMeta(name: String, meta: TableMeta): Unit = {
    val p = metaPath(name)
    val f = fs(p)
    val tmp = new Path(p.getParent, s".meta-${UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(renderMeta(meta).getBytes("UTF-8")) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    f.rename(tmp, p)
    metaCache.put(s"$warehouse/$name", meta)
    verifiedTables.put(s"$warehouse/$name", java.lang.Boolean.TRUE)
  }

  /** Names of all tables in this warehouse (dirs with a meta sidecar). */
  def listTables(): Seq[String] = {
    val root = new Path(warehouse)
    val f = fs(root)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        f.exists(new Path(s.getPath, "_graft_meta.json")))
      .map(_.getPath.getName).sorted
  }

  def dropTable(name: String): Unit = {
    val dir = new Path(tableDir(name))
    fs(dir).delete(dir, true)
    metaCache.remove(s"$warehouse/$name")
    verifiedTables.remove(s"$warehouse/$name")
  }

  // ---- DDL ----

  /** Create a table from a batch schema: landed types + `_inserted_at`. */
  def createTable(
      name: String,
      batchSchema: StructType,
      partitions: Seq[String] = Nil,
      pks: Seq[String] = Nil): TableMeta = {
    val landed = LandedTypes.landedSchema(batchSchema)
    val schema = StructType(
      landed.fields.toSeq :+ StructField(InsertedAtCol, TimestampType, nullable = true))
    partitions.foreach(PartitionExpr.parse) // validate specs eagerly
    val meta = TableMeta(schema, partitions, pks)
    val dd = new Path(dataDir(name))
    fs(dd).mkdirs(dd)
    writeMeta(name, meta)
    meta
  }

  /** Exists-check → create or evolve, under a per-table lock; returns
    * (meta, preExisted). Pre-existence drives upsert-vs-append. */
  def ensureTable(
      name: String,
      batchSchema: StructType,
      partitions: Seq[String] = Nil,
      pks: Seq[String] = Nil): (TableMeta, Boolean) = {
    val lock = tableLocks.computeIfAbsent(s"$warehouse/$name", _ => new Object)
    lock.synchronized {
      if (!tableExists(name))
        (graft.metrics.GraftMetrics.time(graft.metrics.GraftMetrics.CreateTable) {
          createTable(name, batchSchema, partitions, pks)
        }, false)
      else {
        val meta = readMeta(name)
        val incoming = LandedTypes.landedSchema(batchSchema)
        val evolved = LandedTypes.evolve(
          StructType(meta.schema.filterNot(_.name == InsertedAtCol)), incoming)
        val withSys = StructType(
          evolved.fields.toSeq :+ meta.schema(InsertedAtCol))
        // a PK config arriving after auto-creation is adopted (the
        // reference keeps id-columns in connector config, not the table)
        val adoptedPks = if (meta.pks.isEmpty && pks.nonEmpty) pks else meta.pks
        val newMeta = meta.copy(schema = withSys, pks = adoptedPks)
        if (newMeta.pks != meta.pks && newMeta.schema == meta.schema)
          writeMeta(name, newMeta)
        if (newMeta.schema != meta.schema)
          graft.metrics.GraftMetrics.time(graft.metrics.GraftMetrics.EvolveSchema) {
            writeMeta(name, newMeta)
          }
        (newMeta, true)
      }
    }
  }

  // ---- read ----

  private def partitionFields(meta: TableMeta): Seq[StructField] =
    GraftLake.partitionFields(meta)

  /** Full on-disk view incl. generated partition columns. */
  private def readInternal(name: String, meta: TableMeta): DataFrame = {
    val dd = new Path(dataDir(name))
    val f = fs(dd)
    // partition dirs (`__p_x=v`) begin with '_' but ARE data
    val hasData = f.exists(dd) && f.listStatus(dd).exists { s =>
      val n = s.getPath.getName
      (s.isDirectory && n.contains("=")) ||
        (!n.startsWith("_") && !n.startsWith("."))
    }
    val full = StructType(meta.schema.fields.toSeq ++ partitionFields(meta))
    if (!hasData) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    } else {
      spark.read
        .option("basePath", dataDir(name))
        .schema(full)
        .parquet(dataDir(name))
    }
  }

  /** User-facing table view (generated partition columns hidden). */
  def read(name: String): DataFrame = {
    val meta = readMeta(name)
    readInternal(name, meta).select(meta.schema.fieldNames.map(n => col(quoted(n))): _*)
  }

  /** Structured-Streaming source over an APPEND-ONLY lake table: every
    * committed write lands whole part files (staged rename, never
    * in-place mutation), so Spark's file-stream source tails the data
    * directory and emits each file's rows exactly once. The same
    * append-only contract as [[readAppendsBetween]]: after an
    * upsert/rewrite the survivors land in NEW files and would re-emit —
    * stream from ingest logs, diff snapshots on merged tables. */
  def readStream(name: String): DataFrame = {
    val meta = readMeta(name)
    val full = StructType(meta.schema.fields.toSeq ++ partitionFields(meta))
    spark.readStream
      .schema(full)
      .option("basePath", dataDir(name))
      .parquet(if (meta.partitions.isEmpty) dataDir(name)
        else s"${dataDir(name)}/*")
      .select(meta.schema.fieldNames.map(n => col(quoted(n))): _*)
  }

  // ---- write ----

  private[graft] def withPartitionCols(df: DataFrame, meta: TableMeta): DataFrame =
    meta.partitionExprs.foldLeft(df)((d, e) =>
      d.withColumn(e.outputName, e.toColumn))

  /** The reference's single write entry (DucklakeWriter.write): ensure the
    * table, then MERGE when it pre-existed and PKs are configured, else
    * INSERT. `ordering` breaks ties for duplicate PKs within the batch
    * (e.g. the Kafka offset column); arrival order when empty. */
  def write(
      name: String,
      batch: DataFrame,
      partitions: Seq[String] = Nil,
      pks: Seq[String] = Nil,
      ordering: Seq[Column] = Nil,
      exclude: Seq[String] = Nil): Unit = {
    val dataSchema = StructType(batch.schema.filterNot(f => exclude.contains(f.name)))
    val (meta, preExisted) = ensureTable(name, dataSchema, partitions, pks)
    val effectivePks = if (meta.pks.nonEmpty) meta.pks else pks
    if (preExisted && effectivePks.nonEmpty) upsert(name, batch, ordering)
    else append(name, batch.drop(exclude: _*))
  }

  /** One write job per table at a time (the reference's flush lock,
    * DucklakeSinkTask.java:769-770): concurrent Spark jobs writing one
    * path share the committer's `_temporary` dir and clobber each other. */
  private def writeLock[T](name: String)(f: => T): T =
    tableLocks.computeIfAbsent(s"$warehouse/$name/__write", _ => new Object)
      .synchronized(f)

  /** Plain INSERT path (W3): conform + `_inserted_at = now()` + append. */
  def append(name: String, batch: DataFrame): Unit = {
    val (meta, _) = ensureTable(name, batch.schema)
    val conformed = conformBatch(batch, meta)
      .withColumn(InsertedAtCol, current_timestamp())
    val out = withPartitionCols(conformed, meta)
    writeLock(name) {
      val writer = out.write
        .mode(SaveMode.Append)
        .option("maxRecordsPerFile", maxRecordsPerFile)
      val parted =
        if (meta.partitions.nonEmpty)
          writer.partitionBy(meta.partitionExprs.map(_.outputName): _*)
        else writer
      parted.parquet(dataDir(name))
      commitVersion(name)
    }
  }

  private def conformBatch(batch: DataFrame, meta: TableMeta): DataFrame = {
    val dataSchema = StructType(meta.schema.filterNot(_.name == InsertedAtCol))
    LandedTypes.conform(LandedTypes.toLanded(batch), dataSchema)
  }

  /** MERGE path (W2/W4/W5): batch PK-dedup last-wins, affected-partition
    * discovery, anti-join + union rewrite of affected partitions only,
    * `_inserted_at` preserved on update / set on insert.
    *
    * NOTE a batch that changes a partition-source column relocates rows, so
    * both the old and new partitions count as affected — a merge that
    * rewrites its own partition key forfeits pruning by construction and
    * degrades toward a full copy-on-write. Partition by a stable key that
    * merges never update (see README "Scale design notes"). */
  def upsert(name: String, batch: DataFrame, ordering: Seq[Column] = Nil): Unit = writeLock(name) {
    val meta = readMeta(name)
    require(meta.pks.nonEmpty, s"upsert on '$name' requires configured PKs")
    val pks = meta.pks
    val partCols = meta.partitionExprs.map(_.outputName)

    // W4: dedup duplicate PKs within the batch — last wins. Runs on the raw
    // batch so ordering-only columns (e.g. Kafka offset) are usable even
    // though they are not landed.
    val order = if (ordering.nonEmpty) ordering.map(_.desc)
      else Seq(monotonically_increasing_id().desc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pks.map(c => col(quoted(c))): _*).orderBy(order: _*)
    val deduped = conformBatch(
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"),
      meta)

    val existing = readInternal(name, meta)

    // Affected partitions: where batch rows land + where matching PKs live.
    // The PK-location probe reads only (pk, partition) columns — parquet
    // column pruning keeps this cheap at scale.
    val scoped =
      if (partCols.isEmpty) existing
      else {
        val batchParts = withPartitionCols(deduped, meta)
          .select(partCols.map(c => col(quoted(c))): _*).distinct()
        val matchedParts = existing
          .select((pks ++ partCols).map(c => col(quoted(c))): _*)
          .join(deduped.select(pks.map(c => col(quoted(c))): _*), pks, "left_semi")
          .select(partCols.map(c => col(quoted(c))): _*).distinct()
        val parts = batchParts.union(matchedParts).distinct().collect()
        existing.filter(GraftLake.partitionScope(partCols, parts))
      }

    // W2 rewrite with exact MERGE INTO semantics in ONE full-outer join
    // (each side shuffles once on the PK, vs three joins for a
    // untouched/updates/inserts union):
    //  - both sides matched → update in place: batch data columns, the
    //    target row's own _inserted_at (duplicate-PK target rows each
    //    become a copy of the unique batch winner);
    //  - target only → untouched;
    //  - batch only → insert with a fresh _inserted_at.
    val dataCols = meta.schema.fieldNames
      .filterNot(n => pks.contains(n) || n == InsertedAtCol)
    // reserved __graft_b_ prefix + quoted() throughout: user column names
    // with backticks or underscore prefixes must not break or collide
    val bPrefix = "__graft_b_"
    val bPresent = "__graft_b_present__"
    val bRenamed = deduped.select(
      pks.map(c => col(quoted(c))) ++
        dataCols.map(c => col(quoted(c)).as(s"$bPrefix$c")) :+
        lit(true).as(bPresent): _*)
    val merged = scoped.join(bRenamed, pks, "full_outer")
      .select(meta.schema.fieldNames.map {
        case n if pks.contains(n) => col(quoted(n))
        case n if n == InsertedAtCol =>
          coalesce(col(InsertedAtCol), current_timestamp()).as(InsertedAtCol)
        case n =>
          when(col(bPresent).isNotNull, col(quoted(s"$bPrefix$n")))
            .otherwise(col(quoted(n))).as(n)
      }: _*)
    val result = withPartitionCols(merged, meta)

    // Directories of the affected partitions BEFORE the rewrite: a
    // partition that ends up empty (its only rows moved elsewhere) has no
    // stage leaf, but its old files must still be deleted or a stale copy
    // survives the merge. input_file_name() goes through the PRUNED scan
    // (DataFrame.inputFiles would list every partition of the relation and
    // delete data) and is encoding-robust (no hand-built partition names).
    val affectedDirs: Seq[Path] =
      if (partCols.isEmpty) Nil
      else scoped.select(input_file_name().as("f")).distinct()
        .collect().map(r => new Path(r.getString(0)).getParent)
        .toSeq.distinct

    // Stage + swap (Spark cannot overwrite a path it is reading from).
    val stage = new Path(s"${tableDir(name)}/.stage-${UUID.randomUUID()}")
    val writer = result.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(stage.toString)
    swapInto(name, stage, new Path(dataDir(name)), partCols.size, affectedDirs)
    commitVersion(name)
  }

  /** Replace the entire table contents with `df` (must carry exactly the
    * table's user schema — typed columns incl. `_inserted_at`). Staged
    * write + directory swap; partition columns are recomputed from the new
    * row values. Used by the general-form SQL MERGE rewrite, which is an
    * explicit whole-table copy-on-write (the upsert-shaped form routes
    * through [[upsert]]'s affected-partition path instead). */
  def overwriteContents(name: String, df: DataFrame): Unit = writeLock(name) {
    val meta = readMeta(name)
    val projected = df.select(meta.schema.fieldNames.map(n => col(quoted(n))): _*)
    val out = withPartitionCols(projected, meta)
    val partCols = meta.partitionExprs.map(_.outputName)
    val stage = new Path(s"${tableDir(name)}/.stage-${UUID.randomUUID()}")
    val dd = new Path(dataDir(name))
    val f = fs(dd)
    try {
      val writer = out.write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", maxRecordsPerFile)
      (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
        .parquet(stage.toString)
      // rename-aside instead of delete-then-rename: a crash between the
      // two renames leaves the old contents recoverable in .old-*, never
      // a lost table
      val old = new Path(s"${tableDir(name)}/.old-${UUID.randomUUID()}")
      if (f.exists(dd)) f.rename(dd, old)
      f.rename(stage, dd)
      retire(name, old)
      commitVersion(name)
    } finally f.delete(stage, true) // no-op when the rename consumed it
  }

  /** Append rows that already carry the full user schema including
    * `_inserted_at` (the SQL MERGE insert-only path computes the system
    * column by its own assignment/default policy). No conform pass — the
    * caller has already cast every column to the table schema. */
  private[graft] def appendPrepared(name: String, batch: DataFrame): Unit = writeLock(name) {
    val meta = readMeta(name)
    val out = withPartitionCols(
      batch.select(meta.schema.fieldNames.map(n => col(quoted(n))): _*), meta)
    val writer = out.write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    val partCols = meta.partitionExprs.map(_.outputName)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(dataDir(name))
    commitVersion(name)
  }

  /** Rewrite a scoped slice of the table: `survivors` replaces the
    * contents of `affectedDirs` (every partition directory the scope
    * covered — a partition whose rows all vanish has no staged leaf but
    * must still be cleared). Unpartitioned tables replace the whole file
    * set, so `survivors` must then be the full remaining table.
    * Engine-internal support for the SQL DELETE/UPDATE rewrites. */
  private[graft] def replaceScoped(name: String, survivors: DataFrame,
      affectedDirs: Seq[String]): Unit = writeLock(name) {
    val meta = readMeta(name)
    val partCols = meta.partitionExprs.map(_.outputName)
    val out = withPartitionCols(
      survivors.select(meta.schema.fieldNames.map(n => col(quoted(n))): _*), meta)
    val stage = new Path(s"${tableDir(name)}/.stage-${UUID.randomUUID()}")
    val writer = out.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(stage.toString)
    swapInto(name, stage, new Path(dataDir(name)), partCols.size,
      affectedDirs.map(new Path(_)))
    commitVersion(name)
  }

  /** Compact a table's data files: rewrites each partition (or the whole
    * table) into ~`targetRecordsPerFile`-row files via the staged-swap
    * path. The small-file antidote for streaming ingest — micro-batches
    * append many small files; compaction restores scan efficiency without
    * changing table contents. Run it per partition predicate at scale
    * (`predicate` limits the rewrite scope, e.g. yesterday's partition). */
  def compact(name: String, targetRecordsPerFile: Long = maxRecordsPerFile,
      predicate: Option[Column] = None,
      clusterBy: Seq[String] = Nil): Unit = writeLock(name) {
    val meta = readMeta(name)
    val partCols = meta.partitionExprs.map(_.outputName)
    val all = readInternal(name, meta)
    val scoped = predicate.map(all.filter).getOrElse(all)
    val stage = new Path(s"${tableDir(name)}/.stage-${UUID.randomUUID()}")
    val projected = scoped
      .select(meta.schema.fieldNames.map(n => col(quoted(n))) ++
        partCols.map(c => col(quoted(c))): _*)
    val arranged =
      if (clusterBy.nonEmpty) {
        // Z-ORDER clustering: range-partition + sort by the interleaved
        // z-value so every output file covers a tight box over ALL cluster
        // columns — min/max footer pruning then skips files for predicates
        // on any of them. Bounds come from one tiny min/max agg.
        val boundsRow = projected.agg(
          clusterBy.flatMap(c => Seq(
            min(col(quoted(c)).cast("double")),
            max(col(quoted(c)).cast("double")))).head,
          clusterBy.flatMap(c => Seq(
            min(col(quoted(c)).cast("double")),
            max(col(quoted(c)).cast("double")))).tail: _*).head()
        val bounds = clusterBy.indices.map(i =>
          (boundsRow.getDouble(2 * i), boundsRow.getDouble(2 * i + 1)))
        val zv = graft.functions.ZOrder.zValue(
          clusterBy.map(c => col(quoted(c))), bounds)
        projected.repartitionByRange((partCols.map(c => col(quoted(c))) :+ zv): _*)
          .sortWithinPartitions((partCols.map(c => col(quoted(c))) :+ zv): _*)
      } else {
        // AQE rebalance: merges small shuffle partitions / splits skewed
        // ones to the advisory size, so output files coalesce without
        // hand-picking a partition count (partitioned tables rebalance per
        // partition key)
        if (partCols.nonEmpty) projected.hint("rebalance", partCols.map(col(_)): _*)
        else projected.hint("rebalance")
      }
    val writer = arranged
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRecordsPerFile)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(stage.toString)
    swapInto(name, stage, new Path(dataDir(name)), partCols.size)
    commitVersion(name)
  }

  /** Data files currently backing a table (observability / compaction
    * policy input). */
  def dataFiles(name: String): Seq[String] =
    read(name).inputFiles.toSeq

  // ---- snapshots / time travel ----
  //
  // DuckLake — the reference's storage layer — versions every commit in
  // its catalog database (ducklake_snapshot / ducklake_data_file); the
  // connector inherits snapshots for free. This engine reproduces the
  // capability file-native, Iceberg-style: part files are immutable and
  // globally unique, a rewrite RETIRES replaced files into `_history/`
  // instead of deleting them, and each commit writes a manifest
  // (`_versions/v{N}.json`) of the live file set + the schema at commit
  // time. A snapshot read resolves the manifest's files (still-live ones
  // in `data/`, replaced ones in `_history/`) — no directory-state
  // coupling, so the current-version read path is untouched.
  //
  // Scale: the manifest is O(files) — the bookkeeping every lakehouse
  // format pays per commit; `expireSnapshots` bounds retained history.

  private def versionsDir(name: String) = new Path(s"${tableDir(name)}/_versions")
  private def historyDir(name: String) = new Path(s"${tableDir(name)}/_history")

  /** Move a replaced data file / partition directory into `_history`
    * keyed by its globally unique part-file name (Spark part files embed
    * a job UUID, so flat storage cannot collide); non-data droppings are
    * deleted as before. */
  private def retire(name: String, p: Path): Unit = {
    val f = fs(p)
    if (!f.exists(p)) return
    val hd = historyDir(name)
    f.mkdirs(hd)
    def move(q: Path): Unit = {
      if (f.getFileStatus(q).isDirectory) {
        f.listStatus(q).foreach(s => move(s.getPath))
        f.delete(q, true)
      } else if (q.getName.endsWith(".parquet")) {
        f.rename(q, new Path(hd, q.getName))
      } else f.delete(q, false)
    }
    move(p)
  }

  /** Commit the next snapshot manifest for `name`: the full live
    * (relative partition path, file name) list plus the schema. Called at
    * the end of every data mutation, inside its write lock. */
  private def commitVersion(name: String): Unit =
      graft.metrics.GraftMetrics.time(graft.metrics.GraftMetrics.CommitVersion) {
    val vd = versionsDir(name)
    val f = fs(vd)
    f.mkdirs(vd)
    val dd = new Path(dataDir(name))
    val ddUri = f.makeQualified(dd).toUri
    def files(p: Path): Seq[(String, String)] =
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) files(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet"))
          Seq((ddUri.relativize(f.makeQualified(s.getPath.getParent).toUri)
            .getPath.stripSuffix("/"), s.getPath.getName))
        else Nil
      }
    val list = files(dd).sortBy(identity)
    val meta = readMeta(name)
    val next = versions(name).lastOption.getOrElse(-1L) + 1L
    val body = GraftLake.renderManifest(next, meta, list)
    val p = new Path(vd, s"v$next.json")
    val out = f.create(p, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Committed snapshot ids of a table, oldest first. */
  def versions(name: String): Seq[Long] = {
    val vd = versionsDir(name)
    val f = fs(vd)
    if (!f.exists(vd)) Nil
    else f.listStatus(vd).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }.sorted
  }

  /** (schema at commit, resolved absolute file paths) of a snapshot —
    * still-live files resolve into `data/`, replaced ones into
    * `_history/`. Shared by [[readVersion]] and the DSv2 catalog's
    * `VERSION AS OF` table. */
  private[catalog] def snapshotFiles(name: String,
      version: Long): (StructType, Seq[String]) = {
    val p = new Path(versionsDir(name), s"v$version.json")
    val f = fs(p)
    require(f.exists(p), s"table '$name' has no snapshot $version " +
      s"(have: ${versions(name).mkString(", ")})")
    val in = f.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val (schema, files) = GraftLake.parseManifest(raw)
    val hd = historyDir(name)
    val paths = files.map { case (rel, fn) =>
      val live = if (rel.isEmpty) new Path(dataDir(name), fn)
        else new Path(s"${dataDir(name)}/$rel", fn)
      if (f.exists(live)) live
      else {
        val retired = new Path(hd, fn)
        require(f.exists(retired), s"snapshot $version of '$name' references " +
          s"'$fn', which was vacuumed by expireSnapshots")
        retired
      }
    }
    (schema, paths.map(_.toString))
  }

  /** Read the table AS OF snapshot `version`: the manifest's file set
    * under the manifest's schema. Partition-source columns are stored in
    * the data files themselves (the generated `__p_*` dir columns are
    * copies), so the user view needs no partition reconstruction. */
  def readVersion(name: String, version: Long): DataFrame = {
    val (schema, paths) = snapshotFiles(name, version)
    if (paths.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    spark.read.schema(schema).parquet(paths: _*)
      .select(schema.fieldNames.map(n => col(quoted(n))): _*)
  }

  /** Audit view of a table's shape over time: (version, live file count,
    * column count, schema JSON) per committed snapshot — manifests carry
    * the schema at commit, so evolution history costs no extra
    * bookkeeping. */
  def schemaHistory(name: String): Seq[(Long, Int, Int, String)] =
    versions(name).map { v =>
      val (schema, files) = snapshotFiles(name, v)
      (v, files.size, schema.fields.length, schema.json)
    }

  /** Rows in data files ADDED between two snapshots (file-set difference
    * by unique part-file name, read under the newer snapshot's schema) —
    * the incremental-consumption primitive. EXACT change capture for
    * append-only tables (each commit's new files hold exactly its new
    * rows); after an upsert/rewrite it is file-level, not row-level: the
    * rewrite's survivor rows reappear alongside the actual changes — consumers
    * of merged tables should diff snapshots by key instead. */
  def readAppendsBetween(name: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"need fromVersion <= toVersion, got $fromVersion > $toVersion")
    val (schema, toFiles) = snapshotFiles(name, toVersion)
    val fromNames = snapshotFiles(name, fromVersion)._2
      .map(p => new Path(p).getName).toSet
    val fresh = toFiles.filterNot(p => fromNames.contains(new Path(p).getName))
    if (fresh.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(fresh: _*)
      .select(schema.fieldNames.map(n => col(quoted(n))): _*)
  }

  /** Reconcile the directory and manifest views after a crash: a writer
    * that died between landing part files and committing its manifest
    * leaves rows visible to directory-based CURRENT reads but missing
    * from every snapshot. Adopting the data directory as-is into a fresh
    * manifest makes the newest snapshot match `read` again. Returns the
    * adopted snapshot id. */
  def repairTable(name: String): Long = writeLock(name) {
    commitVersion(name)
    versions(name).last
  }

  /** Drop all but the last `keepLast` snapshots and physically delete
    * retired files no surviving manifest references (the storage-bounding
    * half of the snapshot contract). */
  def expireSnapshots(name: String, keepLast: Int = 1): Unit = writeLock(name) {
    require(keepLast >= 1, s"need keepLast >= 1, got $keepLast")
    val vs = versions(name)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    if (drop.isEmpty) return
    val f = fs(versionsDir(name))
    val referenced: Set[String] = keep.flatMap { v =>
      val p = new Path(versionsDir(name), s"v$v.json")
      val in = f.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      GraftLake.parseManifest(raw)._2.map(_._2)
    }.toSet
    drop.foreach(v => f.delete(new Path(versionsDir(name), s"v$v.json"), false))
    val hd = historyDir(name)
    if (f.exists(hd))
      f.listStatus(hd).foreach { s =>
        if (!referenced.contains(s.getPath.getName)) f.delete(s.getPath, false)
      }
  }

  /** Move staged output into the data dir: partitioned tables swap the
    * partition directories present in the stage AND delete `affectedDirs`
    * that produced no stage output (a rewrite can empty a partition);
    * unpartitioned tables swap the whole file set. Best-effort atomicity
    * (directory renames), mirroring a commit-protocol boundary. */
  private def swapInto(name: String, stage: Path, target: Path, partDepth: Int,
      affectedDirs: Seq[Path] = Nil): Unit = {
    val f = fs(target)
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else f.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
        .flatMap(s => leaves(s.getPath, depth - 1))
    try {
      if (partDepth == 0) {
        // replace all data files (replaced ones retire into _history)
        if (f.exists(target))
          f.listStatus(target).foreach { s =>
            if (!s.getPath.getName.startsWith(".")) retire(name, s.getPath)
          }
        else f.mkdirs(target)
        f.listStatus(stage)
          .filter(s => s.getPath.getName.endsWith(".parquet"))
          .foreach(s => f.rename(s.getPath, new Path(target, s.getPath.getName)))
      } else {
        // emptied partitions first: their old contents must go even though
        // the stage has nothing to put in their place
        affectedDirs.foreach(d => retire(name, d))
        val stageUri = f.makeQualified(stage).toUri
        leaves(stage, partDepth).foreach { leaf =>
          val rel = stageUri.relativize(f.makeQualified(leaf).toUri).getPath
          val dest = new Path(target, rel)
          retire(name, dest)
          f.mkdirs(dest.getParent)
          f.rename(leaf, dest)
        }
      }
    } finally f.delete(stage, true)
  }

  private def quoted(n: String): String = GraftLake.quoted(n)
}

object GraftLake {
  /** Generated partition columns of a table (shared by the lake reader and
    * the DSv2 catalog so the naming/typing rules cannot drift). */
  private[catalog] def partitionFields(meta: TableMeta): Seq[StructField] =
    meta.partitionExprs.map {
      case PartitionExpr.Raw(c) => StructField(s"__p_$c", meta.schema(c).dataType)
      case e => StructField(e.outputName, IntegerType)
    }

  /** Engine-side caches, mirroring the reference's static verified-tables /
    * known-columns caches with per-table locks
    * (DucklakeTableManager.java:51-59, 96-145). */
  private val verifiedTables = new ConcurrentHashMap[String, java.lang.Boolean]()
  private val metaCache = new ConcurrentHashMap[String, TableMeta]()
  private val tableLocks = new ConcurrentHashMap[String, Object]()

  /** ≈ reference file.size.bytes flush cap, expressed in records. */
  val maxRecordsPerFile = 5000000

  /** Affected-partition count above which the upsert scope predicate
    * switches from the exact per-tuple OR-chain to per-column isin sets. */
  val maxExactPartitionPredicates = 64

  private[graft] def quoted(n: String): String = s"`${n.replace("`", "``")}`"

  /** Scope predicate over the partition columns for a collected set of
    * affected partition tuples. Small sets get the exact per-tuple
    * OR-chain; past [[maxExactPartitionPredicates]] tuples the OR-chain
    * would blow up the optimizer, so it switches to one `isin` set per
    * partition column — a (cartesian) superset of the exact tuple set:
    * still correct (extra partitions are rewritten unchanged), still
    * prunes at the scan, and O(distinct values per column) in size. Row
    * ordinals must match `partCols`. */
  private[graft] def partitionScope(partCols: Seq[String],
      parts: Array[org.apache.spark.sql.Row]): Column = {
    import org.apache.spark.sql.functions.{col, lit}
    if (parts.isEmpty) lit(false)
    else if (parts.length <= maxExactPartitionPredicates)
      parts.map { r =>
        partCols.zipWithIndex.map { case (c, i) =>
          if (r.isNullAt(i)) col(quoted(c)).isNull else col(quoted(c)) === lit(r.get(i))
        }.reduce(_ && _)
      }.reduce(_ || _)
    else
      partCols.zipWithIndex.map { case (c, i) =>
        val vals = parts.map(r => if (r.isNullAt(i)) null else r.get(i)).distinct
        val nonNull = vals.filter(_ != null)
        val base =
          if (nonNull.isEmpty) lit(false)
          else col(quoted(c)).isin(nonNull.toIndexedSeq: _*)
        if (vals.contains(null)) base || col(quoted(c)).isNull else base
      }.reduce(_ && _)
  }

  /** Clear caches (tests / external table mutation). */
  def invalidateCaches(): Unit = {
    verifiedTables.clear(); metaCache.clear()
  }

  // -- meta (de)serialization: tiny hand-rolled JSON (schema via DataType.json) --

  private[catalog] def renderMeta(meta: TableMeta): String = {
    def arr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
    s"""{"schema":${meta.schema.json},"partitions":${arr(meta.partitions)},"pks":${arr(meta.pks)}}"""
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Snapshot manifest: version + schema at commit + live file list. */
  private[catalog] def renderManifest(version: Long, meta: TableMeta,
      files: Seq[(String, String)]): String = {
    val fileArr = files.map { case (rel, fn) =>
      "{\"rel\":" + q(rel) + ",\"name\":" + q(fn) + "}"
    }.mkString("[", ",", "]")
    s"""{"version":$version,"schema":${meta.schema.json},"files":$fileArr}"""
  }

  private[catalog] def parseManifest(raw: String): (StructType, Seq[(String, String)]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(raw)
    val schema = DataType.fromJson(node.get("schema").toString).asInstanceOf[StructType]
    val fn = node.get("files")
    val files = (0 until fn.size()).map { i =>
      (fn.get(i).get("rel").asText(), fn.get(i).get("name").asText())
    }
    (schema, files)
  }

  private[catalog] def parseMeta(raw: String): TableMeta = {
    // The schema value is itself JSON produced by StructType.json; use
    // Jackson for robust parsing.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(raw)
    val schema = DataType.fromJson(node.get("schema").toString).asInstanceOf[StructType]
    def strs(field: String): Seq[String] = {
      val n = node.get(field)
      (0 until n.size()).map(i => n.get(i).asText())
    }
    TableMeta(schema, strs("partitions"), strs("pks"))
  }
}
