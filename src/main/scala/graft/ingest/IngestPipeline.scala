package graft.ingest

import java.util.concurrent.ConcurrentHashMap

import graft.catalog.GraftLake
import graft.metrics.GraftMetrics
import graft.schema.{SchemaInference, SchemaUnify}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Engine configuration (reference: connect/DucklakeSinkConfig.java).
  *
  * @param warehouse       lake root (≈ DATA_PATH)
  * @param topic2table     explicit topic→table map; identity when absent
  *                        (DucklakeWriterFactory.java:57-60)
  * @param pks             per-TABLE primary keys (id-columns)
  * @param partitions      per-TABLE partition expressions
  * @param dlqTable        bad records land here; None → batch errors fail
  *                        the batch (reference: no ErrantRecordReporter)
  * @param triggerMs       flush.interval.ms analog (micro-batch trigger)
  * @param maxOffsetsPerTrigger flush.size analog for the Kafka source
  * @param avroSchemas     per-topic Avro reader schema JSON — topics listed
  *                        here decode as schemaful Avro (the Connect
  *                        value.converter analog, reference S7)
  * @param dedup           per-TABLE ingestion-time near-dup gate: every
  *                        landing batch probes a persisted LSH index in the
  *                        same lake and lands with a dup flag (or drops
  *                        dups), and admitted docs extend the index — the
  *                        reference's curation-on-ingest identity applied
  *                        to dedup. Cost scales with the batch, never the
  *                        corpus ([[graft.operators.DedupOps.incrementalNearDups]]).
  * @param quality         per-TABLE ingestion-time quality gate: every
  *                        landing batch is scored map-side (length,
  *                        composite quality score, language-ID allowlist)
  *                        and lands flagged (or failures are dropped) —
  *                        see [[QualityConfig]]. Runs BEFORE the dedup
  *                        gate so junk never costs LSH sketching or index
  *                        admission.
  * @param txnAppId        EXACTLY-ONCE upgrade for the append path: when
  *                        set, no-PK tables land through
  *                        [[graft.catalog.GraftLake.appendIdempotent]]
  *                        keyed `"<txnAppId>:<table>" -> batchId`, so a
  *                        redelivered micro-batch (restart replay between
  *                        the lake commit and the checkpoint write) is
  *                        detected from the manifest and skipped instead
  *                        of duplicated. Scope the id to ONE streaming
  *                        query + checkpoint location (batchIds must be
  *                        monotonic per id — a NEW checkpoint dir needs a
  *                        new txnAppId). PK tables are already idempotent
  *                        through upsert. Off by default (at-least-once,
  *                        the reference's delivery contract).
  * @param bloomRefresh    tables whose per-file bloom skipping sidecars
  *                        ([[graft.catalog.GraftLake.buildBloomIndex]])
  *                        stay current with ingest: after each flush ONLY
  *                        the newly landed files are scanned and bloomed
  *                        ([[graft.catalog.GraftLake.refreshBloomIndexes]]),
  *                        so equality-probe pruning never decays as the
  *                        stream grows. No-op until an index is built.
  */
final case class IngestConfig(
    warehouse: String,
    topic2table: Map[String, String] = Map.empty,
    pks: Map[String, Seq[String]] = Map.empty,
    partitions: Map[String, Seq[String]] = Map.empty,
    dlqTable: Option[String] = Some("_dlq"),
    triggerMs: Long = 60000L,
    maxOffsetsPerTrigger: Option[Long] = None,
    avroSchemas: Map[String, String] = Map.empty,
    dedup: Map[String, DedupConfig] = Map.empty,
    quality: Map[String, QualityConfig] = Map.empty,
    autoCompact: Map[String, CompactionConfig] = Map.empty,
    autoRebucket: Map[String, RebucketConfig] = Map.empty,
    retention: Map[String, RetentionConfig] = Map.empty,
    bloomRefresh: Set[String] = Set.empty,
    txnAppId: Option[String] = None) {

  /** Explicit mappings are validated strictly (reference
    * TopicToTableValidator.java:99-154 validates only configured mappings);
    * the identity fallback is sanitized instead — the reference passes the
    * raw topic name through unvalidated (DucklakeWriterFactory.create), and
    * dotted topics (`db.schema.table`, ubiquitous with Debezium) must not
    * become a poison batch that permanently fails the stream. */
  def tableFor(topic: String): String =
    topic2table.get(topic) match {
      case Some(t) => IngestConfig.validateTableName(t); t
      case None    => IngestConfig.sanitizeTableName(topic)
    }
}

/** Ingestion-time near-dup config for one table (see [[IngestConfig.dedup]]).
  *
  * @param idCol    unique document id column (must appear in every batch)
  * @param textCol  text column to sketch (cast to string)
  * @param threshold exact-shingle-Jaccard admission threshold
  * @param flagCol  name of the landed dup-flag column (`0`/`1`)
  * @param dropDups true → duplicates never land (the flag column is not
  *                 written either); false → everything lands, flagged
  */
final case class DedupConfig(
    idCol: String,
    textCol: String,
    threshold: Double = 0.8,
    shingleK: Int = 3,
    bands: Int = 16,
    rowsPerBand: Int = 4,
    flagCol: String = "is_dup",
    dropDups: Boolean = false)

/** Ingestion-time quality config for one table (see
  * [[IngestConfig.quality]]) — the LLM-curation twin of [[DedupConfig]]:
  * the reference's curation-on-ingest identity applied to text quality.
  * All signals are codegen'd map-side expressions over the batch
  * ([[graft.operators.TextOps.qualityScore]] /
  * [[graft.operators.TextOps.langIdPredict]]) — no shuffle, no state, so
  * the gate's cost is one scan of the batch regardless of corpus size.
  *
  * @param textCol      text column to score (cast to string)
  * @param minChars     minimum raw character length
  * @param minScore     minimum composite quality score (0..1 — token
  *                     volume, punctuation, stopword density)
  * @param langAllow    language-ID allowlist (empty = any language)
  * @param flagCol      landed pass-flag column (`1` pass / `0` fail)
  * @param dropFailures true → failing rows never land (no flag column);
  *                     false → everything lands, flagged
  */
final case class QualityConfig(
    textCol: String,
    minChars: Int = 1,
    minScore: Double = 0.0,
    langAllow: Seq[String] = Nil,
    flagCol: String = "quality_ok",
    dropFailures: Boolean = false)

/** Auto-compaction policy for one table (see [[IngestConfig.autoCompact]]):
  * after each flush, when the table's LIVE file count (an O(1) read of
  * the commit cache, never a listing) reaches `minFiles`, the table is
  * compacted toward `targetRecordsPerFile`-row files — the small-file
  * antidote for streaming ingest expressed as policy instead of an
  * operator someone must remember to run. Contents-preserving by
  * [[graft.catalog.GraftLake.compact]]'s construction; `clusterBy`
  * optionally Z-orders while it is rewriting anyway, so the same pass
  * that fixes file sizes also buys data skipping. At-least-once safe:
  * compaction commits a snapshot like any write, and a crash mid-compact
  * leaves the staged dir orphaned, never the table corrupted.
  *
  * Do NOT enable on a table tailed by [[graft.catalog.GraftLake
  * .readStream]]: the file-stream source's append-only contract means a
  * compaction's rewritten survivors re-emit (same caveat as any manual
  * rewrite there — stream from ingest logs, or diff snapshots). */
final case class CompactionConfig(
    minFiles: Int = 64,
    targetRecordsPerFile: Long = graft.catalog.GraftLake.maxRecordsPerFile,
    clusterBy: Seq[String] = Nil)

/** Auto-rebucket policy for one table (see [[IngestConfig.autoRebucket]]):
  * after each flush, when the mean live rows per bucket (metadata-only —
  * manifest footer counts) exceeds `targetRowsPerBucket`, the bucket
  * count DOUBLES via the incremental online rebucket, bounded by
  * `maxBuckets` — the 100 TB layout policy ("fix the bucket size, grow
  * the count with the table") as standing policy: without it a stream's
  * per-flush merge cost grows with bucket size forever once the table
  * outgrows its creation-time count. Safe under the stream's own
  * concurrent writes by the incremental rebucket's construction (appends
  * conflict with nothing; each old bucket migrates as its own commit).
  *
  * `maxGroupsPerFlush` bounds the migration work done inside any one
  * micro-batch: a doubling flips the count immediately, then each flush
  * migrates at most this many old buckets and the NEXT flush resumes
  * (the probe prioritizes in-flight migrations over new doublings), so
  * the rewrite amortizes across triggers instead of stalling the stream
  * for an O(table) rewrite exactly when the table is largest. Mixed
  * layouts stay exact for reads, merges and appends throughout. */
final case class RebucketConfig(
    targetRowsPerBucket: Long,
    maxBuckets: Int = 65536,
    maxGroupsPerFlush: Int = 4)

/** Snapshot-retention policy for one table (see
  * [[IngestConfig.retention]]): when the committed snapshot count reaches
  * `keepLast + slack`, all but the last `keepLast` are expired and
  * unreferenced retired files vacuumed ([[graft.catalog.GraftLake
  * .expireSnapshots]]) — bounding manifest-chain length and `_history`
  * storage for streams that commit every few seconds, without an
  * operator running vacuums by hand. `slack` batches the expiry (one
  * O(keep) pass per `slack` commits, not per flush). Pick `keepLast` to
  * cover the longest concurrent reader, as with any lakehouse vacuum —
  * expired versions fail fast on their next resolution. */
final case class RetentionConfig(
    keepLast: Int = 8,
    slack: Int = 16)

object IngestConfig {
  private val TableName = "^[a-zA-Z_][a-zA-Z0-9_-]*$".r

  /** Reference validation (TopicToTableValidator.java:99-154). */
  def validateTableName(t: String): Unit =
    require(TableName.matches(t), s"Invalid table name: '$t'")

  /** Identity-fallback sanitization: map every character outside
    * [a-zA-Z0-9_-] to '_' and prefix '_' if the result starts with a
    * non-letter. Whenever sanitization CHANGED the name, a 4-hex-digit
    * digest of the original topic is appended — so distinct topics that
    * sanitize alike (`db.users` vs `db_users`, `a.b.c` vs `a.b_c`) land
    * in distinct tables instead of silently interleaving. Deterministic:
    * one topic always lands in one table. */
  def sanitizeTableName(topic: String): String = {
    val cleaned = topic.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_' || c == '-') c else '_')
    val based =
      if (cleaned.isEmpty || !(cleaned.head.isLetter && cleaned.head < 128 || cleaned.head == '_'))
        "_" + cleaned
      else cleaned
    if (based == topic) based
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(topic.getBytes("UTF-8"))
      f"${based}_${md(0) & 0xff}%02x${md(1) & 0xff}%02x"
    }
  }

  def validate(c: IngestConfig): Unit = {
    c.topic2table.values.foreach(validateTableName)
    val dups = c.topic2table.values.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"Duplicate table mappings: ${dups.mkString(", ")}")
  }
}

/** Per-topic unified-schema cache (reference:
  * SinkRecordToArrowConverter.java:74-80, 255-303): the cached schema is
  * reused when all incoming field names are a subset of it; otherwise it is
  * re-unified and replaced. Driver-side only — schemas, never data. */
final class SchemaCache {
  private val cache = new ConcurrentHashMap[String, StructType]()

  def get(topic: String): Option[StructType] = Option(cache.get(topic))

  def unifiedFor(topic: String, incoming: Seq[StructType]): StructType = {
    val cached = Option(cache.get(topic))
    cached match {
      case Some(c) if incoming.forall(_.fieldNames.toSet.subsetOf(c.fieldNames.toSet)) &&
          (try { SchemaUnify.unify(c +: incoming) == c } catch { case _: Exception => false }) =>
        c
      case _ =>
        val u = SchemaUnify.unify(cached.toSeq ++ incoming)
        cache.put(topic, u)
        u
    }
  }

  def put(topic: String, s: StructType): Unit = cache.put(topic, s)
  def clear(): Unit = cache.clear()
}

object IngestPipeline {
  /** Per-(topic, format) accumulation state for the batch-profile pass —
    * mutable on purpose: one instance per key per PARTITION (the
    * aggregate zero deserializes fresh per task), mutated row by row. */
  private[ingest] final case class ProfState(var n: Long,
    var schema: org.apache.spark.sql.types.StructType,
    var conflict: String, var unparseable: Long) extends Serializable

  /** Executor-side per-row step of the batch profile (a static helper so
    * the treeAggregate closure never captures the pipeline instance). */
  private[ingest] def profileRow(
      acc: scala.collection.mutable.HashMap[(String, Boolean), ProfState],
      topic: String, ipc: Boolean, v: String, avroTopics: Set[String]): Unit = {
    val st = acc.getOrElseUpdate((topic, ipc),
      ProfState(0L, org.apache.spark.sql.types.StructType(Nil), null, 0L))
    st.n += 1
    if (!ipc && !avroTopics.contains(topic)) {
      graft.schema.SchemaInference.inferFromJson(v) match {
        case None => st.unparseable += 1
        case Some(_) if st.conflict != null => ()
        case Some(s) if st.schema.isEmpty => st.schema = s
        case Some(s) if s == st.schema => () // uniform stream fast path
        case Some(s) =>
          try st.schema = graft.schema.SchemaUnify.unify2(st.schema, s)
          catch {
            case e: graft.schema.SchemaUnify.GraftSchemaException =>
              st.conflict = e.getMessage
          }
      }
    }
  }

  /** THREAD-LOCAL replay context: non-null while [[IngestPipeline
    * .replayDlq]] is landing parked rows on this thread, carrying the
    * DLQ snapshot id the replay read from. The write path uses it as an
    * idempotency watermark under a replay-specific app id — never the
    * shared trigger batch id, so a concurrent streaming trigger keeps
    * its own exactly-once path untouched. */
  private val replayTxn = new ThreadLocal[java.lang.Long]()

  /** Ships the seed schema to executors as JSON, deserializing once per
    * executor (`@transient lazy`) instead of once per record inside the
    * triage UDFs. */
  private final class SeedHolder(json: String) extends Serializable {
    @transient lazy val schema: StructType =
      DataType.fromJson(json).asInstanceOf[StructType]
    @transient lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** Process-wide REFERENCE-COUNTED scoping of the trigger-side session
    * confs (same discipline as the lake's write-side ConfScope: the first
    * entrant saves the application's values, only the last exit restores
    * them — concurrent pipelines on one session share the overlay).
    *
    * What it sets, and why: a micro-batch trigger runs ~a dozen small
    * actions over BOUNDED data (`maxOffsetsPerTrigger`), where wall time
    * is per-stage scheduling + AQE replanning latency, not compute — so
    * inside `processBatch` adaptive execution is off and the shuffle
    * fan-out small (measured on the ingest+dedup path: ~25% trigger
    * latency cut at identical results). Both are knobs, not constants:
    * `spark.graft.ingest.adaptive` / `spark.graft.ingest.shufflePartitions`
    * — crank them up for deployments with multi-GB triggers, where
    * per-trigger data volume stops being overhead-dominated.
    *
    * SHARED-SESSION caveat: session confs are session-global, so an
    * ad-hoc query submitted WHILE a trigger is in flight also plans with
    * AQE off and the small fan-out. In deployments that mix interactive
    * work and ingest on one application, build the SOURCE STREAM on its
    * own `spark.newSession()` (separate conf, shared catalog + context)
    * and hand that session's pipeline to [[IngestPipeline.start]] — the
    * overlay then never touches the interactive session. This cannot be
    * the pipeline's silent default: a DataFrame plans under the session
    * it was CREATED on, so the trigger frames arriving in foreachBatch
    * carry the caller's session no matter which session the pipeline
    * holds — an overlay applied to a private session would simply never
    * reach the plans it exists to shape. The knob belongs where the
    * stream is built. */
  private final class TriggerScope {
    private var depth = 0
    private var saved: Seq[(String, Option[String])] = Nil
    def enter(spark: SparkSession): Unit = synchronized {
      if (depth == 0) {
        val keys = Seq(
          "spark.sql.adaptive.enabled" ->
            spark.conf.getOption("spark.graft.ingest.adaptive")
              .getOrElse("false"),
          "spark.sql.shuffle.partitions" ->
            spark.conf.getOption("spark.graft.ingest.shufflePartitions")
              .getOrElse("8"))
        saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
        keys.foreach { case (k, v) => spark.conf.set(k, v) }
      }
      depth += 1
    }
    def exit(spark: SparkSession): Unit = synchronized {
      depth -= 1
      if (depth == 0) saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
  private val triggerScopes =
    new java.util.WeakHashMap[SparkSession, TriggerScope]()
  private def triggerScope(spark: SparkSession): TriggerScope =
    triggerScopes.synchronized {
      val existing = triggerScopes.get(spark)
      if (existing != null) existing
      else { val s = new TriggerScope; triggerScopes.put(spark, s); s }
    }
  private[ingest] def withTriggerConfs[T](spark: SparkSession)(f: => T): T = {
    val s = triggerScope(spark)
    s.enter(spark)
    try f finally s.exit(spark)
  }
}

/** The streaming ingestion engine: Kafka-shaped source → per-topic format
  * dispatch (JSON vs Arrow IPC by value sniff — mixed topics supported,
  * reference README.md:120-127) → schema inference/unification → landed
  * write (MERGE or INSERT via [[GraftLake]]) → per-record DLQ triage on
  * schema conflicts (reference E2, DucklakeSinkTask.java:1009-1097).
  *
  * Scale design: the source preserves Kafka partition parallelism; decode
  * and inference are executor-side (`mapPartitions` / treeAggregate);
  * per-batch flush maps to the micro-batch trigger with
  * `maxOffsetsPerTrigger` bounding batch size (B1/B2); buffering/spill/
  * memory-pressure handling (B3-B6) is delegated to Spark's own micro-batch
  * and memory machinery by design.
  */
final class IngestPipeline(spark: SparkSession, config: IngestConfig) {
  IngestConfig.validate(config)

  val lake = new GraftLake(spark, config.warehouse)
  val schemaCache = new SchemaCache

  /** Batch id of the micro-batch currently landing (foreachBatch
    * serializes per query) — the idempotent-append watermark. */
  private var currentBatchId: Long = -1L

  /** First-trigger fan-out decision, remembered for the pipeline's
    * lifetime (see processBatch). */
  @volatile private var fanoutDecision: Option[Boolean] = None

  import spark.implicits._

  /** Kafka-shaped input: (topic, partition, offset, value-bytes). */
  val inputSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("value", BinaryType)))

  /** Process one micro-batch (also the `foreachBatch` body). The batch is
    * cached for its lifetime — the per-topic fan-out and counters would
    * otherwise re-read the source once per pass. ONE job yields the topic
    * fan-out, the batch-size metric, the per-topic wire-format dispatch
    * AND the per-topic JSON schema inference (per-trigger fixed job count
    * is streaming flush latency — r8 folded the two format isEmpty probes
    * into one count, r9 folded that count into the fan-out job, this
    * folds the per-topic schema-inference pass in too via
    * [[profileBatch]], leaving the steady-state JSON trigger at TWO jobs
    * without a DLQ — profile + landing write — and three with one: the
    * corrupt-record probe must re-check every landing batch, because
    * from_json's corrupt set is not derivable from the inference
    * profile). */
  def processBatch(batch: DataFrame, batchId: Long): Unit =
      IngestPipeline.withTriggerConfs(spark) {
    // foreachBatch serializes batches per query; the landing code reads
    // this for the idempotent-append watermark
    currentBatchId = batchId
    // a trigger that arrives on FEWER partitions than the fan-out floor
    // (a single-partition topic, a filtered replay, a bench harness frame)
    // would run its ENTIRE flush — format sniff, inference, JSON parse,
    // landing projection — on that many cores. Spreading the raw bytes
    // first is one trivial shuffle (a trigger is offset-bounded); batches
    // that already carry enough source partitions (the 100 TB shape,
    // where Kafka partition count IS the parallelism) are left untouched
    val minFanout = spark.conf.getOption("spark.graft.ingest.minFanout")
      .map(_.toInt)
      .getOrElse(math.min(8, spark.sparkContext.defaultParallelism))
    // the partition probe costs a physical planning of the batch frame.
    // A first trigger that already carries enough partitions decides NO —
    // but only until the next RE-PROBE (every 16 batches): a stream's
    // source partitioning is usually stable (wide sources pay the probe
    // 1/16th of the time), yet a topic rebalance or a filtered replay can
    // turn a wide stream skinny mid-life, and a lifetime pin would then
    // run whole flushes on too few cores with no recovery short of a
    // restart. A skinny trigger keeps probing per batch: the spread must
    // never SHRINK a later wide batch down to the floor (a blind
    // repartition would), and on the skinny pipelines that reach here the
    // probe is planning a trivial frame anyway
    val needsSpread = fanoutDecision match {
      case Some(false) if batchId % 16 != 0 => false
      case _ =>
        val d = minFanout > 1 && batch.rdd.getNumPartitions < minFanout
        fanoutDecision = Some(d)
        d
    }
    val spread = if (needsSpread) batch.repartition(minFanout) else batch
    // tagged once for the whole batch — Avro-configured topics just
    // ignore the column
    val cached = spread.withColumn("__ipc", ipcSniff).cache()
    try {
      val profiled = profileBatch(cached)
      GraftMetrics.recordBatch(profiled.map(_._3).sum)
      // topics sort so multi-topic batches process in a stable order
      profiled.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (topic, rows) =>
        val table = config.tableFor(topic)
        val records = cached.filter(col("topic") === topic)
          .select(col("value"), col("partition"), col("offset"), col("__ipc"))
        val fmtCounts = rows.map(r => r._2 -> r._3).toMap
        val jsonProfile = rows.find(!_._2).map(_._4)
        processTopic(topic, table, records, fmtCounts, jsonProfile)
      }
    } finally cached.unpersist()
  }

  /** What the fan-out job learned about a topic's JSON rows: the unified
    * schema (None = no record parsed), the first unification conflict
    * (Some = the batch needs per-record triage), and the unparseable-value
    * count (0 = the landing write may skip its corrupt-record probe). */
  private case class BatchProfile(schemaJson: Option[String],
    conflict: Option[String], unparseable: Long)


  /** ONE pass over the cached batch computing, per (topic, wire format):
    * record count, unified JSON schema, first unification conflict and
    * unparseable count. An RDD `treeAggregate` rather than a Catalyst
    * aggregate on purpose: a typed-imperative aggregate would kick the
    * whole stage — including the format sniff and the cache-populating
    * scan — out of whole-stage codegen, and the per-trigger fixed cost is
    * exactly what this fights. Schemas cross the wire once per partition
    * tree level, never data; a conflict freezes the state and comes back
    * as DATA (triage is per record anyway), never as a task failure. A
    * null JSON VALUE (Kafka tombstone) counts unparseable, exactly as the
    * per-record path treated it. Avro-configured topics skip inference —
    * their reader schema is config, not inferred. */
  private def profileBatch(
      cached: DataFrame): Array[(String, Boolean, Long, BatchProfile)] = {
    val rows = cached.select(col("topic"), col("__ipc"),
      col("value").cast("string").as("__v"))
    // plain aggregate, not treeAggregate: only schema-sized states reach
    // the driver (one tiny map per partition), and treeAggregate would
    // add a scale-down SHUFFLE STAGE even for single-digit partition
    // counts — a fixed per-trigger stage for nothing
    val zero = scala.collection.mutable.HashMap.empty[(String, Boolean), IngestPipeline.ProfState]
    val avro = config.avroSchemas.keySet // serializable capture, not `config`
    val agg = rows.rdd.aggregate(zero)(
      (acc, r) => {
        IngestPipeline.profileRow(acc, r.getString(0), r.getBoolean(1),
          if (r.isNullAt(2)) null else r.getString(2), avro)
        acc
      },
      (a, b) => {
        b.foreach { case (k, s) =>
          a.get(k) match {
            case None => a.put(k, s)
            case Some(t) =>
              t.n += s.n; t.unparseable += s.unparseable
              if (t.conflict == null) {
                if (s.conflict != null) { t.conflict = s.conflict }
                else if (t.schema.isEmpty) t.schema = s.schema
                else if (s.schema.nonEmpty && s.schema != t.schema) {
                  try t.schema = SchemaUnify.unify2(t.schema, s.schema)
                  catch {
                    case e: SchemaUnify.GraftSchemaException =>
                      t.conflict = e.getMessage
                  }
                }
              }
          }
        }
        a
      })
    agg.toArray.map { case ((topic, ipc), st) =>
      (topic, ipc, st.n, BatchProfile(
        if (st.schema.isEmpty) None else Some(st.schema.json),
        Option(st.conflict), st.unparseable))
    }
  }

  /** Native codegen'd wire-format sniff (same contract as
    * ArrowIpc.looksLikeIpc): the 0xFFFFFFFF continuation marker in the
    * first 4 bytes + 8-byte minimum. coalesce(false) keeps null payloads
    * on the JSON path, matching the former UDF's null => false. */
  private def ipcSniff: org.apache.spark.sql.Column =
    coalesce(
      length(col("value")) >= 8 &&
        substring(col("value"), 1, 4) === lit(Array[Byte](-1, -1, -1, -1)),
      lit(false))

  /** Dispatch one topic's records by wire format and land them. Topics with
    * a configured Avro reader schema are schemaful (Connect-converter
    * analog); otherwise records dispatch on the batch-level sniff tag as
    * Arrow IPC vs JSON (mixed topics supported) — `fmtCounts` came out of
    * the fan-out job, so the dispatch costs no job here. */
  private def processTopic(topic: String, table: String, records: DataFrame,
      fmtCounts: Map[Boolean, Long],
      jsonProfile: Option[BatchProfile]): Unit = {
    if (config.avroSchemas.contains(topic)) {
      processAvro(topic, table, records)
      return
    }
    if (fmtCounts.getOrElse(true, 0L) > 0)
      processArrowIpc(topic, table, records.filter(col("__ipc")))
    if (fmtCounts.getOrElse(false, 0L) > 0)
      processJson(topic, table, records.filter(!col("__ipc")),
        fmtCounts(false), jsonProfile)
  }

  // ---- Avro path (S7) ----

  private def processAvro(topic: String, table: String, records: DataFrame): Unit = {
    val schemaJson = config.avroSchemas(topic)
    val sparkSchema = AvroDecode.toSparkType(
      AvroDecode.readerSchema(schemaJson)).asInstanceOf[StructType]
    val rows = records.select(col("value"), col("offset"))
      .as[(Array[Byte], Long)].rdd
      .mapPartitions { it =>
        // one parsed schema + datum reader + recycled decoder per partition
        val decoder = new AvroRowDecoder(schemaJson, sparkSchema)
        it.map { case (bytes, offset) =>
          Row.fromSeq(decoder.decode(bytes).toSeq :+ offset)
        }
      }
    val withOffset = StructType(
      sparkSchema.fields.toSeq :+ StructField("__offset", LongType))
    writeToLake(table, spark.createDataFrame(rows, withOffset))
  }

  // ---- JSON path (S3/C2/C3) ----

  /** Ingestion-time near-dup gate: probe the table's persisted LSH index
    * (`{table}_lshidx_docs` / `_bands`, created by the first batch), flag
    * or drop duplicates, and admit survivors into the index. Probing and
    * admission are batch-bounded — the corpus is never re-sketched
    * (reference identity: curation happens ON ingest, not as a later
    * full-corpus pass). A batch whose inferred schema lacks the configured
    * columns lands un-flagged and bumps `dedup.skipped.batches` — schema
    * drift must not poison the stream, but it must be visible.
    *
    * Admission runs before the landing write, both inside one transaction
    * (see writeToLake). An admission that LEAKS past a rollback — a
    * driver crash between the index-admission commit and the landing
    * commit is outside any in-process compensation — is absorbed on
    * redelivery: the probe exempts a doc whose OWN id already band-matches
    * in the index from both dup flagging and re-admission, so the
    * redelivered rows land (txn watermark / PK last-wins dedup the landing
    * side) instead of self-flagging and, under dropDups, being dropped
    * permanently.
    *
    * `nRecords` (the profiled batch row count, -1 = unknown) gates the
    * trigger-sized-batch optimizations: above
    * `spark.graft.ingest.dedupBroadcastMaxRows` (default 5M) the flag
    * frame joins without a broadcast hint (AQE picks) and admission writes
    * proportional-to-data slices instead of coalesce(1) — a backfill
    * replay must degrade to shuffles, not fail the stream on the
    * broadcast limit or serialize its index write onto one task. */
  private def applyDedup(table: String, dc: DedupConfig,
      df: DataFrame, nRecords: Long): (DataFrame, Option[() => Unit]) = {
    if (!df.columns.contains(dc.idCol) || !df.columns.contains(dc.textCol)) {
      GraftMetrics.dedupSkippedBatches.increment()
      return (df, None)
    }
    val bcMax = spark.conf.getOption("spark.graft.ingest.dedupBroadcastMaxRows")
      .map(_.toLong).getOrElse(5000000L)
    val huge = nRecords >= 0 && nRecords > bcMax
    val admitSlices = if (!huge) 1
      else math.min(64L, (nRecords + GraftLake.maxRecordsPerFile - 1) /
        GraftLake.maxRecordsPerFile).toInt
    val probe = df
      .select(col(dc.idCol), col(dc.textCol).cast("string").as(dc.textCol))
      .dropDuplicates(dc.idCol)
    // STAGED: the probe runs now (flags are stable — the dup set is
    // checkpointed before any index mutation); admission is handed back
    // so writeToLake commits it inside ONE transact with the landing
    // write — index and table never diverge on an in-process flush failure
    val (flags, admit) = GraftMetrics.time(GraftMetrics.IngestDedup) {
      graft.operators.DedupOps.incrementalNearDupsStaged(
        lake, s"${table}_lshidx", probe, dc.idCol, dc.textCol,
        dc.threshold, dc.shingleK, dc.bands, dc.rowsPerBand,
        parallelAdmit = true, hintBroadcast = !huge,
        admitSlices = admitSlices)
    }
    // the flag frame is batch-bounded (ids + a bit) — broadcast it back
    // onto the batch rather than shuffling the landing projection (gated:
    // see nRecords above)
    val flagsRenamed = flags.withColumnRenamed("is_dup", dc.flagCol)
    val flagged = df
      .join(if (huge) flagsRenamed else broadcast(flagsRenamed),
        Seq(dc.idCol), "left")
      .withColumn(dc.flagCol, coalesce(col(dc.flagCol), lit(0L)))
    (if (dc.dropDups) flagged.filter(col(dc.flagCol) === 0L).drop(dc.flagCol)
     else flagged, Some(admit))
  }

  /** Ingestion-time quality gate: score the batch map-side and flag (or
    * drop) failures. A batch whose inferred schema lacks the text column
    * lands un-flagged and bumps `quality.skipped.batches` — schema drift
    * must not poison the stream, but it must be visible. Runs BEFORE the
    * dedup gate so junk rows never pay LSH sketching or index admission. */
  private def applyQuality(table: String, qc: QualityConfig, df: DataFrame): DataFrame = {
    if (!df.columns.contains(qc.textCol)) {
      GraftMetrics.qualitySkippedBatches.increment()
      return df
    }
    GraftMetrics.time(GraftMetrics.IngestQuality) {
      val text = col(qc.textCol).cast("string")
      val checks = Seq(
        length(coalesce(text, lit(""))) >= qc.minChars,
        graft.operators.TextOps.qualityScore(coalesce(text, lit(""))) >= qc.minScore) ++
        (if (qc.langAllow.nonEmpty)
          Seq(graft.operators.TextOps.langIdPredict(coalesce(text, lit("")))
            .isin(qc.langAllow: _*))
        else Nil)
      val ok = checks.reduce(_ && _)
      if (qc.dropFailures) df.filter(ok)
      else df.withColumn(qc.flagCol, when(ok, 1L).otherwise(0L))
    }
  }

  private def writeToLake(table: String, rawDf: DataFrame,
      nRecords: Long = -1L): Unit = {
    val gated = config.quality.get(table) match {
      case Some(qc) => applyQuality(table, qc, rawDf)
      case None => rawDf
    }
    val (deduped, admitIndex) = config.dedup.get(table) match {
      case Some(dc) => applyDedup(table, dc, gated, nRecords)
      case None => (gated, None)
    }
    val (df, gateDone) = applyConstraintGate(table, deduped)
    val pks = config.pks.getOrElse(table, Nil)
    val preExisted = lake.tableExists(table)
    val upsertPath = preExisted && pks.nonEmpty
    val op = if (upsertPath) GraftMetrics.UpsertWithMergeInto
      else GraftMetrics.SimpleInsert
    val hasOffset = df.columns.contains("__offset")
    // the watermark: the trigger's batch id normally; during a DLQ
    // replay the thread-local replay context supplies the DLQ snapshot
    // id instead (monotonic per target table), so a crashed-and-re-run
    // replay no-ops rather than duplicating, without touching the
    // trigger thread's batch id
    val txnVersion: Option[Long] = IngestPipeline.replayTxn.get() match {
      case v if v != null => Some(v)
      case _ if currentBatchId >= 0 => Some(currentBatchId)
      case _ => None
    }
    def land(): Unit = GraftMetrics.time(op) {
      (config.txnAppId, txnVersion) match {
        case (Some(app), Some(ver)) if !upsertPath =>
          // exactly-once append: the watermark commits WITH the data, so
          // a redelivered batch (or replay) no-ops (IngestConfig.txnAppId)
          val appId = if (IngestPipeline.replayTxn.get() != null)
            s"$app:replay:$table" else s"$app:$table"
          val applied = lake.appendIdempotent(table,
            df.drop((if (hasOffset) Seq("__offset") else Nil): _*),
            appId, ver,
            partitions = config.partitions.getOrElse(table, Nil), pks = pks)
          if (!applied) GraftMetrics.op("txnSkippedBatches").record(0L)
        case _ =>
          lake.write(table, df,
            partitions = config.partitions.getOrElse(table, Nil),
            pks = pks,
            ordering = if (hasOffset) Seq(col("__offset")) else Nil,
            exclude = if (hasOffset) Seq("__offset") else Nil)
      }
    }
    // the pipeline owns policy timing for its tables: standing
    // graft.policy.* hooks stay out of the landing (and its index
    // transaction) and run post-flush below, config-first
    try graft.catalog.GraftLake.withPoliciesSuppressed { admitIndex match {
      case Some(admit) =>
        // index admission and the landing commit are ONE transaction: a
        // flush that fails after admitting rolls the index back too, so
        // within a live process the persisted LSH index never runs ahead
        // of the table it curates. (A driver CRASH between the two commits
        // is outside compensation — that leak is absorbed at probe time:
        // redelivered ids are exempt from flagging/re-admission, see
        // applyDedup.) transactOwned (this pipeline is the members' only
        // writer — foreachBatch serializes triggers) so admission and
        // landing run CONCURRENTLY: all three writes read only
        // checkpointed probe state + the trigger cache, and a streaming
        // flush pays ONE write's latency, not three in sequence. The
        // admission future is quiesced before any rollback — compensating
        // a member while its append is mid-flight would race
        lake.transactOwned(Seq(table,
            s"${table}_lshidx_docs", s"${table}_lshidx_bands")) {
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration.Duration
          val fAdmit = Future(admit())
          try { land(); Await.result(fAdmit, Duration.Inf) }
          catch {
            case e: Throwable =>
              scala.util.Try(Await.ready(fAdmit, Duration.Inf))
              throw e
          }
        }
      case None => land()
    } } finally gateDone() // release the cached gate frame even on failure
    // post-flush auto-compaction: the trigger check is O(1) against the
    // commit cache, so polling it every micro-batch costs nothing
    config.autoCompact.get(table).foreach { cc =>
      if (lake.liveFileCount(table) >= cc.minFiles)
        GraftMetrics.time(GraftMetrics.AutoCompact) {
          lake.compact(table, cc.targetRecordsPerFile, clusterBy = cc.clusterBy)
        }
    }
    // post-flush auto-rebucket: metadata-only mean-bucket-size probe;
    // the doubling itself is the incremental rebucket, safe under the
    // stream's continuing flushes. ADVISORY: a lost race (external
    // rewrite churn exhausting one bucket's attempts) must not kill the
    // ingest stream — the next flush resumes the migration anyway (the
    // flip no-ops, remaining foreign buckets retry)
    config.autoRebucket.get(table).foreach { rc =>
      try lake.maybeAutoRebucket(table, rc.targetRowsPerBucket, rc.maxBuckets,
        rc.maxGroupsPerFlush)
      catch {
        case scala.util.control.NonFatal(e) =>
          GraftMetrics.op("autoRebucketDeferred").record(0L)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"auto-rebucket of '$table' deferred to the next flush: $e")
      }
    }
    // post-flush snapshot retention: expiry batches up per `slack` commits
    // (the versions listing is bounded by keepLast + slack precisely
    // because this keeps pruning it); expireSnapshots meters itself
    config.retention.get(table).foreach { rc =>
      if (lake.versions(table).size >= rc.keepLast + rc.slack)
        lake.expireSnapshots(table, rc.keepLast)
    }
    // post-flush bloom maintenance: blooms ONLY the files this (and any
    // missed) flush added — O(new files), so the probe index never decays
    if (config.bloomRefresh.contains(table))
      GraftMetrics.time("bloomRefresh") { lake.refreshBloomIndexes(table) }
    // standing graft.policy.* table properties, CONFIG-FIRST: kinds this
    // IngestConfig already handled above are excluded, so a table can
    // carry a warehouse-wide standing policy while a pipeline override
    // stays authoritative for its own stream
    lake.runStandingPolicies(table, exclude =
      (if (config.autoCompact.contains(table)) Set("autoCompact")
       else Set.empty[String]) ++
      (if (config.autoRebucket.contains(table)) Set("autoRebucket")
       else Set.empty[String]) ++
      (if (config.retention.contains(table)) Set("retention")
       else Set.empty[String]))
  }

  private def processJson(topic: String, table: String, records: DataFrame,
      nRecords: Long, profile: Option[BatchProfile]): Unit = {
    // NO second cache: `records` projects the batch-level cache, so every
    // triage re-read is an in-memory scan already — a per-batch cache here
    // would just pay a second memory-store write per trigger
    val values = records
      .select(col("value").cast("string").as("v"), col("partition"), col("offset"))
    // the batch's schema came out of the fan-out job ([[BatchProfile]]) —
    // no per-topic inference job. Conflicts arrived as DATA (the
    // aggregator never throws), so only the cached-topic-schema merge can
    // still throw here; either way the batch routes to per-record triage
    val inferred: Either[Throwable, Option[StructType]] = profile match {
      case Some(p) if p.conflict.isDefined =>
        Left(new SchemaUnify.GraftSchemaException(p.conflict.get))
      case Some(p) =>
        try Right(p.schemaJson
          .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[StructType])
          .map(s => schemaCache.unifiedFor(topic, Seq(s))))
        catch { case e: SchemaUnify.GraftSchemaException => Left(e) }
      case None =>
        // defensive fallback (a caller outside processBatch): the classic
        // separate inference pass
        try Right(SchemaInference.inferSchemaDistributed(values.select("v").as[String])
          .map(s => schemaCache.unifiedFor(topic, Seq(s))))
        catch {
          case e: org.apache.spark.SparkException
              if causeChainHasSchemaConflict(e) => Left(e)
          case e: SchemaUnify.GraftSchemaException => Left(e)
        }
    }
    inferred match {
      case Right(None) =>
        // NO record in the batch yielded a schema — every one is
        // unparseable. They must not vanish (reference: every record is
        // either landed or reported): DLQ them all, or fail loudly.
        if (nRecords > 0) config.dlqTable match {
          case Some(dlq) => sendToDlq(dlq, table,
            values.select(col("v"), col("partition"), col("offset")),
            "unparseable JSON")
          case None =>
            val samples = values.orderBy(col("partition"), col("offset"))
              .select(col("partition"), col("offset")).limit(5).collect()
              .map(r => s"${r.getInt(0)}@${r.getLong(1)}").mkString(", ")
            throw new SchemaUnify.GraftSchemaException(
              s"No record in topic '$topic' batch parses as JSON and no " +
                s"DLQ configured; sample records (partition@offset): $samples")
        }
      case Right(Some(unified)) =>
        // the batch unified INTERNALLY and with the topic cache, but can
        // still conflict with the TABLE schema (cross-topic routing, a
        // fresh cache over an old table): that conflict surfaces as the
        // evolution rejection — triage per record, never crash the stream
        try landJson(table, values, unified, nRecords)
        catch {
          case e: graft.catalog.LandedTypes.SchemaEvolutionException =>
            triageEvolution(topic, table, values, e)
        }
      case Left(_) => triageJson(topic, table, values)
    }
  }

  /** Per-record triage for batch-vs-TABLE evolution conflicts: each record
    * is checked against the table's CURRENT schema with the real landing
    * rules ([[graft.catalog.LandedTypes.evolve]] over the record's landed
    * schema — so nested fields compare in landed form, widenings pass);
    * incompatible records park with the evolution reason, the rest land
    * under their own unified schema (which now evolves cleanly by
    * construction). */
  private def triageEvolution(topic: String, table: String,
      values: DataFrame, cause: Exception): Unit = {
    if (config.dlqTable.isEmpty) throw cause
    val tableSchema = StructType(lake.readMeta(table).schema
      .filterNot(_.name == lake.InsertedAtCol).toSeq)
    val tableHolder = new IngestPipeline.SeedHolder(tableSchema.json)
    val errorDetail = udf { (v: String) =>
      SchemaInference.inferFromJson(v) match {
        case None => null: String
        case Some(s) =>
          try {
            graft.catalog.LandedTypes.evolve(tableHolder.schema,
              graft.catalog.LandedTypes.landedSchema(s))
            null: String
          } catch {
            case e: Exception =>
              s"Incompatible with table '$table' schema: ${e.getMessage}"
          }
      }
    }
    val tagged = values.withColumn("__err", errorDetail(col("v"))).cache()
    try {
      val bad = tagged.filter(col("__err").isNotNull)
      sendToDlq(config.dlqTable.get, table,
        bad.select(col("v"), col("partition"), col("offset"),
          col("__err").as("error")))
      val good = tagged.filter(col("__err").isNull)
        .select(col("v"), col("partition"), col("offset"))
      if (!good.isEmpty) {
        val unified =
          try SchemaInference.inferSchemaDistributed(good.select("v").as[String])
          catch {
            case e: Exception =>
              sendToDlq(config.dlqTable.get, table, good,
                "table-compatible records conflict pairwise: " + e.getMessage)
              None
          }
        unified.foreach(u => landJson(table, good, u))
      }
    } finally tagged.unpersist()
  }

  /** Reference E1: conflict detection via the exception cause chain
    * (DucklakeSinkTask.java:989-1003) — here typed where possible, message
    * sniff only across Spark's task-failure wrapper. */
  private def causeChainHasSchemaConflict(e: Throwable): Boolean = {
    var cur: Throwable = e
    while (cur != null) {
      if (cur.isInstanceOf[SchemaUnify.GraftSchemaException]) return true
      if (cur.getMessage != null &&
        cur.getMessage.contains("Cannot unify incompatible types")) return true
      cur = cur.getCause
    }
    false
  }

  /** Parse + land one topic's JSON rows under `schema`. `nRecords` (known
    * from the fan-out job, never re-counted) sizes the landing write:
    * the batch coalesces to ceil(n / maxRecordsPerFile) slices, so a
    * trigger-sized batch lands as ONE file per flush instead of one tiny
    * file per upstream partition — fewer write tasks, fewer footer-stats
    * reads, fewer manifest entries, less auto-compaction pressure — while
    * a genuinely large trigger keeps one task per target-sized file
    * (parallelism stays proportional to data; `maxRecordsPerFile` still
    * rolls oversized tasks). The corrupt-record DLQ probe always runs
    * when a DLQ is configured: from_json's corrupt set is NOT a subset of
    * what per-record inference found unparseable (inference types an
    * array by its FIRST element and sniffs timestamps with its own
    * grammar, so a record can infer cleanly yet fail from_json
    * conversion) — skipping the probe on a zero-unparseable profile
    * would silently drop exactly those records. */
  private def landJson(table: String, values: DataFrame, schema: StructType,
      nRecords: Long = -1L): Unit = {
    // corrupt-record channel: from_json yields an all-null struct for
    // malformed input, so a dedicated corrupt column is the reliable signal
    val corrupt = "_graft_corrupt"
    val parseSchema = StructType(
      schema.fields.toSeq :+ StructField(corrupt, StringType))
    val parsed = values
      .withColumn("__parsed", from_json(col("v"), parseSchema,
        Map("columnNameOfCorruptRecord" -> corrupt)))
      .withColumn("__corrupt", col(s"__parsed.`$corrupt`"))
      .withColumn("__offset", col("offset"))
    val good0 = parsed.filter(col("__corrupt").isNull && col("__parsed").isNotNull)
      .select((schema.fieldNames.map(n => col(s"__parsed.`$n`").as(n)) :+
        col("__offset")).toSeq: _*)
    // repartition, NOT coalesce: coalesce would collapse the parse itself
    // onto `slices` cores; the shuffle moves only already-parsed rows of
    // one trigger, and the parse keeps the batch's full parallelism
    val good = if (nRecords < 0) good0 // triage subset: size unknown, land as-is
      else good0.repartition(math.max(1L, math.min(Int.MaxValue.toLong,
        (nRecords + GraftLake.maxRecordsPerFile - 1) /
          GraftLake.maxRecordsPerFile)).toInt)
    writeToLake(table, good, nRecords)
    config.dlqTable.foreach { dlq =>
      val bad = parsed.filter(col("__corrupt").isNotNull || col("__parsed").isNull)
      if (!bad.isEmpty) sendToDlq(dlq, table, bad
        .select(col("v"), col("partition"), col("offset")), "unparseable JSON")
    }
  }

  /** Reference E2 per-record DLQ triage: on a batch-level schema conflict,
    * each record is retried solo against a deterministic target schema (the
    * cached topic schema, else the schema of the lowest-offset record);
    * records whose schema cannot unify go to the DLQ — with a per-record
    * error naming the offending field(s), both types, and the record's own
    * sample value (reference ArrowSchemaMerge.java:76-87,
    * SinkRecordToArrowConverterTest.java:518-537) — the rest are re-batched
    * and landed. With no DLQ configured the batch fails with
    * `partition@offset` samples (DucklakeSinkTask.java:643-667). */
  private def triageJson(topic: String, table: String, values: DataFrame): Unit = {
    if (config.dlqTable.isEmpty) {
      val samples = values.orderBy(col("partition"), col("offset"))
        .select(col("partition"), col("offset")).limit(5).collect()
        .map(r => s"${r.getInt(0)}@${r.getLong(1)}").mkString(", ")
      throw new SchemaUnify.GraftSchemaException(
        s"Schema conflict in topic '$topic' and no DLQ configured; " +
          s"sample records (partition@offset): $samples")
    }
    val seed: StructType = schemaCache.get(topic).getOrElse {
      val first = values.orderBy(col("partition"), col("offset"))
        .select("v").as[String].head()
      SchemaInference.inferFromJson(first).getOrElse(StructType(Nil))
    }
    val holder = new IngestPipeline.SeedHolder(seed.json)
    // null = compatible; else the enriched per-record error message
    val errorDetail = udf { (v: String) =>
      SchemaInference.inferFromJson(v) match {
        case None => null: String
        case Some(s) =>
          val seedT = holder.schema
          try { SchemaUnify.unify(Seq(seedT, s)); null: String }
          catch {
            case outer: Exception =>
              val node =
                try holder.mapper.readTree(v)
                catch { case _: Exception => null }
              val perField = s.fields.toSeq.flatMap { f =>
                seedT.fields.find(_.name == f.name).flatMap { sf =>
                  try { SchemaUnify.unifyTypes(f.name, Seq(sf.dataType, f.dataType)); None }
                  catch {
                    case _: Exception =>
                      val sample = Option(node).flatMap(n => Option(n.get(f.name)))
                        .map(_.toString.take(64)).getOrElse("?")
                      Some(s"field '${f.name}': topic type ${sf.dataType.simpleString} " +
                        s"vs record type ${f.dataType.simpleString} (sample: $sample)")
                  }
                }
              }
              "Cannot unify incompatible types with topic schema: " +
                (if (perField.isEmpty) outer.getMessage else perField.mkString("; "))
          }
      }
    }
    val tagged = values.withColumn("__err", errorDetail(col("v"))).cache()
    try {
      val bad = tagged.filter(col("__err").isNotNull)
      sendToDlq(config.dlqTable.get, table,
        bad.select(col("v"), col("partition"), col("offset"),
          col("__err").as("error")))
      val good = tagged.filter(col("__err").isNull)
        .select(col("v"), col("partition"), col("offset"))
      if (!good.isEmpty) {
        // "good" records each unify with the seed, but may still conflict
        // pairwise (two records adding the same NEW field with different
        // types). In that case land under the seed schema alone — every
        // good record parses under it; the conflicting new fields are
        // dropped for this batch rather than poisoning the stream. An
        // EMPTY seed (first record was uninferrable) can't play that
        // role: re-seed from the lowest-offset good record so the
        // survivors still land, and as a last resort DLQ them — a triage
        // pass must never silently drop records.
        val unified =
          try SchemaInference.inferSchemaDistributed(good.select("v").as[String])
            .map(s => schemaCache.unifiedFor(topic, Seq(s)))
            .getOrElse(seed)
          catch {
            case e: Throwable if causeChainHasSchemaConflict(e) =>
              if (seed.nonEmpty) seed
              else {
                val inferrable = udf { (v: String) =>
                  SchemaInference.inferFromJson(v).isDefined
                }
                good.filter(inferrable(col("v")))
                  .orderBy(col("partition"), col("offset"))
                  .select("v").as[String].take(1).headOption
                  .flatMap(SchemaInference.inferFromJson)
                  .getOrElse(StructType(Nil))
              }
          }
        if (unified.nonEmpty) landJson(table, good, unified)
        else sendToDlq(config.dlqTable.get, table, good,
          "pairwise schema conflict and no resolvable seed schema for topic '" +
            topic + "'")
      }
    } finally tagged.unpersist()
  }

  /** CHECK-constraint gate (the reference's per-record triage shape, E2):
    * with a DLQ configured, rows violating any live table constraint
    * route there INDIVIDUALLY — payload re-serialized as JSON, error
    * naming the violated constraint(s) — and the clean remainder lands.
    * The engine's own enforcement (atomic batch abort, correct for batch
    * writers) would turn one bad record into a poison pill under
    * at-least-once redelivery: the stream re-reads the batch and aborts
    * forever. With no DLQ configured, or a constraint referencing a
    * column this batch doesn't carry, the gate steps aside and the write
    * path's enforcement aborts loudly. */
  private def applyConstraintGate(table: String,
      df: DataFrame): (DataFrame, () => Unit) = {
    val pass = (df, () => ())
    if (config.dlqTable.isEmpty || !lake.tableExists(table)) return pass
    val cs = lake.constraints(table)
    if (cs.isEmpty) return pass
    val checks = cs.map { case (n, text) =>
      n -> coalesce(expr(text), lit(true))
    }
    val resolvable =
      try { df.select(checks.map(_._2): _*).queryExecution.analyzed; true }
      catch { case _: Exception => false }
    if (!resolvable) return pass
    // concat_ws skips nulls: the column lists exactly the violated names.
    // The tagged frame is CACHED and released by the caller after the
    // landing write — the DLQ split and the write must not re-run the
    // quality/dedup lineage, and the job count per trigger stays fixed
    // (sendToDlq's own count doubles as the emptiness check)
    val violName = concat_ws(", ", checks.map { case (n, c) =>
      when(!c, lit(n))
    }: _*)
    val tagged = df.withColumn("__viol", violName).cache()
    val bad = tagged.filter(col("__viol") =!= "")
    val hasOffset = df.columns.contains("__offset")
    val payloadCols = df.columns.filterNot(_ == "__offset").toSeq
    sendToDlq(config.dlqTable.get, table,
      bad.select(
        to_json(struct(payloadCols.map(col): _*)).as("v"),
        lit(-1).as("partition"),
        (if (hasOffset) col("__offset") else lit(-1L)).as("offset"),
        concat(lit("CHECK constraint violation: "), col("__viol"))
          .as("error")))
    (tagged.filter(col("__viol") === "").drop("__viol"),
      () => { tagged.unpersist(); () })
  }

  /** Land bad records in the DLQ table. `records` carries the raw payload
    * (`v`), source `partition`/`offset`, and either a per-record `error`
    * column or none (then `error` supplies the constant message). */
  private def sendToDlq(dlq: String, table: String, records: DataFrame,
      error: String = null): Unit = {
    val n = records.count()
    if (n == 0) return
    GraftMetrics.dlqRecords.add(n)
    val withErr =
      if (records.columns.contains("error")) records
      else records.withColumn("error", lit(error))
    lake.append(dlq, withErr
      .select(col("v").as("value"), col("partition"), col("offset"), col("error"))
      .withColumn("target_table", lit(table)))
  }

  // ---- Arrow IPC path (S4/S6) ----

  private def processArrowIpc(topic: String, table: String, records: DataFrame): Unit = {
    // Pass 1: unify record schemas (schema-only header decode). A schema
    // conflict OR an undecodable record routes the batch to per-record
    // triage, same as the JSON path — a single corrupt payload must not
    // become a poison pill that fails the stream on every retry.
    val tried = records.select(col("value")).as[Array[Byte]].rdd
      .map(b =>
        try Right(ArrowIpc.decodeSchema(b))
        catch { case e: Exception => Left(e.getClass.getName) })
      .distinct().collect()
    val schemas = tried.collect { case Right(s) => s }
    if (tried.isEmpty) return
    if (tried.exists(_.isLeft)) { triageArrow(topic, table, records); return }
    val unified =
      try Some(schemaCache.unifiedFor(topic, schemas.toSeq))
      catch {
        case e: Throwable if causeChainHasSchemaConflict(e) =>
          triageArrow(topic, table, records); None
      }
    unified.foreach(u => landArrow(table, records, u))
  }

  /** Pass 2: decode + conform rows to the unified schema, land. */
  private def landArrow(table: String, records: DataFrame, unified: StructType): Unit = {
    val bytesRdd: RDD[(Array[Byte], Long)] = records
      .select(col("value"), col("offset")).as[(Array[Byte], Long)].rdd
    val unifiedJson = unified.json
    val rows: RDD[Row] = bytesRdd.mapPartitions { it =>
      val target = DataType.fromJson(unifiedJson).asInstanceOf[StructType]
      it.flatMap { case (bytes, offset) =>
        val (schema, rs) = ArrowIpc.decode(bytes)
        rs.map { r =>
          Row.fromSeq(ArrowIpc.conformRow(r, schema, target).toSeq :+ offset)
        }
      }
    }
    val withOffset = StructType(unified.fields.toSeq :+ StructField("__offset", LongType))
    writeToLake(table, spark.createDataFrame(rows, withOffset))
  }

  /** Reference E2 triage for the Arrow path: each record's schema is
    * retried solo against the deterministic seed (cached topic schema,
    * else the lowest-offset record's); incompatible or undecodable records
    * land in the DLQ with enriched per-field errors (payload base64'd into
    * the DLQ value column), the rest re-batch and land. */
  private def triageArrow(topic: String, table: String, records: DataFrame): Unit = {
    if (config.dlqTable.isEmpty) {
      val samples = records.orderBy(col("partition"), col("offset"))
        .select(col("partition"), col("offset")).limit(5).collect()
        .map(r => s"${r.getInt(0)}@${r.getLong(1)}").mkString(", ")
      throw new SchemaUnify.GraftSchemaException(
        s"Arrow schema conflict in topic '$topic' and no DLQ configured; " +
          s"sample records (partition@offset): $samples")
    }
    val seed: StructType = schemaCache.get(topic).getOrElse {
      val first = records.orderBy(col("partition"), col("offset"))
        .select("value").as[Array[Byte]].head()
      try ArrowIpc.decodeSchema(first) catch { case _: Exception => StructType(Nil) }
    }
    val holder = new IngestPipeline.SeedHolder(seed.json)
    val errorDetail = udf { (v: Array[Byte]) =>
      try {
        val s = ArrowIpc.decodeSchema(v)
        val seedT = holder.schema
        try { SchemaUnify.unify(Seq(seedT, s)); null: String }
        catch {
          case outer: Exception =>
            val sampleRow =
              try ArrowIpc.decode(v)._2.headOption catch { case _: Exception => None }
            val perField = s.fields.toSeq.flatMap { f =>
              seedT.fields.find(_.name == f.name).flatMap { sf =>
                try { SchemaUnify.unifyTypes(f.name, Seq(sf.dataType, f.dataType)); None }
                catch {
                  case _: Exception =>
                    val sample = sampleRow
                      .map(r => String.valueOf(r.get(s.fieldIndex(f.name))).take(64))
                      .getOrElse("?")
                    Some(s"field '${f.name}': topic type ${sf.dataType.simpleString} " +
                      s"vs record type ${f.dataType.simpleString} (sample: $sample)")
                }
              }
            }
            "Cannot unify incompatible types with topic schema: " +
              (if (perField.isEmpty) outer.getMessage else perField.mkString("; "))
        }
      } catch {
        case e: Exception => "undecodable Arrow IPC: " +
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName).take(120)
      }
    }
    val tagged = records.withColumn("__err", errorDetail(col("value"))).cache()
    try {
      val bad = tagged.filter(col("__err").isNotNull)
      sendToDlq(config.dlqTable.get, table,
        bad.select(base64(col("value")).as("v"), col("partition"), col("offset"),
          col("__err").as("error")))
      val good = tagged.filter(col("__err").isNull)
      if (!good.isEmpty) {
        val goodSchemas = good.select(col("value")).as[Array[Byte]].rdd
          .map(ArrowIpc.decodeSchema).distinct().collect()
        // good records each unify with the seed, but can conflict pairwise
        // (same NEW field, different types) — land under the seed alone
        // then. An EMPTY seed (first record undecodable) can't play that
        // role: re-seed deterministically from the lowest-offset good
        // record, and as a last resort DLQ the survivors — a triage pass
        // must never silently drop records.
        val unified =
          try schemaCache.unifiedFor(topic, goodSchemas.toSeq)
          catch {
            case e: Throwable if causeChainHasSchemaConflict(e) =>
              if (seed.nonEmpty) seed
              else {
                val firstGood = good.orderBy(col("partition"), col("offset"))
                  .select("value").as[Array[Byte]].head()
                try ArrowIpc.decodeSchema(firstGood)
                catch { case _: Exception => StructType(Nil) }
              }
          }
        if (unified.nonEmpty) landArrow(table, good, unified)
        else sendToDlq(config.dlqTable.get, table,
          good.select(base64(col("value")).as("v"), col("partition"), col("offset")),
          "pairwise schema conflict and no resolvable seed schema for topic '" +
            topic + "'")
      }
    } finally tagged.unpersist()
  }

  // ---- streaming assembly ----

  /** Kafka source wired to the engine's flush semantics: the micro-batch
    * trigger is flush.interval.ms, `maxOffsetsPerTrigger` is the
    * flush.size analog (bounds records per flush). Requires the
    * spark-sql-kafka connector on the classpath (not bundled in this
    * environment — tests drive [[start]] with file/memory sources of the
    * same shape). */
  def kafkaSource(bootstrapServers: String, topics: Seq[String]): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest")
    config.maxOffsetsPerTrigger.foreach(n =>
      base.option("maxOffsetsPerTrigger", n.toString))
    base.load().select(
      col("topic"), col("partition"), col("offset"), col("value"))
  }

  /** Start the pipeline over a Kafka-shaped streaming source (columns
    * topic/partition/offset/value). For a real Kafka cluster use
    * [[kafkaSource]]. Checkpointing gives at-least-once (the reference's
    * guarantee). */
  def start(source: DataFrame, checkpoint: String): StreamingQuery =
    source.writeStream
      .foreachBatch((df: Dataset[Row], id: Long) => processBatch(df.toDF(), id))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(config.triggerMs))
      .start()

  /** Re-drive a topic's dead-letter records through the normal decode →
    * land path — the loop-closer the DLQ exists for: records parked by a
    * since-resolved condition (no seed schema yet, a column that has
    * since evolved) land on replay; records that STILL fail re-triage
    * into the DLQ exactly as live traffic would.
    *
    * The DLQ rewrite leans on snapshots for correctness: the replayed
    * originals are the rows of the PRE-replay snapshot parked for
    * `fromTable` (default: the topic's CURRENT routing — pass it
    * explicitly after a remap, when the parked rows carry the old target
    * name); fresh failures are whatever the replay itself appended
    * ([[GraftLake.readAppendsBetween]] over the pre/post versions — they
    * share (partition, offset) with the originals, so identity-based
    * deletion could not tell them apart). The new DLQ contents = other
    * tables' rows + fresh failures.
    *
    * Returns (replayed, stillFailing). */
  def replayDlq(topic: String, fromTable: Option[String] = None): (Long, Long) = {
    val dlq = config.dlqTable.getOrElse(throw new IllegalStateException(
      "replayDlq requires a configured dlqTable"))
    if (!lake.tableExists(dlq)) return (0L, 0L)
    val parkedAs = fromTable.getOrElse(config.tableFor(topic))
    val pre = lake.versions(dlq).lastOption.getOrElse(return (0L, 0L))
    val all = lake.readVersion(dlq, pre)
    val mine = all.filter(col("target_table") === parkedAs).cache()
    try {
      val n = mine.count()
      if (n == 0) return (0L, 0L)
      // replay is not a hot path: one extra count job for the format
      // dispatch is fine here
      val tagged = mine.select(
        col("value").cast("binary").as("value"),
        col("partition"), col("offset")).withColumn("__ipc", ipcSniff)
      val fmtCounts = tagged.groupBy(col("__ipc")).count().collect()
        .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      // replays must not land under the TRIGGER watermark: the batch id
      // that parked these rows DID commit its clean rows, so
      // appendIdempotent at that id silently no-ops the whole replay.
      // The THREAD-LOCAL replay context (never the shared batch id — a
      // concurrent trigger keeps its own exactly-once path) swaps in the
      // DLQ snapshot id as the watermark instead: monotonic per target,
      // so a replay that crashed between landing and the DLQ rewrite
      // no-ops on re-run rather than duplicating.
      IngestPipeline.replayTxn.set(java.lang.Long.valueOf(pre))
      // jsonProfile = None: the replay path takes processJson's fallback
      // inference — replay is not a hot path
      try processTopic(topic, config.tableFor(topic), tagged, fmtCounts, None)
      finally IngestPipeline.replayTxn.remove()
      val post = lake.versions(dlq).last
      val fresh = lake.readAppendsBetween(dlq, pre, post)
      val still = fresh.count()
      lake.overwriteContents(dlq,
        all.filter(col("target_table") =!= parkedAs).unionByName(fresh))
      (n, still)
    } finally mine.unpersist()
  }
}
