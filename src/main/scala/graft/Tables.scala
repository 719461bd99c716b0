package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query entry in [[SparkEntry.queries]] receives `(spark, sfDir)` and
  * reads the parquet tables from `sfDir` through these helpers. Reads are
  * plain `spark.read.parquet` so Catalyst keeps full pushdown / pruning
  * freedom (PushedFilters + ReadSchema reach the scan).
  *
  * The loaders also absorb PHYSICAL-TYPE drift in the testdata: the
  * generator has already flipped `events.ts` between TIMESTAMP(NANOS) and
  * timestamp[us]-no-tz across regenerations (breaking one query for a
  * round), and the TPC-H date columns could drift the same way. Every
  * column listed in [[tsColumns]] is normalized per its READ type:
  *  - TIMESTAMP(NANOS): Spark's parquet reader rejects it outright — read
  *    nanos as long (`nanosAsLong`) and truncate to µs TimestampType, the
  *    same ns→µs truncation DuckDB applies, so oracle values align.
  *    Integer `div` (not `/`) — epoch-nanos exceed 2^53 and would lose
  *    precision through a double.
  *  - timestamp[us] without timezone (read as TIMESTAMP_NTZ): harmless for
  *    comparisons/grouping — those columns pass through as NTZ (their
  *    current, oracle-green read type) — EXCEPT `events.ts`, which feeds
  *    `unix_micros` (rejects NTZ) and is cast to session-tz TimestampType
  *    (session tz is UTC, so values match the oracle's naive timestamps).
  * When the read type is already the expected one, the columns pass through
  * untouched and scans keep full filter pushdown.
  */
object Tables {
  final val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp-semantics columns per table (castNtz = normalize NTZ to
    * session-tz TimestampType too, for downstream epoch functions). */
  private val tsColumns: Map[String, Seq[(String, Boolean)]] = Map(
    "orders" -> Seq(("o_orderdate", false)),
    "lineitem" -> Seq(("l_shipdate", false)),
    "events" -> Seq(("ts", true)))

  private def normalizeTs(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame =
    cols.foldLeft(df) { case (d, (c, castNtz)) =>
      d.schema(c).dataType match {
        case LongType =>
          d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case TimestampNTZType if castNtz =>
          d.withColumn(c, col(c).cast("timestamp"))
        case _ => d
      }
    }

  /** Session-scoped METADATA memo of loaded tables. `spark.read.parquet`
    * pays a fixed driver toll on every call — directory listing, a footer
    * schema-inference JOB, DataSource resolution — and the bench harness
    * loads the same static table hundreds of times per run, so that toll
    * was a per-query constant (~100–200 ms × 173 queries × 2 passes).
    * The memo holds the resolved DataFrame (logical READ PLAN: file
    * listing + schema), never rows — every execution still scans the
    * parquet inputs, and Catalyst keeps full pushdown/pruning freedom on
    * the shared plan. Keyed by session identity so cross-session reuse is
    * impossible ([[DataFrame]]s are session-bound); the `eq` re-check
    * guards identityHashCode collisions, and the size cap clears the memo
    * outright (always safe — it is only a fast path) so long-lived
    * multi-session processes (the test suite) cannot accumulate dead
    * sessions' plans. */
  private val dfMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // harmless when no nanos column exists; REQUIRED before a scan that has
    // one (the reader refuses TIMESTAMP(NANOS) otherwise)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val key = (System.identityHashCode(spark), sfDir, name)
    val hit = dfMemo.get(key)
    if (hit != null && (hit.sparkSession eq spark)) return hit
    if (dfMemo.size > 256) dfMemo.clear()
    val df = normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"),
      tsColumns.getOrElse(name, Nil))
    dfMemo.put(key, df)
    df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
