package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query entry in [[SparkEntry.queries]] receives `(spark, sfDir)` and
  * reads the parquet tables from `sfDir` through these helpers. Reads are
  * plain `spark.read.parquet` so Catalyst keeps full pushdown / pruning
  * freedom (PushedFilters + ReadSchema reach the scan).
  */
object Tables {
  final val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Normalizes `events.ts` to session-tz TimestampType regardless of the
    * physical parquet type the data generator picked:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it — read nanos
    *    as long and truncate to µs TimestampType, the same ns→µs truncation
    *    DuckDB applies, so oracle values align. Integer `div` (not `/`) —
    *    epoch-nanos exceed 2^53 and would lose precision through a double.
    *  - timestamp[us] without timezone: Spark 4 infers TIMESTAMP_NTZ, which
    *    `unix_micros` and friends reject — cast to TimestampType (session tz
    *    is UTC, so values match the oracle's naive timestamps). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
