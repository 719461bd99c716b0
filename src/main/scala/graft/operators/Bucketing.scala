package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins: both sides pre-hashed into the same bucket
  * count on the join key at WRITE time, so repeated fact-fact joins read
  * bucket-aligned files and skip the shuffle entirely (Exchange-free
  * SortMergeJoin).
  *
  * This is the storage-layout answer to the biggest 100 TB cost in the
  * engine's query surface — lineitem⋈orders-shaped joins: pay one shuffle
  * at ingest, none per query. Bucketing requires the session catalog
  * (bucket metadata lives there), unlike the path-addressed [[graft.catalog.GraftLake]]
  * tables; use it for curated analytics tables downstream of the lake.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table at `path`. */
  def saveBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans without an
    * Exchange when bucket counts align. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
