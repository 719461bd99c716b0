package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Distributed parquet-footer bounds collection for large commit deltas.
  *
  * A commit that adds thousands of files (a 100 TB compaction or initial
  * load) must not serialize its footer reads through the driver — the
  * driver's job is the manifest, not I/O fan-out. This helper ships the
  * footer-reading function to executors with a broadcast Hadoop conf
  * (the standard Spark pattern for executor-side FS access; lives under
  * `org.apache.spark` because [[SerializableConfiguration]] is
  * spark-private). Small deltas stay on the driver's parallel-collection
  * path — a Spark job's scheduling latency would dominate a handful of
  * local footer reads.
  */
object FooterStatsJob {

  /** Read bounds for `files` = (fileKey, absolute path string) pairs in a
    * Spark job; entries whose reader returns empty are dropped (meaning
    * "cannot bound" — the pruner keeps those files). Generic in the
    * bounds value `B`, bounded `<: Serializable` so the
    * it-crosses-the-wire contract is compile-checked instead of failing
    * at runtime only on the distributed path. */
  def run[B <: Serializable](spark: SparkSession,
      files: Seq[(String, String)],
      reader: (Path, Configuration) => Map[String, B])
      : Map[String, Map[String, B]] = {
    if (files.isEmpty) return Map.empty
    val bc = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
    try {
      spark.sparkContext
        .parallelize(files.toVector,
          math.max(1, math.min(files.size,
            spark.sparkContext.defaultParallelism * 2)))
        .map { case (k, p) => k -> reader(new Path(p), bc.value.value) }
        .filter(_._2.nonEmpty)
        .collect().toMap
    } finally bc.destroy()
  }
}
