package graft

import java.nio.file.Files

import graft.catalog.GraftLake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's MERGE-vs-INSERT measurement protocol (BASELINE.md:
  * DucklakeWriterIntegrationTest.java:262-489): a base table of `baseRows`
  * rows with schema (id INTEGER, name VARCHAR, created_at TIMESTAMP),
  * write batches of `batchRows` at the given PK-conflict rates, timing the
  * MERGE path vs the INSERT path.
  *
  * Comparable numbers: the reference documents 10-50 ms simpleInsert and
  * 30-100 ms upsertWithMergeInto per flushed batch (embedded DuckDB,
  * single node). Spark pays a fixed job-scheduling floor per write job
  * (~0.2-1 s on local mode), so the 10k-batch protocol measures mostly
  * that floor; `amortized` measures the same write paths at the
  * reference's real default flush size (flush.size = 1,000,000 rows,
  * DucklakeSinkConfig.java:129-135) where the floor amortizes away.
  *
  * Measurement discipline (round-2 fix for the r1 insert>merge inversion):
  * a discarded warm-up write precedes measurement, >=5 iterations are
  * taken, the merge/insert order alternates per iteration so neither path
  * systematically absorbs the other's GC/committer backwash, and the
  * reported statistic is the per-path median.
  */
object PerfHarness {

  final case class Result(conflictPct: Int, iter: Int, mergeMs: Double, insertMs: Double)

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def batchDf(spark: SparkSession, start: Long, n: Int): DataFrame = {
    spark.range(start, start + n)
      .select(col("id").cast("int").as("id"),
        concat(lit("name-"), col("id")).as("name"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("timestamp"))
          .as("created_at"))
  }

  private def timeMs(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
  }

  /** Run the protocol; returns per-iteration timings (warm-up discarded). */
  def run(spark: SparkSession, baseRows: Int = 100000, batchRows: Int = 10000,
      conflictPcts: Seq[Int] = Seq(1, 10, 30), iterations: Int = 5): Seq[Result] = {
    conflictPcts.flatMap { pct =>
      // -1 is the warm-up iteration: identical work, discarded result.
      (-1 until iterations).flatMap { iter =>
        val wh = Files.createTempDirectory("graft-perf").toString
        val lake = new GraftLake(spark, wh)
        lake.write("m", batchDf(spark, 0, baseRows), pks = Seq("id"))
        lake.write("i", batchDf(spark, 0, baseRows))
        val conflicts = batchRows * pct / 100
        // batch: `conflicts` existing ids + the rest new ids
        val batch = batchDf(spark, baseRows - conflicts, batchRows)
        // alternate order so neither path always runs cold-after-setup
        val (mergeMs, insertMs) =
          if (iter % 2 == 0) {
            val m = timeMs(lake.write("m", batch, pks = Seq("id")))
            val i = timeMs(lake.write("i", batch))
            (m, i)
          } else {
            val i = timeMs(lake.write("i", batch))
            val m = timeMs(lake.write("m", batch, pks = Seq("id")))
            (m, i)
          }
        // clean the throwaway warehouse (repeated bench runs must not
        // accumulate temp parquet or pin cache entries)
        lake.dropTable("m"); lake.dropTable("i")
        new java.io.File(wh).delete()
        if (iter < 0) None else Some(Result(pct, iter, mergeMs, insertMs))
      }
    }
  }

  /** Amortized protocol: flushes at the reference's default flush.size
    * (1M rows), reported as ms per 10k rows so the number is directly
    * comparable with the 10k-batch protocol and BASELINE.md's per-batch
    * range. Same measurement discipline as [[run]] — a discarded warm-up
    * flush, `iterations` measured flushes with the merge/insert order
    * alternating per iteration, per-path MEDIAN reported — because a
    * single unguarded sample is one host-contention spike away from a
    * phantom regression (round 4 published 91.7 ms/10k for a path that
    * re-measured at 12.1). Returns (mergeMsPer10k, insertMsPer10k)
    * medians. */
  def amortized(spark: SparkSession, rows: Int = 1000000,
      conflictPct: Int = 10, iterations: Int = 3): (Double, Double) = {
    val samples = (-1 until iterations).flatMap { iter =>
      val wh = Files.createTempDirectory("graft-perf-amort").toString
      val lake = new GraftLake(spark, wh)
      lake.write("m", batchDf(spark, 0, rows), pks = Seq("id"))
      lake.write("i", batchDf(spark, 0, rows))
      val conflicts = (rows.toLong * conflictPct / 100).toInt
      val batch = batchDf(spark, rows - conflicts, rows)
      val (mergeMs, insertMs) =
        if (iter % 2 == 0) {
          val m = timeMs(lake.write("m", batch, pks = Seq("id")))
          val i = timeMs(lake.write("i", batch))
          (m, i)
        } else {
          val i = timeMs(lake.write("i", batch))
          val m = timeMs(lake.write("m", batch, pks = Seq("id")))
          (m, i)
        }
      lake.dropTable("m"); lake.dropTable("i")
      new java.io.File(wh).delete()
      if (iter < 0) None else Some((mergeMs, insertMs))
    }
    val per10k = rows / 10000.0
    (median(samples.map(_._1)) / per10k, median(samples.map(_._2)) / per10k)
  }

  /** Commit-cost micro-bench for a ~`files`-file append delta: COMMIT
    * wall-time (manifest + stats bookkeeping, via the commitVersion
    * sensor — the write job itself is excluded) with bounds collected in
    * the write job vs the footer-read fallback
    * (`spark.graft.stats.writeJobCollection=false`). This is the 100 TB
    * commit-path number: a bulk load or compaction adding hundreds of
    * files must not pay a second I/O pass over them. Returns
    * (writeJobMs, footerReadMs) medians. */
  def commitDelta(spark: SparkSession, files: Int = 100,
      iterations: Int = 3): (Double, Double) = {
    import graft.metrics.GraftMetrics
    def once(writeJob: Boolean): Double = {
      val wh = Files.createTempDirectory("graft-perf-commit").toString
      val lake = new GraftLake(spark, wh)
      val df = spark.range(files.toLong * 2000)
        .select(col("id").cast("long").as("id"),
          (col("id") % 97).cast("double").as("v"),
          concat(lit("k"), col("id")).as("k"))
        .repartition(files)
      if (!writeJob)
        spark.conf.set("spark.graft.stats.writeJobCollection", "false")
      try {
        val before = GraftMetrics.totalsMs()
          .getOrElse(GraftMetrics.CommitVersion, (0L, 0.0))._2
        lake.append("c", df)
        GraftMetrics.totalsMs()(GraftMetrics.CommitVersion)._2 - before
      } finally {
        spark.conf.unset("spark.graft.stats.writeJobCollection")
        lake.dropTable("c")
        new java.io.File(wh).delete()
      }
    }
    once(true); once(false) // discarded warm-ups
    val samples = (0 until iterations).map(_ => (once(true), once(false)))
    (median(samples.map(_._1)), median(samples.map(_._2)))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.hadoop.FastLocalFileSystem.tune(SparkSession.builder())
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = run(spark)
    println("scenario,pct,iter,merge_ms,insert_ms")
    results.foreach(r =>
      println(f"conflict,${r.conflictPct},${r.iter},${r.mergeMs}%.1f,${r.insertMs}%.1f"))
    results.groupBy(_.conflictPct).toSeq.sortBy(_._1).foreach { case (pct, rs) =>
      println(f"median,$pct,-,${median(rs.map(_.mergeMs))}%.1f,${median(rs.map(_.insertMs))}%.1f")
    }
    val (am, ai) = amortized(spark)
    println(f"amortized_1m_per10k,10,-,$am%.1f,$ai%.1f")
    spark.stop()
  }
}
