package graft

import java.nio.file.Files

import graft.catalog.GraftLake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's MERGE-vs-INSERT measurement protocol (BASELINE.md:
  * DucklakeWriterIntegrationTest.java:262-489): a base table of `baseRows`
  * rows with schema (id INTEGER, name VARCHAR, created_at TIMESTAMP),
  * write batches of `batchRows` at the given PK-conflict rates, timing the
  * MERGE path vs the INSERT path; mean/std per scenario.
  *
  * Comparable numbers: the reference documents 10-50 ms simpleInsert and
  * 30-100 ms upsertWithMergeInto per flushed batch (embedded DuckDB,
  * single node). Spark pays scheduler overhead per batch but the same
  * protocol measures it honestly.
  */
object PerfHarness {

  final case class Result(conflictPct: Int, iter: Int, mergeMs: Double, insertMs: Double)

  private def batchDf(spark: SparkSession, start: Long, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(start, start + n)
      .select(col("id").cast("int").as("id"),
        concat(lit("name-"), col("id")).as("name"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("timestamp"))
          .as("created_at"))
  }

  /** Run the protocol; returns per-iteration timings. */
  def run(spark: SparkSession, baseRows: Int = 100000, batchRows: Int = 10000,
      conflictPcts: Seq[Int] = Seq(1, 10, 30), iterations: Int = 2): Seq[Result] = {
    conflictPcts.flatMap { pct =>
      (1 to iterations).map { iter =>
        val wh = Files.createTempDirectory("graft-perf").toString
        val lake = new GraftLake(spark, wh)
        lake.write("m", batchDf(spark, 0, baseRows), pks = Seq("id"))
        lake.write("i", batchDf(spark, 0, baseRows))
        val conflicts = batchRows * pct / 100
        // batch: `conflicts` existing ids + the rest new ids
        val batch = batchDf(spark, baseRows - conflicts, batchRows)
        val t0 = System.nanoTime()
        lake.write("m", batch, pks = Seq("id"))
        val mergeMs = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        lake.write("i", batch)
        val insertMs = (System.nanoTime() - t1) / 1e6
        // clean the throwaway warehouse (repeated bench runs must not
        // accumulate temp parquet or pin cache entries)
        lake.dropTable("m"); lake.dropTable("i")
        new java.io.File(wh).delete()
        Result(pct, iter, mergeMs, insertMs)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
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
      val mm = rs.map(_.mergeMs); val im = rs.map(_.insertMs)
      println(f"mean,$pct,-,${mm.sum / mm.size}%.1f,${im.sum / im.size}%.1f")
    }
    spark.stop()
  }
}
