package graft.operators

import java.sql.{Date, Timestamp}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts of the analytics operators: profiling counts,
  * funnel window arithmetic, and SCD2 close/insert/no-op semantics. */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profileColumns: nulls, exact distincts, typed min/max per column kind") {
    val df = Seq(
      (Some(3L), Some(2.5), Some("b")),
      (Some(1L), None, Some("a")),
      (Some(3L), Some(7.5), None))
      .toDF("k", "v", "s")
    val got = AnalyticsOps.profileColumns(df, Seq("k", "v", "s"))
      .orderBy("column_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
    assert(got.toSeq === Seq(
      ("k", 3L, 0L, 2L, Some(1.0), Some(3.0), None, None),
      ("s", 3L, 1L, 2L, None, None, Some("a"), Some("b")),
      ("v", 3L, 1L, 2L, Some(2.5), Some(7.5), None, None)))
  }

  test("eventFunnel: only in-window, in-order steps convert") {
    def ev(u: Long, t: String, typ: String) =
      (Timestamp.valueOf(t), u, typ, 1.0)
    val events = Seq(
      // u1: full funnel inside both windows
      ev(1, "2024-01-01 10:00:00", "view"),
      ev(1, "2024-01-01 12:00:00", "click"),
      ev(1, "2024-01-01 13:00:00", "purchase"),
      // u2: click 25h after view — outside the 24h window
      ev(2, "2024-01-01 10:00:00", "view"),
      ev(2, "2024-01-02 11:00:00", "click"),
      // u3: purchase BEFORE the click — order matters
      ev(3, "2024-01-01 10:00:00", "view"),
      ev(3, "2024-01-01 12:00:00", "purchase"),
      ev(3, "2024-01-01 13:00:00", "click"))
      .toDF("ts", "user_id", "event_type", "value")
    val r = AnalyticsOps.eventFunnel(events).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 1L)))
    assert(r.getDouble(3) === 0.6667) // 2/3 view→click
    assert(r.getDouble(4) === 0.5)    // 1/2 click→purchase
  }

  test("scd2Apply: closes changed, inserts new, suppresses no-ops") {
    val lake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-scd2-spec").toString)
    val d0 = Date.valueOf("2024-01-01")
    val d1 = Date.valueOf("2024-02-01")
    lake.write("dim",
      Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("k", "attr", "bal")
        .withColumn("valid_from", lit(d0))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(1L)),
      partitions = Nil, pks = Seq("k", "valid_from"))
    // k=1 changes, k=2 is sent UNCHANGED (must no-op), k=3 is new
    val batch = Seq((1L, "x2", 11.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "attr", "bal")
    AnalyticsOps.scd2Apply(lake, "dim", batch, "k", Seq("attr", "bal"), d1)
    val got = lake.read("dim")
      .select("k", "attr", "bal", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, "x", 10.0, "2024-01-01", Some("2024-02-01"), 0L),
      (1L, "x2", 11.0, "2024-02-01", None, 1L),
      (2L, "y", 20.0, "2024-01-01", None, 1L),
      (3L, "z", 30.0, "2024-02-01", None, 1L)))
    // second batch: close the 2024-02-01 version of k=1 again
    AnalyticsOps.scd2Apply(lake, "dim",
      Seq((1L, "x3", 12.0)).toDF("k", "attr", "bal"),
      "k", Seq("attr", "bal"), Date.valueOf("2024-03-01"))
    val hist1 = lake.read("dim").filter(col("k") === 1L)
      .select("attr", "is_current").orderBy("valid_from").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hist1.toSeq === Seq(("x", 0L), ("x2", 0L), ("x3", 1L)))
  }

  test("applyChanges converges a PARTITIONED replica; untouched partitions keep their files") {
    val srcLake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-src-spec").toString)
    val repLake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-rep-spec").toString)
    def df(rows: Seq[(Long, String, Double)]) = rows.toDF("k", "seg", "bal")
    val v0 = df(Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30), (4L, "c", 40)))
    srcLake.write("s", v0, partitions = Seq("seg"), pks = Seq("k"))
    // v1: k=1 updates, k=3 deletes, k=5 inserts; partition c untouched
    srcLake.overwriteContents("s",
      df(Seq((1L, "a", 11), (2L, "a", 20), (4L, "c", 40), (5L, "b", 50)))
        .withColumn("_inserted_at", current_timestamp()))
    val vs = srcLake.versions("s")
    repLake.write("r", srcLake.readVersion("s", vs.head)
      .select(col("k"), col("seg"), col("bal")),
      partitions = Seq("seg"), pks = Seq("k"))
    def segCFiles() =
      repLake.read("r").inputFiles.filter(_.contains("__p_seg=c")).toSet
    val untouched = segCFiles()
    assert(untouched.nonEmpty)
    val changes = AnalyticsOps.snapshotDiff(srcLake, "s", vs.head, vs.last,
      Seq("k"), Seq("seg", "bal"))
    AnalyticsOps.applyChanges(repLake, "r", changes, Seq("k"), Seq("seg", "bal"))
    val got = repLake.read("r").select("k", "seg", "bal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "a", 11.0), (2L, "a", 20.0), (4L, "c", 40.0),
      (5L, "b", 50.0)), "replica must converge to the source's final state")
    // the delete rewrite must have been scoped: partition c (no changes)
    // keeps its physical files
    assert(segCFiles() === untouched,
      "untouched partitions must keep their files")
  }

  test("hourly anomaly: z-score laws hold on the real event stream") {
    val rows = AnalyticsOps.q126HourlyAnomaly
      .fn(spark, graft.SparkTestSession.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty, "event stream must yield per-type rows")
    rows.foreach { case (tpe, nHours, nAnom, maxZ) =>
      assert(nHours > 1, s"$tpe: degenerate hour count")
      assert(nAnom <= nHours, s"$tpe: anomalies bounded by hours")
      assert(maxZ >= 0.0, s"$tpe: |z| is non-negative")
      // |z| <= sqrt(n-1) is a hard algebraic bound for any sample
      assert(maxZ <= math.sqrt((nHours - 1).toDouble) + 1e-9,
        s"$tpe: max |z| $maxZ exceeds the sqrt(n-1) bound")
      if (nAnom > 0) assert(maxZ > 2.0,
        s"$tpe: anomalies reported but the worst excursion is under the gate")
    }
  }

  test("refreshAdditiveAgg: delta maintenance == full recompute; mutations force rebuild") {
    graft.catalog.GraftLake.invalidateCaches()
    val wh = java.nio.file.Files.createTempDirectory("graft-incagg").toString
    val lake = new graft.catalog.GraftLake(spark, wh)
    def full() = lake.read("src").groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum(col("a")).as("sum_a"),
        sum(col("b")).as("sum_b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    def dest() = lake.read("agg")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_a"), r.getAs[Long]("sum_b"))).toSet
    def refresh() = AnalyticsOps.refreshAdditiveAgg(lake, "src", "agg",
      Seq("k"), Seq("a", "b"))
    lake.append("src", Seq(("x", 1L, 10L), ("y", 2L, 20L)).toDF("k", "a", "b"))
    assert(refresh() === 2L)
    assert(dest() === full())
    // incremental: new keys insert, existing keys ADD
    lake.append("src", Seq(("x", 3L, 30L), ("z", 4L, 40L)).toDF("k", "a", "b"))
    assert(refresh() === 2L, "must read only the appended delta")
    assert(dest() === full())
    assert(dest().contains(("x", 2L, 4L, 40L)))
    assert(refresh() === 0L, "nothing new → nothing read")
    // a NON-append commit invalidates additivity → full rebuild, still exact
    lake.deleteWhere("src", col("k") === "y")
    val n = refresh()
    assert(n === 3L, s"delete in the interval must force a rebuild, read $n")
    assert(dest() === full())
    assert(!dest().exists(_._1 == "y"))
    // the watermark persists: a FRESH lake instance (restart) stays incremental
    graft.catalog.GraftLake.invalidateCaches()
    val lake2 = new graft.catalog.GraftLake(spark, wh)
    lake2.append("src", Seq(("z", 5L, 50L)).toDF("k", "a", "b"))
    assert(AnalyticsOps.refreshAdditiveAgg(lake2, "src", "agg",
      Seq("k"), Seq("a", "b")) === 1L, "state survives restart")
    assert(lake2.read("agg").filter(col("k") === "z")
      .select("n_rows", "sum_a").head() ===
      org.apache.spark.sql.Row(2L, 9L))
  }
}
