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
}
