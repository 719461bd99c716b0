package graft.functions

import java.nio.file.Files

import graft.SparkTestSession
import graft.catalog.GraftLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave: known bit patterns") {
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val got = df.select(
      ZOrder.interleave(Seq(col("x"), col("y")), bits = 2).as("z"))
      .as[Long].collect()
    // x bits land at positions 0,2; y bits at 1,3
    assert(got.toSeq === Seq(
      5L,   // x=11 -> 0101
      10L,  // y=11 -> 1010
      15L,  // both -> 1111
      6L))  // x=10 -> 0100, y=01 -> 0010
  }

  test("zValue: normalization maps bounds to the bit range, degenerate span to 0") {
    val df = Seq((0.0, 5.0), (10.0, 5.0)).toDF("a", "b")
    val z = df.select(ZOrder.zValue(
      Seq(col("a"), col("b")), Seq((0.0, 10.0), (5.0, 5.0)), bits = 4).as("z"))
      .as[Long].collect()
    // b is degenerate -> contributes 0; a=0 -> 0, a=10 -> 15 interleaved
    // at even positions = 0b01010101
    assert(z.toSeq === Seq(0L, 85L))
  }

  test("clustered compaction bounds every file on BOTH cluster columns") {
    GraftLake.invalidateCaches()
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft-zorder").toString)
    // 64x64 grid in an order hostile to clustering (row-major by a hash)
    val rows = (0 until 4096).map { i =>
      val k = (i * 2654435761L % 4096).toInt
      (k % 64, k / 64, i.toLong)
    }
    lake.write("grid", rows.toDF("a", "b", "payload"))
    lake.compact("grid", targetRecordsPerFile = 256, clusterBy = Seq("a", "b"))
    val files = lake.dataFiles("grid")
    assert(files.size >= 8, s"expected many 256-row files, got ${files.size}")
    files.foreach { f =>
      val r = spark.read.parquet(f)
        .agg(min("a"), max("a"), min("b"), max("b")).head()
      val spanA = r.getInt(1) - r.getInt(0)
      val spanB = r.getInt(3) - r.getInt(2)
      // a plain sort on `a` would give spanB = 63 for every file; z-order
      // keeps both dimensions bounded
      assert(spanA <= 40, s"file $f spans a: $spanA")
      assert(spanB <= 40, s"file $f spans b: $spanB")
    }
    // content is untouched by clustering
    assert(lake.read("grid").count() === 4096L)
    assert(lake.read("grid").agg(sum("payload")).head().getLong(0) ===
      (0 until 4096).map(_.toLong).sum)
  }
}
