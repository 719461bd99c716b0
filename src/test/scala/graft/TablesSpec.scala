package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-type-drift guards for the testdata loaders: the data generator
  * has already regenerated `events.ts` across parquet timestamp encodings
  * (TIMESTAMP(NANOS) one round, timestamp[us]-no-tz the next), breaking a
  * query each time the loader assumed one. These specs write each physical
  * shape with raw writers — NOT through the loader's own path — and prove
  * [[Tables]] normalizes all of them to usable timestamps. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Writes `events.parquet` with `ts` as INT64 TIMESTAMP(NANOS) — the
    * shape Spark's reader rejects outright without `nanosAsLong` — using
    * the raw parquet example API (Spark itself cannot produce it). */
  private def writeNanosFixture(dir: String, epochNanos: Seq[Long]): Unit = {
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("event_id"))
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withConf(conf)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try epochNanos.zipWithIndex.foreach { case (ns, i) =>
      val g = factory.newGroup()
      g.add("ts", ns)
      g.add("event_id", i.toLong)
      writer.write(g)
    } finally writer.close()
  }

  test("events loader survives TIMESTAMP(NANOS) testdata: ns truncate to µs TimestampType") {
    val dir = Files.createTempDirectory("graft-nanos").toString
    // 2024-01-02T03:04:05.123456789 UTC — the 789 ns tail must truncate
    val nanos = 1704164645123456789L
    writeNanosFixture(dir, Seq(nanos))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      "nanos column must land as session-tz TimestampType")
    val micros = df.select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .head().getLong(0)
    assert(micros === nanos / 1000L,
      "ns→µs must truncate exactly (integer div, no double round-trip)")
  }

  test("events loader casts timestamp[us]-no-tz (NTZ) so epoch functions work") {
    val dir = Files.createTempDirectory("graft-ntz").toString
    spark.sql(
      """SELECT TIMESTAMP_NTZ '2024-05-06 07:08:09.123456' AS ts,
        |CAST(7 AS BIGINT) AS event_id""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assume(raw.schema("ts").dataType === TimestampNTZType,
      "fixture must exercise the NTZ read shape")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    // unix_micros rejects NTZ — succeeding at all IS the guard; value must
    // be the naive instant read in UTC
    val micros = df.select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .head().getLong(0)
    assert(micros === 1714979289123456L)
  }

  test("TPC-H date columns survive a nanos regeneration; NTZ passes through untouched") {
    val dir = Files.createTempDirectory("graft-li").toString
    // current generator shape: timestamp[us] no-tz -> NTZ stays NTZ (the
    // oracle-green read type today; no cast that would shift output schema)
    spark.sql(
      """SELECT TIMESTAMP_NTZ '1995-03-15 00:00:00' AS l_shipdate,
        |CAST(1 AS BIGINT) AS l_orderkey""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(Tables.lineitem(spark, dir).schema("l_shipdate").dataType === TimestampNTZType)

    // drifted shape: TIMESTAMP(NANOS) must still read (today every TPC-H
    // query would die at scan time)
    val dir2 = Files.createTempDirectory("graft-li-ns").toString
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("l_shipdate"))
      .named("lineitem")
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new Path(s"$dir2/lineitem.parquet"))
      .withConf(conf).build()
    val g = new SimpleGroupFactory(schema).newGroup()
    g.add("l_shipdate", 795225600000000000L) // 1995-03-15T00:00:00 UTC in ns
    try w.write(g) finally w.close()
    val df = Tables.lineitem(spark, dir2)
    assert(df.schema("l_shipdate").dataType === TimestampType)
    assert(df.select(org.apache.spark.sql.functions.unix_micros(col("l_shipdate")))
      .head().getLong(0) === 795225600000000L)
  }
}
