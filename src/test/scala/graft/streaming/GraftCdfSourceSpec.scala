package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import graft.catalog.GraftLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-cdf` commit-log streaming source: exactly-once across
  * restarts, compaction invisibility, rewrite fail-fast/skip, rate
  * limiting, floor pinning, expired-offset refusal. */
class GraftCdfSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-cdf").toString)
  }

  private var sinkN = 0
  private def freshSink(): String = { sinkN += 1; s"cdf_sink_$sinkN" }

  private def stream(lake: GraftLake, table: String, sink: String,
      ckpt: String, options: Map[String, String] = Map.empty) = {
    options.foldLeft(
      spark.readStream.format("graft-cdf")
        .option("warehouse", lake.warehouseDir).option("table", table)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .start()
  }

  /** Restart tests need a sink that supports checkpoint RECOVERY — the
    * memory sink refuses it; the parquet file sink's own transaction log
    * additionally proves exactly-once end to end. */
  private def fileStream(lake: GraftLake, table: String, outDir: String,
      ckpt: String, options: Map[String, String] = Map.empty) = {
    options.foldLeft(
      spark.readStream.format("graft-cdf")
        .option("warehouse", lake.warehouseDir).option("table", table)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
  }

  private def ids(df: DataFrame): Seq[Int] =
    df.select("id").collect().map(_.getInt(0)).sorted.toSeq

  test("exactly-once across a restart; compaction commits emit nothing") {
    val lake = newLake()
    def batch(r: Range): DataFrame = r.map(i => (i, s"v$i")).toDF("id", "v")
    lake.append("t", batch(0 until 10))
    lake.append("t", batch(10 until 20))
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    val out = Files.createTempDirectory("cdf-out").toString
    val q1 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "snapshot"))
    try q1.processAllAvailable() finally q1.stop()
    assert(ids(spark.read.parquet(out)) === (0 until 20))

    // while the stream is DOWN: a compaction (must emit nothing) and two
    // more appends (must all arrive, exactly once, on restart)
    lake.compact("t", targetRecordsPerFile = 1000000)
    lake.append("t", batch(20 until 25))
    lake.append("t", batch(25 until 30))
    val q2 = fileStream(lake, "t", out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(ids(spark.read.parquet(out)) === (0 until 30),
      "restart must resume at the checkpointed version: no gaps, no dups")
  }

  test("startingVersion=latest pins its floor at FIRST start (no loss on restart)") {
    val lake = newLake()
    lake.append("t", Seq((1, "pre")).toDF("id", "v")) // before the stream
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    val out = Files.createTempDirectory("cdf-out").toString
    val q1 = fileStream(lake, "t", out, ckpt) // default latest
    try q1.processAllAvailable() finally q1.stop()
    // commits land while the stream is down; the restarted source must NOT
    // re-resolve 'latest' (that would skip them) — the pinned floor wins
    lake.append("t", Seq((2, "down")).toDF("id", "v"))
    val q2 = fileStream(lake, "t", out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(ids(spark.read.parquet(out)) === Seq(2),
      "pre-existing row skipped; down-time commit delivered")
  }

  test("row-changing rewrites fail fast; onRewrite=skip downgrades them") {
    val lake = newLake()
    lake.write("t", Seq((1, "a"), (2, "b")).toDF("id", "v"), pks = Seq("id"))
    lake.deleteWhere("t", col("id") === 1) // MoR delete: a dv-add commit
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> (lake.versions("t").head.toString)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getCause.getMessage.contains("rewrites or deletes rows"))

    val sink2 = freshSink()
    val q2 = stream(lake, "t", sink2,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> (lake.versions("t").head.toString),
        "onRewrite" -> "skip"))
    try q2.processAllAvailable() finally q2.stop()
    assert(ids(spark.table(sink2)) === Seq.empty,
      "skip: the delete commit becomes a no-op instead of an error")
  }

  test("snapshot bootstrap applies the starting snapshot's deletion vectors") {
    val lake = newLake()
    lake.write("t", (0 until 10).map(i => (i, s"v$i")).toDF("id", "v"),
      pks = Seq("id"))
    lake.deleteWhere("t", col("id") < 3) // MoR: rows masked, files intact
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> "snapshot", "onRewrite" -> "skip"))
    try q.processAllAvailable() finally q.stop()
    assert(ids(spark.table(sink)) === (3 until 10),
      "bootstrap must not resurrect DV-deleted rows")
  }

  test("maxVersionsPerTrigger bounds each micro-batch") {
    val lake = newLake()
    lake.append("t", Seq((-1, "seed")).toDF("id", "v")) // pre-stream floor
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("maxVersionsPerTrigger" -> "2")) // default latest: floor = seed
    try {
      q.processAllAvailable()
      (0 until 6).foreach(i =>
        lake.append("t", Seq((i, s"v$i")).toDF("id", "v")))
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(spark.table(sink)) === (0 until 6))
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      s"6 commits at 2/trigger need ≥3 non-empty batches " +
        s"(got ${q.recentProgress.map(_.numInputRows).mkString(",")})")
  }

  test("latest on a table with NO commits yet streams its first-ever commit") {
    val lake = newLake()
    lake.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))))
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString)
    try {
      q.processAllAvailable() // nothing yet: the -1 floor must not error
      lake.append("t", Seq((1, "first")).toDF("id", "v"))
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(spark.table(sink)) === Seq(1),
      "the origin floor (complete chain from v0) is not an expired offset")
  }

  test("feed=cdf streams inserts and MoR-delete preimages with commit ids") {
    val lake = newLake()
    lake.write("t", Seq((1, "a"), (2, "b")).toDF("id", "v"), pks = Seq("id"))
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("feed" -> "cdf", "startingVersion" -> "snapshot"))
    try {
      q.processAllAvailable() // bootstrap: live rows as inserts of v0
      lake.append("t", Seq((3, "c")).toDF("id", "v")) // v1: inserts
      lake.deleteWhere("t", col("id") === 1) // v2: MoR delete preimage
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1, "insert", 0L), (2, "insert", 0L), // the bootstrap snapshot
      (3, "insert", 1L), // the live append
      (1, "delete", 2L))) // the MoR delete's preimage
  }

  test("feed=cdf bootstrap emits the snapshot's LIVE rows (DVs applied)") {
    val lake = newLake()
    lake.write("t", (0 until 10).map(i => (i, s"v$i")).toDF("id", "v"),
      pks = Seq("id"))
    lake.deleteWhere("t", col("id") < 3)
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("feed" -> "cdf", "startingVersion" -> "snapshot"))
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(sink)
    assert(ids(got) === (3 until 10))
    assert(got.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("insert"))
    // cdf refuses onRewrite=skip (attribution is exact or an error)
    intercept[IllegalArgumentException] {
      new GraftCdfSource(lake, "t", Files.createTempDirectory("m").toString,
        "latest", "skip", None, 0L, "cdf")
    }
  }

  test("feed=cdf on a PARTITIONED table; a MoR UPDATE streams pre/post images") {
    val lake = newLake()
    lake.write("t", (0 until 20).map(i => (i, i % 4, s"v$i")).toDF("id", "seg", "v"),
      partitions = Seq("seg"), pks = Seq("id"))
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("feed" -> "cdf", "startingVersion" -> "snapshot"))
    try {
      q.processAllAvailable() // bootstrap across the partition dirs
      // MoR UPDATE: preimage masked by a DV, postimage lands in new files
      lake.updateWhere("t", col("id") === 7, Map("v" -> lit("UPD")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink)
    assert(got.filter(col("_commit_version") === 0).count() === 20,
      "partitioned bootstrap emits every live row once")
    val changed = got.filter(col("_commit_version") > 0)
      .select("id", "_change_type", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(changed === Set(
      (7, "update_preimage", "v7"), (7, "update_postimage", "UPD")),
      s"MoR UPDATE must stream paired pre/post images, got $changed")
  }

  test("feed=cdf streams an UPSERT window exactly under change capture") {
    val lake = newLake()
    lake.write("t", Seq((1, "a"), (2, "b")).toDF("id", "v"), pks = Seq("id"))
    // WITHOUT capture: the upsert rewrite is unattributable — fail fast
    lake.write("t", Seq((2, "B2")).toDF("id", "v"), pks = Seq("id"))
    val sinkFail = freshSink()
    val qf = stream(lake, "t", sinkFail,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("feed" -> "cdf", "startingVersion" -> "0"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try qf.processAllAvailable() finally qf.stop()
    }
    assert(e.getCause.getMessage.contains("enableChangeDataFeed"),
      s"uncaptured rewrite must fail with guidance, got: ${e.getCause.getMessage}")

    // WITH capture: the upsert writes its change files at commit time and
    // the feed attributes the window exactly — matched keys as
    // update_preimage/update_postimage pairs, new keys as inserts
    lake.setTableProperty("t",
      graft.catalog.TableMeta.CdfEnabledKey, "true")
    val vBefore = lake.versions("t").last
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("feed" -> "cdf", "startingVersion" -> vBefore.toString))
    try {
      q.processAllAvailable()
      lake.upsert("t", Seq((1, "A3"), (9, "new")).toDF("id", "v"))
      q.processAllAvailable()
    } finally q.stop()
    val vUp = lake.versions("t").last
    val got = spark.table(sink)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1, "a", "update_preimage", vUp),
      (1, "A3", "update_postimage", vUp),
      (9, "new", "insert", vUp)), s"got $got")
    // the change feed's postimages equal the table's rows — including the
    // frozen _inserted_at of the insert path
    val tbl = lake.read("t").select("id", "v", "_inserted_at")
    val post = spark.table(sink)
      .filter(col("_change_type").isin("update_postimage", "insert"))
      .select("id", "v", "_inserted_at")
    assert(post.exceptAll(tbl).isEmpty,
      "every streamed postimage/insert must appear verbatim in the table")
  }

  test("mid-stream ADDITIVE evolution: appends feed conforms by default, fail refuses") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v"))
    val sink = freshSink()
    val q = stream(lake, "t", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> "snapshot")) // appends: conform by default
    try {
      q.processAllAvailable()
      // additive evolution + rows in one commit: conform mode delivers
      // the rows projected to the stream-start shape (w drops silently)
      lake.append("t", Seq((2, "b", 9.5)).toDF("id", "v", "w"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink)
    assert(ids(got) === Seq(1, 2))
    assert(!got.columns.contains("w"),
      "conform mode projects epochs to the stream-start shape")

    // the same evolution landing MID-STREAM under onSchemaChange=fail
    // refuses at the commit that carries it, with restart guidance (a
    // stream started AFTER the evolution advertises the new schema and
    // sails through — only the mid-stream window differs)
    val lake2 = newLake()
    lake2.append("t", Seq((1, "a")).toDF("id", "v"))
    val sink2 = freshSink()
    val q2 = stream(lake2, "t", sink2,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> "snapshot", "onSchemaChange" -> "fail"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q2.processAllAvailable()
        lake2.append("t", Seq((2, "b", 9.5)).toDF("id", "v", "w"))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    assert(e.getCause.getMessage.contains("Restart the stream"),
      s"got: ${e.getCause.getMessage}")
    assert(e.getCause.getMessage.contains("added: w"))
  }

  test("DROP and RENAME mid-stream are detected by fail mode at their commits") {
    val lake = newLake()
    lake.append("t", Seq((1, "a", 1.0)).toDF("id", "v", "dead")
      .repartition(1))
    val sinkDrop = freshSink()
    val qd = stream(lake, "t", sinkDrop,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> "snapshot", "onSchemaChange" -> "fail"))
    val ed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        qd.processAllAvailable()
        lake.dropColumn("t", "dead") // mid-stream metadata commit
        lake.append("t", Seq((2, "b")).toDF("id", "v"))
        qd.processAllAvailable()
      } finally qd.stop()
    }
    assert(ed.getCause.getMessage.contains("removed: dead"))

    val lake2 = newLake()
    lake2.append("t", Seq((1, "a")).toDF("id", "v").repartition(1))
    val sinkRen = freshSink()
    val qr = stream(lake2, "t", sinkRen,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> "snapshot", "onSchemaChange" -> "fail"))
    val er = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        qr.processAllAvailable()
        lake2.renameColumn("t", "v", "val") // mid-stream
        qr.processAllAvailable()
      } finally qr.stop()
    }
    assert(er.getCause.getMessage.contains("added: val") &&
      er.getCause.getMessage.contains("removed: v"),
      s"rename must surface as add+remove, got: ${er.getCause.getMessage}")
  }

  test("fail policy: a DOWN-TIME evolution must not crash the restart's catch-up") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v"))
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    val out = Files.createTempDirectory("cdf-out").toString
    val q1 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "snapshot", "onSchemaChange" -> "fail"))
    try q1.processAllAvailable() finally q1.stop()
    assert(ids(spark.read.parquet(out)) === Seq(1))
    // the table evolves WHILE THE STREAM IS DOWN; the restart advertises
    // the evolved schema, and Spark's v1 catch-up re-plans the OLD-shape
    // committed window (discarded) — the policy must fail lazily or this
    // healthy restart dies at plan build
    lake.append("t", Seq((2, "b", 1.5)).toDF("id", "v", "w"))
    val q2 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "snapshot", "onSchemaChange" -> "fail"))
    try q2.processAllAvailable() finally q2.stop()
    assert(ids(spark.read.parquet(out)) === Seq(1, 2),
      "the down-time evolved commit arrives under the fresh advertisement")
  }

  test("onRewrite flipped across a restart must not crash the discarded catch-up") {
    val lake = newLake()
    lake.write("t", Seq((1, "a"), (2, "b")).toDF("id", "v"), pks = Seq("id"))
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    val out = Files.createTempDirectory("cdf-out").toString
    val q1 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "snapshot", "onRewrite" -> "skip"))
    try {
      q1.processAllAvailable()
      lake.deleteWhere("t", col("id") === 1) // rewrite commit, skipped
      lake.append("t", Seq((3, "c")).toDF("id", "v"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(ids(spark.read.parquet(out)) === Seq(1, 2, 3),
      "skip mode: the delete is a no-op, the append arrives")
    // restart with onRewrite=fail: Spark's v1 catch-up re-plans the
    // COMMITTED window — which contains the rewrite commit that was
    // legal under skip — and discards it. The refusal must fail at
    // execution, not at plan build, or this healthy restart dies in
    // populateStartOffsets on a batch it never runs.
    val q2 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "snapshot", "onRewrite" -> "fail"))
    try {
      q2.processAllAvailable()
      lake.append("t", Seq((4, "d")).toDF("id", "v"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ids(spark.read.parquet(out)) === Seq(1, 2, 3, 4),
      "the option flip only governs NEW windows")
    // and a NEW rewrite under the flipped option still fails loudly
    val q3 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "snapshot", "onRewrite" -> "fail"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q3.processAllAvailable()
        lake.deleteWhere("t", col("id") === 2)
        lake.append("t", Seq((5, "e")).toDF("id", "v"))
        q3.processAllAvailable()
      } finally q3.stop()
    }
    assert(e.getCause.getMessage.contains("rewrites or deletes rows"),
      s"got: ${e.getCause.getMessage}")
  }

  test("fail policy: a FIRST start over pre-evolved history conforms the backfill") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v"))          // v0 old shape
    lake.append("t", Seq((2, "b")).toDF("id", "v"))          // v1 old shape
    lake.append("t", Seq((3, "c", 1.5)).toDF("id", "v", "w")) // v2 evolves
    // a FIRST start from the origin under onSchemaChange=fail: every
    // commit the stream backfills pre-dates its schema advertisement, so
    // the old-shape commits conform (widened read) instead of bricking
    // every batch with a violation no restart could ever clear
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    val out = Files.createTempDirectory("cdf-out").toString
    val q1 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "0", "onSchemaChange" -> "fail"))
    try q1.processAllAvailable() finally q1.stop()
    val got = spark.read.parquet(out)
    assert(ids(got) === Seq(2, 3), "window above floor v0 delivered")
    assert(got.filter(col("id") === 2).select("w").head().isNullAt(0),
      "pre-evolution rows null-fill the advertised column")
    assert(got.filter(col("id") === 3).select("w").head().getDouble(0) === 1.5)
    // genuine MID-STREAM evolution still refuses at its commit
    val q2 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "0", "onSchemaChange" -> "fail"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q2.processAllAvailable()
        lake.append("t", Seq((4, "d", 1.5, 9L)).toDF("id", "v", "w", "x"))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    assert(e.getCause.getMessage.contains("added: x"),
      s"got: ${e.getCause.getMessage}")
  }

  test("replication under fail mode: mid-stream evolution fails loudly, restart converges") {
    val lake = newLake()
    lake.append("rsrc", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    def replicate() = spark.readStream.format("graft-cdf")
      .option("warehouse", lake.warehouseDir).option("table", "rsrc")
      .option("startingVersion", "snapshot")
      .option("onSchemaChange", "fail")
      .load()
      .drop("_inserted_at")
      .writeStream.format("graft")
      .option("warehouse", lake.warehouseDir).option("table", "rdst")
      .option("checkpointLocation", ckpt)
      .start()
    // additive evolution + rows land WHILE replicating: the feed must
    // NOT silently drop the new column from the replica — fail loudly
    val q2 = replicate()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q2.processAllAvailable()
        assert(lake.read("rdst").count() === 2)
        lake.append("rsrc", Seq((3, "c", 7.5)).toDF("id", "v", "w"))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    assert(e.getCause.getMessage.contains("onSchemaChange=conform"))

    // restart re-reads the evolved schema; the refused epoch replays and
    // the replica converges INCLUDING the new column
    val q3 = replicate()
    try q3.processAllAvailable() finally q3.stop()
    val dst = lake.read("rdst")
    assert(dst.count() === 3)
    assert(dst.columns.contains("w"))
    assert(dst.filter(col("id") === 3).select("w").head().getDouble(0) === 7.5)
  }

  test("Trigger.AvailableNow drains the backlog and terminates") {
    val lake = newLake()
    lake.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    lake.append("t", Seq((3, "c")).toDF("id", "v"))
    val sink = freshSink()
    val q = spark.readStream.format("graft-cdf")
      .option("warehouse", lake.warehouseDir).option("table", "t")
      .option("startingVersion", "snapshot")
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdf-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000),
      "AvailableNow must drain the backlog and stop on its own")
    assert(ids(spark.table(sink)) === Seq(1, 2, 3))
  }

  test("ingest-pipeline landings flow straight into the commit-log stream") {
    // the composition a lakehouse runs in production: Kafka-shaped
    // micro-batches land through the ingest pipeline (idempotent
    // appends), and a downstream job tails the SAME table's commit log
    val wh = Files.createTempDirectory("graft-cdf-ingest").toString
    val pipeline = new graft.ingest.IngestPipeline(spark,
      graft.ingest.IngestConfig(warehouse = wh, dlqTable = None))
    def kafkaShaped(rows: Seq[(Int, String)], off: Int) =
      rows.toDF("id", "v").select(
        lit("feed").as("topic"), lit(0).as("partition"),
        (monotonically_increasing_id() + off).as("offset"),
        to_json(struct(col("id"), col("v"))).cast("binary").as("value"))
    pipeline.processBatch(kafkaShaped(Seq((1, "a"), (2, "b")), 0), 0L)
    val lake = new GraftLake(spark, wh)
    val sink = freshSink()
    val q = stream(lake, "feed", sink,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingVersion" -> "snapshot"))
    try {
      q.processAllAvailable() // backfill = batch 0's rows
      pipeline.processBatch(kafkaShaped(Seq((3, "c")), 100), 1L) // live
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(spark.table(sink)) === Seq(1, 2, 3),
      "every ingest landing streams downstream exactly once")
  }

  test("catalog-qualified table option resolves through the session catalog") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v"))
    spark.conf.set("spark.sql.catalog.gcdfspec",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcdfspec.warehouse", lake.warehouseDir)
    try {
      val sink = freshSink()
      val q = spark.readStream.format("graft-cdf")
        .option("table", "gcdfspec.t") // no warehouse option
        .option("startingVersion", "snapshot")
        .load()
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation",
          Files.createTempDirectory("cdf-ckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(ids(spark.table(sink)) === Seq(1))
      // an unregistered catalog and a both-forms conflict refuse clearly
      val e = intercept[Exception] {
        spark.readStream.format("graft-cdf")
          .option("table", "nosuchcat.t").load()
      }
      assert(e.getMessage.contains("not a registered catalog"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gcdfspec")
      spark.conf.unset("spark.sql.catalog.gcdfspec.warehouse")
    }
  }

  test("column pruning reaches the per-epoch parquet scan; offsets surface in progress") {
    val lake = newLake()
    lake.append("t", (0 until 50).map(i => (i, s"payload$i" * 10, i * 1.5))
      .toDF("id", "big_payload", "score"))
    val sink = freshSink()
    // the consumer projects ONE column; the v1 batch plan is substituted
    // into the streaming plan and optimized PER EPOCH, so Catalyst must
    // push the projection into the parquet scan — the DSv2-advertised
    // benefit, delivered by the relational epoch plan
    val q = spark.readStream.format("graft-cdf")
      .option("warehouse", lake.warehouseDir).option("table", "t")
      .option("startingVersion", "snapshot")
      .load()
      .select("id")
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdf-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val exec = org.apache.spark.sql.graft.PlanBridge.lastStreamExecution(q)
        .getOrElse(fail("no epoch executed"))
      val scans = exec.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "the epoch must plan a parquet file scan")
      scans.foreach { s =>
        val read = s.requiredSchema.fieldNames.toSet
        assert(!read.contains("big_payload") && !read.contains("score"),
          s"epoch scan must read only the projected column, got $read")
      }
      // version offsets are visible per progress event (what the DSv2
      // 'offsets in the UI' item actually buys an operator)
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      assert(prog.nonEmpty && prog.forall(p =>
        p.sources.nonEmpty && p.sources(0).endOffset != null))
    } finally q.stop()
    assert(spark.table(sink).count() === 50)
  }

  test("startingTimestamp floors the stream at the snapshot current AS OF that time") {
    val lake = newLake()
    lake.append("t", Seq((1, "old")).toDF("id", "v"))          // v0
    Thread.sleep(1200)
    val between = System.currentTimeMillis()
    Thread.sleep(1200)
    lake.append("t", Seq((2, "new")).toDF("id", "v"))          // v1
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    val out = Files.createTempDirectory("cdf-out").toString
    val q = fileStream(lake, "t", out, ckpt,
      Map("startingTimestamp" -> between.toString))
    try q.processAllAvailable() finally q.stop()
    assert(ids(spark.read.parquet(out)) === Seq(2),
      "the consumer owns the table as of the timestamp; only later " +
        "commits stream")
    // restart AFTER retention expired the resolution point: the PIN wins
    // and the timestamp is never re-resolved (an eager re-resolution
    // would refuse — v0, the snapshot current at the timestamp, is gone)
    lake.append("t", Seq((3, "down")).toDF("id", "v"))         // v2
    // keep the checkpoint anchor (v1) but EXPIRE v0 — the snapshot the
    // timestamp resolves to; an eager re-resolution would now refuse
    lake.expireSnapshots("t", keepLast = 2)
    val q2 = fileStream(lake, "t", out, ckpt,
      Map("startingTimestamp" -> between.toString))
    try q2.processAllAvailable() finally q2.stop()
    assert(ids(spark.read.parquet(out)) === Seq(2, 3),
      "restart resumes from the pinned floor across the expiry")

    // before the FIRST commit (full chain retained): everything streams
    val lakeB = newLake()
    lakeB.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val sink2 = freshSink()
    val qPre = stream(lakeB, "t", sink2,
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingTimestamp" -> "2001-01-01T00:00:00Z"))
    try qPre.processAllAvailable() finally qPre.stop()
    assert(ids(spark.table(sink2)) === Seq(1, 2))

    // mutual exclusion with startingVersion (the source is created on the
    // stream thread, so the refusal surfaces through the query)
    val q3 = stream(lakeB, "t", freshSink(),
      Files.createTempDirectory("cdf-ckpt").toString,
      Map("startingTimestamp" -> between.toString,
        "startingVersion" -> "0"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q3.processAllAvailable() finally q3.stop()
    }
    assert(e.getCause.getMessage.contains("mutually exclusive"))
    // unparseable timestamps refuse with guidance
    assert(GraftCdfSourceProvider.parseTimestampMs("1723800000000") ===
      1723800000000L)
    intercept[IllegalArgumentException] {
      GraftCdfSourceProvider.parseTimestampMs("yesterday-ish")
    }
  }

  test("minPollIntervalMs defaults by warehouse scheme: 0 local, 1000 elsewhere") {
    assert(GraftCdfSourceProvider.defaultPollIntervalMs("/tmp/wh") === 0L)
    assert(GraftCdfSourceProvider.defaultPollIntervalMs("file:/tmp/wh") === 0L)
    assert(GraftCdfSourceProvider.defaultPollIntervalMs("file:///tmp/wh") === 0L)
    // every non-local scheme pays per LIST — a 1 s trigger must not
    // issue ~86k listing calls/day/stream by default
    assert(GraftCdfSourceProvider.defaultPollIntervalMs("s3a://b/wh") === 1000L)
    assert(GraftCdfSourceProvider.defaultPollIntervalMs("hdfs://nn/wh") === 1000L)
    assert(GraftCdfSourceProvider.defaultPollIntervalMs("abfss://c@a/wh") === 1000L)
  }

  test("an expired checkpoint offset fails loudly, never re-emits") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v"))
    lake.append("t", Seq((2, "b")).toDF("id", "v"))
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    val out = Files.createTempDirectory("cdf-out").toString
    val q1 = fileStream(lake, "t", out, ckpt,
      Map("startingVersion" -> "snapshot"))
    try q1.processAllAvailable() finally q1.stop()
    assert(ids(spark.read.parquet(out)) === Seq(1, 2))
    // retention passes the checkpoint: only the latest snapshot survives
    lake.append("t", Seq((3, "c")).toDF("id", "v"))
    lake.expireSnapshots("t", keepLast = 1)
    val q2 = fileStream(lake, "t", out, ckpt)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(e.getCause.getMessage.contains("expired"))
  }
}
