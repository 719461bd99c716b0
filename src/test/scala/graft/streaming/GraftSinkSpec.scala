package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import graft.catalog.GraftLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The `graft` streaming sink: epoch idempotence (exactly-once on WAL
  * replay), output modes, partitioned landing, and the composed
  * lake→lake replication restart. */
class GraftSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-sink").toString)
  }

  private def ids(df: DataFrame): Seq[Int] =
    df.select("id").collect().map(_.getInt(0)).sorted.toSeq

  test("append mode: a replayed epoch lands exactly once") {
    val lake = newLake()
    val sink = new GraftSink(lake, "t", "app", Nil, Nil, OutputMode.Append())
    sink.addBatch(0, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    sink.addBatch(0, Seq((1, "a"), (2, "b")).toDF("id", "v")) // WAL replay
    assert(ids(lake.read("t")) === Seq(1, 2), "replayed epoch must no-op")
    sink.addBatch(1, Seq((3, "c")).toDF("id", "v"))
    assert(ids(lake.read("t")) === Seq(1, 2, 3))
    // a DIFFERENT appId scope is a different stream: its epoch 0 lands
    val other = new GraftSink(lake, "t", "app2", Nil, Nil, OutputMode.Append())
    other.addBatch(0, Seq((4, "d")).toDF("id", "v"))
    assert(ids(lake.read("t")) === Seq(1, 2, 3, 4))
  }

  test("appId normalization upgrade adopts the legacy raw-path watermark") {
    val lake = newLake()
    // a pre-upgrade stream committed epochs 0..1 under the RAW checkpoint
    // string as its scope
    val legacy = new GraftSink(lake, "t", "/tmp/ck", Nil, Nil,
      OutputMode.Append())
    legacy.addBatch(0, Seq((1, "a")).toDF("id", "v"))
    legacy.addBatch(1, Seq((2, "b")).toDF("id", "v"))
    // post-upgrade the same checkpoint normalizes to a qualified URI; the
    // WAL replays the last epoch — without legacy adoption the fresh
    // scope has no watermark and the epoch would land TWICE
    val upgraded = new GraftSink(lake, "t", "file:///tmp/ck", Nil, Nil,
      OutputMode.Append(), legacyAppId = Some("/tmp/ck"))
    upgraded.addBatch(1, Seq((2, "b")).toDF("id", "v")) // WAL replay
    assert(ids(lake.read("t")) === Seq(1, 2),
      "the replayed epoch must dedupe against the legacy watermark")
    upgraded.addBatch(2, Seq((3, "c")).toDF("id", "v"))
    assert(ids(lake.read("t")) === Seq(1, 2, 3))
    // from here the new scope owns the watermark
    upgraded.addBatch(2, Seq((3, "c")).toDF("id", "v"))
    assert(ids(lake.read("t")) === Seq(1, 2, 3))
  }

  test("update mode upserts each epoch by PK; complete mode overwrites") {
    val lake = newLake()
    val up = new GraftSink(lake, "u", "app", Nil, Seq("id"), OutputMode.Update())
    up.addBatch(0, Seq((1, "a")).toDF("id", "v"))
    up.addBatch(1, Seq((1, "A"), (2, "b")).toDF("id", "v"))
    val got = lake.read("u").select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "A", 2 -> "b"))

    val full = new GraftSink(lake, "c", "app", Nil, Nil, OutputMode.Complete())
    full.addBatch(0, Seq((1, "x"), (2, "y")).toDF("id", "v"))
    full.addBatch(1, Seq((3, "z")).toDF("id", "v"))
    assert(ids(lake.read("c")) === Seq(3), "complete mode replaces contents")

    intercept[IllegalArgumentException] {
      new GraftSink(lake, "u2", "app", Nil, Nil, OutputMode.Update())
    }
  }

  test("Complete-mode epochs on a cdf table capture a keyed diff; feed=cdf streams them") {
    val lake = newLake()
    val full = new GraftSink(lake, "c", "app", Nil, Seq("id"),
      OutputMode.Complete())
    full.addBatch(0, Seq((1, "a"), (2, "b")).toDF("id", "v"))   // v0 seed
    lake.setTableProperty("c",
      graft.catalog.TableMeta.CdfEnabledKey, "true")
    val v1 = lake.versions("c").last
    // epoch: id=1 unchanged, id=2 changed, id=3 new
    full.addBatch(1, Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "v"))
    // epoch: only id=2 survives → 1 and 3 are deletes
    full.addBatch(2, Seq((2, "B")).toDF("id", "v"))
    val feed = lake.tableChanges("c", v1, lake.versions("c").last)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(feed === Set(
      (2, "b", "update_preimage"), (2, "B", "update_postimage"),
      (3, "c", "insert"),
      (1, "a", "delete"), (3, "c", "delete")),
      s"unchanged id=1 must be invisible to the first epoch; got $feed")
    // feed == table: the update postimage's _inserted_at equals the live
    // row's (matched keys keep their original stamp — upsert parity)
    val liveTs = lake.read("c").filter(col("id") === 2)
      .select("_inserted_at").head().getTimestamp(0)
    val postTs = lake.tableChanges("c", v1, lake.versions("c").last)
      .filter(col("_change_type") === "update_postimage")
      .select("_inserted_at").head().getTimestamp(0)
    assert(postTs === liveTs, "captured postimages must equal table rows")
    // and a feed=cdf streaming consumer replays the same epochs exactly
    val sinkName = s"cdf_complete_${System.nanoTime()}"
    val q = spark.readStream.format("graft-cdf")
      .option("warehouse", lake.warehouseDir).option("table", "c")
      .option("feed", "cdf").option("startingVersion", v1.toString)
      .load()
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-cdfck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sinkName)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(streamed === feed)
  }

  test("expression partitioning lands through the sink") {
    val lake = newLake()
    val sink = new GraftSink(lake, "p", "app", Seq("bucket(4, id)"),
      Seq("id"), OutputMode.Append())
    sink.addBatch(0, (0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val dirs = lake.read("p").inputFiles
      .flatMap(_.split('/').find(_.startsWith("__p_bucket_4_id="))).toSet
    assert(dirs.size === 4, s"bucketed layout expected, got $dirs")
    assert(lake.read("p").count() === 40)
  }

  test("append mode requires an explicit idempotence scope") {
    val lake = newLake()
    val provider = new GraftSinkProvider
    def create(params: Map[String, String]) = provider.createSink(
      spark.sqlContext, params, Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val base = Map("warehouse" -> lake.warehouseDir, "table" -> "t")
    // no txnAppId and no checkpointLocation OPTION: two streams would
    // silently dedupe against each other's epochs — refuse
    val e = intercept[IllegalArgumentException] { create(base) }
    assert(e.getMessage.contains("idempotence scope"))
    create(base + ("txnAppId" -> "a")) // explicit scope: fine
    create(base + ("checkpointLocation" -> "/tmp/x")) // option-scope: fine
    // Update/Complete are idempotent by construction — no scope needed
    provider.createSink(spark.sqlContext, base + ("pks" -> "id"), Nil,
      org.apache.spark.sql.streaming.OutputMode.Update())
  }

  test("checkpoint-derived idempotence scope is spelling-invariant") {
    val conf = spark.sparkContext.hadoopConfiguration
    val n = GraftSinkProvider.normalizeScope(conf, _: String)
    // every spelling of ONE location maps to ONE appId — a restart with a
    // trailing slash or a file: prefix must not reset the txn watermark
    val canon = n("/tmp/ckpt-x")
    assert(n("/tmp/ckpt-x/") === canon)
    assert(n("file:/tmp/ckpt-x") === canon)
    assert(n("file:///tmp/ckpt-x") === canon)
    // distinct locations stay distinct scopes
    assert(n("/tmp/ckpt-y") !== canon)
  }

  test("lake→lake replication survives a restart exactly once") {
    val lake = newLake()
    def slice(r: Range): DataFrame = r.map(i => (i, s"v$i")).toDF("id", "v")
    lake.append("src", slice(0 until 5))
    val ckpt = Files.createTempDirectory("sink-ckpt").toString
    def replicate() = spark.readStream.format("graft-cdf")
      .option("warehouse", lake.warehouseDir).option("table", "src")
      .option("startingVersion", "snapshot")
      .load()
      .drop("_inserted_at")
      .writeStream.format("graft")
      .option("warehouse", lake.warehouseDir).option("table", "dst")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = replicate()
    try q1.processAllAvailable() finally q1.stop()
    assert(ids(lake.read("dst")) === (0 until 5))
    lake.append("src", slice(5 until 8)) // lands while the stream is down
    val q2 = replicate()
    try q2.processAllAvailable() finally q2.stop()
    assert(ids(lake.read("dst")) === (0 until 8),
      "restart must neither duplicate the backfill nor drop down-time commits")
  }
}
