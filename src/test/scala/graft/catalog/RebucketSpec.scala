package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[GraftLake.rebucket]] — `OPTIMIZE t REBUCKET TO n`: online
  * re-bucketing with the layout VERSIONED in the manifest. Contracts:
  * contents preserved; point lookups and merges route under the NEW n
  * after the transition; the pre-rebucket snapshot reads (and prunes)
  * under its OWN recorded layout; a concurrent append wins and forces
  * the rebucket to retry (never a mixed directory); and a historically
  * type-widened bucket source disables hash-based pruning outright
  * (legacy tables from before the ensureTable guard). */
class RebucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-rbk").toString)
  }

  private def bucketDirs(lake: GraftLake, t: String): Set[String] =
    lake.dataFiles(t).map { p =>
      new org.apache.hadoop.fs.Path(p).getParent.getName.split('=').head
    }.toSet

  test("rebucket preserves contents; lookups and merges route under the new n") {
    val lake = newLake()
    val rows = (0 until 400).map(i => (i.toLong, s"v$i"))
    lake.write("t", rows.toDF("id", "v"),
      partitions = Seq("bucket(4, id)"), pks = Seq("id"))
    val before = lake.read("t").select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val v0 = lake.versions("t").last
    lake.rebucket("t", 16)
    assert(lake.readMeta("t").partitions === Seq("bucket(16, id)"))
    assert(bucketDirs(lake, "t") === Set("__p_bucket_16_id"),
      "every live file must obey the new layout after the rebucket")
    assert(lake.read("t").select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === before)
    // the rebucket commit is a logical no-op to the change feed
    assert(lake.tableChanges("t", v0, lake.versions("t").last).isEmpty)
    // a merge THROUGH the new layout: update half, insert new keys —
    // exactly-once per PK (the probe-skip re-rendered under n=16)
    lake.upsert("t",
      (0 until 400 by 2).map(i => (i.toLong, "UPD")).toDF("id", "v")
        .unionByName((400 until 450).map(i => (i.toLong, s"n$i")).toDF("id", "v")))
    val after = lake.read("t")
    assert(after.count() === 450)
    assert(after.filter(col("v") === "UPD").count() === 200)
    // point lookup prunes under the NEW n
    val planned = lake.readWhere("t", col("id") === 7L)
    assert(planned.collect().map(_.getLong(0)).toSeq === Seq(7L))
    // pre-rebucket snapshot: its own contents, under its own layout
    assert(lake.readVersion("t", v0).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === before)
  }

  test("a concurrent append during the rebucket window wins; rebucket retries") {
    val lake = newLake()
    lake.write("t", (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      partitions = Seq("bucket(2, id)"), pks = Seq("id"))
    val appended = new java.util.concurrent.atomic.AtomicBoolean(false)
    lake.rebucketBeforeCommitHook = () => {
      val t = new Thread(() => {
        lake.append("t", Seq((900L, "mid")).toDF("id", "v"))
        appended.set(true)
      }, "mid-rebucket-appender")
      t.start()
      t.join(120000)
      assert(!t.isAlive, "append must not be blocked by in-flight rebucket")
      lake.rebucketBeforeCommitHook = () => ()
    }
    try lake.rebucket("t", 8) finally lake.rebucketBeforeCommitHook = () => ()
    assert(appended.get)
    // the rebucket retried (its first window saw the append) and the
    // final state carries EVERY row in the new layout — never mixed
    assert(lake.read("t").count() === 101)
    assert(lake.read("t").filter(col("id") === 900L).count() === 1)
    assert(bucketDirs(lake, "t") === Set("__p_bucket_8_id"),
      "the mid-window append's old-layout file must have been re-homed " +
        "by the retried rewrite, not adopted as-is")
    assert(lake.readMeta("t").partitions === Seq("bucket(8, id)"))
  }

  test("rebucket validates: no bucket expr / same n / shallow clone") {
    val lake = newLake()
    lake.write("plain", Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] { lake.rebucket("plain", 8) }
    assert(e.getMessage.contains("exactly one bucket"))
    lake.write("b", Seq((1L, "a")).toDF("id", "v"),
      partitions = Seq("bucket(4, id)"), pks = Seq("id"))
    val v = lake.versions("b").last
    lake.rebucket("b", 4) // same n: no-op, no commit
    assert(lake.versions("b").last === v)
  }

  test("a historically type-widened bucket source disables hash pruning (legacy guard)") {
    val lake = newLake()
    // find a key whose INT hash-bucket differs from its LONG hash-bucket
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    def bucketOf(v: Any, dt: org.apache.spark.sql.types.DataType, n: Int) = {
      val h = Murmur3Hash(Seq(Literal(v, dt)), 42).eval(null).asInstanceOf[Int]
      ((h % n) + n) % n
    }
    val k = (1 to 1000).find(i =>
      bucketOf(i, IntegerType, 4) != bucketOf(i.toLong, LongType, 4)).get
    val df = Seq(k, k + 1, k + 2).toDF("id")
      .select(col("id").cast("int").as("id"), lit("x").as("v"))
    lake.write("t", df, partitions = Seq("bucket(4, id)"), pks = Seq("id"))
    // simulate a LEGACY pre-guard widening: hand-rewrite the registry to
    // BIGINT while the stored files (and their bucket dirs) were hashed
    // under INT — exactly the state the round-11 ensureTable guard now
    // prevents from arising
    val meta = lake.readMeta("t")
    val widened = meta.copy(schema = org.apache.spark.sql.types.StructType(
      meta.schema.fields.map(f =>
        if (f.name == "id") f.copy(dataType = LongType) else f)))
    val metaPath = new java.io.File(s"${lake.warehouseDir}/t/_graft_meta.json")
    java.nio.file.Files.write(metaPath.toPath,
      GraftLake.renderMeta(widened).getBytes("UTF-8"))
    // drop the Hadoop LocalFS checksum sidecar the out-of-band write broke
    new java.io.File(metaPath.getParent, "._graft_meta.json.crc").delete()
    GraftLake.invalidateCaches()
    // bucket pruning under the LONG hash would plan the wrong directory
    // and silently miss the row; the stability guard must disable it
    val got = lake.readWhere("t", col("id") === k.toLong)
    assert(got.count() === 1L,
      "a legacy-widened bucket source must fall back to the unpruned scan")
  }
}
