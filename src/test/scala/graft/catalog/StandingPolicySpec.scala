package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Standing `graft.policy.*` TABLE PROPERTIES: auto-compaction,
  * auto-rebucket and snapshot retention as per-table standing policy
  * honored by EVERY write path's post-commit hook (plain appends, the
  * streaming sink's epochs, upserts, whole-table replaces) — not just
  * the ingest pipeline's config-scoped post-flush checks. The pipeline
  * keeps precedence: its landing suppresses the hooks and its
  * post-flush re-invocation excludes the kinds its IngestConfig owns. */
class StandingPolicySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-policy").toString)
  }

  test("plain appends trigger property-driven compaction") {
    val lake = newLake()
    lake.write("t", Seq((1L, "a")).toDF("id", "v"))
    lake.setTableProperty("t", "graft.policy.autoCompact.minFiles", "4")
    (2 to 5).foreach(i =>
      lake.append("t", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(lake.liveFileCount("t") < 4,
      s"the 4th-file append must compact, got ${lake.liveFileCount("t")} files")
    assert(lake.read("t").count() === 5, "compaction preserves contents")
  }

  test("plain appends trigger the property-driven bucket doubling; " +
      "maxGroupsPerCall bounds and later appends drain it") {
    val lake = newLake()
    def batch(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "v")
    lake.write("t", batch(0 until 100),
      partitions = Seq("bucket(2, id)"), pks = Seq("id"))
    lake.setTableProperty("t",
      "graft.policy.autoRebucket.targetRowsPerBucket", "100")
    lake.setTableProperty("t",
      "graft.policy.autoRebucket.maxGroupsPerCall", "1")
    // 300 rows / 2 buckets = 150 >= 100: the append itself doubles the
    // count, migrating at most ONE old bucket inside this write
    lake.append("t", batch(100 until 300))
    assert(lake.readMeta("t").partitions === Seq("bucket(4, id)"))
    val dirs0 = lake.dataFiles("t").map(p =>
      new org.apache.hadoop.fs.Path(p).getParent.getName.split('=').head).toSet
    assert(dirs0 === Set("__p_bucket_2_id", "__p_bucket_4_id"),
      s"one-group budget leaves the mixed state, got $dirs0")
    // the NEXT append resumes the in-flight migration (one more group)
    lake.append("t", batch(300 until 301))
    assert(lake.dataFiles("t").forall(_.contains("__p_bucket_4_id=")),
      "the second append drains the remaining group")
    assert(lake.read("t").count() === 301)
    assert(lake.read("t").select("id").distinct().count() === 301)
  }

  test("a streaming sink epoch triggers standing policies; retention " +
      "prunes snapshots") {
    val lake = newLake()
    val sink = new graft.streaming.GraftSink(lake, "s", "app", Nil, Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0, Seq((1, "a")).toDF("id", "v"))
    lake.setTableProperty("s", "graft.policy.retention.keepLast", "2")
    lake.setTableProperty("s", "graft.policy.retention.slack", "2")
    (1 to 5).foreach(i => sink.addBatch(i.toLong,
      Seq((i + 1, s"v$i")).toDF("id", "v")))
    assert(lake.versions("s").size <= 4,
      s"sink epochs must enforce retention, got ${lake.versions("s").size}")
    assert(lake.read("s").count() === 6, "retention never drops live rows")
  }

  test("pipeline-style exclusion and suppression override the properties") {
    val lake = newLake()
    lake.write("t", Seq((1L, "a")).toDF("id", "v"))
    lake.setTableProperty("t", "graft.policy.autoCompact.minFiles", "2")
    // a caller that owns policy timing suppresses the write-path hook
    GraftLake.withPoliciesSuppressed {
      (2 to 4).foreach(i =>
        lake.append("t", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    }
    assert(lake.liveFileCount("t") >= 4,
      "suppressed appends must not compact")
    // the post-flush re-invocation with the kind excluded (the pipeline
    // has its own CompactionConfig) leaves the table alone too
    lake.runStandingPolicies("t", exclude = Set("autoCompact"))
    assert(lake.liveFileCount("t") >= 4, "excluded kinds must not run")
    // without the exclusion the standing policy applies
    lake.runStandingPolicies("t")
    assert(lake.liveFileCount("t") < 4)
  }

  test("tables written only through transactions still get standing " +
      "maintenance (after the window, never inside it)") {
    val lake = newLake()
    lake.write("t", Seq((1L, "a")).toDF("id", "v"))
    lake.setTableProperty("t", "graft.policy.autoCompact.minFiles", "3")
    lake.transact(Seq("t")) {
      (2 to 4).foreach(i =>
        lake.append("t", Seq((i.toLong, s"v$i")).toDF("id", "v")))
      // inside the window the hooks are suppressed: the journaled
      // pre-versions must account for every commit
      assert(lake.liveFileCount("t") >= 3, "no policy commit mid-window")
    }
    assert(lake.liveFileCount("t") < 3,
      "the post-transaction re-run must compact")
    assert(lake.read("t").count() === 4)
  }

  test("non-positive policy bounds fail loudly at parse, not as a " +
      "silent every-write deferral") {
    val lake = newLake()
    lake.write("t", Seq((1L, "a")).toDF("id", "v"))
    lake.setTableProperty("t",
      "graft.policy.autoRebucket.maxGroupsPerCall", "0")
    lake.setTableProperty("t",
      "graft.policy.autoRebucket.targetRowsPerBucket", "100")
    val e = intercept[IllegalArgumentException](
      lake.append("t", Seq((2L, "b")).toDF("id", "v")))
    assert(e.getMessage.contains("must be positive"), e.getMessage)
  }

  test("malformed policy values fail loudly, after the write landed") {
    val lake = newLake()
    lake.write("t", Seq((1L, "a")).toDF("id", "v"))
    lake.setTableProperty("t", "graft.policy.autoCompact.minFiles", "lots")
    val e = intercept[IllegalArgumentException](
      lake.append("t", Seq((2L, "b")).toDF("id", "v")))
    assert(e.getMessage.contains("must be an integer"))
    assert(lake.read("t").count() === 2,
      "the append itself landed; only the policy probe failed")
  }
}
