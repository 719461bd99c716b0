package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 contract: compaction neither blocks nor is blocked by
  * appends. The rewrite phase holds NO table lock; the commit section
  * validates its input files are still live (and the DV set unchanged)
  * and retries from the new state otherwise — appends only add files, so
  * appends always win and coexist; rewrites/deletes force a retry. The
  * reference inherits this from PG snapshot isolation + serialization
  * retries (DucklakeConnectionFactory.java:69-70); here it is file-native
  * commit-time conflict detection. The `compactBeforeCommitHook` test
  * seam opens a deterministic window between the lock-free rewrite and
  * the commit lock. */
class ConcurrentCompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-ccomp").toString)
  }

  test("an append lands DURING compaction: both commit, zero lost rows") {
    val lake = newLake()
    for (b <- 0 until 4)
      lake.append("t", (b * 1000 until (b + 1) * 1000)
        .map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1))
    assert(lake.dataFiles("t").size === 4)
    val appended = new java.util.concurrent.atomic.AtomicBoolean(false)
    lake.compactBeforeCommitHook = () => {
      // mid-compaction window, ANOTHER thread appends: the same-thread
      // monitor is reentrant, so only a foreign thread proves no table
      // lock is held across the rewrite
      val t = new Thread(() => {
        lake.append("t", Seq((999999L, "mid")).toDF("id", "v"))
        appended.set(true)
      }, "mid-compaction-appender")
      t.start()
      t.join(120000)
      assert(!t.isAlive, "append must not be blocked by in-flight compaction")
      lake.compactBeforeCommitHook = () => ()
    }
    try lake.compact("t") finally lake.compactBeforeCommitHook = () => ()
    assert(appended.get)
    // both committed: the compact op is in the history AND the
    // mid-compaction append's row survived (zero lost rows)
    assert(lake.history("t").collect().map(_.getString(2)).count(_ == "compact") === 1)
    assert(lake.read("t").count() === 4001,
      "the mid-compaction append must survive the compaction commit")
    assert(lake.read("t").filter(col("id") === 999999L).count() === 1)
    // the 4 input files compacted; the appended file stayed live untouched
    assert(lake.dataFiles("t").size === 2,
      s"expected compacted file + appended file, got ${lake.dataFiles("t")}")
  }

  test("a concurrent DELETE invalidates the rewrite: compaction retries, rows never resurrect") {
    val lake = newLake()
    for (b <- 0 until 3)
      lake.append("t", (b * 1000 until (b + 1) * 1000)
        .map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1))
    val retries0 = graft.metrics.GraftMetrics.op("compactRetry").count.sum()
    lake.compactBeforeCommitHook = () => {
      // a MoR DELETE commits a DV on one of the compaction's input files
      // while the rewrite (which folded the PRE-delete DV set) is staged:
      // committing that stage would resurrect the deleted rows
      val t = new Thread(() => lake.deleteWhere("t", col("id") < 10))
      t.start(); t.join(120000)
      assert(!t.isAlive)
      lake.compactBeforeCommitHook = () => ()
    }
    try lake.compact("t") finally lake.compactBeforeCommitHook = () => ()
    assert(graft.metrics.GraftMetrics.op("compactRetry").count.sum() === retries0 + 1,
      "the stale rewrite must be detected and retried, not committed")
    assert(lake.read("t").count() === 2990,
      "deleted rows must never resurrect through a stale compaction")
    assert(lake.read("t").filter(col("id") < 10).count() === 0)
    // the retry DID compact (fold the DVs, merge the files)
    assert(lake.history("t").collect().map(_.getString(2)).contains("compact"))
    assert(lake.dataFiles("t").size === 1)
    assert(lake.liveDvs("t").isEmpty,
      "a full compaction folds the deletion vectors away")
  }

  test("partition-scoped concurrent path: append to ANOTHER partition coexists") {
    val lake = newLake()
    lake.write("p", (0 until 2000).map(i => (i.toLong, i % 2, s"v$i"))
      .toDF("id", "seg", "v").repartition(4),
      partitions = Seq("seg"))
    val before = lake.dataFiles("p").filter(_.contains("__p_seg=1")).toSet
    lake.compactBeforeCommitHook = () => {
      val t = new Thread(() => lake.append("p",
        Seq((999999L, 1, "other")).toDF("id", "seg", "v")))
      t.start(); t.join(120000)
      assert(!t.isAlive)
      lake.compactBeforeCommitHook = () => ()
    }
    // compact ONLY seg=0; the mid-flight append went to seg=1
    try lake.compact("p", predicate = Some(col("seg") === 0))
    finally lake.compactBeforeCommitHook = () => ()
    assert(lake.read("p").count() === 2001)
    assert(before.subsetOf(lake.dataFiles("p")
      .filter(_.contains("__p_seg=1")).toSet),
      "untouched partitions' files survive a scoped compaction")
    assert(lake.dataFiles("p").count(_.contains("__p_seg=0")) === 1,
      "the scoped partition compacted to one file")
  }
}
