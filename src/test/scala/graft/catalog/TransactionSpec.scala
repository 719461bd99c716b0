package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coordinated multi-table transaction contract (`transact`): sorted-order
  * write locks for the body's duration, compensating rollback of every
  * member that committed when the body throws (restore for pre-existing
  * tables, truncate for members created inside), suppressed-exception
  * hygiene; and the `pin` version vector giving snapshot-consistent
  * multi-table reads while ingest keeps committing. */
class TransactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-txn").toString)
  }

  test("durable transact: in-process semantics match transact; journal+locks clean up") {
    val lake = newLake()
    lake.append("a", Seq((1, "a1")).toDF("k", "v").repartition(1))
    lake.append("b", Seq((1, "b1")).toDF("k", "v").repartition(1))
    lake.transactDurable(Seq("a", "b")) {
      lake.append("a", Seq((2, "a2")).toDF("k", "v"))
      lake.append("b", Seq((2, "b2")).toDF("k", "v"))
    }
    assert(lake.read("a").count() === 2 && lake.read("b").count() === 2)
    val e = intercept[IllegalStateException](
      lake.transactDurable(Seq("a", "b")) {
        lake.append("a", Seq((3, "a3")).toDF("k", "v"))
        throw new IllegalStateException("boom")
      })
    assert(e.getMessage === "boom")
    assert(lake.read("a").count() === 2, "in-process failure compensates")
    // no residue: journal empty, lock files gone, next txn acquires freely
    val whf = new java.io.File(s"${lake.warehouseDir}/_txn_journal")
    assert(!whf.exists() || whf.listFiles().forall(!_.getName.endsWith(".json")))
    assert(!new java.io.File(s"${lake.warehouseDir}/a/_txn.lock").exists())
    lake.transactDurable(Seq("a", "b")) {
      lake.append("b", Seq((3, "b3")).toDF("k", "v"))
    }
    assert(lake.read("b").count() === 3)
    assert(lake.recoverStaleTransactions() === 0, "nothing stale to heal")
  }

  test("durable transact: a coordinator that DIES mid-transaction is compensated by the next writer (two real JVMs)") {
    GraftLake.invalidateCaches()
    val wh = Files.createTempDirectory("graft-txn2p").toString
    val lake = new GraftLake(spark, wh)
    lake.append("ta", Seq((1, "a1")).toDF("id", "v").repartition(1))
    lake.append("tb", Seq((1, "b1")).toDF("id", "v").repartition(1))
    // fork a coordinator that commits to ta then HALTS before tb
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.TxnCrasher", wh)).toArray
    val child = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD).start()
    assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "crasher JVM did not exit")
    assert(child.exitValue() === 42, s"crasher exited ${child.exitValue()}")
    // the crash left exactly a dead coordinator's state behind
    GraftLake.invalidateCaches()
    val lake2 = new GraftLake(spark, wh)
    assert(new java.io.File(s"$wh/_txn_journal").listFiles()
      .count(_.getName.endsWith(".json")) === 1, "journal must survive the crash")
    assert(new java.io.File(s"$wh/ta/_txn.lock").exists(), "lock must survive")
    assert(lake2.read("ta").count() === 6,
      "the partial commit is visible before recovery (5 crash rows + 1)")
    // the NEXT durable writer detects the dead pid, compensates ta,
    // breaks the locks, and runs its own transaction atomically
    lake2.transactDurable(Seq("ta", "tb")) {
      lake2.append("ta", Seq((2, "a2")).toDF("id", "v"))
      lake2.append("tb", Seq((2, "b2")).toDF("id", "v"))
    }
    assert(lake2.read("ta").count() === 2,
      "the dead coordinator's partial commit must be compensated away")
    assert(lake2.read("ta").filter(col("id") >= 100).count() === 0)
    assert(lake2.read("tb").count() === 2)
    assert(new java.io.File(s"$wh/_txn_journal").listFiles()
      .count(_.getName.endsWith(".json")) === 0, "journal healed")
    assert(!new java.io.File(s"$wh/ta/_txn.lock").exists() &&
      !new java.io.File(s"$wh/tb/_txn.lock").exists(), "locks healed")
    assert(graft.metrics.GraftMetrics.op("txnRecovered").count.sum() >= 1)
  }

  test("a SUSPENDED (alive, heartbeat-stopped) coordinator is taken over and fenced on resume (two real JVMs)") {
    GraftLake.invalidateCaches()
    val wh = Files.createTempDirectory("graft-txnhb").toString
    val lake = new GraftLake(spark, wh)
    lake.append("ta", Seq((1, "a1")).toDF("id", "v").repartition(1))
    // takeover keys on MISSED HEARTBEATS for FOREIGN-host coordinators
    // (the child journals under a simulated remote host name; its pid
    // stays alive throughout — same-host pid liveness would trust it and
    // wait out the lock timeout, which is exactly the protection a live
    // local coordinator needs)
    spark.conf.set("spark.graft.txn.heartbeatTimeoutMs", "1500")
    try {
      import scala.jdk.CollectionConverters._
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.filter(a =>
          a.startsWith("--add-opens") || a.startsWith("--add-exports"))
      val javaBin = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.TxnSuspender", wh)).toArray
      val child = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD).start()
      try {
        val ready = new java.io.File(wh, "_suspender_ready")
        val deadline = System.nanoTime() + 180e9.toLong
        while (!ready.exists() && System.nanoTime() < deadline)
          Thread.sleep(200)
        assert(ready.exists(), "suspender never signalled readiness")
        GraftLake.invalidateCaches()
        assert(lake.read("ta").count() === 2,
          "the partial commit is visible while the coordinator naps")
        Thread.sleep(2500) // > heartbeatTimeout with zero renewals
        GraftLake.invalidateCaches()
        assert(child.isAlive, "the coordinator must still be ALIVE")
        assert(lake.recoverStaleTransactions() === 1,
          "missed heartbeats must trigger takeover despite the live pid")
        assert(lake.read("ta").count() === 1,
          "the suspended coordinator's partial commit is compensated")
        // resume: the coordinator lands one more commit, detects the
        // broken locks, self-compensates and reports the fence
        new java.io.File(wh, "_suspender_resume").createNewFile()
        assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
          "suspender JVM did not exit")
        assert(child.exitValue() === 43,
          s"suspender exited ${child.exitValue()} (43 = fenced as expected)")
        GraftLake.invalidateCaches()
        assert(lake.read("ta").count() === 1,
          "the post-takeover commit must not survive the fence")
      } finally if (child.isAlive) child.destroyForcibly()
    } finally spark.conf.unset("spark.graft.txn.heartbeatTimeoutMs")
  }

  test("same-host LIVE coordinator is protected from heartbeat takeover; a dead one is not") {
    GraftLake.invalidateCaches()
    val wh = Files.createTempDirectory("graft-txnhost").toString
    val lake = new GraftLake(spark, wh)
    lake.append("ta", Seq((1, "a1")).toDF("id", "v").repartition(1))
    lake.append("ta", Seq((2, "a2")).toDF("id", "v").repartition(1))
    spark.conf.set("spark.graft.txn.heartbeatTimeoutMs", "500")
    try {
      val dir = new java.io.File(wh, "_txn_journal"); dir.mkdirs()
      val j = new java.io.File(dir, "test-host-txn.json")
      def writeJournal(pid: Long): Unit = {
        val host = GraftLake.coordinatorHost(spark)
        java.nio.file.Files.write(j.toPath,
          (s"""{"txn":"test-host-txn","pid":$pid,"host":"$host",""" +
            s""""members":[{"name":"ta","pre":0,"meta":""}]}""")
            .getBytes("UTF-8"))
        // mtime far past the heartbeat timeout: the lease looks expired
        j.setLastModified(System.currentTimeMillis() - 60000L)
      }
      // LIVE pid on THIS host: pid liveness is authoritative — a stale
      // lease alone (driver GC pause, silently-failing touch) must not
      // get the coordinator's in-flight work compensated
      writeJournal(ProcessHandle.current().pid())
      assert(lake.recoverStaleTransactions() === 0,
        "a live same-host coordinator must not be taken over on lease age")
      assert(lake.read("ta").count() === 2, "no compensation ran")
      // DEAD pid on THIS host: immediate takeover, member restored to its
      // journaled pre-version
      writeJournal(999999999L)
      assert(lake.recoverStaleTransactions() === 1,
        "a dead same-host coordinator is compensated immediately")
      assert(lake.read("ta").count() === 1,
        "member restored to its journaled pre-version")
      assert(!j.exists(), "journal healed")
    } finally spark.conf.unset("spark.graft.txn.heartbeatTimeoutMs")
  }

  test("transact commits all members; failure rolls every member back") {
    val lake = newLake()
    lake.append("a", Seq((1, "a1")).toDF("k", "v").repartition(1))
    lake.append("b", Seq((1, "b1")).toDF("k", "v").repartition(1))
    lake.transact(Seq("a", "b")) {
      lake.append("a", Seq((2, "a2")).toDF("k", "v"))
      lake.append("b", Seq((2, "b2")).toDF("k", "v"))
    }
    assert(lake.read("a").count() === 2 && lake.read("b").count() === 2)
    // failure AFTER both members wrote: both compensate back
    val e = intercept[IllegalStateException](
      lake.transact(Seq("a", "b")) {
        lake.append("a", Seq((3, "a3")).toDF("k", "v"))
        lake.append("b", Seq((3, "b3")).toDF("k", "v"))
        throw new IllegalStateException("boom")
      })
    assert(e.getMessage === "boom", "the body's own failure propagates")
    assert(lake.read("a").count() === 2 && lake.read("b").count() === 2)
    assert(lake.history("a").collect().last.getString(2) === "restore",
      "rollback is a compensating restore, visible in the commit log")
    assert(lake.history("b").collect().last.getString(2) === "restore")
    // failure BEFORE the second member wrote: only the first compensates
    val vB = lake.versions("b").size
    intercept[RuntimeException](
      lake.transact(Seq("a", "b")) {
        lake.append("a", Seq((4, "a4")).toDF("k", "v"))
        throw new RuntimeException("later")
      })
    assert(lake.read("a").count() === 2 && lake.read("b").count() === 2)
    assert(lake.versions("b").size === vB, "untouched members commit nothing")
  }

  test("members created inside a failed transaction are emptied") {
    val lake = newLake()
    lake.append("base", Seq((1, 1)).toDF("k", "n").repartition(1))
    intercept[RuntimeException](
      lake.transact(Seq("base", "fresh")) {
        lake.append("fresh", Seq((1, 1)).toDF("k", "n"))
        lake.append("base", Seq((2, 2)).toDF("k", "n"))
        throw new RuntimeException("abort")
      })
    assert(lake.read("base").count() === 1)
    assert(lake.read("fresh").count() === 0,
      "a member created inside the transaction truncates on abort")
  }

  test("rollback reverts registry evolution the aborted body committed") {
    val lake = newLake()
    lake.append("a", Seq((1, "x")).toDF("k", "v").repartition(1))
    intercept[RuntimeException](
      lake.transact(Seq("a")) {
        // auto-evolution inside the body: ADD COLUMN extra
        lake.append("a", Seq((2, "y", 9)).toDF("k", "v", "extra"))
        throw new RuntimeException("abort")
      })
    assert(lake.read("a").count() === 1)
    assert(!lake.read("a").columns.contains("extra"),
      "an aborted append's schema evolution must not survive the rollback")
  }

  test("a failed rollback step surfaces as a suppressed exception") {
    val lake = newLake()
    lake.append("a", Seq((1, 1)).toDF("k", "n").repartition(1))
    val e = intercept[RuntimeException](
      lake.transact(Seq("a")) {
        lake.append("a", Seq((2, 2)).toDF("k", "n"))
        // vacuum the pre-transaction snapshot so the compensating
        // restore has nothing to return to
        lake.expireSnapshots("a", keepLast = 1)
        throw new RuntimeException("boom")
      })
    assert(e.getMessage === "boom")
    assert(e.getSuppressed.nonEmpty,
      "the failed restore must ride along as a suppressed exception")
    // no data lost: the body's append simply stays (compensation failed)
    assert(lake.read("a").count() === 2)
  }

  test("nested transact is refused; fatal control flow skips compensation") {
    val lake = newLake()
    lake.append("a", Seq((1, 1)).toDF("k", "n"))
    lake.append("b", Seq((1, 1)).toDF("k", "n"))
    val e = intercept[IllegalArgumentException](
      lake.transact(Seq("a")) { lake.transact(Seq("b")) { () } })
    assert(e.getMessage.contains("nested transact"))
    // a non-local return is control flow, not failure: committed work stays
    def f(): Int = {
      lake.transact(Seq("a")) {
        lake.append("a", Seq((2, 2)).toDF("k", "n"))
        return 7
      }
      0
    }
    assert(f() === 7)
    assert(lake.read("a").count() === 2,
      "the body's append must survive a non-local return")
  }

  test("pin gives snapshot-consistent multi-table reads under ongoing writes") {
    val lake = newLake()
    lake.append("o", Seq((1, 10)).toDF("k", "n").repartition(1))
    lake.append("l", Seq((1, 100)).toDF("k", "n").repartition(1))
    val pins = lake.pin(Seq("o", "l"))
    // ingest keeps moving after the pin
    lake.append("o", Seq((2, 20)).toDF("k", "n"))
    lake.deleteWhere("l", col("k") === 1)
    val o = lake.readVersion("o", pins("o"))
    val l = lake.readVersion("l", pins("l"))
    assert(o.count() === 1 && l.count() === 1)
    assert(o.join(l, "k").count() === 1,
      "the pinned join sees one point in time")
    assert(lake.read("o").count() === 2 && lake.read("l").count() === 0,
      "live reads see the post-pin state")
    intercept[IllegalArgumentException](lake.pin(Seq("nope")))
  }

  test("rollback reverts exactly-once txn watermarks - redelivery lands") {
    val lake = newLake()
    // committed watermark BEFORE the transaction must survive rollback
    assert(lake.appendIdempotent("t", Seq((1, "a")).toDF("k", "v"), "app", 0L))
    val e = intercept[RuntimeException] {
      lake.transact(Seq("t")) {
        // the aborted body commits batch 1 WITH its watermark...
        assert(lake.appendIdempotent("t", Seq((2, "b")).toDF("k", "v"), "app", 1L))
        throw new RuntimeException("boom after the idempotent append")
      }
    }
    assert(e.getMessage == "boom after the idempotent append")
    // data rolled back AND the watermark with it: without the reset, the
    // stream's redelivery of batch 1 would no-op and its rows would be
    // lost forever
    assert(lake.read("t").count() === 1)
    assert(lake.lastTxnVersion("t", "app") === Some(0L),
      "rollback must revert the aborted append's txn watermark")
    assert(lake.appendIdempotent("t", Seq((2, "b")).toDF("k", "v"), "app", 1L),
      "redelivery of the rolled-back batch must LAND, not skip")
    assert(lake.read("t").count() === 2)
    // the pre-transaction watermark still dedups below itself
    assert(!lake.appendIdempotent("t", Seq((9, "z")).toDF("k", "v"), "app", 0L))
    // transactOwned shares the rollback discipline
    val e2 = intercept[RuntimeException] {
      lake.transactOwned(Seq("t")) {
        assert(lake.appendIdempotent("t", Seq((3, "c")).toDF("k", "v"), "app", 2L))
        throw new RuntimeException("boom2")
      }
    }
    assert(e2.getMessage == "boom2")
    assert(lake.lastTxnVersion("t", "app") === Some(1L))
    assert(lake.appendIdempotent("t", Seq((3, "c")).toDF("k", "v"), "app", 2L))
    assert(lake.read("t").count() === 3)
  }
}
