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
