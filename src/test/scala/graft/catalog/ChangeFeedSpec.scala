package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[GraftLake.tableChanges]] contract: the change feed is derived from
  * commit metadata alone — append commits yield their files as inserts,
  * merge-on-read commits yield their new DV entries as deletes (an
  * UPDATE yields preimages + postimages), logically no-op rewrites
  * (compact) contribute nothing, and rewrite-class commits fail fast.
  * The reconciliation invariant: state(from) plus the feed's inserts
  * minus its deletes IS state(to). */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-cf").toString)
  }

  private def feedRows(df: DataFrame): Set[(Int, String, String, Long)] =
    df.select(col("id"), col("v"), col(GraftLake.ChangeTypeCol),
        col(GraftLake.CommitVersionCol))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

  test("append-only window: each commit's files are its inserts") {
    val lake = newLake()
    lake.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    lake.append("t", Seq((3, "c")).toDF("id", "v"))
    lake.append("t", Seq((4, "d")).toDF("id", "v"))
    val vs = lake.versions("t")
    val feed = lake.tableChanges("t", vs.head, vs.last)
    assert(feedRows(feed) === Set(
      (3, "c", "insert", vs(1)), (4, "d", "insert", vs(2))))
  }

  test("MoR delete and update: DV entries are deletes, postimages inserts") {
    val lake = newLake()
    lake.append("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val v0 = lake.versions("t").head
    assert(lake.deleteWhere("t", col("id") === 2) === 1L)
    val vDel = lake.versions("t").last
    assert(lake.updateWhere("t", col("id") === 3,
      Map("v" -> lit("C2"))) === 1L)
    val vUpd = lake.versions("t").last
    val feed = lake.tableChanges("t", v0, vUpd)
    assert(feedRows(feed) === Set(
      (2, "b", "delete", vDel),
      (3, "c", "delete", vUpd),
      (3, "C2", "insert", vUpd)))
  }

  test("compaction in the window is logically invisible; retired files still read") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v").repartition(1))
    val v0 = lake.versions("t").head
    lake.append("t", Seq((2, "b")).toDF("id", "v").repartition(1))
    // compaction retires BOTH appended files — the feed must skip the
    // churn and recover the second append's rows from _history/
    lake.compact("t")
    lake.append("t", Seq((3, "c")).toDF("id", "v").repartition(1))
    val vs = lake.versions("t")
    val feed = lake.tableChanges("t", v0, vs.last)
    assert(feed.filter(col(GraftLake.ChangeTypeCol) =!= "insert").isEmpty)
    assert(feedRows(feed).map(r => (r._1, r._2, r._3)) ===
      Set((2, "b", "insert"), (3, "c", "insert")))
  }

  test("rewrite-class commit in the window fails fast") {
    val lake = newLake()
    lake.write("t", Seq((1, "a"), (2, "b")).toDF("id", "v"), pks = Seq("id"))
    val v0 = lake.versions("t").head
    lake.write("t", Seq((2, "B2")).toDF("id", "v"), pks = Seq("id"))
    val vs = lake.versions("t")
    val e = intercept[IllegalArgumentException] {
      lake.tableChanges("t", v0, vs.last).collect()
    }
    assert(e.getMessage.contains("snapshotDiff"))
  }

  test("empty window returns an empty frame with the feed schema") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v"))
    val v = lake.versions("t").head
    val feed = lake.tableChanges("t", v, v)
    assert(feed.isEmpty)
    assert(feed.columns.contains(GraftLake.ChangeTypeCol) &&
      feed.columns.contains(GraftLake.CommitVersionCol))
  }

  test("provenance: rows attribute to their landing commit; DVs excluded; rewrites re-attribute") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v").repartition(1))
    val v0 = lake.versions("t").head
    lake.append("t", Seq((2, "b"), (3, "c")).toDF("id", "v").repartition(1))
    val v1 = lake.versions("t").last
    val p = lake.readWithProvenance("t")
    val vIdx = p.columns.indexOf(GraftLake.CommitVersionCol)
    assert(p.collect().map(r => (r.getInt(0), r.getLong(vIdx))).toSet ===
      Set((1, v0), (2, v1), (3, v1)))
    assert(p.columns.contains(GraftLake.SourceFileCol))
    lake.deleteWhere("t", col("id") === 2)
    assert(lake.readWithProvenance("t").select("id").collect()
      .map(_.getInt(0)).toSet === Set(1, 3))
    // a rewrite re-attributes file-granular provenance to the rewrite
    // commit (documented; _inserted_at keeps the row-level ingest time)
    lake.compact("t")
    val vC = lake.versions("t").last
    assert(lake.readWithProvenance("t")
      .select(GraftLake.CommitVersionCol).collect()
      .map(_.getLong(0)).toSet === Set(vC))
  }

  test("provenance after RESTORE: a re-added file attributes once, no row fan-out") {
    val lake = newLake()
    lake.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v").repartition(1))
    val v0 = lake.versions("t").head
    lake.overwriteContents("t",
      Seq((9, "z")).toDF("id", "v")
        .withColumn("_inserted_at", current_timestamp()))
    lake.restore("t", v0) // the original file re-references by identity
    val vR = lake.versions("t").last
    val p = lake.readWithProvenance("t")
    // LAST-WINS attribution: one row per table row, attributed to the
    // restore commit (the commit that made the file live again)
    assert(p.count() === 2L, "a duplicate attribution key must not fan out")
    assert(p.select(GraftLake.CommitVersionCol).collect()
      .map(_.getLong(0)).toSet === Set(vR))
  }

  test("metadata row count: footer stats minus live DVs; inert entries don't subtract") {
    val lake = newLake()
    lake.write("p", (1 to 60).map(i => (i, i % 2, s"v$i")).toDF("id", "seg", "v"),
      partitions = Seq("seg"))
    def check(): Unit = {
      val fast = lake.rowCountFromStats("p")
      assert(fast.isDefined, "live files must carry the row-count stat")
      assert(fast.get === lake.read("p").count())
    }
    check()
    assert(lake.deleteWhere("p", col("id") <= 6) === 6L)
    check()
    // rewrite ONLY seg 0: its files retire but the partition-scoped
    // rewrite keeps the DV set — entries for retired files are inert and
    // must not subtract from the metadata count
    lake.compact("p", predicate = Some(col("seg") === 0))
    check()
    lake.append("p", Seq((100, 0, "x")).toDF("id", "seg", "v"))
    check()
  }

  test("reconciliation: state(from) + inserts - deletes = state(to)") {
    val lake = newLake()
    val base = (1 to 200).map(i => (i, s"v$i"))
    lake.append("t", base.toDF("id", "v"))
    val v0 = lake.versions("t").head
    lake.append("t", (201 to 260).map(i => (i, s"v$i")).toDF("id", "v"))
    lake.deleteWhere("t", col("id") % 7 === 0)
    lake.updateWhere("t", col("id") % 11 === 3,
      Map("v" -> concat(col("v"), lit("!"))))
    val vN = lake.versions("t").last
    val feed = lake.tableChanges("t", v0, vN)
    val from = lake.readVersion("t", v0).select("id", "v")
    val ins = feed.filter(col(GraftLake.ChangeTypeCol) === "insert")
      .select("id", "v")
    val del = feed.filter(col(GraftLake.ChangeTypeCol) === "delete")
      .select("id", "v")
    val reconstructed = from.unionByName(ins).exceptAll(del)
    val to = lake.readVersion("t", vN).select("id", "v")
    assert(reconstructed.exceptAll(to).isEmpty &&
      to.exceptAll(reconstructed).isEmpty)
  }
}
