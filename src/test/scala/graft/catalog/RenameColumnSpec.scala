package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RENAME COLUMN contract: metadata-only (the physical parquet name is
  * frozen; the logical name rides as schema metadata), zero files
  * rewritten, every read/write/DML surface addresses the new name,
  * time travel presents each snapshot's own names, and data skipping
  * keeps pruning on the renamed column. */
class RenameColumnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-ren").toString)
  }

  test("rename is metadata-only: no rewrite, old and new files both read") {
    val lake = newLake()
    lake.append("t", Seq((1, 10.0), (2, 20.0)).toDF("id", "amount")
      .repartition(1))
    val files0 = lake.dataFiles("t").sorted
    lake.renameColumn("t", "amount", "price")
    assert(lake.dataFiles("t").sorted.sameElements(files0),
      "RENAME COLUMN must rewrite nothing")
    assert(lake.read("t").columns.toSeq === Seq("id", "price", "_inserted_at"))
    // a post-rename append addresses the NEW name and lands into the
    // same (frozen physical) column
    lake.append("t", Seq((3, 30.0)).toDF("id", "price").repartition(1))
    assert(lake.read("t").select("id", "price").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSet ===
      Set((1, 10.0), (2, 20.0), (3, 30.0)))
  }

  test("time travel presents each snapshot's own logical names") {
    val lake = newLake()
    lake.append("t", Seq((1, "a")).toDF("id", "v"))
    val v0 = lake.versions("t").head
    lake.renameColumn("t", "v", "label")
    val v1 = lake.versions("t").last
    assert(lake.readVersion("t", v0).columns.contains("v"))
    assert(lake.readVersion("t", v1).columns.contains("label"))
    assert(!lake.readVersion("t", v1).columns.contains("v"))
  }

  test("MoR delete/update and upsert address the new name") {
    val lake = newLake()
    lake.write("t", (1 to 20).map(i => (i, i * 1.0)).toDF("id", "amount"),
      pks = Seq("id"))
    lake.renameColumn("t", "amount", "price")
    assert(lake.deleteWhere("t", col("price") === 5.0) === 1L)
    assert(lake.updateWhere("t", col("price") === 7.0,
      Map("price" -> lit(700.0))) === 1L)
    // upsert through the PK path updates the renamed column by new name
    lake.write("t", Seq((1, 111.0)).toDF("id", "price"), pks = Seq("id"))
    val got = lake.read("t").select("id", "price").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(!got.contains(5) && got(7) === 700.0 && got(1) === 111.0)
    assert(got.size === 19)
  }

  test("data skipping keeps pruning on the renamed column") {
    val lake = newLake()
    // two well-separated files so bounds pruning can drop one
    lake.append("s", (1 to 100).map(i => (i, i.toLong)).toDF("id", "metric")
      .repartition(1))
    lake.append("s", (1001 to 1100).map(i => (i, i.toLong))
      .toDF("id", "metric").repartition(1))
    lake.renameColumn("s", "metric", "score")
    val pruned = lake.readWhere("s", col("score") > 1000L)
    assert(pruned.inputFiles.length === 1,
      s"bounds pruning must survive the rename, scanned ${pruned.inputFiles.length}")
    assert(pruned.count() === 100L)
    // row-level results identical to the unpruned read
    assert(lake.read("s").filter(col("score") > 1000L).count() === 100L)
  }

  test("SQL surface: ALTER TABLE RENAME COLUMN, SELECT, DML, time travel") {
    GraftLake.invalidateCaches()
    val cat = "rencat1"
    val wh = Files.createTempDirectory("graft-rencat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val lake = new GraftLake(spark, wh)
    lake.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val v0 = lake.versions("t").head
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
    assert(spark.sql(s"SELECT label FROM $cat.t WHERE id = 2").collect()
      .map(_.getString(0)).toSeq === Seq("b"))
    spark.sql(s"INSERT INTO $cat.t (id, label) VALUES (3, 'c')")
    assert(spark.sql(s"SELECT label FROM $cat.t ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    spark.sql(s"UPDATE $cat.t SET label = 'B' WHERE id = 2")
    spark.sql(s"DELETE FROM $cat.t WHERE label = 'a'")
    assert(spark.sql(s"SELECT id, label FROM $cat.t ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((2, "B"), (3, "c")))
    // the pre-rename snapshot still reads under its own name
    assert(spark.sql(s"SELECT v FROM $cat.t VERSION AS OF $v0 ORDER BY v")
      .collect().map(_.getString(0)).toSeq === Seq("a", "b"))
  }

  test("guards: pk/partition/engine columns, collisions, rename-back") {
    val lake = newLake()
    lake.write("t",
      Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x", 1.0))
        .toDF("id", "ts", "seg", "val"),
      partitions = Seq("year(ts)"), pks = Seq("id"))
    intercept[IllegalArgumentException](lake.renameColumn("t", "id", "id2"))
    intercept[IllegalArgumentException](lake.renameColumn("t", "ts", "ts2"))
    intercept[IllegalArgumentException](
      lake.renameColumn("t", "_inserted_at", "x2"))
    intercept[IllegalArgumentException](lake.renameColumn("t", "seg", "val"))
    intercept[IllegalArgumentException](lake.renameColumn("t", "nope", "y"))
    // rename, rename again, then back to the original physical name:
    // the mapping collapses to identity
    lake.renameColumn("t", "seg", "segment")
    lake.renameColumn("t", "segment", "bucket")
    intercept[IllegalArgumentException](
      lake.renameColumn("t", "bucket", "val")) // still collision-checked
    lake.renameColumn("t", "bucket", "seg")
    assert(GraftLake.logicalNamesOf(lake.readMeta("t").schema).isEmpty,
      "rename back to the physical original must clear the mapping")
    assert(lake.read("t").columns.contains("seg"))
    // dropColumn resolves the logical name after a fresh rename
    lake.renameColumn("t", "val", "score")
    lake.dropColumn("t", "score")
    assert(!lake.read("t").columns.exists(c => c == "val" || c == "score"))
  }

  test("SQL time travel to a renamed-era snapshot survives a rename-back") {
    GraftLake.invalidateCaches()
    val cat = "rencat2"
    val wh = Files.createTempDirectory("graft-renback").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val lake = new GraftLake(spark, wh)
    lake.append("t", Seq((1, "a"), (2, "b")).toDF("id", "amount"))
    lake.renameColumn("t", "amount", "price")
    val vRenamed = lake.versions("t").last
    lake.renameColumn("t", "price", "amount") // back: mapping collapses
    assert(GraftLake.logicalNamesOf(lake.readMeta("t").schema).isEmpty)
    // the renamed-era snapshot must still alias the physical column —
    // a current-meta check would keep the plain scan and read NULLs
    val rows = spark.sql(
        s"SELECT id, price FROM $cat.t VERSION AS OF $vRenamed ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq === Seq((1, "a"), (2, "b")))
  }

  test("evolution by a logical name widens the renamed column, never duplicates") {
    val lake = newLake()
    lake.append("t", Seq((1, 10)).toDF("id", "score"))
    lake.renameColumn("t", "score", "rating")
    // an incoming batch/DDL addressing 'rating' (with a wider type) must
    // resolve to the frozen physical 'score' field and widen it
    lake.ensureTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rating",
        org.apache.spark.sql.types.LongType))))
    val meta = lake.readMeta("t")
    assert(meta.schema.fieldNames.count(_.equalsIgnoreCase("rating")) === 0,
      "no duplicate physical column may appear")
    assert(meta.schema("score").dataType ===
      org.apache.spark.sql.types.LongType, "the physical field widens")
    assert(lake.read("t").columns.count(_ == "rating") === 1)
    assert(lake.read("t").select("rating").head().getLong(0) === 10L)
  }

  test("randomized model check: renames interleaved with append/delete/update/compact") {
    // deterministic seeds; each run replays a random op sequence against
    // an in-memory model and asserts full-content equality after every op
    for (seed <- Seq(7L, 23L, 91L)) {
      val rng = new scala.util.Random(seed)
      val lake = newLake()
      val original = Seq("c1", "c2") // frozen physical names
      var names = original // current logical names
      var model = Vector.empty[(Int, Int, Int)]
      var nextId = 0
      var renameCount = 0
      def check(): Unit = {
        val got = lake.read("t")
          .select(col("id"), col(names(0)), col(names(1))).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
        assert(got === model.toSet, s"seed=$seed names=$names")
      }
      lake.append("t", Seq((nextId, 0, 0)).toDF("id", names(0), names(1)))
      model :+= ((nextId, 0, 0)); nextId += 1
      for (step <- 1 to 20) {
        rng.nextInt(5) match {
          case 0 => // append a few rows under the CURRENT logical names
            val rows = (0 until 1 + rng.nextInt(3)).map { _ =>
              val r = (nextId, rng.nextInt(100), rng.nextInt(100))
              nextId += 1; r
            }
            lake.append("t", rows.toDF("id", names(0), names(1)))
            model ++= rows
          case 1 => // rename one data column (sometimes back to original)
            val i = rng.nextInt(2)
            val to = if (rng.nextBoolean() && names(i) != original(i))
              original(i) else { renameCount += 1; s"r${seed}_$renameCount" }
            lake.renameColumn("t", names(i), to)
            names = names.updated(i, to)
          case 2 => // MoR delete by id slice
            val m = 2 + rng.nextInt(4); val r = rng.nextInt(m)
            lake.deleteWhere("t", col("id") % m === r)
            model = model.filterNot(t => t._1 % m == r)
          case 3 => // MoR update addressing the current logical name
            val m = 2 + rng.nextInt(4); val r = rng.nextInt(m)
            val i = rng.nextInt(2)
            lake.updateWhere("t", col("id") % m === r,
              Map(names(i) -> (col(names(i)) + 1000)))
            model = model.map { t =>
              if (t._1 % m != r) t
              else if (i == 0) (t._1, t._2 + 1000, t._3)
              else (t._1, t._2, t._3 + 1000)
            }
          case 4 =>
            lake.compact("t")
        }
        check()
      }
    }
  }

  test("compact with clusterBy on the renamed name; change feed follows") {
    val lake = newLake()
    lake.append("t", (1 to 50).map(i => (i, i.toLong)).toDF("id", "metric"))
    lake.renameColumn("t", "metric", "score")
    val v0 = lake.versions("t").last
    lake.compact("t", clusterBy = Seq("score"))
    lake.append("t", Seq((51, 51L)).toDF("id", "score"))
    assert(lake.read("t").count() === 51L)
    // the feed presents the logical name and skips the compaction churn
    val feed = lake.tableChanges("t", v0, lake.versions("t").last)
    assert(feed.columns.contains("score"))
    assert(feed.select("id").collect().map(_.getInt(0)).toSeq === Seq(51))
  }
}
