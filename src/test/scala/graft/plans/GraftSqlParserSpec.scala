package graft.plans

import java.nio.file.Files

import graft.SparkTestSession
import graft.catalog.{GraftCatalog, GraftLake}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Admin-SQL surface (parser-injected): RESTORE TABLE / VACUUM / OPTIMIZE
  * route to the engine ops; everything else parses through Spark
  * unchanged. */
class GraftSqlParserSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // one catalog name per test: the session's CatalogManager caches
  // catalog INSTANCES by name, so a reused name would keep pointing at
  // the first test's warehouse
  private def withCat[T](cat: String)(f: (GraftLake, String) => T): T = {
    GraftLake.invalidateCaches()
    val wh = Files.createTempDirectory("graft-adminsql").toString
    val lake = new GraftLake(spark, wh)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try f(lake, cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("RESTORE TABLE ... VERSION AS OF rolls back through SQL") {
    withCat("admr") { (lake, cat) =>
      lake.write("t", Seq((1, "a")).toDF("id", "v"), pks = Seq("id"))
      lake.write("t", Seq((1, "CHANGED")).toDF("id", "v"), pks = Seq("id"))
      assert(spark.sql(s"SELECT v FROM $cat.t").head().getString(0) ===
        "CHANGED")
      spark.sql(s"RESTORE TABLE $cat.t TO VERSION AS OF 0")
      assert(spark.sql(s"SELECT v FROM $cat.t").head().getString(0) === "a")
      assert(lake.history("t").collect().last.getString(2) === "restore")
      // the TO keyword is optional
      spark.sql(s"RESTORE TABLE $cat.t VERSION AS OF 1")
      assert(spark.sql(s"SELECT v FROM $cat.t").head().getString(0) ===
        "CHANGED")
    }
  }

  test("VACUUM ... KEEP n SNAPSHOTS expires old versions") {
    withCat("admv") { (lake, cat) =>
      for (i <- 1 to 5)
        lake.write("t", Seq((1, s"v$i")).toDF("id", "v"), pks = Seq("id"))
      assert(lake.versions("t").size === 5)
      spark.sql(s"VACUUM $cat.t KEEP 2 SNAPSHOTS")
      assert(lake.versions("t").size === 2)
      assert(spark.sql(s"SELECT v FROM $cat.t").head().getString(0) === "v5")
    }
  }

  test("OPTIMIZE compacts; OPTIMIZE ZORDER BY clusters") {
    withCat("admo") { (lake, cat) =>
      for (i <- 0 until 4)
        lake.append("t", Seq((i, i * 10)).toDF("id", "n").repartition(1))
      assert(lake.dataFiles("t").size === 4)
      spark.sql(s"OPTIMIZE $cat.t")
      assert(lake.dataFiles("t").size < 4, "compaction must merge files")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 4)
      spark.sql(s"OPTIMIZE $cat.t ZORDER BY (id, n)")
      assert(lake.history("t").collect().last.getString(2) === "zorder")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 4)
    }
  }

  test("OPTIMIZE ... WHERE compacts only the matched partitions") {
    withCat("admow") { (lake, cat) =>
      for (i <- 0 until 4)
        lake.write("p", Seq((i, if (i % 2 == 0) "x" else "y"))
          .toDF("id", "seg").repartition(1), partitions = Seq("seg"))
      val before = lake.dataFiles("p")
      assert(before.size === 4)
      spark.sql(s"OPTIMIZE $cat.p WHERE seg = 'x' ZORDER BY (id)")
      val after = lake.dataFiles("p")
      // x-partition merged 2 -> 1; y-partition's two files UNTOUCHED
      assert(after.size === 3, s"expected 3 files, got ${after.size}")
      assert(before.filter(_.contains("seg=y")).toSet ===
        after.filter(_.contains("seg=y")).toSet,
        "unmatched partitions must keep their exact files")
      assert(spark.sql(s"SELECT count(*) FROM $cat.p").head().getLong(0) === 4)
      // a non-matching scope is a no-op commit-wise
      val v = lake.versions("p").last
      spark.sql(s"OPTIMIZE $cat.p WHERE seg = 'zzz'")
      assert(lake.versions("p").last === v, "empty scope must not commit")
    }
  }

  test("DESCRIBE HISTORY returns the commit log as a result set") {
    withCat("admh") { (lake, cat) =>
      // the first file spans two ids so the point delete stays a MoR
      // delete (a single-row file would metadata-drop and change the
      // live-file count this test pins)
      lake.append("t", Seq((1, "a"), (3, "c")).toDF("id", "v").repartition(1))
      lake.append("t", Seq((2, "b")).toDF("id", "v"))
      lake.deleteWhere("t", col("id") === 1)
      val h = spark.sql(s"DESCRIBE HISTORY $cat.t").collect()
      assert(h.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
      assert(h.map(_.getString(2)).toSeq === Seq("append", "append", "delete"))
      assert(h.last.getLong(5) === 2L, "live files unchanged by a MoR delete")
      // the short form parses too, and projection works over the result
      assert(spark.sql(s"DESC HISTORY $cat.t").count() === 3L)
    }
  }

  test("DESCRIBE DETAIL summarizes every admin surface in one row") {
    withCat("admd") { (lake, cat) =>
      lake.write("t", Seq((1, 10.0), (2, 20.0)).toDF("id", "amount")
        .repartition(1), pks = Seq("id"))
      lake.renameColumn("t", "amount", "price")
      lake.addConstraint("t", "pos", "price >= 0")
      lake.buildBloomIndex("t", "id", expectedItemsPerFile = 100L)
      assert(lake.deleteWhere("t", col("id") === 2) === 1L)
      val d = spark.sql(s"DESC DETAIL $cat.t").head()
      assert(d.getString(0) === "t")
      assert(d.getLong(1) === 4L, "write + rename + constraint + delete")
      assert(d.getLong(3) === 1L, "one live file")
      assert(d.getLong(4) === 1L, "metadata row count minus the DV mask")
      assert(d.getLong(5) > 0L, "bytes counted")
      assert(d.getLong(6) === 3L, "id, price, _inserted_at")
      assert(d.getString(8) === "id")
      assert(d.getString(9) === "pos: CHECK (price >= 0)")
      assert(d.getString(10) === "id")
      assert(d.getLong(11) === 1L, "one live DV entry")
      assert(d.getString(12) === "amount -> price")
    }
  }

  test("DESCRIBE PARTITIONS reports per-partition files and exact rows from metadata") {
    withCat("admp") { (lake, cat) =>
      lake.write("p", (1 to 30).map(i => (i, i % 2)).toDF("id", "seg")
        .repartition(1), partitions = Seq("seg"))
      assert(lake.deleteWhere("p", col("id") <= 4) === 4L) // 2 per seg
      val rows = spark.sql(s"DESC PARTITIONS $cat.p").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.map(t => (t._1, t._2, t._3)).toSeq.sortBy(_._1) ===
        Seq(("__p_seg=0", 1L, 13L), ("__p_seg=1", 1L, 13L)))
      assert(rows.forall(_._4 > 0L), "bytes counted")
    }
  }

  test("CREATE/REFRESH BLOOM INDEX build and extend the skipping sidecar") {
    withCat("admb") { (lake, cat) =>
      def batch(r: Range) = r.map(i => (i.toLong, s"u$i"))
        .toDF("uid", "v").repartition(3)
      lake.append("t", batch(0 until 3000 by 3))
      lake.append("t", batch(1 until 3000 by 3))
      spark.sql(s"CREATE BLOOM INDEX ON $cat.t (uid) " +
        "OPTIONS (items=2000, fpp=0.01)")
      assert(lake.bloomIndexedColumns("t") === Seq("uid"))
      val all = lake.read("t").inputFiles.length
      assert(lake.readWhere("t", col("uid") === 100L).inputFiles.length < all)
      // appends after the build are covered by the SQL refresh
      lake.append("t", batch(2 until 3000 by 3))
      val r = spark.sql(s"REFRESH BLOOM INDEX ON $cat.t").collect()
      assert(r.map(_.getString(0)).toSeq === Seq("uid"))
      assert(r.head.getLong(1) === 3L, s"three new files, got ${r.toSeq}")
      assert(spark.sql(s"REFRESH BLOOM INDEX ON $cat.t")
        .head().getLong(1) === 0L)
    }
  }

  test("SHOW GRAFT METRICS surfaces the op sensors as a result set") {
    withCat("admm") { (lake, cat) =>
      lake.write("t", Seq((1, "a")).toDF("id", "v"))
      val rows = spark.sql("SHOW GRAFT METRICS").collect()
      val ops = rows.map(_.getString(0)).toSet
      assert(ops.contains(graft.metrics.GraftMetrics.CommitVersion),
        s"commit sensor missing from $ops")
      val commit = rows.find(_.getString(0) ==
        graft.metrics.GraftMetrics.CommitVersion).get
      assert(commit.getLong(1) >= 1L, "at least one commit recorded")
      assert(commit.getDouble(2) >= 0.0 && commit.getDouble(4) >= 0.0)
      // projection over the result set works (it is a real command output)
      assert(spark.sql("SHOW GRAFT METRICS").select("op", "n").count() ===
        rows.length.toLong)
    }
  }

  test("USE <graft-catalog> makes unqualified admin statements resolve through it") {
    withCat("admu") { (lake, cat) =>
      lake.write("t", Seq((1, "a")).toDF("id", "v"), pks = Seq("id"))
      lake.write("t", Seq((1, "CHANGED")).toDF("id", "v"), pks = Seq("id"))
      val prev = spark.sessionState.catalogManager.currentCatalog.name()
      spark.sql(s"USE $cat")
      try {
        // unqualified graft-only statements hit graft through the CURRENT
        // catalog — not Spark's generic ParseException for grammar it lacks
        spark.sql("RESTORE TABLE t TO VERSION AS OF 0")
        assert(spark.sql(s"SELECT v FROM $cat.t").head().getString(0) === "a")
        spark.sql("OPTIMIZE t")
        assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 1)
        assert(spark.sql("DESCRIBE HISTORY t").count() >= 2)
      } finally spark.sql(s"USE $prev")
    }
  }

  test("table_changes TVF: catalog resolution, quoting, composition, literal guards") {
    withCat("admtc") { (lake, cat) =>
      lake.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))   // v0
      lake.append("t", Seq((3, "c")).toDF("id", "v"))             // v1
      assert(lake.deleteWhere("t", col("id") === 1) === 1)        // v2 MoR
      // qualified resolution + relational composition (filter/agg over
      // the TVF result like any other relation)
      val agg = spark.sql(
        s"""SELECT _change_type, count(*) AS n
           |FROM table_changes('$cat.t', 0, 2)
           |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(agg === Seq("delete" -> 1L, "insert" -> 1L))
      // backquoted identifier spelling resolves identically
      assert(spark.sql(
        s"SELECT id FROM table_changes('`$cat`.`t`', 0, 1) ORDER BY id")
        .collect().map(_.getInt(0)).toSeq === Seq(3))
      // USE <graft-catalog> makes the single-part spelling resolve
      val prev = spark.catalog.currentCatalog()
      spark.sql(s"USE $cat")
      try assert(spark.sql("SELECT count(*) AS n FROM table_changes('t', 0, 2)")
        .head().getLong(0) === 2)
      finally spark.sql(s"USE $prev")
      // joins against the TVF work (it is a plain relation)
      val joined = spark.sql(
        s"""SELECT c._change_type, t.v
           |FROM table_changes('$cat.t', 1, 2) c JOIN $cat.t t USING (id)
           |ORDER BY t.v""".stripMargin).collect()
      assert(joined.isEmpty, "deleted id=1 no longer joins the live table")
      // guards: non-literal args and unknown versions fail loudly
      val e1 = intercept[Exception](spark.sql(
        s"SELECT * FROM table_changes('$cat.t', 0, (SELECT 2))").collect())
      assert(e1.getMessage.contains("literal") ||
        e1.getMessage.toLowerCase.contains("unsupported"),
        s"got: ${e1.getMessage}")
      val e2 = intercept[Exception](spark.sql(
        s"SELECT * FROM table_changes('$cat.t', 0, 99)").collect())
      assert(e2.getMessage.contains("no snapshot pair"),
        s"got: ${e2.getMessage}")
    }
  }

  test("table_changes TVF: timestamp/date bounds resolve to the snapshot " +
      "as of that time (versionAt semantics)") {
    withCat("admts") { (lake, cat) =>
      lake.append("t", Seq((1, "a")).toDF("id", "v"))             // v0
      Thread.sleep(1200) // commit-file mtimes must straddle `between`
      val betweenMs = System.currentTimeMillis()
      Thread.sleep(1200)
      lake.append("t", Seq((2, "b")).toDF("id", "v"))             // v1
      lake.append("t", Seq((3, "c")).toDF("id", "v"))             // v2
      val afterMs = System.currentTimeMillis() + 1000
      val zone = java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone)
      def iso(ms: Long) = java.time.Instant.ofEpochMilli(ms).toString
      def local(ms: Long) = java.time.Instant.ofEpochMilli(ms).atZone(zone)
        .toLocalDateTime.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      def ids(sql: String): Seq[Int] =
        spark.sql(sql).select("id").collect().map(_.getInt(0)).toSeq.sorted
      // ISO-instant strings both ends: between→v0, after→v2 ⇒ (v0, v2]
      assert(ids(s"SELECT id FROM table_changes('$cat.t', " +
        s"'${iso(betweenMs)}', '${iso(afterMs)}')") === Seq(2, 3))
      // TIMESTAMP literal + local 'yyyy-MM-dd HH:mm:ss.SSS' string (both
      // session-zone local), mixed with an integer version on one end
      assert(ids(s"SELECT id FROM table_changes('$cat.t', " +
        s"TIMESTAMP '${local(betweenMs)}', 2)") === Seq(2, 3))
      assert(ids(s"SELECT id FROM table_changes('$cat.t', " +
        s"'${local(betweenMs)}', 2)") === Seq(2, 3))
      // DATE literal bound: tomorrow resolves to the latest snapshot
      val tomorrow = java.time.Instant.ofEpochMilli(afterMs).atZone(zone)
        .toLocalDate.plusDays(1)
      assert(ids(s"SELECT id FROM table_changes('$cat.t', " +
        s"'${iso(betweenMs)}', DATE '$tomorrow')") === Seq(2, 3))
      // a time before the first commit fails loudly
      val e1 = intercept[Exception](spark.sql(
        s"SELECT * FROM table_changes('$cat.t', " +
          s"'${iso(betweenMs - 864000000L)}', 2)").collect())
      assert(e1.getMessage.contains("no snapshot at or before"),
        s"got: ${e1.getMessage}")
      // digit-only strings are refused as ambiguous, not guessed at
      val e2 = intercept[Exception](spark.sql(
        s"SELECT * FROM table_changes('$cat.t', '0', 2)").collect())
      assert(e2.getMessage.contains("ambiguous"), s"got: ${e2.getMessage}")
      // garbage time strings name the accepted forms
      val e3 = intercept[Exception](spark.sql(
        s"SELECT * FROM table_changes('$cat.t', 'not-a-time', 2)").collect())
      assert(e3.getMessage.contains("ISO-8601"), s"got: ${e3.getMessage}")
    }
  }

  test("unqualified / non-graft targets DELEGATE to Spark's native grammar") {
    withCat("admf") { (lake, cat) =>
      lake.write("t", Seq((1, "a")).toDF("id", "v"))
      // graft-only statement shapes against non-graft targets surface
      // Spark's NATIVE syntax error — never the old
      // "catalog ... is not a graft catalog" interception failure
      val e = intercept[Exception] {
        spark.sql("RESTORE TABLE t VERSION AS OF 0")
      }
      assert(!e.getMessage.contains("graft"), e.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("VACUUM spark_catalog.t KEEP 1 SNAPSHOTS")
      }
      assert(!e2.getMessage.contains("graft"), e2.getMessage)
      // a statement shape Spark's grammar DOES own must reach Spark's
      // analyzer when the catalog is not graft: the intercepted
      // ALTER TABLE ... ADD CONSTRAINT on a V1 session-catalog table
      // gets Spark's own behavior (its table-resolution/constraint
      // handling), not an interception IllegalArgumentException
      spark.sql("CREATE TABLE spark_catalog.default.sqlp_nongraft (id INT) USING parquet")
      try {
        // whether Spark accepts or rejects it for a V1 table, the outcome
        // must be SPARK's, never the interception IllegalArgumentException
        scala.util.Try(spark.sql(
          "ALTER TABLE spark_catalog.default.sqlp_nongraft " +
            "ADD CONSTRAINT c1 CHECK (id > 0)")) match {
          case scala.util.Failure(e3) =>
            assert(!e3.getMessage.contains("not a graft catalog"), e3.getMessage)
            assert(!e3.isInstanceOf[IllegalArgumentException], e3.getClass.getName)
          case scala.util.Success(_) => // Spark's native accept — fine
        }
      } finally {
        spark.sql("DROP TABLE IF EXISTS spark_catalog.default.sqlp_nongraft")
      }
      // the delegate still parses everything else
      assert(spark.sql("SELECT 1 + 1").head().getInt(0) === 2)
      assert(spark.sql(s"SELECT id FROM $cat.t").head().getInt(0) === 1)
    }
  }
}
