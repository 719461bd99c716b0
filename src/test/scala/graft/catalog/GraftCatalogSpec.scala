package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // catalog instances are cached per session at first use, so each test
  // gets its own catalog name bound to a fresh warehouse
  private var n = 0
  private def withCatalog[T](f: (String, String) => T): T = {
    GraftLake.invalidateCaches()
    n += 1
    val cat = s"gcat$n"
    val wh = Files.createTempDirectory("graft-cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(cat, wh)
  }

  test("SQL SELECT and JOIN against lake tables through the v2 catalog") {
    withCatalog { (cat, wh) =>
      val lake = new GraftLake(spark, wh)
      lake.write("users", Seq((1, "alice"), (2, "bob")).toDF("id", "name"),
        pks = Seq("id"))
      lake.write("orders_t", Seq((10, 1, 99.5), (11, 2, 45.0)).toDF("oid", "uid", "amt"))
      val got = spark.sql(
        s"""SELECT u.name, round(sum(o.amt), 2) AS total
          |FROM $cat.users u JOIN $cat.orders_t o ON u.id = o.uid
          |GROUP BY u.name ORDER BY u.name""".stripMargin).collect()
      assert(got.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
        Seq(("alice", 99.5), ("bob", 45.0)))
      assert(spark.sql(s"SHOW TABLES IN $cat").collect()
        .map(_.getString(1)).toSet === Set("users", "orders_t"))
    }
  }

  test("partitioned lake table readable with pruning via the catalog") {
    withCatalog { (cat, wh) =>
      val lake = new GraftLake(spark, wh)
      lake.write("p",
        Seq((1, java.sql.Timestamp.valueOf("2023-01-15 00:00:00"), "a"),
          (2, java.sql.Timestamp.valueOf("2024-06-15 00:00:00"), "b"))
          .toDF("id", "ts", "v"),
        partitions = Seq("year(ts)"), pks = Seq("id"))
      val df = spark.sql(s"SELECT id, v FROM $cat.p WHERE __p_year_ts = 2024")
      assert(df.collect().map(_.toSeq).toSet === Set(Seq(2, "b")))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PartitionFilters: [isnotnull(__p_year_ts"),
        "partition filter must prune at scan")
      // SQL INSERT routes through the engine: the row lands in the correct
      // partition directory with _inserted_at stamped
      spark.sql(s"INSERT INTO $cat.p (id, ts, v) SELECT 9, TIMESTAMP '2024-01-01', 'z'")
      val inserted = spark.sql(
        s"SELECT id, v, _inserted_at FROM $cat.p WHERE __p_year_ts = 2024 ORDER BY id")
        .collect()
      assert(inserted.map(r => (r.getInt(0), r.getString(1))).toSeq ===
        Seq((2, "b"), (9, "z")))
      assert(inserted.forall(_.getTimestamp(2) != null),
        "_inserted_at must be stamped on SQL INSERT")
      val dir2024 = new java.io.File(s"$wh/p/data/__p_year_ts=2024")
      assert(dir2024.isDirectory &&
        dir2024.listFiles().exists(_.getName.endsWith(".parquet")))
    }
  }

  test("CREATE TABLE / INSERT INTO / DROP TABLE through SQL") {
    withCatalog { (cat, wh) =>
      spark.sql(
        s"""CREATE TABLE $cat.raw (id INT, v STRING)
          |TBLPROPERTIES ('pks' = 'id')""".stripMargin)
      val lake = new GraftLake(spark, wh)
      assert(lake.tableExists("raw"))
      assert(lake.readMeta("raw").pks === Seq("id"))
      // named-column insert: _inserted_at is engine-managed (stamped by the
      // write path, reference DucklakeWriter.java:205-214), SQL writers
      // address the data columns
      spark.sql(s"INSERT INTO $cat.raw (id, v) SELECT 1, 'x'")
      assert(spark.sql(s"SELECT id, v FROM $cat.raw").collect()
        .map(_.toSeq).toSet === Set(Seq(1, "x")))
      assert(spark.sql(s"SELECT _inserted_at FROM $cat.raw").head()
        .getTimestamp(0) != null)
      // INSERT OVERWRITE replaces contents through the engine
      spark.sql(s"INSERT OVERWRITE $cat.raw (id, v) SELECT 2, 'y'")
      assert(spark.sql(s"SELECT id, v FROM $cat.raw").collect()
        .map(_.toSeq).toSet === Set(Seq(2, "y")))
      spark.sql(s"DROP TABLE $cat.raw")
      assert(!lake.tableExists("raw"))
    }
  }

  test("widened registry schema reads through the catalog") {
    withCatalog { (cat, wh) =>
      val lake = new GraftLake(spark, wh)
      lake.write("w", Seq((1, 100)).toDF("id", "n"))
      lake.write("w", Seq((2, 5000000000L)).toDF("id", "n")
        .select(org.apache.spark.sql.functions.col("id").cast("int").as("id"),
          org.apache.spark.sql.functions.col("n")))
      // old files are int32, logical schema is int64 — catalog read must widen
      val got = spark.sql(s"SELECT id, n FROM $cat.w ORDER BY id").collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      assert(got.toSeq === Seq((1, 100L), (2, 5000000000L)))
    }
  }
}
