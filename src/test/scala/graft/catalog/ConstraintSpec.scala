package graft.catalog

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHECK-constraint contract: ADD CONSTRAINT validates existing rows,
  * every write path (append, upsert, MoR update, SQL DML) enforces the
  * check inside its own write job, a violating batch aborts before any
  * commit (atomic), NULL checks pass (SQL semantics), and constraints
  * guard rename/drop of the columns they reference. */
class ConstraintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLake(): GraftLake = {
    GraftLake.invalidateCaches()
    new GraftLake(spark, Files.createTempDirectory("graft-chk").toString)
  }

  private def violates[T](f: => T): Unit = {
    val e = intercept[Exception](f)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("CHECK constraint")),
      s"expected a CHECK violation, got: ${e.getMessage}")
  }

  test("add validates existing rows; violating append aborts atomically") {
    val lake = newLake()
    lake.append("t", Seq((1, 10.0), (2, -5.0)).toDF("id", "price"))
    intercept[IllegalArgumentException](
      lake.addConstraint("t", "pos_price", "price >= 0"))
    lake.deleteWhere("t", col("price") < 0)
    lake.addConstraint("t", "pos_price", "price >= 0")
    val versions0 = lake.versions("t").size
    violates(lake.append("t", Seq((3, 3.0), (4, -1.0)).toDF("id", "price")))
    // atomic: nothing landed, no commit
    assert(lake.read("t").count() === 1L)
    assert(lake.versions("t").size === versions0)
    lake.append("t", Seq((5, 5.0)).toDF("id", "price"))
    assert(lake.read("t").count() === 2L)
  }

  test("NULL checks pass (SQL semantics); NOT NULL is expressible") {
    val lake = newLake()
    lake.append("t", Seq((1, Some(10.0))).toDF("id", "price"))
    lake.addConstraint("t", "pos_price", "price >= 0")
    // null price: CHECK(price >= 0) is NULL -> passes
    lake.append("t", Seq((2, Option.empty[Double])).toDF("id", "price"))
    assert(lake.read("t").count() === 2L)
    intercept[IllegalArgumentException](
      lake.addConstraint("t", "nn_price", "price IS NOT NULL"))
    lake.deleteWhere("t", col("price").isNull)
    lake.addConstraint("t", "nn_price", "price IS NOT NULL")
    violates(lake.append("t",
      Seq((3, Option.empty[Double])).toDF("id", "price")))
  }

  test("upsert and MoR update enforce; drop constraint lifts it") {
    val lake = newLake()
    lake.write("t", Seq((1, 10.0), (2, 20.0)).toDF("id", "price"),
      pks = Seq("id"))
    lake.addConstraint("t", "pos_price", "price >= 0")
    violates(lake.write("t", Seq((2, -1.0)).toDF("id", "price"),
      pks = Seq("id")))
    assert(lake.read("t").filter(col("id") === 2).select("price")
      .head().getDouble(0) === 20.0)
    violates(lake.updateWhere("t", col("id") === 1,
      Map("price" -> lit(-9.0))))
    assert(lake.read("t").filter(col("price") < 0).isEmpty)
    lake.dropConstraint("t", "pos_price")
    lake.write("t", Seq((2, -1.0)).toDF("id", "price"), pks = Seq("id"))
    assert(lake.read("t").filter(col("price") < 0).count() === 1L)
  }

  test("SQL surface: ADD/DROP CONSTRAINT, INSERT and UPDATE enforcement") {
    GraftLake.invalidateCaches()
    val cat = "chkcat1"
    val wh = Files.createTempDirectory("graft-chkcat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val lake = new GraftLake(spark, wh)
    lake.append("t", Seq((1, 10.0)).toDF("id", "price"))
    spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT pos_price CHECK (price >= 0)")
    assert(lake.constraints("t") === Seq("pos_price" -> "price >= 0"))
    violates(spark.sql(s"INSERT INTO $cat.t (id, price) VALUES (2, -3.0)"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 1L)
    violates(spark.sql(s"UPDATE $cat.t SET price = -1.0 WHERE id = 1"))
    assert(spark.sql(s"SELECT price FROM $cat.t WHERE id = 1")
      .head().getDouble(0) === 10.0)
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT pos_price")
    spark.sql(s"INSERT INTO $cat.t (id, price) VALUES (2, -3.0)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 2L)
  }

  test("constraintReport measures candidates without blocking; defaults to registered") {
    val lake = newLake()
    lake.append("t", Seq((1, 10.0), (2, -5.0), (3, 7.0)).toDF("id", "price"))
    // candidate checks: NULL-passing SQL semantics, counts not rejection
    val rep = lake.constraintReport("t", Seq(
        "pos" -> "price >= 0", "small_id" -> "id < 3"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rep.toSeq === Seq(("pos", 3L, 1L), ("small_id", 3L, 1L)))
    // the default set is the table's registered constraints
    lake.deleteWhere("t", col("price") < 0)
    lake.addConstraint("t", "pos", "price >= 0")
    val reg = lake.constraintReport("t").head()
    assert(reg.getString(0) === "pos" && reg.getLong(2) === 2L &&
      reg.getLong(3) === 0L)
    val bare = newLake()
    bare.append("x", Seq((1, 1)).toDF("id", "v"))
    intercept[IllegalArgumentException](bare.constraintReport("x"))
    // zero live rows (sum over an empty frame is NULL in SQL): the
    // report must come back (0, 0), not NPE — the "measure a candidate
    // on a just-created staging table" workflow
    lake.deleteWhere("t", lit(true))
    val empty = lake.constraintReport("t", Seq("pos" -> "price >= 0")).head()
    assert(empty.getLong(2) === 0L && empty.getLong(3) === 0L)
  }

  test("constraints guard rename and drop of referenced columns") {
    val lake = newLake()
    lake.append("t", Seq((1, 10.0, "x")).toDF("id", "price", "tag"))
    lake.addConstraint("t", "pos_price", "price >= 0")
    intercept[IllegalArgumentException](
      lake.renameColumn("t", "price", "cost"))
    intercept[IllegalArgumentException](lake.dropColumn("t", "price"))
    // un-referenced columns stay renameable, and the constraint keeps
    // enforcing through the rename of OTHER columns
    lake.renameColumn("t", "tag", "label")
    violates(lake.append("t",
      Seq((2, -1.0, "y")).toDF("id", "price", "label")))
    lake.dropConstraint("t", "pos_price")
    lake.renameColumn("t", "price", "cost")
    lake.addConstraint("t", "pos_cost", "cost >= 0")
    violates(lake.append("t", Seq((3, -2.0, "z")).toDF("id", "cost", "label")))
    // nondeterministic constraints are rejected
    intercept[IllegalArgumentException](
      lake.addConstraint("t", "bad", "rand() > 0.5"))
  }
}
