package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lake tables queryable through plain SQL with engine functions") {
    catalog.GraftLake.invalidateCaches()
    val wh = Files.createTempDirectory("graft-session").toString
    val lake = new catalog.GraftLake(spark, wh)
    lake.write("users", Seq((1, "alice"), (2, "bob")).toDF("id", "name"),
      pks = Seq("id"))
    lake.write("scores", Seq((1, 9.5), (2, 7.0)).toDF("id", "score"))
    val gs = GraftSession(spark, wh)
    assert(gs.lake.listTables() === Seq("scores", "users"))
    val joined = gs.sql(
      """SELECT u.name, s.score FROM users u JOIN scores s ON u.id = s.id
        |ORDER BY u.id""".stripMargin).collect()
    assert(joined.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("alice", 9.5), ("bob", 7.0)))
    // native engine functions available in SQL
    val fp = gs.sql("SELECT graft_rolling_hash(name) FROM users WHERE id = 1")
      .head().getLong(0)
    assert(fp != 0L)
    val cos = gs.sql(
      "SELECT graft_cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D))")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    // refresh picks up new tables
    lake.write("extra", Seq((1, "x")).toDF("id", "v"))
    gs.refresh()
    assert(gs.sql("SELECT count(*) FROM extra").head().getLong(0) === 1L)
  }
}
