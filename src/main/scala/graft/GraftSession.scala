package graft

import graft.catalog.GraftLake
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing query session over a graft warehouse: every lake table is
  * registered as a SQL view and the engine's native functions
  * (graft_cosine_similarity, graft_rolling_hash, graft_minhash,
  * graft_simhash, graft_shingles_k) are on the function registry — so the
  * full Spark SQL surface (the reference's "whatever the engine under the
  * lake can do", SURVEY §2.10) works directly over ingested data:
  *
  * {{{
  * val gs = GraftSession(spark, "/warehouse")
  * gs.refresh()
  * gs.sql("SELECT user_id, count(*) FROM events GROUP BY 1")
  * gs.sql("SELECT graft_cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  */
final class GraftSession(val spark: SparkSession, val lake: GraftLake) {

  registerFunctions()

  def registerFunctions(): Unit = {
    functions.VectorFunctions.register(spark)
    functions.TextExpressions.register(spark)
    functions.SketchExpressions.register(spark)
    functions.ShingleExpression.register(spark)
  }

  /** (Re-)register every lake table as a temp view. Lake table names may
    * contain '-' (valid per the topic→table rules) which SQL identifiers
    * reject, so view names map '-' to '_'; a single bad table must not
    * poison the whole session, so per-table failures are skipped. */
  def refresh(): Unit =
    lake.listTables().foreach { t =>
      try lake.read(t).createOrReplaceTempView(viewName(t))
      catch { case _: Exception => () }
    }

  /** SQL view name for a lake table. */
  def viewName(table: String): String = table.replace('-', '_')

  def table(name: String): DataFrame = lake.read(name)

  def sql(query: String): DataFrame = spark.sql(query)
}

object GraftSession {
  def apply(spark: SparkSession, warehouse: String): GraftSession = {
    val s = new GraftSession(spark, new GraftLake(spark, warehouse))
    s.refresh()
    s
  }
}
