package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query exposed through [[SparkEntry]].
  *
  * @param name   stable key used by the driver (`CORRECTNESS_r{N}.json`)
  * @param fn     Spark implementation, `(spark, sfDir) => result`
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables; None → driver records a weaker rows-only check.
  *               Column names/aliases MUST match `fn`'s output exactly.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
