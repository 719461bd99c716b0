package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the bounded-buffer top-k aggregate: distinct semantics,
  * k-bounding through partial aggregation and serialized merges, and
  * SQL-registration. */
class TopKAggregateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("top-k distinct: dedups, bounds at k, descending order") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 9.0), ("a", 1.0), ("a", 7.0),
      ("b", 2.0)).toDF("g", "x")
    val got = df.groupBy("g")
      .agg(TopKAggregate.topKDistinct(col("x"), 3).as("tk"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(got.toSeq === Seq(
      ("a", Seq(9.0, 7.0, 5.0)),
      ("b", Seq(2.0))))
  }

  test("partial buffers merge across many partitions without losing values") {
    // values scattered over 16 partitions: every partial buffer is
    // k-bounded, so the merge path (serialize/deserialize included) must
    // still surface the global top-k
    val df = (1 to 1000).map(i => ("g", ((i * librarySeed) % 997).toDouble))
      .toDF("g", "x").repartition(16)
    val got = df.groupBy("g")
      .agg(TopKAggregate.topKDistinct(col("x"), 4).as("tk"))
      .head().getSeq[Double](1)
    val expected = (1 to 1000).map(i => ((i * librarySeed) % 997).toDouble)
      .distinct.sorted.reverse.take(4)
    assert(got.toSeq === expected)
  }

  private val librarySeed = 7919

  test("nulls are ignored; all-null group yields an empty array") {
    val df = Seq(("a", Some(3.0)), ("a", None), ("b", None))
      .toDF("g", "x")
    val got = df.groupBy("g")
      .agg(TopKAggregate.topKDistinct(col("x"), 2).as("tk"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(got.toSeq === Seq(("a", Seq(3.0)), ("b", Seq.empty[Double])))
  }

  test("registered SQL function form works") {
    TopKAggregate.register(spark)
    Seq((1, 2.0)).toDF("g", "x").createOrReplaceTempView("tk_in")
    val got = spark.sql(
      "SELECT graft_topk_distinct(x, 2) FROM tk_in GROUP BY g")
      .head().getSeq[Double](0)
    assert(got.toSeq === Seq(2.0))
  }
}
