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

  test("property: equals the window formulation over random types/groups/k") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(1, 60)
      groups <- Gen.choose(1, 4)
      k <- Gen.choose(1, 6)
      tpe <- Gen.oneOf("int", "bigint", "float", "double", "smallint",
        "decimal(12,2)")
      vals <- Gen.listOfN(n, Gen.choose(-1000, 1000))
    } yield (groups, k, tpe, vals)
    val params = Gen.Parameters.default
    (1 to 10).foreach { i =>
      val (groups, k, tpe, vals) =
        caseGen.pureApply(params, Seed(4242L + i), retries = 100)
      val df = vals.zipWithIndex
        .map { case (v, j) => (s"g${j % groups}", v) }
        .toDF("g", "raw")
        .withColumn("x", col("raw").cast(tpe))
      val got = df.groupBy("g")
        .agg(TopKAggregate.topKDistinct(col("x"), k).as("tk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
      // the formulation the oracle would use: distinct values, ranked per
      // group by a window, top k — the thing the bounded buffer replaces
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("xd").desc)
      val expected = df.select(col("g"), col("x").cast("double").as("xd"))
        .distinct()
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .collect().map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).view
        .mapValues(_.map(_._2).sorted.reverse.toList).toMap
      assert(got === expected, s"case $i: type=$tpe groups=$groups k=$k")
    }
  }

  test("non-numeric input is an analysis error, not a runtime MatchError") {
    val df = Seq(("a", "zzz")).toDF("g", "x")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(TopKAggregate.topKDistinct(col("x"), 2).as("tk")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("numeric")
      || err.getMessage.contains("DATATYPE_MISMATCH"), err.getMessage)
  }

  test("k must be a positive literal integer, with a clear error") {
    TopKAggregate.register(spark)
    Seq(("a", 1.0)).toDF("g", "x").createOrReplaceTempView("tk_kcheck")
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT graft_topk_distinct(x, CAST(x AS INT)) FROM tk_kcheck GROUP BY g")
        .collect()
    }
    assert(nonLiteral.getMessage.contains("literal"), nonLiteral.getMessage)
    val nonPositive = intercept[Exception] {
      spark.sql("SELECT graft_topk_distinct(x, 0) FROM tk_kcheck GROUP BY g")
        .collect()
    }
    assert(nonPositive.getMessage.contains("positive"), nonPositive.getMessage)
  }
}
