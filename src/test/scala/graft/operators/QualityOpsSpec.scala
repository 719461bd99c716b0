package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contract of the parameterized contamination sweep
  * ([[QualityOps.contaminationFlags]]): caller-supplied benchmark set,
  * k-gram width, and the lowercase/punctuation-strip normalization toggle.
  */
class QualityOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("flags exactly the docs sharing a k-gram with the benchmark set") {
    val corpus = df(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely unrelated text with no overlap at all here",
      3L -> "we saw the quick brown fox jumps over rocks today")
    val bench = df(100L -> "quick brown fox jumps over the hill")
    val got = QualityOps.contaminationFlags(corpus, bench, k = 5)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got === Array((1L, 1L), (2L, 0L), (3L, 1L)))
  }

  test("a doc is never flagged against itself (same doc_id in both sets)") {
    val corpus = df(1L -> "alpha beta gamma delta epsilon zeta")
    val got = QualityOps.contaminationFlags(corpus, corpus, k = 5)
      .as[(Long, Long)].collect()
    assert(got === Array((1L, 0L)))
  }

  test("normalize=true catches case/punctuation-disguised overlap; false does not") {
    val corpus = df(1L -> "The QUICK, brown fox... jumps over!! something")
    val bench = df(100L -> "the quick brown fox jumps over the hill")
    val strict = QualityOps.contaminationFlags(corpus, bench, k = 5)
      .as[(Long, Long)].collect()
    assert(strict === Array((1L, 0L)),
      "punctuation stuck to tokens must defeat the exact-gram match")
    val normed = QualityOps.contaminationFlags(corpus, bench, k = 5, normalize = true)
      .as[(Long, Long)].collect()
    assert(normed === Array((1L, 1L)))
  }

  test("k controls the gram width: wider k demands longer shared spans") {
    val corpus = df(1L -> "one two three four five six")
    val bench = df(100L -> "zero one two three four nine")
    // shares "one two three four" (4-gram) but no 5-gram
    val k4 = QualityOps.contaminationFlags(corpus, bench, k = 4).as[(Long, Long)].collect()
    val k5 = QualityOps.contaminationFlags(corpus, bench, k = 5).as[(Long, Long)].collect()
    assert(k4 === Array((1L, 1L)))
    assert(k5 === Array((1L, 0L)))
  }

  test("docs shorter than k never flag and never crash") {
    val corpus = df(1L -> "too short", 2L -> "")
    val bench = df(100L -> "the quick brown fox jumps over the hill")
    val got = QualityOps.contaminationFlags(corpus, bench, k = 5)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got === Array((1L, 0L), (2L, 0L)))
  }
}
