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

  test("unigram cross-entropy matches the hand-computed model") {
    // counts: a=2 b=2 c=1, total=5
    // doc 1 "a a b": xent = (2·ln(5/2) + ln(5/2)) / 3 = ln(2.5)
    // doc 2 "b c":   xent = (ln(2.5) + ln(5)) / 2
    val corpus = df(1L -> "a a b", 2L -> "b c")
    val got = QualityOps.unigramCrossEntropy(corpus, "text", Seq("doc_id"))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "xent").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((1L, 3L), (2L, 2L)))
    assert(math.abs(got(0)._3 - math.log(2.5)) < 1e-12)
    assert(math.abs(got(1)._3 - (math.log(2.5) + math.log(5.0)) / 2) < 1e-12)
  }

  test("unigram scoring joins the model by broadcast (corpus never shuffles on token)") {
    val corpus = df(1L -> "a a b", 2L -> "b c")
    val plan = QualityOps.unigramCrossEntropy(corpus, "text", Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$plan")
  }

  test("cross-doc duplicate gram rate counts distinct grams shared with OTHER docs") {
    val corpus = df(
      1L -> "x y z w",   // grams: "x y z", "y z w"
      2L -> "x y z q",   // grams: "x y z", "y z q"
      3L -> "p q r",     // gram:  "p q r"
      4L -> "too short") // < 3 tokens: no rows
    val got = QualityOps.crossDocDupGramRate(corpus, "text", "doc_id", k = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_shared", "dup_frac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
  }

  test("a gram repeated only WITHIN one doc is not cross-doc duplication") {
    // "a b c" occurs twice in doc 1 (shingles are distinct per doc) and
    // nowhere else — nd stays 1, nothing is shared
    val corpus = df(1L -> "a b c a b c", 2L -> "u v w")
    val got = QualityOps.crossDocDupGramRate(corpus, "text", "doc_id", k = 3)
      .orderBy("doc_id").select("doc_id", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 0L), (2L, 0L)))
  }

  test("quality funnel: first-fail attribution, one rule charged per doc") {
    val corpus = df(
      1L -> "xx yy",                                    // 2 tokens: word_count
      // 0 stopwords AND huge words — must be charged to mean_word_len,
      // the EARLIER rule, never stopword_ratio
      2L -> "elephants mastodons wonderful incredible",
      3L -> "the cat sat on mat",                       // passes everything
      4L -> "cat dog bird fish wolf",                   // stopword_ratio
      5L -> "the the the the cat")                      // dup 0.6: dup_token_frac
    val got = QualityOps.qualityFunnel(corpus, "text",
        minTokens = 3, maxTokens = 10,
        minMeanWordLen = 2.0, maxMeanWordLen = 6.0,
        minStopwordRatio = 0.1, maxDupTokenFrac = 0.5)
      .orderBy("doc_id").select("doc_id", "fail_rule").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq === Seq(
      (1L, Some("word_count")),
      (2L, Some("mean_word_len")),
      (3L, None),
      (4L, Some("stopword_ratio")),
      (5L, Some("dup_token_frac"))))
  }

  test("quality funnel: per-rule counts + passes are additive to the corpus size") {
    val corpus = (1L to 200L).map(i =>
      (i, (1 to (i % 17).toInt + 1).map(j => s"w${(i + j) % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val funneled = QualityOps.qualityFunnel(corpus, "text").cache()
    try {
      val total = funneled.count()
      val byRule = funneled.groupBy("fail_rule").count().collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      assert(byRule.values.sum === total,
        "every doc must land in exactly one funnel bucket")
      assert(total === 200L)
    } finally funneled.unpersist()
  }

  test("bigram cross-entropy matches a hand-computed interpolated model") {
    // corpus = one doc "a b a": unigrams a:2 b:1 (N=3); bigrams "a b","b a"
    // c1(a)=1, c1(b)=1 -> p(b|a)=0.75*1/1+0.25*(1/3); p(a|b)=0.75+0.25*(2/3)
    val got = QualityOps.bigramCrossEntropy(
        df(1L -> "a b a"), "text", Seq("doc_id"))
      .select("n_bigrams", "xent2").head()
    val expected = -(math.log(0.75 + 0.25 / 3.0) + math.log(0.75 + 0.5 / 3.0)) / 2.0
    assert(got.getLong(0) === 2L)
    assert(math.abs(got.getDouble(1) - expected) < 1e-12,
      s"got ${got.getDouble(1)}, expected $expected")
  }

  test("bigram cross-entropy: single-token docs are excluded, not zero") {
    val got = QualityOps.bigramCrossEntropy(
        df(1L -> "solo", 2L -> "x y"), "text", Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L))
  }

  private def sdf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, "s", t) }.toDF("doc_id", "source", "text")

  test("spanExcise removes exactly the covered positions, in order") {
    // doc 10 contains the bench 3-gram "a b c" at positions 2-4
    val got = QualityOps.spanExcise(
        sdf(10L -> "x a b c y z", 11L -> "p q r s"),
        sdf(99L -> "a b c"), k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(10L) === ((6L, 3L, "x y z")), "positions 2-4 excised, order kept")
    assert(got(11L) === ((4L, 4L, "p q r s")), "untouched doc passes through")
  }

  test("spanExcise overlapping matches excise the union, not double") {
    // bench grams "a b c" and "b c d" overlap at positions 2-4/3-5:
    // union covers 2..5, leaving "x y"
    val got = QualityOps.spanExcise(
        sdf(1L -> "x a b c d y"),
        sdf(98L -> "a b c", 99L -> "b c d"), k = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq((6L, 2L, "x y")))
  }

  test("spanExcise fully-covered doc yields zero kept and null text") {
    val got = QualityOps.spanExcise(
        sdf(1L -> "a b c"), sdf(99L -> "a b c"), k = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.isNullAt(4)))
    assert(got.toSeq === Seq((3L, 0L, true)))
  }

  test("spanExcise properties: equals the brute-force model (random cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny alphabet forces k-gram collisions so excision actually fires;
    // deterministic sample-based driver, same idiom as the chunking
    // property test above
    val alphabet = Vector("a", "b", "c", "d")
    val caseGen = for {
      k <- Gen.choose(1, 4)
      corpusLens <- Gen.listOfN(6, Gen.choose(0, 15))
      benchLens <- Gen.listOfN(2, Gen.choose(1, 8))
      seedToks <- Gen.listOfN(60, Gen.choose(0, alphabet.size - 1))
    } yield (k, corpusLens, benchLens, seedToks.map(alphabet))
    (1 to 8).foreach { i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (k, corpusLens, benchLens, pool) =>
          def mkDocs(lens: List[Int], off: Int) = lens.zipWithIndex.map {
            case (n, d) => ((d + off).toLong,
              (0 until n).map(t => pool((d * 7 + t * 3) % pool.size)).mkString(" "))
          }
          val corpus = mkDocs(corpusLens, 0)
          val bench = mkDocs(benchLens, 100)
          // brute-force model
          val benchGrams = bench.flatMap(_._2.split(" ").filter(_.nonEmpty)
            .sliding(k).filter(_.size == k).map(_.mkString(" "))).toSet
          val expect = corpus.map { case (id, text) =>
            val toks = text.split(" ").filter(_.nonEmpty).toVector
            val covered = (0 to toks.size - k).flatMap { i0 =>
              if (benchGrams.contains(toks.slice(i0, i0 + k).mkString(" ")))
                i0 until i0 + k else Nil
            }.toSet
            val kept = toks.zipWithIndex.collect {
              case (t, p) if !covered(p) => t }
            id -> ((toks.size.toLong, kept.size.toLong,
              if (kept.isEmpty) null else kept.mkString(" ")))
          }.toMap
          val got = QualityOps.spanExcise(
              corpus.map { case (id, t) => (id, "s", t) }
                .toDF("doc_id", "source", "text"),
              bench.map { case (id, t) => (id, t) }.toDF("doc_id", "text"),
              k)
            .collect().map(r => r.getLong(0) ->
              ((r.getLong(2), r.getLong(3),
                if (r.isNullAt(4)) null else r.getString(4)))).toMap
          val clue = s"case $i k=$k"
          assert(got.keySet === expect.keySet, clue)
          expect.foreach { case (id, (n, kept, text)) =>
            assert(got(id) === ((n, kept, text)), s"$clue doc $id")
          }
      }
    }
  }

  test("epoch plan: integer-exact invariants hold on the real corpus") {
    val rows = graft.operators.CurationOps.q123EpochPlan
      .fn(spark, graft.SparkTestSession.sf)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val totToks = rows.map(_._1).sum
    rows.foreach { case (nToks, planned, granted, spilled, epochs1e3) =>
      assert(granted === math.min(planned, 2 * nToks), "cap law")
      assert(spilled === planned - granted, "spill accounting")
      assert(epochs1e3 === granted * 1000 / nToks, "epoch arithmetic")
      assert(epochs1e3 <= 2000, "cap bounds epochs at 2.0")
    }
    // Σ floor(T·w_s) loses at most 1 token per source vs the exact budget
    val plannedSum = rows.map(_._2).sum
    assert(plannedSum <= 2 * totToks && plannedSum > 2 * totToks - rows.length,
      s"budget conservation: $plannedSum vs ${2 * totToks}")
    assert(rows.exists(_._4 > 0), "the 2-epoch cap must bind somewhere")
    assert(rows.exists(_._4 == 0), "and not everywhere")
  }
}
