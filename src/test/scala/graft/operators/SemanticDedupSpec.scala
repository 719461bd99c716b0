package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of SemDeDup-style semantic dedup
  * ([[SimilarityOps.semanticDedup]]): keep-min-id greedy semantics, exact
  * equivalence to brute force when everything shares one cluster, and the
  * ⊆-of-brute guarantee when clustering splits candidates. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("planted near-identical vectors: every higher-id twin is dropped") {
    // ids 1,2,3 are the same direction (cos=1); 10 is orthogonal
    val df = Seq(
      (1L, vec(1, 0, 0)), (2L, vec(2, 0, 0)), (3L, vec(0.5, 0, 0)),
      (10L, vec(0, 1, 0))).toDF("vec_id", "embedding")
    val got = SimilarityOps.semanticDedup(df, "vec_id", "embedding", 0.9,
        centroids = Some(Array(Seq(1.0, 0.0, 0.0))))
      .orderBy("vec_id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 0L), (2L, 1L), (3L, 1L), (10L, 0L)))
  }

  /** Brute-force keep-min-id dedup for comparison. */
  private def brute(rows: Seq[(Long, Seq[Float])], t: Double): Set[Long] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    (for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib && cos(va, vb) > t
    } yield ib).toSet
  }

  private def randomRows(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("a single cluster reproduces brute force exactly") {
    val rows = randomRows(60, 8, seed = 7)
    val expected = brute(rows, 0.5)
    val got = SimilarityOps.semanticDedup(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", 0.5,
        centroids = Some(Array(Seq.fill(8)(0.1))))
      .filter(col("is_dup") === 1).select("vec_id").as[Long].collect().toSet
    assert(got === expected)
  }

  test("with real clustering the dropped set is a subset of brute force") {
    val rows = randomRows(120, 8, seed = 11)
    val expected = brute(rows, 0.5)
    val got = SimilarityOps.semanticDedup(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", 0.5,
        nCentroids = 4)
      .filter(col("is_dup") === 1).select("vec_id").as[Long].collect().toSet
    assert(got.subsetOf(expected),
      s"cluster candidates invented a pair: ${got.diff(expected)}")
    // and it still catches the guaranteed dup: an exact copy lands in the
    // same cluster no matter how the quantizer fits
    val withCopy = rows :+ (999L, rows.head._2)
    val gotCopy = SimilarityOps.semanticDedup(
        withCopy.toDF("vec_id", "embedding"), "vec_id", "embedding", 0.99,
        nCentroids = 4)
      .filter(col("is_dup") === 1).select("vec_id").as[Long].collect().toSet
    assert(gotCopy.contains(999L))
  }

  test("semantic contamination: paraphrases flag, below-threshold neighbors never") {
    // 4-d micro-contract for the q146 operator: recall on near-identical
    // vectors AND precision on in-between ones (the banded join may
    // produce them as candidates, but the exact-cosine verify must drop
    // them below tau)
    val bench = Seq((100L, vec(1, 0, 0, 0)), (200L, vec(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, vec(0.999, 0.01, 0, 0)), // cos ~0.99995 to b100 -> flag
      (2L, vec(0, 2.0, 0.001, 0)),  // scaled near-copy of b200 -> flag
      (3L, vec(0.7, 0.7, 0, 0)),    // cos ~0.707 to both -> never
      (4L, vec(0, 0, 1, 0))         // orthogonal -> never
    ).toDF("vec_id", "embedding")
    val flagged = SimilarityOps.semanticContamination(corpus, bench,
      "vec_id", "embedding", threshold = 0.99, dim = 4)
    assert(flagged.select("vec_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    assert(flagged.filter(col("max_benchmark_sim") > 0.99).count() === 2L,
      "reported sims are the true cosines, above the threshold")
  }

  test("int8 quantization audit: full coverage, bounded error, code range") {
    val sf = SparkTestSession.sf
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    val rows = SimilarityOps.q122EmbedQuantize.fn(spark, sf).collect()
    assert(rows.length === 64, "one audit row per dimension")
    rows.foreach { r =>
      val (dim, mn, mx) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      val (nVals, nCodes) = (r.getLong(3), r.getLong(4))
      val maxErr1e6 = r.getLong(6)
      assert(nVals === nVecs, s"dim $dim must audit every vector")
      assert(nCodes >= 2 && nCodes <= 255, s"dim $dim code-space usage")
      assert(mn < mx, s"dim $dim degenerate range")
      // worst reconstruction error is half a quantization step:
      // (mx-mn)/254/2, +1 µunit of floor-rounding slack
      val bound = (mx - mn) / 254.0 / 2.0 * 1e6 + 1
      assert(maxErr1e6 <= bound,
        s"dim $dim error $maxErr1e6 exceeds the half-step bound $bound")
    }
  }

  test("embedding outlier audit: total coverage, argmin is the reported min") {
    val sf = SparkTestSession.sf
    val emb = graft.Tables.embeddings(spark, sf)
    val rows = SimilarityOps.q125EmbedOutliers.fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).distinct.length === rows.length,
      "one audit row per label")
    assert(rows.map(_.getLong(1)).sum === emb.count(),
      "every vector audited exactly once")
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2),
        s"label ${r.getInt(0)}: min cohesion cannot exceed the mean")
      val worst = r.getLong(4)
      val worstLabel = emb.filter(col("vec_id") === worst)
        .select("label").head().getInt(0)
      assert(worstLabel === r.getInt(0),
        "the reported outlier must belong to the audited label")
    }
  }
}
