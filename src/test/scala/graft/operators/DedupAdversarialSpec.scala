package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial cases for the two approximate near-dup pipelines: exact
  * expected pair sets at the decision boundary, and unicode token
  * handling. The rows-only driver gate cannot hash-check these operators,
  * so these specs pin the semantics instead. */
class DedupAdversarialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("minhash-LSH: exact pair set at the Jaccard threshold boundary") {
    // 11-token docs -> 9 word 3-shingles. A and B share the 8-token prefix:
    // exactly 6 common shingles -> J = 6/(9+9-6) = 0.5, precisely ON the
    // threshold (>= keeps it). C shares only a 7-token prefix with A/B:
    // 5 common shingles -> J = 5/13 < 0.5, must be excluded. D == A -> J=1.
    val p8 = (1 to 8).map(i => s"p$i").mkString(" ")
    val p7 = (1 to 7).map(i => s"p$i").mkString(" ")
    val docA = s"$p8 a9 a10 a11"
    val docB = s"$p8 b9 b10 b11"
    val docC = s"$p7 c8 c9 c10 c11"
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docA))
      .toDF("doc_id", "text")
    val got = DedupOps.minHashNearDups(docs, "doc_id", "text", 0.5)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 0.5), (2L, 4L, 0.5), (1L, 4L, 1.0)),
      "boundary pair (J=0.5) kept, below-boundary (5/13) excluded, identical found")
  }

  test("minhash-LSH: sub-threshold candidates are killed by exact verification") {
    // many docs sharing a few shingles (likely LSH candidates at low J) —
    // verification must produce NO pairs at threshold 0.9
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = (0 until 6).map { i =>
      (i.toLong, base.replace("w12", s"x$i y$i z$i"))
    }.toDF("doc_id", "text")
    val got = DedupOps.minHashNearDups(docs, "doc_id", "text", 0.9).count()
    assert(got === 0L)
  }

  test("minhash-LSH: unicode tokens (CJK, diacritics, emoji) behave exactly") {
    val d1 = "café naïve 東京 größe ñandú 北京 résumé königsberg данные 処理 高速 動作"
    val d3 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq((1L, d1), (2L, d1), (3L, d3)).toDF("doc_id", "text")
    val got = DedupOps.minHashNearDups(docs, "doc_id", "text", 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)), "identical unicode docs pair at J=1, nothing else")
  }

  test("minhash-LSH hub-bucket guard: an oversized bucket emits O(n) " +
      "chain pairs, keeps full recall for true dups, exact below the cap") {
    // 300 IDENTICAL docs: every band hashes them into ONE bucket. The
    // uncapped plan would emit 300*299/2 = 44,850 pairs per band; the
    // guard (cap 64 here) chains oversized buckets — O(n) pairs — while
    // the verify (jaccard 1.0 between identical docs) and downstream
    // transitive closure keep every member attached to the cluster.
    val hubText = (1 to 12).map(i => s"h$i").mkString(" ")
    val hub = (0 until 300).map(i => (i.toLong, hubText))
    // plus one small genuine near-dup pair away from the hub
    val p8 = (1 to 8).map(i => s"q$i").mkString(" ")
    val docs = (hub ++ Seq((1000L, s"$p8 a9 a10 a11"),
      (1001L, s"$p8 b9 b10 b11"))).toDF("doc_id", "text")
    val sigs = DedupOps.minHashSignatures(docs, "doc_id", "text")
    val capped = DedupOps.lshCandidatePairs(sigs, "doc_id",
      maxBucketSize = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.length < 2000,
      s"hub candidates must be O(n), got ${capped.length}")
    // chain coverage: EVERY hub member appears in some candidate pair
    val touched = capped.flatMap(p => Seq(p._1, p._2)).toSet
    assert((0L until 300L).forall(touched.contains),
      "every hub member must stay reachable for the transitive closure")
    // the small genuine pair is untouched by the cap (its bucket is tiny)
    assert(capped.contains((1000L, 1001L)))
    // full pipeline: verified pairs connect the whole hub component
    val verified = DedupOps.minHashNearDups(docs, "doc_id", "text", 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    verified.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((0L until 300L).map(find).toSet.size === 1,
      "all 300 identical docs resolve to ONE cluster through the chains")
    // below the cap the plan is EXACTLY the uncapped one
    val smallSigs = DedupOps.minHashSignatures(
      docs.filter(col("doc_id") >= 1000L), "doc_id", "text")
    val a = DedupOps.lshCandidatePairs(smallSigs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = DedupOps.lshCandidatePairs(smallSigs, "doc_id",
      maxBucketSize = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("simhash banding: exact pair set around the hamming threshold") {
    val base = 0x0123456789ABCDEFL
    val fps = Map(
      1L -> base,
      2L -> (base ^ 1L),                                      // 1 flip
      3L -> (base ^ ((1L << 0) | (1L << 17) | (1L << 34))),   // 3 flips, 3 chunks
      4L -> (base ^ ((1L << 0) | (1L << 17) | (1L << 34) | (1L << 51))), // 4 flips, all chunks
      5L -> (base ^ 0x7L))                                    // 3 flips, one chunk
    val df = fps.toSeq.map { case (id, f) => (id, f) }.toDF("doc_id", "simhash")
    val got = DedupOps.simHashNearDups(df, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth computed locally: every pair at hamming <= 3 MUST be
    // found (pigeonhole: <=3 flips across 4 chunks always leaves a shared
    // chunk), everything above excluded
    val expected = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)).toLong
      if h <= 3
    } yield (a, b, h)).toSet
    assert(expected.nonEmpty && expected.exists(_._3 == 3L))
    assert(fps.exists { case (id, f) =>
      id == 4L && java.lang.Long.bitCount(f ^ base) == 4 })
    assert(got === expected)
  }

  test("simhash end-to-end on unicode text: identical docs at distance 0") {
    val d = "データ 処理 エンジン cafés наïve 😀 große テスト"
    val docs = Seq((1L, d), (2L, d), (3L, "completely different words here"))
      .toDF("doc_id", "text")
    val fps = DedupOps.simHash(docs, "doc_id", "text")
    val got = DedupOps.simHashNearDups(fps, "doc_id", maxHamming = 0)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("property: jaccard/containment lattice over random set pairs") {
    // 200 deterministic random distinct-token set pairs, checked in ONE job:
    //   0 <= J <= min(C(a->b), C(b->a)) <= 1, and J = 1 iff both C = 1
    // (J <= C since the union can only be at least as large as either side)
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"t$i")
    def randSet() = rnd.shuffle(vocab).take(1 + rnd.nextInt(12)).toArray
    val pairs = (0 until 200).map(_ => (randSet(), randSet()))
      .toDF("sa", "sb")
    val rows = pairs.select(
      DedupOps.jaccard(col("sa"), col("sb")).as("j"),
      DedupOps.containment(col("sa"), col("sb")).as("cab"),
      DedupOps.containment(col("sb"), col("sa")).as("cba")).collect()
    rows.foreach { r =>
      val (j, cab, cba) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(j >= 0.0 && j <= 1.0 && cab >= 0.0 && cab <= 1.0)
      assert(j <= math.min(cab, cba) + 1e-12,
        s"jaccard $j must not exceed either containment ($cab, $cba)")
      assert((j == 1.0) === (cab == 1.0 && cba == 1.0),
        s"J=1 must coincide with mutual full containment: $j $cab $cba")
    }
  }

  test("property: rrfFuse is invariant to the order its lists are given in") {
    val l1 = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val l2 = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val l3 = Seq((3L, 1), (1L, 3)).toDF("doc_id", "rank")
    def fused(ls: Seq[org.apache.spark.sql.DataFrame]) =
      SimilarityOps.rrfFuse(ls, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = fused(Seq(l1, l2, l3))
    val b = fused(Seq(l3, l1, l2))
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12,
      s"score for $k differs across list orderings") }
  }

  test("canonical selection: one canonical per cluster, max n_chars wins") {
    val rows = DedupOps.q120CanonicalSelect
      .fn(spark, graft.SparkTestSession.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "the corpus must yield at least one cluster")
    val byCluster = rows.groupBy(_._2)
    val chars = graft.Tables.documents(spark, graft.SparkTestSession.sf)
      .select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (cid, members) =>
      assert(members.length >= 2, s"cluster $cid: singletons never cluster")
      val canonicals = members.filter(_._4 == 1L)
      assert(canonicals.length === 1, s"cluster $cid: exactly one canonical")
      val can = canonicals.head
      assert(members.forall(_._3 == can._1),
        s"cluster $cid: every member must point at the canonical")
      val best = members.map(m => (chars(m._1), -m._1)).max
      assert((chars(can._1), -can._1) === best,
        s"cluster $cid: canonical must maximize (n_chars, -doc_id)")
    }
  }
}
