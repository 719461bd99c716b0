package graft.operators

import graft.SparkTestSession
import graft.functions.{ShingleExpression, TextExpressions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = SparkTestSession.sf

  // ---- vector functions ----

  test("cosine expression matches known values and the builtin formulation") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical -> 1
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> 0
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)))   // parallel -> 1
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosineSim(col("a"), col("b")).as("c"),
      VectorFunctions.cosineSimBuiltin(col("a"), col("b")).as("cb"))
      .collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(got(1).getDouble(0)) < 1e-12)
    assert(math.abs(got(2).getDouble(0) - 1.0) < 1e-12)
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
      "custom expression and builtin formulation must agree"))
  }

  test("cosine of a zero vector is null; null input is null") {
    VectorFunctions.register(spark)
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineSim(col("a"), col("b"))).head().isNullAt(0))
    val withNull = spark.sql(
      "SELECT graft_cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS c")
    assert(withNull.head().isNullAt(0))
  }

  test("rolling hash matches a hand-computed polynomial value") {
    TextExpressions.register(spark)
    val got = Seq("ab", "").toDF("t")
      .select(TextExpressions.rollingHash(col("t"))).as[Long].collect()
    // "ab" = 'a'*31 + 'b' = 97*31 + 98 = 3105
    assert(got(0) === 3105L)
    assert(got(1) === 0L)
  }

  // ---- text ops ----

  test("token count, stopword and punct ratios on crafted strings") {
    val df = Seq("the cat sat.", "", "   ", "one,two").toDF("text")
    val got = df.select(
      TextOps.tokenCount(col("text")).as("n"),
      TextOps.stopwordRatio(col("text")).as("sw"),
      TextOps.punctRatio(col("text")).as("p")).collect()
    assert(got(0).getLong(0) === 3)
    assert(math.abs(got(0).getDouble(1) - 1.0 / 3) < 1e-12)
    assert(math.abs(got(0).getDouble(2) - 1.0 / 12) < 1e-12)
    assert(got(1).getLong(0) === 0 && got(1).getDouble(1) === 0.0)
    assert(got(2).getLong(0) === 0)
    assert(got(3).getLong(0) === 1) // "one,two" has no whitespace
  }

  test("tokenization strips all whitespace kinds — no empty tokens") {
    // trim() strips only ASCII space; tab/newline-bounded text must not
    // leak empty tokens into counts, stopword ratios or shingles
    val df = Seq("\thello\n", "\t \n", "a\tb\nc", "\n\nthe end\t").toDF("text")
    val toks = df.select(TextOps.tokens(col("text"))).as[Seq[String]].collect()
    assert(toks(0) === Seq("hello"))
    assert(toks(1) === Nil)
    assert(toks(2) === Seq("a", "b", "c"))
    assert(toks(3) === Seq("the", "end"))
    val sw = df.select(TextOps.stopwordRatio(col("text"))).as[Double].collect()
    assert(sw(1) === 0.0 && math.abs(sw(3) - 0.5) < 1e-12)
  }

  test("langid picks the profile with most marker hits") {
    val df = Seq(
      "the cat and the dog is in that house of it",
      "el perro y la casa de los gatos en el jardin del sol",
      "der hund und die katze von dem haus mit den blumen ist").toDF("text")
    val got = df.select(TextOps.langIdPredict(col("text"))).as[String].collect()
    assert(got.toSeq === Seq("en", "es", "de"))
  }

  // ---- dedup ops ----

  test("word shingles: distinct k-grams, short docs empty") {
    val df = Seq("a b c d", "a b", "x").toDF("text")
    val got = df.select(DedupOps.wordShingles(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Nil)
    assert(got(2) === Nil)
  }

  test("top-shingle count matches a hand-computed repetition profile") {
    ShingleExpression.register(spark)
    val df = Seq(
      "a b a b a b",   // "a b" ×3 of 5 bigram slots
      "x y z w",       // all bigrams unique → 1
      "solo").toDF("text")
    val got = df.select(ShingleExpression.topShingleCount(
      TextOps.tokens(col("text")), 2)).collect()
    assert(got(0).getLong(0) === 3L)
    assert(got(1).getLong(0) === 1L)
    assert(got(2).isNullAt(0), "doc shorter than k yields null")
  }

  test("minhash-LSH finds exact duplicates with jaccard 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "totally different words here okay fine"),
      (4L, "alpha beta gamma delta epsilon eta")) // near dup of 1
      .toDF("doc_id", "text")
    val pairs = DedupOps.minHashNearDups(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((1L, 2L)).contains(1.0), s"exact dup must surface: ${pairs.toSeq}")
    assert(!asMap.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pair")
  }

  test("incremental dedup vs a persisted LSH index: copies caught, uniques admitted, index maintained") {
    val lake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-lsh-spec").toString)
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "red green blue yellow purple orange")).toDF("doc_id", "text")
    DedupOps.buildMinhashIndex(lake, "t", corpus, "doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // copy of corpus 1
      (11L, "u0x11 u1x11 u2x11 u3x11 u4x11"),       // unique
      (12L, "u0x11 u1x11 u2x11 u3x11 u4x11"))       // copy of batch-mate 11
      .toDF("doc_id", "text")
    val got = DedupOps.incrementalNearDups(lake, "t", batch,
      "doc_id", "text", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 1L, 11L -> 0L, 12L -> 1L),
      s"corpus copy and batch-mate copy flagged, unique admitted: $got")
    // admission maintains the index: a SECOND batch copying doc 11 must
    // now collide with the previously admitted doc
    val got2 = DedupOps.incrementalNearDups(lake, "t",
      Seq((20L, "u0x11 u1x11 u2x11 u3x11 u4x11")).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(20L -> 1L),
      "a copy of an ADMITTED doc must be caught by the maintained index")
  }

  test("minhash verified jaccard equals brute-force jaccard") {
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val pairs = DedupOps.minHashNearDups(docs, "doc_id", "text", threshold = 0.4)
    val shingled = docs.select(col("doc_id"),
      DedupOps.wordShingles(col("text"), 3).as("gs"))
    val brute = shingled.select(col("doc_id").as("a"), col("gs").as("ga"))
      .crossJoin(shingled.select(col("doc_id").as("b"), col("gs").as("gb")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), DedupOps.jaccard(col("ga"), col("gb")).as("j"))
      .filter(col("j") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (k, v) =>
      assert(brute.contains(k), s"LSH pair $k not in brute set")
      assert(math.abs(brute(k) - v) < 1e-12)
    }
    // high-similarity pairs should essentially all be recalled at 64 hashes
    val recalled = brute.keySet.count(lsh.contains)
    assert(brute.isEmpty || recalled.toDouble / brute.size >= 0.8,
      s"LSH recall too low: $recalled/${brute.size}")
  }

  test("simhash: identical docs distance 0; near-dups within threshold") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "completely unrelated content goes right here now then"))
      .toDF("doc_id", "text")
    val fps = DedupOps.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    val pairs = DedupOps.simHashNearDups(
      DedupOps.simHash(docs, "doc_id", "text"), "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("connected components: chains and separate cliques") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 11L)).toDF("a", "b")
    val got = DedupOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connected components: full-range 64-bit ids don't overflow the witness") {
    // xxhash64(string-id) node ids span the whole Long range; a LongType
    // label sum overflows (ANSI runtime error). Witness must be
    // decimal-safe and still converge to correct clusters.
    val big = Long.MaxValue
    val edges = Seq(
      (big, big - 1L), (big - 1L, big - 2L),          // clique near +inf
      (Long.MinValue + 1L, Long.MinValue + 2L)        // clique near -inf
    ).toDF("a", "b")
    val got = DedupOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      big -> (big - 2L), (big - 1L) -> (big - 2L), (big - 2L) -> (big - 2L),
      (Long.MinValue + 1L) -> (Long.MinValue + 1L),
      (Long.MinValue + 2L) -> (Long.MinValue + 1L)))
  }

  test("connected components: long chain converges with sparse convergence checks") {
    // a 9-node path has diameter 8 — far past the first checkEvery window;
    // sparse checking must not declare early convergence. Fast path
    // DISABLED so this keeps exercising the distributed loop.
    val chain = (1L to 8L).map(i => (i, i + 1)).toDF("a", "b")
    val got = DedupOps.connectedComponents(chain, driverFastPathMaxEdges = 0)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 9L).map(_ -> 1L).toMap)
  }

  test("connected components: driver fast path equals the distributed loop") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      pairs <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong),
        Gen.choose(0L, n.toLong)))
    } yield pairs.filter(p => p._1 != p._2)
    (1 to 6).foreach { i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { pairs =>
        if (pairs.nonEmpty) {
          val edges = pairs.toDF("a", "b")
          val fast = DedupOps.connectedComponents(edges).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val dist = DedupOps.connectedComponents(edges,
              driverFastPathMaxEdges = 0).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(fast === dist, s"case $i: $pairs")
        }
      }
    }
  }

  test("dropNearDups keeps one representative per cluster") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val kept = DedupOps.dropNearDups(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L), "cluster {1,2,3} keeps 1; singleton 4 stays")
  }

  test("hash split: total partition, deterministic, roughly 80/10/10") {
    val df = (1L to 2000L).toDF("id")
    val counts = df.select(TextOps.splitAssign(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1450 && counts("train") < 1750, s"got $counts")
    // determinism: same assignment on recompute
    val again = df.select(TextOps.splitAssign(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === counts)
    val sampled = df.filter(TextOps.deterministicSample(col("id"), 0.25)).count()
    assert(sampled > 350 && sampled < 650)
  }

  test("simhash banded pairs are a subset of brute-force hamming pairs") {
    val docs = graft.Tables.documents(spark, sf).limit(100)
    val fps = DedupOps.simHash(docs, "doc_id", "text").cache()
    val banded = DedupOps.simHashNearDups(fps, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val all = fps.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, fa) <- all; (b, fb) <- all if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b) -> h.toLong).toMap
    banded.foreach { case (k, h) =>
      assert(brute.get(k).contains(h), s"pair $k hamming mismatch")
    }
    // hamming<=3 pairs always share at least one 16-bit chunk -> full recall
    assert(banded.keySet === brute.keySet,
      s"banding must find every pair within distance 3: missing ${brute.keySet -- banded.keySet}")
    fps.unpersist()
  }

  // ---- similarity ops ----

  test("ANN (IVF and LSH) recall vs brute force") {
    VectorFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(SimilarityOps.knnBrute(emb, queries, "vec_id", "embedding", 10))
    val ivf = pairs(SimilarityOps.knnIvf(emb, queries, "vec_id", "embedding", 10))
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    assert(ivfRecall >= 0.5, s"IVF recall $ivfRecall below 0.5")
    val lsh = pairs(SimilarityOps.knnLsh(emb, queries, "vec_id", "embedding", 10))
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    // random-hyperplane LSH is data-dependent; assert it at least prunes
    // while finding a nontrivial share
    assert(lshRecall >= 0.2, s"LSH recall $lshRecall below 0.2")
  }

  test("k-means-fit IVF quantizer beats the sampled quantizer at equal nprobe") {
    VectorFunctions.register(spark)
    // 8 well-separated cluster directions in 16 dims, ids interleaved so the
    // deterministic sample init (every 20th of the first 320 ids) only ever
    // sees clusters id%8 ∈ {0, 4} — maximally skewed. Small deterministic
    // per-vector noise breaks assignment ties so Lloyd iterations can
    // specialize centroids toward the unseen clusters.
    val dims = 16
    def vec(i: Int): Array[Float] = {
      val c = i % 8
      Array.tabulate(dims)(d =>
        (if (d == 2 * c) 5.0f else 0.0f) + ((i * 31 + d * 7) % 13) / 13.0f * 0.4f)
    }
    val docs = (0 until 400).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      .cache()
    val queries = docs.filter(col("vec_id") >= 392) // one query per cluster
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(SimilarityOps.knnBrute(docs, queries, "vec_id", "embedding", 5))
    val sampled = SimilarityOps.sampleCentroids(docs, "vec_id", "embedding", 16)
    val sampleRecall = (brute & pairs(SimilarityOps.knnIvf(
      docs, queries, "vec_id", "embedding", 5,
      centroids = Some(sampled)))).size.toDouble / brute.size
    val fitted = SimilarityOps.fitCentroids(docs, "vec_id", "embedding", 16, iters = 3)
    val fitRecall = (brute & pairs(SimilarityOps.knnIvf(
      docs, queries, "vec_id", "embedding", 5,
      centroids = Some(fitted)))).size.toDouble / brute.size
    assert(fitRecall >= sampleRecall,
      s"fit recall $fitRecall below sample recall $sampleRecall")
    assert(fitRecall >= 0.5, s"fit recall $fitRecall too low")

    // subset fit: capping maxFitVectors forces the hash-sampled fit path
    // (mod = ceil(400/100) = 4 -> ~1/4 of the vectors); the coarse
    // quantizer it learns must stay within tolerance of the full fit at
    // equal nprobe — the at-scale contract that lets the fit scan stay
    // bounded on a 100 TB corpus
    val subsetFitted = SimilarityOps.fitCentroids(
      docs, "vec_id", "embedding", 16, iters = 3, maxFitVectors = 100L)
    val subsetRecall = (brute & pairs(SimilarityOps.knnIvf(
      docs, queries, "vec_id", "embedding", 5,
      centroids = Some(subsetFitted)))).size.toDouble / brute.size
    assert(subsetRecall >= fitRecall - 0.15,
      s"subset-fit recall $subsetRecall more than 0.15 below full-fit $fitRecall")
    assert(subsetRecall >= 0.5, s"subset-fit recall $subsetRecall too low")
    docs.unpersist()
  }

  // ---- multimodal ----

  test("PNG/WAV header parsers: exact metadata, junk falls back to the stub") {
    // PNG RGBA 640x480 -> 4 channels, 1 frame
    val png = MultimodalOps.synthPng(640, 480, colorType = 6)
    val pm = MultimodalOps.decodeHeader(1L, png)
    assert((pm.width, pm.height, pm.channels, pm.n_frames) === ((640, 480, 4, 1L)))
    // PNG grayscale -> 1 channel
    assert(MultimodalOps.decodeHeader(2L, MultimodalOps.synthPng(10, 7, 0)).channels === 1)
    // WAV stereo 44100 Hz 16-bit, 250 sample frames
    val wav = MultimodalOps.synthWav(2, 44100, 16, 250)
    val wm = MultimodalOps.decodeHeader(3L, wav)
    assert((wm.width, wm.height, wm.channels, wm.n_frames) === ((44100, 16, 2, 250L)))
    // junk payload -> deterministic fallback (size-derived)
    val junk = "not a container".getBytes("UTF-8")
    assert(MultimodalOps.decodeHeader(4L, junk) === MultimodalOps.fakeDecode(4L, junk))
    // truncated PNG signature -> fallback, not crash
    val trunc = MultimodalOps.synthPng(5, 5, 2).take(10)
    assert(MultimodalOps.decodeHeader(5L, trunc) === MultimodalOps.fakeDecode(5L, trunc))
    // corrupt RIFF chunk size near Int.MaxValue -> fallback, not overflow
    val corrupt = "RIFF    WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++ Array(0xf0, 0xff, 0xff, 0x7f).map(_.toByte) ++
      new Array[Byte](16)
    assert(MultimodalOps.decodeHeader(6L, corrupt) === MultimodalOps.fakeDecode(6L, corrupt))
    // data chunk BEFORE fmt chunk (legal RIFF order): frames still divide
    // by the final block align
    val w = MultimodalOps.synthWav(2, 8000, 16, 100)
    val fmtChunk = w.slice(12, 12 + 24)     // "fmt " + 16-byte PCM body
    val dataChunk = w.drop(12 + 24)         // "data" + payload
    val reordered = w.take(12) ++ dataChunk ++ fmtChunk
    val rm = MultimodalOps.decodeHeader(7L, reordered)
    assert((rm.channels, rm.width, rm.n_frames) === ((2, 8000, 100L)))
  }

  test("multimodal decode batch + frame sampling plumbing") {
    val docs = Seq((1L, "x" * 600), (2L, "y")).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val meta = MultimodalOps.decodeBatch(docs, spark).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes === 600)
    assert(meta(1L).n_frames === 3) // ceil(600/256)
    assert(meta(2L).n_frames === 1)
    assert(meta(1L).width === (64 + 600 % 577))
    val frames = MultimodalOps.sampleFrames(docs, frameSize = 256, stride = 1)
    assert(frames.filter(col("doc_id") === 1L).count() === 3)
  }

  test("saved quantizer round-trips through the lake and reproduces results") {
    VectorFunctions.register(spark)
    val lake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-index").toString)
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val fitted = SimilarityOps.fitCentroids(emb, "vec_id", "embedding", 16)
    SimilarityOps.saveCentroids(lake, "ivf_idx", fitted)
    val loaded = SimilarityOps.loadCentroids(lake, "ivf_idx")
    assert(loaded.length === fitted.length)
    fitted.zip(loaded).foreach { case (a, b) => assert(a === b) }
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = pairs(SimilarityOps.knnIvf(emb, queries, "vec_id", "embedding",
      10, centroids = Some(fitted)))
    val viaLake = pairs(SimilarityOps.knnIvf(emb, queries, "vec_id", "embedding",
      10, centroids = Some(loaded)))
    assert(direct === viaLake, "a persisted index must answer identically")
  }

  test("saved PQ codebooks round-trip through the lake; saved-vs-refit answers identical") {
    VectorFunctions.register(spark)
    val lake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-pq-index").toString)
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val coarse = SimilarityOps.fitCentroids(emb, "vec_id", "embedding", 16)
    val books = SimilarityOps.fitPq(emb, "vec_id", "embedding",
      m = 8, ksub = 16, dim = 64)
    SimilarityOps.savePqCodebooks(lake, "pq_idx", books)
    val loaded = SimilarityOps.loadPqCodebooks(lake, "pq_idx")
    assert(loaded.length === books.length)
    books.zip(loaded).foreach { case (a, b) =>
      assert(a.length === b.length)
      a.zip(b).foreach { case (x, y) => assert(x === y) }
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val refit = rows(SimilarityOps.knnIvfPq(emb, queries, "vec_id", "embedding",
      10, coarseCentroids = Some(coarse), codebooks = Some(books)))
    val persisted = rows(SimilarityOps.knnIvfPq(emb, queries, "vec_id", "embedding",
      10, coarseCentroids = Some(coarse), codebooks = Some(loaded)))
    assert(refit === persisted,
      "a persisted PQ index must answer identically to the in-memory fit")
    // the inline-fit path (no persisted params) is the same computation
    val inline = rows(SimilarityOps.knnIvfPq(emb, queries, "vec_id", "embedding", 10))
    assert(inline === persisted,
      "fit-inline and load-persisted paths must agree on the same corpus")
  }

  test("persisted-index serving (buildPqIndex/knnIvfPqIndexed) answers identically") {
    VectorFunctions.register(spark)
    val lake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-ann-srv").toString)
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    SimilarityOps.buildPqIndex(lake, "emb", emb, "vec_id", "embedding",
      nCentroids = 16, m = 8, ksub = 16, dim = 64)
    // the index tables the serving path reads are exactly the persisted fits
    val coarse = SimilarityOps.loadCentroids(lake, "emb_coarse")
    val books = SimilarityOps.loadPqCodebooks(lake, "emb_books")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val served = rows(SimilarityOps.knnIvfPqIndexed(lake, "emb", emb, queries,
      "vec_id", "embedding", 10, nprobe = 8, refine = 10))
    val inMemory = rows(SimilarityOps.knnIvfPq(emb, queries, "vec_id", "embedding",
      10, nprobe = 8, refine = 10,
      coarseCentroids = Some(coarse), codebooks = Some(books)))
    assert(served === inMemory,
      "the packed-code serving path must answer identically to the in-memory path")
    assert(served.groupBy(_._1).forall(_._2.size == 10))
  }

  test("incremental ANN admission: appended vectors encode identically and are served") {
    VectorFunctions.register(spark)
    val lake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-ann-incr-spec").toString)
    val emb = graft.Tables.embeddings(spark, sf)
    val held = col("vec_id") >= 5 && col("vec_id") < 25
    // reference: one-shot build over the FULL corpus with quantizers fit
    // on the base only — incremental admission must land byte-identical
    // (cid, code) rows, because encoding is a pure function of (vector,
    // persisted quantizers)
    SimilarityOps.buildPqIndex(lake, "base", emb.filter(!held),
      "vec_id", "embedding", nCentroids = 16, m = 8, ksub = 16, dim = 64)
    SimilarityOps.appendToPqIndex(lake, "base", emb.filter(held),
      "vec_id", "embedding")
    val coarse = SimilarityOps.loadCentroids(lake, "base_coarse")
    val books = SimilarityOps.loadPqCodebooks(lake, "base_books")
    val ref = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-ann-incr-ref").toString)
    SimilarityOps.saveCentroids(ref, "ref_coarse", coarse)
    SimilarityOps.savePqCodebooks(ref, "ref_books", books)
    SimilarityOps.appendToPqIndex(ref, "ref", emb, "vec_id", "embedding")
    def codes(l: graft.catalog.GraftLake, t: String) =
      l.read(t).select("vec_id", "cid", "code").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val incr = codes(lake, "base_codes")
    val oneShot = codes(ref, "ref_codes")
    assert(incr.size === emb.count())
    assert(incr === oneShot,
      "incremental admission must produce the same codes as a full encode " +
        "under the same quantizers")
    // re-admission (at-least-once redelivery) upserts, never duplicates
    SimilarityOps.appendToPqIndex(lake, "base", emb.filter(held),
      "vec_id", "embedding")
    assert(codes(lake, "base_codes") === oneShot)
    // the served top-k actually reaches appended vectors: query WITH a
    // held-out vector's exact values finds that vector at cosine 1, rank 1
    val probe = emb.filter(col("vec_id") === 10)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val got = SimilarityOps.knnIvfPqIndexed(lake, "base",
      emb.unionByName(probe), probe, "vec_id", "embedding",
      k = 3, nprobe = 8, refine = 10)
      .filter(col("rank") === 1).select("neighbor_id", "cos").collect()
    assert(got.length === 1 && got(0).getLong(0) === 10L &&
      math.abs(got(0).getDouble(1) - 1.0) < 1e-9,
      "an identical appended vector must serve as the rank-1 neighbor")
  }

  test("IVF-PQ: recall vs brute, ADC prunes, reported cosines are exact") {
    VectorFunctions.register(spark)
    // same separated-clusters construction as the quantizer test: 8 cluster
    // directions in 16 dims + deterministic noise, so PQ codebooks have
    // real structure to learn
    val dims = 16
    def vec(i: Int): Array[Float] = {
      val c = i % 8
      Array.tabulate(dims)(d =>
        (if (d == 2 * c) 5.0f else 0.0f) + ((i * 31 + d * 7) % 13) / 13.0f * 0.4f)
    }
    val docs = (0 until 400).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      .cache()
    val queries = docs.filter(col("vec_id") >= 392)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteDf = SimilarityOps.knnBrute(docs, queries, "vec_id", "embedding", 5)
    val brute = pairs(bruteDf)
    val pqDf = SimilarityOps.knnIvfPq(docs, queries, "vec_id", "embedding", 5,
      m = 4, ksub = 16, dim = dims)
    val pq = pairs(pqDf)
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall below 0.5")
    // the refine step reranks EXACTLY: any (query, neighbor) the PQ path
    // emits that brute force also ranked must carry the identical cosine
    val bruteCos = bruteDf.select("query_id", "neighbor_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pqDf.select("query_id", "neighbor_id", "cos").collect().foreach { r =>
      bruteCos.get((r.getLong(0), r.getLong(1))).foreach { cb =>
        assert(math.abs(r.getDouble(2) - cb) < 1e-9,
          s"PQ-reported cosine for (${r.getLong(0)},${r.getLong(1)}) is not the true cosine")
      }
    }
    docs.unpersist()
  }

  // ---- hybrid retrieval fusion ----

  test("rrfFuse: doc in both lists outranks docs in one; absent lists contribute 0") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val den = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val fused = SimilarityOps.rrfFuse(Seq(lex, den), "doc_id", k = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused.keySet === Set(10L, 20L, 30L, 40L))
    assert(math.abs(fused(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(fused(10L) - 1.0 / 61) < 1e-12)
    assert(math.abs(fused(40L) - 1.0 / 62) < 1e-12)
    // both-list doc 20 beats every single-list doc, including both rank-1s
    assert(fused(20L) > fused(10L) && fused(20L) > fused(40L) &&
      fused(20L) > fused(30L))
  }

  test("rrfFuse over three lists sums every present contribution") {
    val l1 = Seq((1L, 1)).toDF("doc_id", "rank")
    val l2 = Seq((1L, 2)).toDF("doc_id", "rank")
    val l3 = Seq((1L, 3), (2L, 1)).toDF("doc_id", "rank")
    val fused = SimilarityOps.rrfFuse(Seq(l1, l2, l3), "doc_id", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(fused(1L) - (1.0 / 11 + 1.0 / 12 + 1.0 / 13)) < 1e-12)
    assert(math.abs(fused(2L) - 1.0 / 11) < 1e-12)
  }

  // ---- temperature mixture sampling ----

  test("temperatureSample caps each source at floor(scale*sqrt(n)) deterministically") {
    val rows = (0 until 400).map(i => (i.toLong, if (i < 360) "web" else "book"))
    val corpus = rows.toDF("doc_id", "source")
    val kept = TextOps.temperatureSample(corpus, "source", "doc_id", scale = 3.0)
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // floor(3*sqrt(360)) = 56, floor(3*sqrt(40)) = 18
    assert(bySrc("web") === math.floor(3.0 * math.sqrt(360)).toLong)
    assert(bySrc("book") === math.floor(3.0 * math.sqrt(40)).toLong)
    // flattening: big source's kept FRACTION is strictly below small source's
    assert(bySrc("web").toDouble / 360 < bySrc("book").toDouble / 40)
    // deterministic: same ids on a re-run
    val ids1 = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = TextOps.temperatureSample(corpus, "source", "doc_id", scale = 3.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
  }

  test("temperatureSample keeps every row of a source under its cap") {
    val corpus = (0 until 9).map(i => (i.toLong, "tiny")).toDF("doc_id", "source")
    // floor(4*sqrt(9)) = 12 >= 9 -> nothing dropped
    val kept = TextOps.temperatureSample(corpus, "source", "doc_id", scale = 4.0)
    assert(kept.count() === 9)
  }

  // ---- weighted sampling ----

  test("weightedSample favors heavy rows, always includes a dominant weight, reproducibly") {
    val rows = (0 until 400).map(i =>
      (i.toLong, if (i < 200) 1L else 50L)) :+ (9999L, 1000000000L)
    val df = rows.toDF("doc_id", "w")
    val pick = TextOps.weightedSample(df, "doc_id", "w", 41)
      .select("doc_id").as[Long].collect().toSet
    assert(pick.contains(9999L), "a dominant weight must always be drawn")
    val heavy = pick.count(id => id >= 200 && id < 400)
    val light = pick.count(_ < 200)
    assert(heavy > light * 2,
      s"50x-weighted rows must dominate the sample: heavy=$heavy light=$light")
    // identical draw on a re-run (the randomness is the md5 of the id)
    val again = TextOps.weightedSample(df, "doc_id", "w", 41)
      .select("doc_id").as[Long].collect().toSet
    assert(again === pick)
  }

  // ---- DSIR importance scoring ----

  test("dsirScores ranks target-like candidates above generic ones") {
    // target domain speaks "kernel gpu tensor"; the raw pool speaks "the a of"
    val corpus = Seq(
      (1L, true, "kernel gpu tensor kernel gpu"),
      (2L, true, "tensor kernel gpu tensor"),
      (10L, false, "kernel gpu tensor gpu"),     // candidate that reads like target
      (11L, false, "the a of the a of"),          // generic candidate
      (12L, false, "the of kernel a the of"))     // mixed
      .toDF("doc_id", "is_tgt", "text")
    val scored = QualityOps.dsirScores(corpus, "text", Seq("doc_id"), col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.keySet === Set(10L, 11L, 12L), "only non-target docs are scored")
    assert(scored(10L) > scored(12L) && scored(12L) > scored(11L),
      s"target-like > mixed > generic, got $scored")
    // the target-like doc's tokens are MORE likely under the target LM
    assert(scored(10L) > 0, "mean llr of target-typical tokens must be positive")
    assert(scored(11L) < 0, "mean llr of target-absent tokens must be negative")
  }

  // ---- n-gram containment ----

  test("containment is asymmetric: an embedded excerpt scores 1.0 from the short side") {
    ShingleExpression.register(spark)
    val short = "alpha beta gamma delta epsilon"
    val long = s"intro words here $short trailing content words beyond"
    val df = Seq((short, long)).toDF("s", "l")
      .select(DedupOps.wordShingles(col("s"), 3).as("gs"),
        DedupOps.wordShingles(col("l"), 3).as("gl"))
    val got = df.select(
      DedupOps.containment(col("gs"), col("gl")).as("short_in_long"),
      DedupOps.containment(col("gl"), col("gs")).as("long_in_short"),
      DedupOps.jaccard(col("gs"), col("gl")).as("j")).head()
    assert(got.getDouble(0) === 1.0, "every 3-gram of the excerpt appears in the long doc")
    assert(got.getDouble(1) < 0.5, "the long doc is NOT contained in the excerpt")
    // the case Jaccard misses: union is large, so Jaccard stays low while
    // short-side containment is exact
    assert(got.getDouble(2) < 0.5)
  }

  test("containment of an empty shingle set is 0, not NaN") {
    ShingleExpression.register(spark)
    val df = Seq(("ab", "alpha beta gamma delta")).toDF("s", "l")
      .select(DedupOps.wordShingles(col("s"), 3).as("gs"),
        DedupOps.wordShingles(col("l"), 3).as("gl"))
    val got = df.select(DedupOps.containment(col("gs"), col("gl"))).head().getDouble(0)
    assert(got === 0.0)
  }

  test("hardNegatives: exclusion is structural even when true NNs share the label") {
    graft.functions.VectorFunctions.register(spark)
    // query 0 (label 0) sits in a tight same-label cluster (ids 1-4,
    // cosine ~1); the only different-label vectors (ids 10-13, label 1)
    // are far away. A top-k WITHOUT exclusion would return only label-0
    // hits; hardNegatives must return ONLY the far label-1 vectors.
    def v(base: Double, j: Int) =
      Array.tabulate(64)(d => (base + (if (d == j % 64) 0.01 else 0.0)).toFloat)
    val rows = Seq((0L, v(1.0, 0), 0)) ++
      (1 to 4).map(i => (i.toLong, v(1.0, i), 0)) ++
      (10 to 13).map(i => ((i.toLong, Array.tabulate(64)(d =>
        (if (d < 32) -1.0 else 1.0).toFloat), 1)))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val hn = SimilarityOps.hardNegatives(emb, emb.filter(col("vec_id") === 0L),
      "vec_id", "embedding", "label", k = 3, tables = 16, bitsPerTable = 2)
    val got = hn.collect().map(r => r.getLong(1))
    assert(got.nonEmpty && got.forall(id => id >= 10L && id <= 13L),
      s"same-label vectors must never occupy negative slots, got ${got.toSeq}")
  }

  test("persisted vector-LSH index: indexed join == inline join; admission; param guard") {
    VectorFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf)
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1 && col("vec_id") < 40)
    val wh = java.nio.file.Files.createTempDirectory("graft-vlsh").toString
    val lake = new graft.catalog.GraftLake(spark, wh)
    // build on a PREFIX of the corpus, admit the rest incrementally — the
    // served result must equal the inline join over the FULL corpus
    // (same seeded planes => same buckets => same candidates => same rerank)
    val aOld = a.filter(col("vec_id") % 4 === 0)
    val aNew = a.filter(col("vec_id") % 4 === 2)
    SimilarityOps.buildVectorLshIndex(lake, "v", aOld, "vec_id", "embedding",
      tables = 16, bitsPerTable = 4)
    SimilarityOps.appendToVectorLshIndex(lake, "v", aNew, "vec_id", "embedding")
    val inline = SimilarityOps.knnJoinLsh(a, b, "vec_id", "embedding", 3,
      tables = 16, bitsPerTable = 4)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val served = SimilarityOps.knnJoinLshIndexed(lake, "v", a, b,
      "vec_id", "embedding", 3, tables = 16, bitsPerTable = 4)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(served === inline,
      "index-served join must be byte-identical to the inline join")
    // a redelivered admission batch upserts last-wins — no duplicate bands
    SimilarityOps.appendToVectorLshIndex(lake, "v", aNew, "vec_id", "embedding")
    val again = SimilarityOps.knnJoinLshIndexed(lake, "v", a, b,
      "vec_id", "embedding", 3, tables = 16, bitsPerTable = 4)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(again === inline, "redelivered admission must be absorbed by PK upsert")
    // probing with a different quantizer is refused, never silently wrong
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnJoinLshIndexed(lake, "v", a, b, "vec_id", "embedding",
        3, tables = 16, bitsPerTable = 4, seed = 99L)
    }
    assert(e.getMessage.contains("quantizer"), e.getMessage)
  }

  test("parseMp4: real box walk - mvhd duration, tkhd size, track count; corrupt falls back") {
    val b = MultimodalOps.synthMp4(640, 360, nTracks = 2, timescale = 600,
      duration = 9000L)
    val m = MultimodalOps.decodeBatch(
      Seq((7L, b)).toDF("doc_id", "payload"), spark).collect().head
    assert((m.width, m.height, m.channels, m.n_frames) === (640, 360, 2, 9000L))
    assert(m.n_bytes === b.length.toLong)
    // a 64-bit largesize moov is walked too (version-1 path exercised via
    // size=1 header rewrite of the top-level moov box)
    // corrupt: a box size larger than the payload must fall back to the
    // deterministic stub, never throw
    val corrupt = b.clone()
    corrupt(b.indexOfSlice("moov".getBytes("US-ASCII")) - 4) = 0x7f.toByte
    val f = MultimodalOps.decodeBatch(
      Seq((7L, corrupt)).toDF("doc_id", "payload"), spark).collect().head
    assert(f === MultimodalOps.fakeDecode(7L, corrupt),
      "corrupt container must take the stub path")
    // non-MP4 bytes never match
    val txt = "hello world this is not a container".getBytes("UTF-8")
    assert(MultimodalOps.decodeBatch(Seq((1L, txt)).toDF("doc_id", "payload"),
      spark).collect().head === MultimodalOps.fakeDecode(1L, txt))
  }
}
