package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, fingerprinting. All are pure
  * column expressions (whole-stage codegen, no UDFs) so they scan-scale
  * linearly — the per-document cost is a few regex/array kernels.
  */
object TextOps {

  /** Whitespace tokenization (empty-safe). `\S+` extraction — the same
    * formulation the DuckDB oracles use — never yields empty tokens, even
    * for text bounded by tabs/newlines (plain `trim` strips only ASCII
    * space, so `split(trim(x), "\\s+")` would emit a leading "" there).
    * RegExpExtractAll is codegen'd, so the kernel stays in whole-stage
    * codegen with no higher-order-function fallback. */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-2-style BPE pre-tokenization, lookahead-free so the SAME pattern
    * runs identically on Java regex (Spark) and RE2 (DuckDB and most
    * native engines): contraction suffixes (`'t`, `'re`, …), then
    * space-prefixed letter runs, digit runs, and punctuation/symbol runs.
    * Whitespace never becomes a token of its own. This is the
    * pre-tokenizer a BPE trainer segments further; counting its pieces
    * estimates model-token footprint far better than whitespace words on
    * punctuated text ("don't stop!" → 4 BPE pieces vs 2 words). */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stopword ratio over tokens (null-safe: 0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Punctuation-character ratio of the raw text. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
        length(text).cast("double"))

  /** Composite quality score in [0, 1]: token volume (cap 100) + low
    * punctuation + presence of function words. */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.5 +
      (lit(1.0) - punctRatio(text)) * 0.25 +
      least(stopwordRatio(text) * 5.0, lit(1.0)) * 0.25

  /** Language-ID: n-gram/stopword profile scoring. Each profile is a small
    * set of high-frequency marker words; the predicted language maximizes
    * marker hits (ties break lexicographically). Heuristic by design —
    * the reference pipeline has no langid; this is the LLM-pipeline
    * extension surface. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "mit", "den", "ist"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em"))

  def langIdPredict(text: Column): Column = {
    val toks = tokens(text)
    // argmax by (score, tie) where tie = profiles in REVERSE alphabetical
    // index order, so equal scores resolve to the alphabetically first
    // language under greatest()
    val sortedProfiles = LangProfiles.toSeq.sortBy(_._1)
    val scored = sortedProfiles.zipWithIndex.map { case ((lang, markers), i) =>
      struct(
        size(filter(toks, t => t.isin(markers: _*))).as("score"),
        lit(sortedProfiles.size - i).as("tie"),
        lit(lang).as("lang"))
    }
    greatest(scored: _*).getField("lang")
  }

  // ---- driver-facing queries ----

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** Corpus statistics per language label. */
  val q20DocStats = QueryDef(
    "q20_doc_stats",
    """SELECT lang, count(*) AS n, round(avg(n_chars), 2) AS avg_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    docs(s, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  /** Token counting: longest documents by whitespace-token count. */
  val q21TokenCount = QueryDef(
    "q21_token_count",
    """SELECT doc_id, length(regexp_extract_all(text, '\S+')) AS n_tokens
      |FROM documents ORDER BY n_tokens DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .limit(20)
  }

  /** Exact deduplication: duplicate text groups by content hash
    * (hash-groupBy — single shuffle on the digest). */
  val q22DedupExact = QueryDef(
    "q22_dedup_exact",
    """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS first_doc
      |FROM documents GROUP BY 1 HAVING count(*) > 1
      |ORDER BY h""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
      .filter(col("n") > 1)
      .orderBy(col("h"))
  }

  /** Quality scoring aggregated per language. */
  val q23TextQuality = QueryDef(
    "q23_text_quality",
    """WITH m AS (SELECT lang,
      |  length(regexp_extract_all(text, '\S+')) AS toks,
      |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |    (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0
      |      / length(text) END AS punct,
      |  CASE WHEN length(regexp_extract_all(text, '\S+')) = 0 THEN 0.0 ELSE
      |    len(list_filter(regexp_extract_all(text, '\S+'),
      |        t -> t IN ('the','a','of','and','to','in','is'))) * 1.0
      |      / length(regexp_extract_all(text, '\S+')) END AS stop
      |  FROM documents)
      |SELECT lang, count(*) AS n,
      |  round(avg(least(toks / 100.0, 1.0) * 0.5 + (1.0 - punct) * 0.25 +
      |    least(stop * 5.0, 1.0) * 0.25), 4) AS avg_quality,
      |  round(avg(stop), 4) AS avg_stopword_ratio
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .select(col("lang"), qualityScore(col("text")).as("q"),
        stopwordRatio(col("text")).as("stop"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), round(avg(col("q")), 4).as("avg_quality"),
        round(avg(col("stop")), 4).as("avg_stopword_ratio"))
      .orderBy(col("lang"))
  }

  /** Normalized-content fingerprinting: distinct fingerprints per source
    * (dup-rate view). */
  val q24Fingerprint = QueryDef(
    "q24_fingerprint",
    """SELECT source, count(*) AS n,
      |  count(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS n_unique
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        countDistinct(md5(lower(regexp_replace(col("text"), "\\s+", " ")))).as("n_unique"))
      .orderBy(col("source"))
  }

  /** Rolling-hash fingerprints via the native codegen'd expression. The
    * oracle reproduces the polynomial fold (base 31, wrapping mod 2⁶⁴,
    * signed-long result) with a HUGEINT list_reduce — exact for the ASCII
    * corpus, where codepoints equal UTF-8 bytes. */
  val q25RollingFingerprint = QueryDef(
    "q25_rolling_fingerprint",
    """WITH t AS (SELECT
      |  (CASE WHEN h >= 9223372036854775808::HUGEINT
      |    THEN CAST(h - 18446744073709551616::HUGEINT AS BIGINT)
      |    ELSE CAST(h AS BIGINT) END) AS fp
      |  FROM (SELECT list_reduce(
      |      list_prepend(CAST(0 AS HUGEINT),
      |        [CAST(unicode(c) AS HUGEINT) for c in string_split(text, '')]),
      |      (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS h
      |    FROM documents))
      |SELECT fp % 16 AS bucket, count(*) AS n, count(DISTINCT fp) AS n_unique
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    TextExpressions.register(s)
    docs(s, dir)
      .select(col("doc_id"), TextExpressions.rollingHash(col("text")).as("fp"))
      .groupBy((col("fp") % 16).as("bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("fp")).as("n_unique"))
      .orderBy(col("bucket"))
  }

  /** Language-ID heuristic: prediction distribution against the lang
    * label. The oracle replicates the profile argmax (alphabetically-first
    * tie-break) with marker-hit counts per profile. */
  val q26LangId = QueryDef(
    "q26_langid",
    """WITH s AS (SELECT lang,
      |  len(list_filter(toks, t -> t IN ('der','die','und','das','von','mit','den','ist'))) AS s_de,
      |  len(list_filter(toks, t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
      |  len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','los','del'))) AS s_es,
      |  len(list_filter(toks, t -> t IN ('le','la','de','et','les','des','en','une'))) AS s_fr,
      |  len(list_filter(toks, t -> t IN ('o','a','de','que','e','do','da','em'))) AS s_pt
      |  FROM (SELECT lang, regexp_extract_all(text, '\S+') AS toks FROM documents))
      |SELECT lang, CASE
      |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
      |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
      |  WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
      |  WHEN s_fr >= s_pt THEN 'fr' ELSE 'pt' END AS predicted,
      |  count(*) AS n
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .select(col("lang"), langIdPredict(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Deterministic hash bucket in [0, 256) from any key column — the
    * train/val/test splitter and stratified-sampling primitive. md5-based
    * so the assignment is stable across engines, cluster layouts and
    * reruns (never `rand()`). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  /** Deterministic train/val/test split assignment (80/10/10). */
  def splitAssign(key: Column): Column = {
    val b = hashBucket(key)
    when(b < 205, "train").when(b < 230, "val").otherwise("test")
  }

  /** Deterministic sampling: keep rows whose bucket < fraction·256. */
  def deterministicSample(key: Column, fraction: Double): Column =
    hashBucket(key) < (fraction * 256).toInt

  /** Train/val/test split statistics (hash-deterministic, so the exact
    * assignment is DuckDB-checkable). */
  val q47TrainSplit = QueryDef(
    "q47_train_split",
    """WITH t AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) AS b,
      |             n_chars FROM documents)
      |SELECT CASE WHEN b < 205 THEN 'train' WHEN b < 230 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n, round(avg(n_chars), 2) AS avg_chars
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(splitAssign(col("doc_id")).as("split"), col("n_chars"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("split"))
  }

  /** Deterministic stratified sample: k docs per language, chosen by md5
    * order (stable across engines and reruns — the distributed analog of
    * ORDER BY random() LIMIT k per group, without the nondeterminism). */
  val q48GroupSample = QueryDef(
    "q48_group_sample",
    """SELECT lang, doc_id, rk FROM (
      |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents) t
      |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy(col("lang"), col("rk"))
  }

  /** q76: model-token footprint — whitespace words vs BPE pre-tokenizer
    * pieces per source. The synthetic docs are unpunctuated (the two
    * counts would tie), so both dialects append the same punctuated
    * clause to every doc before counting; `token_witness` (md5-prefix sum
    * over the '|'-joined piece list, q70's idiom) gates the exact piece
    * BOUNDARIES, not just the totals. */
  val q76BpeTokens = QueryDef(
    "q76_bpe_tokens",
    """WITH inj AS (SELECT doc_id, source,
      |    text || ' plus don''t re-use 12,340 items (always)!' AS text
      |  FROM documents),
      |t AS (SELECT source,
      |    len(regexp_extract_all(text, '\S+')) AS ws,
      |    regexp_extract_all(text,
      |      '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+') AS bpe
      |  FROM inj)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
      |  CAST(sum(len(bpe)) AS BIGINT) AS bpe_tokens,
      |  round(sum(len(bpe)) * 1.0 / sum(ws), 4) AS bpe_per_word,
      |  CAST(sum(CAST(('0x' || substr(md5(array_to_string(bpe, '|')), 1, 8)) AS BIGINT))
      |    AS BIGINT) AS token_witness
      |FROM t GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("source"),
        concat(col("text"), lit(" plus don't re-use 12,340 items (always)!"))
          .as("text"))
      .select(col("source"), tokenCount(col("text")).as("ws"),
        bpeTokens(col("text")).as("bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(size(col("bpe")).cast("long")).as("bpe_tokens"),
        round(sum(size(col("bpe")).cast("long")).cast("double") /
          sum(col("ws")), 4).as("bpe_per_word"),
        sum(conv(substring(md5(array_join(col("bpe"), "|")), 1, 8), 16, 10)
          .cast("long")).as("token_witness"))
      .orderBy(col("source"))
  }

  /** Temperature-flattened source-mixture sampling: keep
    * `floor(scale · n_s^α)` documents from each source `s` (α = 0.5 here —
    * the classic sqrt-temperature used to rebalance web-dominated training
    * mixes), chosen deterministically per source by md5 order. Large
    * sources are downsampled ∝ n^(α−1) while small sources keep most rows,
    * flattening the mixture without dropping rare sources.
    *
    * Determinism across engines: the per-source cap depends only on that
    * source's own count (`floor(scale · sqrt(n))` — one IEEE sqrt + mul,
    * bit-identical in Spark and DuckDB); there is no cross-source
    * normalization sum whose addition order could differ.
    *
    * Scale shape: one count agg (broadcast back), one window ranked by
    * md5 within source — a single shuffle on the source key; skewed
    * sources are bounded by the rank filter's early cutoff under AQE. */
  def temperatureSample(corpus: DataFrame, srcCol: String, idCol: String,
      scale: Double = 10.0): DataFrame = {
    val counts = corpus.groupBy(col(srcCol))
      .agg(count(lit(1)).as("__n_src"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    corpus.withColumn("__rk", row_number().over(w))
      .join(broadcast(counts), Seq(srcCol))
      .filter(col("__rk") <= floor(lit(scale) * sqrt(col("__n_src"))))
      .drop("__rk", "__n_src")
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each row draws u ∈ (0,1) from the
    * md5-fraction of its id — the engine-stable stand-in for a uniform
    * random draw — and the k rows with the largest key u^(1/w) win. In the
    * log domain (`ln(u)/w`, same ordering, avoids cross-engine `pow`
    * rounding skew) heavier rows shrink |ln(u)|/w toward 0 and float to
    * the top, so inclusion probability scales with the weight while every
    * run and every engine draws the identical sample.
    *
    * Scale shape: the key is one map-side expression over the corpus and
    * the top-k is a distributed sort-limit (TakeOrderedAndProject) —
    * no global sort, no shuffle beyond the k winners. */
  def weightedSample(corpus: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    // u ∈ [0, 1): guard the log's zero edge with the smallest step
    val key = log(greatest(u, lit(1.0 / 4294967296.0))) /
      col(weightCol).cast("double")
    corpus.withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol)).limit(k)
  }

  /** q116: A-ES weighted sample of 25 documents, weight = n_chars —
    * longer docs proportionally likelier, the draw reproducible in any
    * engine. Hash-gated on the exact sampled id set (and each row's key). */
  val q116WeightedSample = QueryDef(
    "q116_weighted_sample",
    """WITH t AS (SELECT doc_id, lang, n_chars,
      |    ln(greatest(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |         / CAST(4294967296 AS DOUBLE),
      |       CAST(1 AS DOUBLE) / 4294967296)) / n_chars AS wkey
      |  FROM documents)
      |SELECT doc_id, lang, n_chars, round(wkey, 8) AS sample_key
      |FROM t ORDER BY wkey DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
    weightedSample(docs(s, dir), "doc_id", "n_chars", 25)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("__wkey"), 8).as("sample_key"))
  }

  /** q111: sqrt-temperature mixture rebalancing over `documents.source`,
    * hash-gated — per-source kept counts, an id-sum witness over exactly
    * which documents survived, and the realized kept fraction. */
  val q111TemperatureMix = QueryDef(
    "q111_temperature_mix",
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |r AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
      |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |      FROM documents),
      |kept AS (SELECT r.source, r.doc_id FROM r JOIN c USING (source)
      |         WHERE rk <= floor(10 * sqrt(n_docs)))
      |SELECT c.source, c.n_docs, count(k.doc_id) AS n_kept,
      |  CAST(coalesce(sum(k.doc_id), 0) AS BIGINT) AS id_witness,
      |  round(count(k.doc_id) * 1.0 / c.n_docs, 4) AS kept_frac
      |FROM c LEFT JOIN kept k ON k.source = c.source
      |GROUP BY c.source, c.n_docs ORDER BY c.source""".stripMargin) { (s, dir) =>
    val corpus = docs(s, dir)
    val counts = corpus.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    temperatureSample(corpus, "source", "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_witness"))
      .join(counts, Seq("source"), "right_outer")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("id_witness"), lit(0L)).as("id_witness"),
        round(coalesce(col("n_kept"), lit(0L)) * lit(1.0) / col("n_docs"), 4)
          .as("kept_frac"))
      .orderBy(col("source"))
  }

  /** BM25 relevance of every document against a query term set — the
    * classical retrieval scorer; in a curation pipeline it selects
    * documents matching a topic profile (seed-query mining) without
    * embeddings.
    *
    * Scale shape: doc lengths are a MAP-SIDE `size(tokens)` (no explode),
    * the explode is immediately filtered to the query terms so the one
    * corpus-width shuffle carries only query-term hits, and the per-term
    * document frequencies (|terms| rows) plus the 1-row corpus stats
    * broadcast back. Nothing joins corpus-to-corpus. */
  def bm25(corpus: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lens = corpus.select(col(idCol),
      size(tokens(col(textCol))).cast("double").as("__dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val hits = corpus.select(col(idCol),
      explode(tokens(col(textCol))).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = hits.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
    hits.join(broadcast(dfreq), Seq("__term"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (idf * col("__tf") * lit(k1 + 1) /
          (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__s"))
      .groupBy(col(idCol))
      .agg(sum(col("__s")).as("bm25"))
  }

  /** q100: BM25 top-20 docs for a three-term query, oracle-gated — the
    * whole scorer (tf, df, idf, length normalization) re-derived in SQL. */
  val q100Bm25 = QueryDef(
    "q100_bm25",
    """WITH lens AS (SELECT doc_id,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) AS dl
      |  FROM documents),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM lens),
      |tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      |        FROM documents),
      |hits AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
      |         WHERE term IN ('spark', 'join', 'merge') GROUP BY 1, 2),
      |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY 1),
      |scored AS (SELECT h.doc_id,
      |    sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * h.tf * 2.2
      |        / (h.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))) AS score
      |  FROM hits h JOIN dfreq d USING (term) JOIN lens l USING (doc_id)
      |  CROSS JOIN stats s GROUP BY h.doc_id)
      |SELECT doc_id, round(score, 4) AS bm25
      |FROM scored ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    bm25(docs(s, dir), "doc_id", "text", Seq("spark", "join", "merge"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
  }

  /** q159: Unicode NFC normalization on the gate — the first step of
    * every text pipeline, as a codegen'd native expression
    * ([[graft.functions.TextExpressions.NormalizeNfc]]; Spark ships no
    * NFC builtin and a UDF would break whole-stage codegen). The corpus
    * text gets DECOMPOSED sequences appended deterministically
    * (`e + U+0301`, `A + U+0300` — the byte-variant spellings exact
    * dedup and shingling would otherwise treat as distinct text), and
    * both engines normalize independently: DuckDB's `nfc_normalize`
    * must agree with `java.text.Normalizer` on character counts and
    * changed-doc counts per source, or the hash gate fails. Docs with
    * zero appended units pin the identity fast path. Map-side only —
    * one scan, no shuffle before the rollup. */
  val q159NfcNormalize = QueryDef(
    "q159_nfc_normalize",
    """WITH d AS (SELECT source,
      |    text || repeat(' e' || chr(769) || 'A' || chr(768),
      |                   CAST(doc_id % 3 AS INT)) AS t
      |  FROM documents WHERE doc_id < 500),
      |n AS (SELECT source, t, nfc_normalize(t) AS tn FROM d)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(length(t)) AS BIGINT) AS chars_before,
      |  CAST(sum(length(tn)) AS BIGINT) AS chars_after,
      |  CAST(sum(CASE WHEN t <> tn THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed
      |FROM n GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    graft.functions.TextExpressions.register(s)
    val d = docs(s, dir).filter(col("doc_id") < 500)
      .select(col("source"), concat(col("text"),
        call_function("repeat", lit(" e\u0301A\u0300"),
          (col("doc_id") % 3).cast("int"))).as("t"))
      .withColumn("tn", graft.functions.TextExpressions.normalizeNfc(col("t")))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("t"))).as("chars_before"),
        sum(length(col("tn"))).as("chars_after"),
        sum(when(col("t") =!= col("tn"), 1L).otherwise(0L)).as("n_changed"))
      .orderBy(col("source"))
  }

  /** q163: UNICODE-EQUIVALENCE exact dedup key — `casefold(nfkc(text))`
    * as native codegen'd expressions (q159's NFC family completed:
    * compatibility folds NFC lacks — ligatures, fullwidth forms — plus
    * FULL case folding, which plain lower() is not: lower('ß')='ß').
    * Oracle construction: the corpus slice is pure ASCII (asserted
    * in-query), where the key degenerates to lower(text) — something
    * DuckDB CAN compute — while the PLANTED variants are aggressively
    * non-ASCII (fullwidth substitutions, uppercasing) and must collapse
    * onto their base doc's key: every group's size triples exactly, so
    * the group count equals the base corpus's distinct-lower count and
    * zero groups are ragged. A dedup key that missed a fold (or folded
    * two distinct texts together) breaks the constants. */
  val q163UnicodeDedupKey = QueryDef(
    "q163_unicode_dedup_key",
    """WITH d AS (SELECT text FROM documents WHERE doc_id < 600)
      |SELECT CAST(count(DISTINCT lower(text)) AS BIGINT) AS n_groups,
      |  CAST(count(*) * 3 AS BIGINT) AS n_docs,
      |  CAST(0 AS BIGINT) AS n_ragged_groups
      |FROM d""".stripMargin) { (s, dir) =>
    graft.functions.TextExpressions.register(s)
    val base = docs(s, dir).filter(col("doc_id") < 600)
      .select(col("doc_id"), col("text"))
    require(base.filter(length(col("text")) =!= octet_length(col("text")))
      .isEmpty, "oracle precondition: the base corpus slice is pure ASCII")
    // planted byte-variant spellings of the SAME text: fullwidth letters
    // (an NFKC-only fold — NFC keeps them) and an uppercased copy (full
    // casefold territory) — neither computable by the DuckDB oracle,
    // both MUST land in their base doc's group
    val v1 = base.select((col("doc_id") + 1000000L).as("doc_id"),
      translate(col("text"), "ae", "ａｅ").as("text"))
    val v2 = base.select((col("doc_id") + 2000000L).as("doc_id"),
      upper(col("text")).as("text"))
    val keyed = base.unionByName(v1).unionByName(v2)
      .withColumn("key", graft.functions.TextExpressions.caseFold(
        graft.functions.TextExpressions.normalizeNfkc(col("text"))))
    keyed.groupBy(col("key")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("sz")).cast("long").as("n_docs"),
        sum(when(col("sz") % 3 =!= 0, 1L).otherwise(0L))
          .as("n_ragged_groups"))
  }

  val all: Seq[QueryDef] = Seq(
    q20DocStats, q21TokenCount, q22DedupExact, q23TextQuality,
    q24Fingerprint, q25RollingFingerprint, q26LangId, q47TrainSplit,
    q48GroupSample, q76BpeTokens, q100Bm25, q111TemperatureMix,
    q116WeightedSample, q159NfcNormalize, q163UnicodeDedupKey)
}
