package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.ShingleExpression
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality operators for training-data curation, beyond the basic
  * text metrics in [[TextOps]]: Gopher-style repetition scoring and a
  * benchmark-contamination sweep. Both are designed as 100 TB scans:
  *
  *  - repetition is a pure map — the top-k-gram count is a single-pass
  *    codegen'd expression ([[ShingleExpression.TopShingleCount]]), so no
  *    k-gram explode or per-doc groupBy ever reaches the plan;
  *  - contamination explodes k-grams ONLY map-side and joins them against
  *    a BROADCAST benchmark-shingle set — the corpus is never shuffled;
  *    the only exchanges are over the (tiny) flagged-doc-id set and the
  *    final per-source aggregate.
  */
object QualityOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** Gopher-style repetition metrics per language: the fraction of 2-gram
    * slots taken by the single most repeated phrase, lexical diversity
    * (distinct/total tokens), and how many docs cross the repetition
    * threshold a curation pipeline would drop at. */
  val q66Repetition = QueryDef(
    "q66_repetition",
    """WITH t AS (SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |d AS (SELECT doc_id, lang, len(toks) AS n, len(list_distinct(toks)) AS nd,
      |        [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS grams
      |      FROM t WHERE len(toks) >= 2),
      |top AS (SELECT doc_id, max(c) AS topc FROM (
      |    SELECT doc_id, gm, count(*) AS c
      |    FROM (SELECT doc_id, unnest(grams) AS gm FROM d)
      |    GROUP BY doc_id, gm) GROUP BY doc_id),
      |p AS (SELECT d.lang, top.topc * 1.0 / (d.n - 1) AS top2_frac,
      |             d.nd * 1.0 / d.n AS diversity
      |      FROM d JOIN top USING (doc_id))
      |SELECT lang, count(*) AS n_docs,
      |  round(avg(top2_frac), 4) AS avg_top2gram_frac,
      |  round(avg(diversity), 4) AS avg_token_diversity,
      |  CAST(sum(CASE WHEN top2_frac > 0.18 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
      |FROM p GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    ShingleExpression.register(s)
    val toks = TextOps.tokens(col("text"))
    val perDoc = docs(s, dir)
      .select(col("lang"), size(toks).as("n"),
        size(array_distinct(toks)).as("nd"),
        ShingleExpression.topShingleCount(toks, 2).as("topc"))
      .filter(col("n") >= 2)
      .select(col("lang"),
        (col("topc").cast("double") / (col("n") - 1)).as("top2_frac"),
        (col("nd").cast("double") / col("n")).as("diversity"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("top2_frac")), 4).as("avg_top2gram_frac"),
        round(avg(col("diversity")), 4).as("avg_token_diversity"),
        sum(when(col("top2_frac") > 0.18, 1L).otherwise(0L)).as("n_repetitive"))
      .orderBy(col("lang"))
  }

  /** Benchmark-contamination sweep: flag every corpus document that shares
    * at least one `k`-gram with any document of `bench` — the
    * n-gram-overlap decontamination step of LLM training pipelines.
    *
    * `bench` is a caller-supplied DataFrame with columns `(doc_id, text)`
    * (a real pipeline passes the eval-benchmark corpus here); `normalize`
    * applies the common decontamination recipe of lowercasing and
    * punctuation-stripping BOTH sides before shingling, so cosmetic edits
    * don't hide overlap.
    *
    * Scale shape: the benchmark side is tiny by construction, so its
    * exploded shingle set broadcasts; corpus docs stream through map-side
    * and only the flagged-id set is ever shuffled. Returns the corpus with
    * a `contaminated` flag column (doc_id, contaminated). */
  def contaminationFlags(corpus: DataFrame, bench: DataFrame, k: Int = 5,
      normalize: Boolean = false): DataFrame = {
    val s = corpus.sparkSession
    ShingleExpression.register(s)
    def norm(c: org.apache.spark.sql.Column) =
      if (normalize) lower(regexp_replace(c, "[\\p{Punct}]+", " ")) else c
    def grams(df: DataFrame, id: String, out: String) = df
      .select(col("doc_id").as(id),
        ShingleExpression.wordShingles(TextOps.tokens(norm(col("text"))), k).as("sh"))
      .filter(col("sh").isNotNull)
      .select(col(id), explode(col("sh")).as(out))
    val benchGrams = grams(bench, "b_id", "bg")
    val flagged = grams(corpus, "doc_id", "g")
      .join(broadcast(benchGrams),
        col("g") === col("bg") && col("doc_id") =!= col("b_id"))
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(1L))
    corpus.select(col("doc_id")).join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("contaminated"), lit(0L)).as("contaminated"))
  }

  /** q67: [[contaminationFlags]] driven with a deterministically chosen
    * demo slice (`doc_id % 97 = 0`) standing in for the benchmark corpus,
    * aggregated to a per-source contamination count. */
  val q67Contamination = QueryDef(
    "q67_contamination",
    """WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |s AS (SELECT doc_id, source,
      |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |                       toks[i+3] || ' ' || toks[i+4]
      |                       for i in range(1, len(toks) - 3)]) AS sh
      |      FROM t WHERE len(toks) >= 5),
      |bench AS (SELECT doc_id AS b_id, sh AS bsh FROM s WHERE doc_id % 97 = 0),
      |flagged AS (SELECT DISTINCT s.doc_id FROM s JOIN bench
      |            ON s.doc_id != bench.b_id AND list_has_any(s.sh, bench.bsh))
      |SELECT d.source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_contaminated
      |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
    val base = docs(s, dir)
    val flags = contaminationFlags(base, base.filter(col("doc_id") % 97 === 0))
    base.join(flags, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("contaminated")).as("n_contaminated"))
      .orderBy(col("source"))
  }

  /** Deterministic sequence packing: assign documents to fixed-budget
    * (512-token) training sequences in a stable md5 order, the way a
    * pretraining pipeline packs shuffled docs into context windows. A doc
    * starting inside a window belongs to it and may spill into the next
    * (concat-and-split packing).
    *
    * Scale design: the running sum is windowed per `(lang, shard)` where
    * `shard = md5-bucket(doc_id) % nShards` — the SHARD (not the language)
    * is the parallelism unit, so no window partition ever holds an entire
    * language's corpus on one task. Sequence ids are namespaced by shard
    * (`n_seqs` counts distinct `(shard, seq_id)` pairs), mirroring how
    * real packing shards emit independent sequence streams that are only
    * unioned, never renumbered. The shard key reuses the engine-stable
    * md5-bucket idiom ([[TextOps.hashBucket]]) so the exact assignment is
    * reproducible in any engine — at 100 TB, raise `nShards` with the
    * cluster; 8 here keeps the sf0.01 oracle readable. */
  val q68SequencePacking = QueryDef(
    "q68_sequence_packing",
    """WITH t AS (SELECT lang, doc_id,
      |             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 8 AS shard,
      |             len(regexp_extract_all(text, '\S+')) AS nt FROM documents),
      |w AS (SELECT lang, shard, nt,
      |        sum(nt) OVER (PARTITION BY lang, shard
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM t),
      |p AS (SELECT lang, shard, nt,
      |        CAST(floor((cum - nt) * 1.0 / 512) AS BIGINT) AS seq_id FROM w)
      |SELECT lang, count(DISTINCT (shard, seq_id)) AS n_seqs, count(*) AS n_docs,
      |  CAST(sum(nt) AS BIGINT) AS total_tokens,
      |  round(count(*) * 1.0 / count(DISTINCT (shard, seq_id)), 2) AS avg_docs_per_seq
      |FROM p GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val budget = 512
    val nShards = 8
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(s, dir)
      .select(col("lang"), col("doc_id"),
        (TextOps.hashBucket(col("doc_id")) % nShards).as("shard"),
        TextOps.tokenCount(col("text")).as("nt"))
      .withColumn("cum", sum(col("nt")).over(w))
      .select(col("lang"), col("shard"), col("nt"),
        floor((col("cum") - col("nt")) * lit(1.0) / budget).cast("long").as("seq_id"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("shard"), col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        round(count(lit(1)).cast("double") /
          countDistinct(col("shard"), col("seq_id")), 2).as("avg_docs_per_seq"))
      .orderBy(col("lang"))
  }

  /** Per-document unigram cross-entropy against the corpus's own unigram
    * distribution — the cheap stand-in for LM-perplexity quality
    * filtering: a doc of globally rare tokens scores high, a doc of
    * boilerplate scores low.
    *
    * Scale shape: ONE token-count shuffle builds the model (partial aggs
    * ship counts, not tokens); the model is vocab-sized, gets its total
    * from a window over itself, and BROADCASTS back, so scoring is a
    * map-side join + one per-doc aggregate — the corpus text never
    * shuffles. */
  def unigramCrossEntropy(corpus: DataFrame, textCol: String,
      idCols: Seq[String]): DataFrame = {
    val tok = corpus.select(idCols.map(col) :+
      explode(TextOps.tokens(col(textCol))).as("token"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val model = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .select(col("token"),
        (-log(col("c").cast("double") / sum(col("c")).over(w))).as("nll"))
    tok.join(broadcast(model), Seq("token"))
      .groupBy(idCols.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"), avg(col("nll")).as("xent"))
  }

  /** q74: per-language corpus cross-entropy profile + how many docs cross
    * the "too surprising" filter line. */
  val q74UnigramXent = QueryDef(
    "q74_unigram_xent",
    """WITH tok AS (SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS token
      |             FROM documents),
      |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
      |m AS (SELECT token, -ln(c * 1.0 / (SELECT sum(c) FROM cnt)) AS nll FROM cnt),
      |d AS (SELECT doc_id, lang, avg(nll) AS xent
      |      FROM tok JOIN m USING (token) GROUP BY doc_id, lang)
      |SELECT lang, count(*) AS n_docs,
      |  round(avg(xent), 4) AS avg_xent,
      |  round(min(xent), 4) AS min_xent,
      |  round(max(xent), 4) AS max_xent,
      |  CAST(sum(CASE WHEN xent > 3.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    unigramCrossEntropy(docs(s, dir), "text", Seq("doc_id", "lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("xent")), 4).as("avg_xent"),
        round(min(col("xent")), 4).as("min_xent"),
        round(max(col("xent")), 4).as("max_xent"),
        sum(when(col("xent") > 3.45, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("lang"))
  }

  /** DSIR-style importance scoring (Data Selection via Importance
    * Resampling, Xie et al. 2023, simplified to unigrams): score every
    * candidate document by the mean log-likelihood RATIO of its tokens
    * under a target-domain unigram LM vs the raw-corpus LM (both add-1
    * smoothed over the shared vocabulary). Documents that "read like" the
    * target domain score high even when their metadata says otherwise —
    * the standard trick for mining target-like data out of a web crawl.
    *
    * Scale shape: identical to [[unigramCrossEntropy]] — two token-count
    * shuffles (target is a filtered second pass of the same scan), a
    * vocab-sized model frame that broadcasts back, one per-doc aggregate;
    * the corpus text never shuffles. */
  def dsirScores(corpus: DataFrame, textCol: String, idCols: Seq[String],
      targetFilter: Column): DataFrame = {
    val tok = corpus.select(idCols.map(col) :+ targetFilter.as("__tgt") :+
      explode(TextOps.tokens(col(textCol))).as("token"): _*)
    val cntAll = tok.groupBy(col("token")).agg(count(lit(1)).as("__c_all"))
    val cntTgt = tok.filter(col("__tgt")).groupBy(col("token"))
      .agg(count(lit(1)).as("__c_tgt"))
    val stats = cntAll.agg(sum(col("__c_all")).as("__t_all"),
      count(lit(1)).as("__v"))
      .crossJoin(tok.filter(col("__tgt")).agg(count(lit(1)).as("__t_tgt")))
    val model = cntAll.join(cntTgt, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .select(col("token"),
        (log((coalesce(col("__c_tgt"), lit(0L)) + 1).cast("double") /
            (col("__t_tgt") + col("__v"))) -
          log((col("__c_all") + 1).cast("double") /
            (col("__t_all") + col("__v")))).as("__llr"))
    tok.filter(!col("__tgt"))
      .join(broadcast(model), Seq("token"))
      .groupBy(idCols.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"), avg(col("__llr")).as("dsir"))
  }

  /** q113: DSIR selection — mine the 15 non-German documents whose text
    * best matches the German-subset unigram LM. Ordered by the ROUNDED
    * score then doc_id: per-doc mean-of-llr accumulates in engine-specific
    * order, so the unrounded doubles can differ in the last bits between
    * engines; 4-decimal rounding collapses that before the sort key. */
  val q113DsirSelect = QueryDef(
    "q113_dsir_select",
    """WITH tok AS (SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS token
      |             FROM documents),
      |ca AS (SELECT token, count(*) AS c_all FROM tok GROUP BY 1),
      |ct AS (SELECT token, count(*) AS c_tgt FROM tok WHERE lang = 'de' GROUP BY 1),
      |st AS (SELECT (SELECT sum(c_all) FROM ca) AS t_all,
      |              (SELECT count(*) FROM ca) AS v,
      |              (SELECT count(*) FROM tok WHERE lang = 'de') AS t_tgt),
      |m AS (SELECT ca.token,
      |    ln(CAST(coalesce(ct.c_tgt, 0) + 1 AS DOUBLE) / (st.t_tgt + st.v)) -
      |    ln(CAST(ca.c_all + 1 AS DOUBLE) / (st.t_all + st.v)) AS llr
      |  FROM ca LEFT JOIN ct ON ca.token = ct.token CROSS JOIN st),
      |d AS (SELECT t.doc_id, t.lang, count(*) AS n_tokens,
      |        round(avg(m.llr), 4) AS dsir_score
      |      FROM tok t JOIN m USING (token) WHERE t.lang != 'de'
      |      GROUP BY t.doc_id, t.lang)
      |SELECT doc_id, lang, n_tokens, dsir_score
      |FROM d ORDER BY dsir_score DESC, doc_id LIMIT 15""".stripMargin) { (s, dir) =>
    dsirScores(docs(s, dir), "text", Seq("doc_id", "lang"), col("lang") === "de")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("dsir"), 4).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id")).limit(15)
  }

  /** Cross-document duplicate k-gram rate — Gopher's "duplicate n-grams
    * across the corpus" signal: per doc, the fraction of its DISTINCT
    * k-grams that also appear in at least one other document. High values
    * mean templated/boilerplate text that near-dup sketches (banded on
    * whole docs) can miss.
    *
    * Scale shape: grams explode map-side (distinct per doc via the
    * codegen'd shingle expression), one shuffle counts distinct doc_ids
    * per gram, and the shared-gram set joins back on the gram key — the
    * same inherently shuffle-on-gram shape as the LSH band join; nothing
    * here is quadratic in docs. */
  def crossDocDupGramRate(corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 3): DataFrame = {
    ShingleExpression.register(corpus.sparkSession)
    val g = corpus.select(col(idCol),
      explode(ShingleExpression.wordShingles(
        TextOps.tokens(col(textCol)), k)).as("gram"))
    val dup = g.groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") > 1)
      .select(col("gram"), lit(1L).as("__shared"))
    g.join(dup, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__shared"), lit(0L))).as("n_shared"))
      .withColumn("dup_frac",
        col("n_shared").cast("double") / col("n_grams"))
  }

  /** q75: 3-gram cross-doc duplication per source + docs over the 90 %
    * boilerplate line. */
  val q75CrossdocDupGrams = QueryDef(
    "q75_crossdoc_dup_grams",
    """WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |s AS (SELECT doc_id, source,
      |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                       for i in range(1, len(toks) - 1)]) AS sh
      |      FROM t WHERE len(toks) >= 3),
      |g AS (SELECT doc_id, source, unnest(sh) AS gram FROM s),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
      |d AS (SELECT g.doc_id, g.source, count(*) AS n_grams,
      |        sum(CASE WHEN dup.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
      |      FROM g LEFT JOIN dup ON g.gram = dup.gram
      |      GROUP BY g.doc_id, g.source)
      |SELECT source, count(*) AS n_docs,
      |  round(avg(n_shared * 1.0 / n_grams), 4) AS avg_dup3_frac,
      |  CAST(sum(CASE WHEN n_shared * 1.0 / n_grams > 0.9 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_boilerplate
      |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val base = docs(s, dir)
    crossDocDupGramRate(base, "text", "doc_id", k = 3)
      .join(base.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("dup_frac")), 4).as("avg_dup3_frac"),
        sum(when(col("dup_frac") > 0.9, 1L).otherwise(0L)).as("n_boilerplate"))
      .orderBy(col("source"))
  }

  /** Per-document INTERPOLATED BIGRAM cross-entropy against the corpus's
    * own n-gram LM — one step up the LM-quality ladder from
    * [[unigramCrossEntropy]]: `p(w2|w1) = λ·c(w1 w2)/c(w1·) +
    * (1−λ)·c(w2)/N` (λ = 0.75; `c(w1·)` counts w1 as a bigram head, so
    * the conditional sums to 1 over observed continuations). Bigrams
    * extract MAP-SIDE by zipping each token array with its own tail — no
    * positional self-join.
    *
    * Scale shape: two token-shuffles build the model (bigram counts and
    * unigram counts — partial aggs ship counts, not text); the model
    * broadcasts back (vocab², still tiny vs corpus) and scoring is a
    * map-side join + per-doc aggregate. At web scale swap the broadcast
    * for a shuffle join on the gram key — same plan otherwise. */
  def bigramCrossEntropy(corpus: DataFrame, textCol: String,
      idCols: Seq[String], lambda: Double = 0.75): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val n = size(toks)
    val pairs = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val bg = corpus.filter(n >= 2)
      .select(idCols.map(col) :+ explode(pairs).as("bg"): _*)
    val tok = corpus.select(explode(toks).as("token"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val uni = tok.groupBy(col("token")).agg(count(lit(1)).as("cu"))
      .select(col("token"), col("cu"),
        sum(col("cu")).over(wAll).as("n_total"))
    val bc = bg.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val wHead = org.apache.spark.sql.expressions.Window
      .partitionBy(substring_index(col("bg"), " ", 1))
    val model = bc
      .withColumn("c1", sum(col("cb")).over(wHead))
      .join(broadcast(uni), substring_index(col("bg"), " ", -1) === col("token"))
      .select(col("bg"),
        (-log(lit(lambda) * col("cb") / col("c1") +
          lit(1.0 - lambda) * col("cu") / col("n_total"))).as("nll"))
    bg.join(broadcast(model), Seq("bg"))
      .groupBy(idCols.map(col): _*)
      .agg(count(lit(1)).as("n_bigrams"), avg(col("nll")).as("xent2"))
  }

  /** q89: per-language bigram cross-entropy profile — the discriminating
    * version of q74's unigram filter line (boilerplate scores low, rare
    * token sequences high). */
  val q89BigramXent = QueryDef(
    "q89_bigram_xent",
    """WITH t AS (SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |b AS (SELECT doc_id, lang, unnest([toks[i] || ' ' || toks[i+1]
      |                                   for i in range(1, len(toks))]) AS bg
      |      FROM t WHERE len(toks) >= 2),
      |tok AS (SELECT unnest(toks) AS token FROM t),
      |uni AS (SELECT token, count(*) AS cu FROM tok GROUP BY token),
      |tot AS (SELECT sum(cu) AS n_total FROM uni),
      |bc AS (SELECT bg, count(*) AS cb FROM b GROUP BY bg),
      |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, sum(cb) AS c1 FROM bc GROUP BY 1),
      |model AS (SELECT bg,
      |    -ln(0.75 * cb / c1 + 0.25 * cu / (SELECT n_total FROM tot)) AS nll
      |  FROM bc
      |  JOIN c1 ON split_part(bg, ' ', 1) = c1.w1
      |  JOIN uni ON split_part(bg, ' ', 2) = uni.token),
      |d AS (SELECT doc_id, lang, avg(nll) AS xent2
      |      FROM b JOIN model USING (bg) GROUP BY doc_id, lang)
      |SELECT lang, count(*) AS n_docs,
      |  round(avg(xent2), 4) AS avg_xent2,
      |  round(min(xent2), 4) AS min_xent2,
      |  round(max(xent2), 4) AS max_xent2
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    bigramCrossEntropy(docs(s, dir), "text", Seq("doc_id", "lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("xent2")), 4).as("avg_xent2"),
        round(min(col("xent2")), 4).as("min_xent2"),
        round(max(col("xent2")), 4).as("max_xent2"))
      .orderBy(col("lang"))
  }

  /** Gopher-style quality filter funnel: a fixed, ordered rule chain where
    * each document is charged to the FIRST rule it fails (`fail_rule`,
    * null = passed all). First-fail attribution is what makes funnel
    * metrics additive: per-rule counts + passes sum to the corpus size, so
    * pipeline dashboards can stack them.
    *
    * Scale shape (100 TB): a PURE MAP — every signal (token count, mean
    * word length, stopword ratio, duplicate-token fraction) is computed
    * from the row's own token array; no shuffle until the caller
    * aggregates, and that aggregate is per-source partial-agg bytes. */
  def qualityFunnel(corpus: DataFrame, textCol: String,
      minTokens: Int = 30, maxTokens: Int = 90,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 5.0,
      minStopwordRatio: Double = 0.02,
      maxDupTokenFrac: Double = 0.6): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val n = size(toks)
    val mwl = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / n.cast("double")
    val stop = TextOps.stopwordRatio(col(textCol))
    val dup = lit(1.0) - size(array_distinct(toks)).cast("double") / n.cast("double")
    corpus.withColumn("fail_rule",
      when(n < minTokens || n > maxTokens, lit("word_count"))
        .when(mwl < minMeanWordLen || mwl > maxMeanWordLen, lit("mean_word_len"))
        .when(stop < minStopwordRatio, lit("stopword_ratio"))
        .when(dup > maxDupTokenFrac, lit("dup_token_frac")))
  }

  /** q78: the funnel aggregated per source — the per-rule drop accounting
    * a curation pipeline publishes. Both dialects compute the same four
    * signals from the same token arrays, so the hash gate pins the exact
    * first-fail attribution of every document. */
  val q78QualityFunnel = QueryDef(
    "q78_quality_funnel",
    """WITH t AS (SELECT source, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |m AS (SELECT source, len(toks) AS n,
      |        list_sum(list_transform(toks, t -> len(t))) * 1.0 / len(toks) AS mwl,
      |        len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is')))
      |          * 1.0 / len(toks) AS stop,
      |        1.0 - len(list_distinct(toks)) * 1.0 / len(toks) AS dup
      |      FROM t),
      |f AS (SELECT source,
      |        CASE WHEN n < 30 OR n > 90 THEN 'word_count'
      |             WHEN mwl < 3.0 OR mwl > 5.0 THEN 'mean_word_len'
      |             WHEN stop < 0.02 THEN 'stopword_ratio'
      |             WHEN dup > 0.6 THEN 'dup_token_frac' END AS fail_rule
      |      FROM m)
      |SELECT source, count(*) AS n_docs,
      |  CAST(count(*) FILTER (fail_rule = 'word_count') AS BIGINT) AS n_fail_word_count,
      |  CAST(count(*) FILTER (fail_rule = 'mean_word_len') AS BIGINT) AS n_fail_word_len,
      |  CAST(count(*) FILTER (fail_rule = 'stopword_ratio') AS BIGINT) AS n_fail_stopword,
      |  CAST(count(*) FILTER (fail_rule = 'dup_token_frac') AS BIGINT) AS n_fail_dup,
      |  CAST(count(*) FILTER (fail_rule IS NULL) AS BIGINT) AS n_pass
      |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    qualityFunnel(docs(s, dir), "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("fail_rule") === "word_count", 1)).as("n_fail_word_count"),
        count(when(col("fail_rule") === "mean_word_len", 1)).as("n_fail_word_len"),
        count(when(col("fail_rule") === "stopword_ratio", 1)).as("n_fail_stopword"),
        count(when(col("fail_rule") === "dup_token_frac", 1)).as("n_fail_dup"),
        count(when(col("fail_rule").isNull, 1)).as("n_pass"))
      .orderBy(col("source"))
  }

  /** Span-level benchmark excision: remove every token position of
    * `corpus` covered by a `k`-gram that appears anywhere in `bench`, and
    * rebuild each document from the surviving tokens in order. Overlapping
    * matches excise the UNION of their positions. Returns one row per
    * corpus doc: (doc_id, source, n_toks, toks_kept, clean_text) —
    * `clean_text` is null when every token was excised.
    *
    * Scale shape: positional grams are a map-side explode; the benchmark
    * gram set broadcasts; the rebuild is one groupBy(doc_id) — the single
    * unavoidable per-doc shuffle. */
  def spanExcise(corpus: DataFrame, bench: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    def withToks(df: DataFrame) = df.select(col("doc_id"), col("source"),
      TextOps.tokens(col("text")).as("toks"))
    def positionalGrams(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("toks")) - (k - 1))).as("i"),
        col("toks"))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("toks"), col("i"), lit(k)), " ").as("g"))
    val d = withToks(corpus)
    val bgrams = positionalGrams(
        withToks(bench.withColumn("source", lit(""))))
      .select(col("g")).distinct()
    val hits = positionalGrams(d).join(broadcast(bgrams), Seq("g"))
      .select(col("doc_id"), col("i"))
    val covered = hits
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (k - 1))).as("p"))
      .distinct()
    val tokPos = d.select(col("doc_id"), col("source"),
        posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("source"), col("tok"),
        (col("p0") + 1).as("p"))
    val kept = tokPos.join(covered, Seq("doc_id", "p"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("toks_kept"))
    d.select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_toks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_toks"),
        coalesce(col("toks_kept"), lit(0L)).as("toks_kept"),
        col("clean_text"))
  }

  /** q124: span-level decontamination EXCISION — q67 flags contaminated
    * documents; this operator repairs them instead of dropping them: every
    * token position covered by a benchmark 3-gram is removed, the document
    * is rebuilt from the surviving tokens in order, and the per-source
    * report carries kept/removed token counts plus an md5 witness of the
    * rebuilt texts (a doc cleaned to the wrong tokens hash-mismatches).
    * Overlapping matches excise their union of positions, not double.
    * The benchmark set is the q67 convention (`doc_id % 97 = 0` docs
    * standing in for the eval corpus); bench docs are excluded from the
    * report. 3-grams (vs q67's 5-grams) keep the excision path densely
    * exercised on the synthetic corpus; a production run would raise the
    * window (8-13 tokens is typical) — the shape is gram-size-agnostic.
    *
    * Scale shape: gram construction is a map-side positional explode;
    * the benchmark gram set is BROADCAST (benchmarks are small by
    * definition) so matching never shuffles the corpus; covered positions
    * fan out at most 5× the match count; reconstruction is the one
    * unavoidable shuffle — a groupBy(doc_id) carrying surviving tokens,
    * the same cardinality any per-doc rebuild must pay. */
  val q124Decontaminate = QueryDef(
    "q124_decontaminate",
    """WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |bgrams AS (SELECT DISTINCT
      |    array_to_string(toks[i:i+2], ' ') AS g
      |  FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i
      |        FROM t WHERE doc_id % 97 = 0 AND len(toks) >= 3)),
      |d AS (SELECT doc_id, source, toks FROM t WHERE doc_id % 97 != 0),
      |grams AS (SELECT doc_id, i, array_to_string(toks[i:i+2], ' ') AS g
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
      |        FROM d WHERE len(toks) >= 3)),
      |hits AS (SELECT doc_id, i FROM grams JOIN bgrams USING (g)),
      |covered AS (SELECT DISTINCT doc_id, i + u.d AS p
      |  FROM hits CROSS JOIN (SELECT unnest([0, 1, 2]) AS d) u),
      |tok_pos AS (SELECT doc_id, source, unnest(toks) AS tok,
      |    generate_subscripts(toks, 1) AS p FROM d),
      |kept AS (SELECT tp.doc_id, tp.source, tp.tok, tp.p
      |  FROM tok_pos tp LEFT JOIN covered c
      |    ON tp.doc_id = c.doc_id AND tp.p = c.p
      |  WHERE c.doc_id IS NULL),
      |rebuilt AS (SELECT doc_id, source,
      |    string_agg(tok, ' ' ORDER BY p) AS clean_text,
      |    count(*) AS toks_kept
      |  FROM kept GROUP BY doc_id, source),
      |full_docs AS (SELECT doc_id, source, len(toks) AS n_toks FROM d)
      |SELECT f.source,
      |  count(*) AS n_docs,
      |  CAST(sum(f.n_toks) AS BIGINT) AS toks_total,
      |  CAST(sum(coalesce(r.toks_kept, 0)) AS BIGINT) AS toks_kept,
      |  CAST(sum(f.n_toks - coalesce(r.toks_kept, 0)) AS BIGINT) AS toks_removed,
      |  CAST(sum(CASE WHEN coalesce(r.toks_kept, 0) < f.n_toks
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_excised,
      |  CAST(sum(CASE WHEN r.clean_text IS NOT NULL
      |    THEN CAST(('0x' || substr(md5(r.clean_text), 1, 8)) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS text_witness
      |FROM full_docs f LEFT JOIN rebuilt r
      |  ON f.doc_id = r.doc_id
      |GROUP BY f.source ORDER BY f.source""".stripMargin) { (s, dir) =>
    val base = docs(s, dir)
    spanExcise(base.filter(col("doc_id") % 97 =!= 0),
        base.filter(col("doc_id") % 97 === 0), k = 3)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("toks_total"),
        sum(coalesce(col("toks_kept"), lit(0L))).as("toks_kept"),
        sum(col("n_toks") - coalesce(col("toks_kept"), lit(0L)))
          .as("toks_removed"),
        sum(when(coalesce(col("toks_kept"), lit(0L)) < col("n_toks"), 1L)
          .otherwise(0L)).as("n_docs_excised"),
        sum(when(col("clean_text").isNotNull,
          conv(substring(md5(col("clean_text")), 1, 8), 16, 10).cast("long"))
          .otherwise(0L)).as("text_witness"))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(q66Repetition, q67Contamination,
    q68SequencePacking, q74UnigramXent, q75CrossdocDupGrams, q78QualityFunnel,
    q89BigramXent, q113DsirSelect, q124Decontaminate)
}
