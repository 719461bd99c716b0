package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond cleaning/dedup: context-window
  * chunking, tokenizer-prep vocabulary statistics, and temperature-based
  * source mixing — the steps that turn a curated corpus into model input.
  *
  * Scale shapes (100 TB):
  *  - chunking is a pure map — chunk starts come from `sequence()` over
  *    each doc's own token count, so the explode factor is the chunk
  *    count, never a cross join; no shuffle until the caller aggregates;
  *  - vocabulary is one token-count shuffle (partial aggs ship counts,
  *    not tokens) + a driver-side top-k that is vocab-sized, then OOV
  *    scoring re-scans map-side against the BROADCAST vocabulary;
  *  - mixing rates derive from a source-cardinality aggregate (rows =
  *    #sources), broadcast back; the sample itself is a map-side
  *    deterministic hash filter — no data ever shuffles.
  */
object CurationOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  // ---- context-window chunking ----

  /** Split each document into fixed-budget token windows with overlap:
    * chunk k covers tokens `[1 + k·step, 1 + k·step + chunkSize)` until the
    * start passes the document's token count (trailing chunks may be
    * short). Returns one row per chunk: every corpus column EXCEPT the
    * text (chunk rows must not replicate whole documents), plus chunk_id,
    * chunk_start, doc_tokens, chunk_tokens, chunk_text. `step = chunkSize
    * - overlap` must be positive.
    *
    * `maxChunksPerDoc` bounds the explode factor of a single row: a
    * pathological multi-GB document would otherwise fan out into an
    * unbounded number of chunk rows inside ONE task (the explode happens
    * before any repartition can spread it). Docs over the cap emit exactly
    * the first `maxChunksPerDoc` chunks; [[chunkOverflow]] is the DLQ-style
    * side channel listing what was truncated. */
  def chunkDocuments(corpus: DataFrame, textCol: String, chunkSize: Int,
      overlap: Int, maxChunksPerDoc: Int = Int.MaxValue): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    require(maxChunksPerDoc > 0, s"need maxChunksPerDoc > 0, got $maxChunksPerDoc")
    val step = chunkSize - overlap
    // last permitted start under the cap: chunk (max-1) starts here
    val lastStart = 1L + (maxChunksPerDoc.toLong - 1L) * step
    val keep = corpus.columns.filterNot(_ == textCol)
    val toks = TextOps.tokens(col(textCol))
    corpus
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 1)
      .withColumn("chunk_start",
        explode(sequence(lit(1L),
          least(col("__n").cast("long"), lit(lastStart)), lit(step.toLong))))
      .select(keep.map(col) ++ Seq(
        ((col("chunk_start") - 1) / step).cast("long").as("chunk_id"),
        col("chunk_start").cast("long"),
        col("__n").cast("long").as("doc_tokens"),
        least(lit(chunkSize), col("__n") - col("chunk_start") + 1)
          .cast("long").as("chunk_tokens"),
        array_join(
          slice(col("__toks"), col("chunk_start").cast("int"), lit(chunkSize)),
          " ").as("chunk_text")): _*)
  }

  /** Side channel for [[chunkDocuments]]' `maxChunksPerDoc` cap: one row
    * per TRUNCATED document (every corpus column except the text, plus
    * doc_tokens, the chunk count the doc would have produced, and the
    * cap), same idiom as the ingest DLQ — the main output stays clean and
    * bounded, the overflow is queryable. */
  def chunkOverflow(corpus: DataFrame, textCol: String, chunkSize: Int,
      overlap: Int, maxChunksPerDoc: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    require(maxChunksPerDoc > 0, s"need maxChunksPerDoc > 0, got $maxChunksPerDoc")
    val step = chunkSize - overlap
    val keep = corpus.columns.filterNot(_ == textCol)
    corpus
      .withColumn("__n", TextOps.tokenCount(col(textCol)))
      .withColumn("n_chunks",
        when(col("__n") >= 1, floor((col("__n") - 1) / step) + 1).otherwise(0L))
      .filter(col("n_chunks") > maxChunksPerDoc)
      .select(keep.map(col) ++ Seq(
        col("__n").as("doc_tokens"),
        col("n_chunks").cast("long"),
        lit(maxChunksPerDoc).cast("long").as("max_chunks_per_doc")): _*)
  }

  /** q70: chunking statistics per source at a 16-token window with 4-token
    * overlap (miniature context-window prep for the synthetic docs). The
    * oracle reproduces the start arithmetic with `range()` AND gates the
    * chunk TEXT itself through `text_witness` — an order-independent
    * per-source sum of an md5-prefix hash of every chunk's text, computed
    * independently by both dialects (DuckDB `list_slice` + md5 vs Spark
    * `slice` + md5) — so a chunk with the right length but the wrong
    * tokens hash-mismatches. */
  val q70DocChunks = QueryDef(
    "q70_doc_chunks",
    """WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |c AS (SELECT doc_id, source, toks, len(toks) AS n,
      |             unnest(range(1, len(toks) + 1, 12)) AS s
      |      FROM t WHERE len(toks) >= 1),
      |x AS (SELECT source, doc_id, n, s,
      |             array_to_string(list_slice(toks, s, s + 15), ' ') AS chunk_text
      |      FROM c)
      |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
      |  CAST(sum(least(16, n - s + 1)) AS BIGINT) AS chunk_tokens,
      |  round(avg(least(16, n - s + 1)), 2) AS avg_chunk_tokens,
      |  CAST(sum(CAST(('0x' || substr(md5(chunk_text), 1, 8)) AS BIGINT)) AS BIGINT)
      |    AS text_witness
      |FROM x GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    chunkDocuments(docs(s, dir), "text", chunkSize = 16, overlap = 4)
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("chunk_tokens"),
        round(avg(col("chunk_tokens")), 2).as("avg_chunk_tokens"),
        sum(conv(substring(md5(col("chunk_text")), 1, 8), 16, 10).cast("long"))
          .as("text_witness"))
      .orderBy(col("source"))
  }

  /** Segment-level exact dedup with document reconstruction — the
    * sub-document dedup pass of web-curation pipelines (repeated
    * boilerplate/quote segments are removed corpus-wide while the
    * documents themselves survive): split every doc into fixed
    * `segTokens`-token segments, keep only the FIRST occurrence of each
    * distinct segment text (ordered by (doc_id, chunk_id)), and rebuild
    * each document from its surviving segments in order.
    *
    * Scale shape: segmentation rides [[chunkDocuments]] (map-side
    * explode), first-occurrence selection is ONE shuffle keyed on the
    * segment text (a window rank, same key a groupBy dedup would use),
    * and reconstruction is one per-doc aggregate. Nothing is quadratic;
    * the segment-text shuffle is the same cardinality the exact-dedup
    * hash-groupBy would carry. */
  def segmentDedup(corpus: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    val segs = chunkDocuments(corpus, textCol, chunkSize = segTokens,
      overlap = 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_text")).orderBy(col(idCol), col("chunk_id"))
    segs.withColumn("__rn", row_number().over(w))
      .withColumn("is_first", (col("__rn") === 1).cast("long"))
      .drop("__rn")
  }

  /** q115: [[segmentDedup]] at 8-token segments, reported per source —
    * documents rebuilt from surviving segments with an order-independent
    * md5 witness over every rebuilt text, so a wrong segment order, a
    * wrongly-kept duplicate, or a wrongly-dropped first occurrence all
    * hash-mismatch. */
  val q115SegmentDedup = QueryDef(
    "q115_segment_dedup",
    """WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |c AS (SELECT doc_id, source, toks, len(toks) AS n,
      |             unnest(range(1, len(toks) + 1, 8)) AS s
      |      FROM t WHERE len(toks) >= 1),
      |seg AS (SELECT doc_id, source, CAST((s - 1) / 8 AS BIGINT) AS chunk_id,
      |          least(8, n - s + 1) AS seg_tokens,
      |          array_to_string(list_slice(toks, s, s + 7), ' ') AS seg_text
      |        FROM c),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY seg_text
      |             ORDER BY doc_id, chunk_id) AS rn FROM seg),
      |rebuilt AS (SELECT doc_id, any_value(source) AS source,
      |    string_agg(seg_text, ' ' ORDER BY chunk_id) AS new_text,
      |    sum(seg_tokens) AS kept_tokens
      |  FROM ranked WHERE rn = 1 GROUP BY doc_id),
      |orig AS (SELECT source, count(DISTINCT doc_id) AS n_docs,
      |    count(*) AS n_segments, CAST(sum(seg_tokens) AS BIGINT) AS n_tokens
      |  FROM seg GROUP BY source),
      |ded AS (SELECT source, count(*) AS n_docs_kept,
      |    CAST(sum(kept_tokens) AS BIGINT) AS kept_tokens,
      |    CAST(sum(CAST(('0x' || substr(md5(new_text), 1, 8)) AS BIGINT)) AS BIGINT)
      |      AS text_witness
      |  FROM rebuilt GROUP BY source)
      |SELECT o.source, o.n_docs, o.n_segments, o.n_tokens,
      |  coalesce(d.n_docs_kept, 0) AS n_docs_kept,
      |  coalesce(d.kept_tokens, 0) AS kept_tokens,
      |  round(coalesce(d.kept_tokens, 0) * 1.0 / o.n_tokens, 4) AS token_retention,
      |  coalesce(d.text_witness, 0) AS text_witness
      |FROM orig o LEFT JOIN ded d ON d.source = o.source
      |ORDER BY o.source""".stripMargin) { (s, dir) =>
    val segs = segmentDedup(docs(s, dir), "doc_id", "text", segTokens = 8)
    val orig = segs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_segments"),
        sum(col("chunk_tokens")).as("n_tokens"))
    val rebuilt = segs.filter(col("is_first") === 1)
      .groupBy(col("doc_id"))
      .agg(first(col("source")).as("source"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          x => x.getField("chunk_text")), " ").as("new_text"),
        sum(col("chunk_tokens")).as("kept_tokens"))
    val ded = rebuilt.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("kept_tokens")).as("kept_tokens"),
        sum(conv(substring(md5(col("new_text")), 1, 8), 16, 10).cast("long"))
          .as("text_witness"))
    orig.join(ded, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_segments"), col("n_tokens"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        round(coalesce(col("kept_tokens"), lit(0L)) * lit(1.0) / col("n_tokens"), 4)
          .as("token_retention"),
        coalesce(col("text_witness"), lit(0L)).as("text_witness"))
      .orderBy(col("source"))
  }

  // ---- tokenizer-prep vocabulary ----

  /** Top-`vocabSize` tokens by global count (count desc, token asc on
    * ties) — the seed vocabulary a tokenizer trainer starts from. One
    * shuffle: the per-token partial counts. */
  def buildVocabulary(corpus: DataFrame, textCol: String,
      vocabSize: Int): DataFrame = {
    corpus
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(vocabSize)
  }

  /** Out-of-vocabulary rate per group against a given vocabulary
    * (broadcast; corpus streams map-side). */
  def oovRate(corpus: DataFrame, textCol: String, groupCol: String,
      vocab: DataFrame): DataFrame = {
    val v = broadcast(vocab.select(col("token"), lit(1L).as("__in_vocab")))
    corpus
      .select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .join(v, Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        round(col("oov_tokens").cast("double") / col("n_tokens"), 4))
  }

  /** q71: 30-token vocabulary over the corpus, then per-language OOV rate
    * — the coverage diagnostic run before committing to a tokenizer. */
  val q71VocabOov = QueryDef(
    "q71_vocab_oov",
    """WITH tok AS (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS token
      |             FROM documents),
      |counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
      |vocab AS (SELECT token FROM counts ORDER BY n DESC, token LIMIT 30)
      |SELECT lang, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
      |  round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
      |    AS oov_rate
      |FROM tok LEFT JOIN vocab v USING (token)
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val d = docs(s, dir)
    oovRate(d, "text", "lang", buildVocabulary(d, "text", 30))
      .orderBy(col("lang"))
  }

  // ---- temperature-based source mixing ----

  /** Deterministic temperature-weighted sampling across sources: source
    * `s` with `n_s` docs gets weight `n_s^alpha / Σ n^alpha` (alpha < 1
    * up-weights small sources — multilingual-mixing practice), a target
    * budget of `fraction · Σ n` docs overall, hence a per-source keep rate
    * `min(1, weight · budget / n_s)`. Rows are kept by the engine-stable
    * md5 bucket of the id — reproducible across engines, layouts and
    * reruns, never `rand()`. Returns per-source (n_docs, keep_rate,
    * n_sampled). */
  def sourceMixPlan(corpus: DataFrame, groupCol: String, idCol: String,
      alpha: Double, fraction: Double): DataFrame = {
    val counts = corpus.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val rates = counts
      .withColumn("__w", pow(col("n_docs").cast("double"), alpha))
      .withColumn("__budget", sum(col("n_docs")).over(w) * fraction)
      .withColumn("keep_rate",
        least(lit(1.0), col("__w") / sum(col("__w")).over(w)
          * col("__budget") / col("n_docs")))
    val sampled = corpus
      .join(broadcast(rates.select(col(groupCol), col("keep_rate"))), Seq(groupCol))
      .filter(TextOps.hashBucket(col(idCol)) <
        floor(col("keep_rate") * 256).cast("int"))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_sampled"))
    rates.select(col(groupCol), col("n_docs"), round(col("keep_rate"), 4).as("keep_rate"))
      .join(sampled, Seq(groupCol), "left")
      .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
  }

  /** q72: alpha=0.5, half-corpus budget over the `source` column. */
  val q72SourceMix = QueryDef(
    "q72_source_mix",
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |r AS (SELECT source, n_docs,
      |        least(1.0, sqrt(n_docs * 1.0) / sum(sqrt(n_docs * 1.0)) OVER ()
      |          * (sum(n_docs) OVER () * 0.5) / n_docs) AS rate
      |      FROM c),
      |kept AS (SELECT d.source, count(*) AS n_sampled
      |         FROM documents d JOIN r ON d.source = r.source
      |         WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)) AS INTEGER)
      |               < CAST(floor(rate * 256) AS INTEGER)
      |         GROUP BY d.source)
      |SELECT r.source, n_docs, round(rate, 4) AS keep_rate,
      |  coalesce(n_sampled, 0) AS n_sampled
      |FROM r LEFT JOIN kept ON r.source = kept.source
      |ORDER BY r.source""".stripMargin) { (s, dir) =>
    sourceMixPlan(docs(s, dir), "source", "doc_id", alpha = 0.5, fraction = 0.5)
      .orderBy(col("source"))
  }

  // ---- quantile-threshold data selection ----

  /** Select the top `fraction` of rows per group by score WITHOUT a global
    * sort — the way quality-threshold selection actually runs at 100 TB:
    *
    *  1. bucketize scores (assumed in [0,1]) into `nBuckets` fixed-width
    *     buckets; one small `(group, bucket) → count` aggregate;
    *  2. a cumulative window over that GROUPS×BUCKETS-sized histogram
    *     finds each group's boundary bucket and how many boundary rows are
    *     still needed; the result broadcasts back;
    *  3. rows strictly above the boundary bucket are selected MAP-SIDE;
    *     only the boundary bucket's rows (≈ 1/nBuckets of the data) pay a
    *     per-group window rank (score desc, id asc) to fill the remainder.
    *
    * The selected set is IDENTICAL to the naive
    * `row_number() OVER (ORDER BY score DESC, id) <= ceil(n·fraction)`
    * per group — buckets are monotone in score, so "all higher buckets +
    * top-of-boundary" IS the global top — which is exactly what the q79
    * oracle proves (it runs the naive formulation; the hash gate pins
    * every selected row). */
  def selectTopFraction(corpus: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, fraction: Double, nBuckets: Int = 1000): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"need fraction in (0,1], got $fraction")
    val scored = corpus.select(col(groupCol), col(idCol), scoreCol.as("score"))
      .withColumn("__b",
        least(floor(col("score") * nBuckets), lit(nBuckets - 1)).cast("int"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__b").desc)
      .rowsBetween(Long.MinValue, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).rowsBetween(Long.MinValue, Long.MaxValue)
    val bounds = scored.groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__target",
        ceil(sum(col("__c")).over(wAll) * fraction).cast("long"))
      .filter(col("__cum") >= col("__target") &&
        col("__cum") - col("__c") < col("__target"))
      .select(col(groupCol), col("__b").as("__bb"),
        (col("__target") - col("__cum") + col("__c")).as("__need"))
    val j = scored.join(broadcast(bounds), Seq(groupCol))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("score").desc, col(idCol))
    val boundary = j.filter(col("__b") === col("__bb"))
      .withColumn("__r", row_number().over(wRank))
      .filter(col("__r") <= col("__need"))
    j.filter(col("__b") > col("__bb"))
      .select(col(groupCol), col(idCol), col("score"))
      .unionByName(boundary.select(col(groupCol), col(idCol), col("score")))
  }

  /** q79: keep the top 25 % of each source by [[TextOps.qualityScore]].
    * The oracle is the NAIVE global-sort selection; hash-matching it is
    * the proof that the histogram path selects the identical rows
    * (id_witness pins exact membership, not just counts). */
  val q79QualitySelect = QueryDef(
    "q79_quality_select",
    """WITH m AS (SELECT source, doc_id,
      |    least(length(regexp_extract_all(text, '\S+')) / 100.0, 1.0) * 0.5 +
      |    (1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |      (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0
      |        / length(text) END) * 0.25 +
      |    least(CASE WHEN length(regexp_extract_all(text, '\S+')) = 0 THEN 0.0 ELSE
      |      len(list_filter(regexp_extract_all(text, '\S+'),
      |          t -> t IN ('the','a','of','and','to','in','is'))) * 1.0
      |        / length(regexp_extract_all(text, '\S+')) END * 5.0, 1.0) * 0.25
      |    AS score FROM documents),
      |r AS (SELECT source, doc_id, score,
      |        row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rn,
      |        count(*) OVER (PARTITION BY source) AS n
      |      FROM m),
      |sel AS (SELECT * FROM r WHERE rn <= CAST(ceil(n * 0.25) AS BIGINT))
      |SELECT source, count(*) AS n_selected,
      |  round(avg(score), 6) AS avg_score,
      |  round(min(score), 6) AS min_score,
      |  CAST(sum(doc_id) AS BIGINT) AS id_witness
      |FROM sel GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    selectTopFraction(docs(s, dir), "source", "doc_id",
      TextOps.qualityScore(col("text")), fraction = 0.25)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        round(avg(col("score")), 6).as("avg_score"),
        round(min(col("score")), 6).as("min_score"),
        sum(col("doc_id")).as("id_witness"))
      .orderBy(col("source"))
  }

  // ---- the end-to-end curation funnel ----

  /** The whole curation pipeline as one report: raw corpus → exact dedup
    * (keep-min-id per content hash) → quality funnel survivors →
    * decontamination against a benchmark set, with per-source doc counts
    * at every stage and the final token-retention ratio. This is the
    * dashboard a data team watches while a crawl becomes a training set.
    *
    * Scale shape: each stage is an already-scale-shaped operator (content
    * hash shuffle; map-side funnel; broadcast benchmark probe); the five
    * stage aggregates are per-source partial-agg bytes joined on a
    * #sources-row key. */
  def curationReport(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val base = corpus.select(col("doc_id"), col("source"), col("text"),
      TextOps.tokenCount(col("text")).as("__nt"))
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col("doc_id"))
    val deduped = base.withColumn("__h", md5(col("text")))
      .withColumn("__rn", row_number().over(wDup))
      .filter(col("__rn") === 1).drop("__h", "__rn")
    val survivors = QualityOps.qualityFunnel(deduped, "text")
      .filter(col("fail_rule").isNull).drop("fail_rule")
    val clean = survivors
      .join(QualityOps.contaminationFlags(survivors, bench)
        .filter(col("contaminated") === 0).select(col("doc_id")), Seq("doc_id"))
    def stage(df: DataFrame, n: String, tok: Option[String]) = {
      val aggs = count(lit(1)).as(n) +:
        tok.map(t => sum(col("__nt")).as(t)).toSeq
      df.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
    }
    stage(base, "n_raw", Some("raw_tokens"))
      .join(stage(deduped, "n_dedup", None), Seq("source"), "left")
      .join(stage(survivors, "n_quality", None), Seq("source"), "left")
      .join(stage(clean, "n_clean", Some("clean_tokens")), Seq("source"), "left")
      .select(col("source"), col("n_raw"), col("raw_tokens"),
        coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_clean"), lit(0L)).as("n_clean"),
        coalesce(col("clean_tokens"), lit(0L)).as("clean_tokens"),
        round(coalesce(col("clean_tokens"), lit(0L)).cast("double") /
          col("raw_tokens"), 4).as("token_retention"))
      .orderBy(col("source"))
  }

  /** q90: the report over `documents` with the q67-style deterministic
    * benchmark slice (`doc_id % 97 = 0`). The oracle re-derives every
    * stage — dedup keys, all four funnel rules, and the 5-gram
    * contamination probe — so a hash match pins the entire pipeline's
    * row-level behavior at once. */
  val q90CurationReport = QueryDef(
    "q90_curation_report",
    """WITH base AS (SELECT doc_id, source, text,
      |    regexp_extract_all(text, '\S+') AS toks FROM documents),
      |ded AS (SELECT * FROM (SELECT base.*, row_number() OVER (
      |          PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM base)
      |        WHERE rn = 1),
      |m AS (SELECT doc_id, source, text, toks, len(toks) AS n,
      |        list_sum(list_transform(toks, t -> len(t))) * 1.0 / len(toks) AS mwl,
      |        len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is')))
      |          * 1.0 / len(toks) AS stop,
      |        1.0 - len(list_distinct(toks)) * 1.0 / len(toks) AS dup
      |      FROM ded),
      |surv AS (SELECT doc_id, source, text, toks FROM m
      |         WHERE n >= 30 AND n <= 90 AND mwl >= 3.0 AND mwl <= 5.0
      |           AND stop >= 0.02 AND dup <= 0.6),
      |sh AS (SELECT doc_id, source, toks,
      |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |                        toks[i+3] || ' ' || toks[i+4]
      |                        for i in range(1, len(toks) - 3)]) AS g
      |       FROM surv WHERE len(toks) >= 5),
      |bsh AS (SELECT doc_id AS b_id,
      |          list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |                         toks[i+3] || ' ' || toks[i+4]
      |                         for i in range(1, len(toks) - 3)]) AS bg
      |        FROM base WHERE doc_id % 97 = 0 AND len(toks) >= 5),
      |flagged AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bsh
      |            ON sh.doc_id != bsh.b_id AND list_has_any(sh.g, bsh.bg)),
      |clean AS (SELECT surv.* FROM surv LEFT JOIN flagged USING (doc_id)
      |          WHERE flagged.doc_id IS NULL),
      |r AS (SELECT source, count(*) AS n_raw,
      |        CAST(sum(len(toks)) AS BIGINT) AS raw_tokens
      |      FROM base GROUP BY source),
      |d AS (SELECT source, count(*) AS n_dedup FROM ded GROUP BY source),
      |q AS (SELECT source, count(*) AS n_quality FROM surv GROUP BY source),
      |c AS (SELECT source, count(*) AS n_clean,
      |        CAST(sum(len(toks)) AS BIGINT) AS clean_tokens
      |      FROM clean GROUP BY source)
      |SELECT r.source, n_raw, raw_tokens,
      |  coalesce(n_dedup, 0) AS n_dedup,
      |  coalesce(n_quality, 0) AS n_quality,
      |  coalesce(n_clean, 0) AS n_clean,
      |  coalesce(clean_tokens, 0) AS clean_tokens,
      |  round(coalesce(clean_tokens, 0) * 1.0 / raw_tokens, 4) AS token_retention
      |FROM r LEFT JOIN d USING (source) LEFT JOIN q USING (source)
      |  LEFT JOIN c USING (source)
      |ORDER BY r.source""".stripMargin) { (s, dir) =>
    val base = docs(s, dir)
    curationReport(base, base.filter(col("doc_id") % 97 === 0))
  }

  // ---- BPE merge-pair counting (tokenizer training primitive) ----

  /** The first iteration of BPE training: count adjacent symbol pairs
    * across the corpus, weighted by word frequency — the statistic whose
    * argmax becomes the next merge rule.
    *
    * Scale shape — the reason BPE training is feasible at 100 TB: ONE
    * corpus-sized shuffle builds the word-frequency table (partial aggs
    * ship counts); every subsequent pair computation runs over the
    * VOCABULARY (distinct words), whose size is corpus-independent. A
    * full trainer loops this: count pairs → pick argmax → re-segment the
    * vocab — never touching the corpus again. */
  def bpeMergePairCounts(corpus: DataFrame, textCol: String,
      topN: Int): DataFrame = {
    val tok = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val chars = regexp_extract_all(col("token"), lit("."), lit(0))
    val n = size(chars)
    val pairs = zip_with(slice(chars, lit(1), n - 1), slice(chars, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    tok.filter(n >= 2)
      .select(col("cnt"), explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topN)
  }

  /** q93: the top-10 first-merge candidates over `documents`. */
  val q93BpeMerges = QueryDef(
    "q93_bpe_merges",
    """WITH tok AS (SELECT token, count(*) AS cnt
      |  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS token
      |        FROM documents) GROUP BY token),
      |ch AS (SELECT cnt, string_split(token, '') AS cs FROM tok),
      |p AS (SELECT cnt, cs[i] || ' ' || cs[i+1] AS pair
      |      FROM ch, LATERAL (SELECT unnest(range(1, len(cs))) AS i)
      |      WHERE len(cs) >= 2)
      |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
      |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 10""".stripMargin) { (s, dir) =>
    bpeMergePairCounts(docs(s, dir), "text", topN = 10)
  }

  // ---- split-leakage audit ----

  /** Audit whether duplicate-content families straddle train/val/test
    * splits: group rows by `contentKey`, keep groups with >1 member, and
    * for each split-assignment strategy count the groups whose members
    * landed in MORE THAN ONE split (= leakage: a model evaluated on test
    * saw the same content in train). Splitting BY ID leaks duplicate
    * families by construction; splitting BY CONTENT KEY provably cannot
    * — the audit quantifies exactly that.
    *
    * Scale shape: one shuffle on the content key; per-group distinct
    * splits are tiny partial aggs. */
  def splitLeakage(corpus: DataFrame, idCol: String,
      contentKey: Column): DataFrame = {
    val assigned = corpus.select(contentKey.as("__k"),
      TextOps.splitAssign(col(idCol)).as("__id_split"))
      .withColumn("__content_split", TextOps.splitAssign(col("__k")))
    val groups = assigned.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"),
        countDistinct(col("__id_split")).as("__d_id"),
        countDistinct(col("__content_split")).as("__d_content"))
      .filter(col("__n") > 1)
    groups.agg(
        count(lit(1)).as("n_dup_groups"),
        sum(when(col("__d_content") > 1, 1L).otherwise(0L)).as("__leak_content"),
        sum(when(col("__d_id") > 1, 1L).otherwise(0L)).as("__leak_id"))
      .select(explode(array(
        struct(lit("by_content").as("method"), col("n_dup_groups"),
          col("__leak_content").as("n_leaking")),
        struct(lit("by_doc_id").as("method"), col("n_dup_groups"),
          col("__leak_id").as("n_leaking")))).as("r"))
      .select(col("r.*"))
      .orderBy(col("method"))
  }

  /** q94: leakage audit with 2-token-prefix families as the duplicate
    * groups (the synthetic corpus has no exact duplicates; shared
    * prefixes stand in for the near-dup families a real crawl has). */
  val q94SplitLeakage = QueryDef(
    "q94_split_leakage",
    """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |a AS (SELECT md5(toks[1] || ' ' || toks[2]) AS k,
      |        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) < 205
      |             THEN 'train'
      |             WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) < 230
      |             THEN 'val' ELSE 'test' END AS id_split
      |      FROM t WHERE len(toks) >= 2),
      |b AS (SELECT k, id_split,
      |        CASE WHEN CAST(('0x' || substr(md5(k), 1, 2)) AS INTEGER) < 205 THEN 'train'
      |             WHEN CAST(('0x' || substr(md5(k), 1, 2)) AS INTEGER) < 230 THEN 'val'
      |             ELSE 'test' END AS content_split
      |      FROM a),
      |g AS (SELECT k, count(*) AS n, count(DISTINCT id_split) AS d_id,
      |        count(DISTINCT content_split) AS d_content
      |      FROM b GROUP BY k HAVING count(*) > 1)
      |SELECT 'by_content' AS method, count(*) AS n_dup_groups,
      |  CAST(sum(CASE WHEN d_content > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaking
      |FROM g
      |UNION ALL
      |SELECT 'by_doc_id', count(*),
      |  CAST(sum(CASE WHEN d_id > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM g
      |ORDER BY method""".stripMargin) { (s, dir) =>
    val toks = TextOps.tokens(col("text"))
    splitLeakage(
      docs(s, dir).filter(size(toks) >= 2),
      "doc_id",
      md5(concat_ws(" ", slice(toks, 1, 2))))
  }

  // ---- content-defined chunking ----

  /** Content-defined chunking: a token ENDS a chunk when its own content
    * hash lands in the boundary bucket (`md5-bucket % 1/p == 0`,
    * p ≈ 1/8 → expected 8-token chunks). Unlike [[chunkDocuments]]'s
    * fixed windows — where one inserted token shifts every later chunk —
    * boundaries here depend only on token content, so an edit disturbs
    * at most its own chunk: the property that makes chunk-level dedup
    * and incremental re-embedding stable under document edits.
    *
    * Scale shape: boundary flags are a pure map; the running boundary
    * count and the in-chunk reassembly shuffle ONCE on doc_id (each
    * doc's tokens land in one task — docs, not the corpus, bound the
    * window size). */
  def contentDefinedChunks(corpus: DataFrame, textCol: String,
      idCols: Seq[String], boundaryMod: Int = 8): DataFrame = {
    val tok = corpus.select(idCols.map(col) :+
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "token")): _*)
    val boundary = (TextOps.hashBucket(col("token")) % boundaryMod === 0)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCols.map(col): _*).orderBy(col("pos"))
      .rowsBetween(Long.MinValue, -1)
    tok
      .withColumn("chunk_id", coalesce(sum(boundary).over(w), lit(0L)))
      .groupBy((idCols :+ "chunk_id").map(col): _*)
      .agg(count(lit(1)).as("chunk_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")), " ").as("chunk_text"))
  }

  /** q96: content-defined chunks over `documents` with the q70-style
    * text witness pinning every chunk's exact reassembled text. */
  val q96ContentChunks = QueryDef(
    "q96_content_chunks",
    """WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      |           FROM documents),
      |tok AS (SELECT doc_id, source, i AS pos, toks[i] AS token
      |        FROM t, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)),
      |f AS (SELECT doc_id, source, pos, token,
      |        CASE WHEN CAST(('0x' || substr(md5(token), 1, 2)) AS INTEGER) % 8 = 0
      |             THEN 1 ELSE 0 END AS b
      |      FROM tok),
      |c AS (SELECT doc_id, source, pos, token,
      |        COALESCE(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      |      FROM f),
      |ch AS (SELECT doc_id, source, chunk_id, count(*) AS n_toks,
      |         md5(string_agg(token, ' ' ORDER BY pos)) AS h
      |       FROM c GROUP BY doc_id, source, chunk_id)
      |SELECT source, count(*) AS n_chunks,
      |  round(avg(n_toks), 2) AS avg_chunk_tokens,
      |  CAST(sum(CAST(('0x' || substr(h, 1, 8)) AS BIGINT)) AS BIGINT)
      |    AS text_witness
      |FROM ch GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    contentDefinedChunks(docs(s, dir), "text", Seq("doc_id", "source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        round(avg(col("chunk_tokens")), 2).as("avg_chunk_tokens"),
        sum(conv(substring(md5(col("chunk_text")), 1, 8), 16, 10).cast("long"))
          .as("text_witness"))
      .orderBy(col("source"))
  }

  /** q121: per-source quota capping — hard-cap every source at N documents,
    * chosen DETERMINISTICALLY (rank by `md5(doc_id)` within source, so the
    * "random" sample is stable across runs, engines and cluster layouts).
    * This is the source-balancing step a mixture pipeline runs when one
    * crawl dominates the corpus: q72/q111 compute the target rates; this
    * operator enforces an absolute per-source ceiling.
    *
    * Scale shape: the only shuffle is the window partition on `source`.
    * Spark's `WindowGroupLimit` rewrite (the `rk <= N` filter over
    * `row_number`) pushes a per-partition top-N BELOW the shuffle, so each
    * map task ships at most N rows per source instead of its whole source
    * slice — the 100 TB cost is O(sources × N), not O(corpus). Low source
    * cardinality therefore never skews the exchange: the heavy lifting is
    * already done map-side. */
  val q121SourceQuota = QueryDef(
    "q121_source_quota",
    """WITH r AS (SELECT source, doc_id,
      |    len(regexp_extract_all(text, '\S+')) AS n_toks,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT source, rk, doc_id, n_toks
      |FROM r WHERE rk <= 15 ORDER BY source, rk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val quota = 15
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_toks"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
      .select(col("source"), col("rk"), col("doc_id"), col("n_toks"))
      .orderBy(col("source"), col("rk"))
  }

  /** q123: token-budget epoch planner — the mixture step that turns
    * per-source corpus statistics into a training-run data plan: given a
    * total token budget (2× the corpus here) split across sources by a
    * quality proxy (each source's share of total characters — denser
    * sources earn larger budgets), emit per source the planned token
    * budget, the implied epoch count (how many passes over that source),
    * and the budget that spills past a 2-epoch repetition cap (chosen so
    * the cap BINDS for above-average-density sources on this corpus —
    * both plan branches are oracle-exercised).
    *
    * Everything is INTEGER arithmetic end-to-end: weights are rational
    * (`chars_s / Σchars` via `div`), so the plan is bit-identical across
    * engines with no float normalization sum (the q111 lesson — cross-
    * source double sums are order-sensitive and not hash-safe). At real
    * corpus scale (10^14 tokens) the `T × chars_s` product needs
    * decimal(38,0); at test scale int64 has 5 orders of margin.
    *
    * Scale shape: one partial-aggregated groupBy(source) — rows out =
    * #sources — then per-row arithmetic on that tiny frame; the corpus is
    * scanned once, map-side. */
  val q123EpochPlan = QueryDef(
    "q123_epoch_plan",
    """WITH s AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_toks,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS toks_total,
      |               CAST(sum(n_chars) AS BIGINT) AS chars_total FROM s),
      |p AS (SELECT source, n_docs, n_toks, n_chars,
      |    (2 * toks_total * n_chars) // chars_total AS planned_toks
      |  FROM s, tot)
      |SELECT source, n_docs, n_toks,
      |  planned_toks,
      |  least(planned_toks, 2 * n_toks) AS granted_toks,
      |  planned_toks - least(planned_toks, 2 * n_toks) AS spilled_toks,
      |  (least(planned_toks, 2 * n_toks) * 1000) // n_toks AS epochs_1e3
      |FROM p ORDER BY source""".stripMargin) { (s, dir) =>
    val stats = docs(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text"))).as("n_toks"),
        sum(col("n_chars")).as("n_chars"))
    val tot = stats.agg(sum(col("n_toks")).as("toks_total"),
      sum(col("n_chars")).as("chars_total"))
    stats.crossJoin(broadcast(tot))
      .withColumn("planned_toks",
        expr("(2 * toks_total * n_chars) div chars_total"))
      .withColumn("granted_toks", least(col("planned_toks"), col("n_toks") * 2))
      .select(col("source"), col("n_docs"), col("n_toks"), col("planned_toks"),
        col("granted_toks"),
        (col("planned_toks") - col("granted_toks")).as("spilled_toks"),
        expr("(granted_toks * 1000) div n_toks").as("epochs_1e3"))
      .orderBy(col("source"))
  }

  /** q154: CURRICULUM ORDERING — assign every document a deterministic
    * training position that interleaves difficulty bands (the curriculum-
    * learning data-ordering step: each consecutive window of the epoch
    * sees the full easy→hard spectrum instead of all-easy-then-all-hard).
    * Difficulty proxy = scaled mean word length; band boundaries are the
    * exact 25/50/75 % quantiles (both engines use the same R-7 linear
    * interpolation; the scaled-integer domain makes the interpolated
    * boundaries exact quarters, so `>` comparisons are float-safe); a
    * document's position is `(rank-within-band − 1) × 4 + band`, unique
    * by construction.
    *
    * Scale shape: the classic stats-pass + apply-pass pair (as in
    * q121/q122): one corpus scan feeds the exact-quantile aggregate, a
    * second scans for banding with the ONE-ROW boundary frame broadcast
    * back (never a corpus shuffle); banding itself is a map-side CASE. The
    * within-band rank is the one inherently sequential piece (a training
    * ORDER is a global prefix anyway) — expressed as a 4-way-parallel
    * window here; at 100 TB the same positions come from per-partition
    * counts + prefix-sum offsets (the zipWithIndex pattern), same
    * semantics, no single-task window. */
  val q154Curriculum = QueryDef(
    "q154_curriculum",
    """WITH d AS (SELECT doc_id,
      |    CAST(floor(100.0 * n_chars /
      |      (1 + length(text) - length(replace(text, ' ', '')))) AS BIGINT)
      |      AS diff
      |  FROM documents),
      |q AS (SELECT quantile_cont(diff, 0.25) AS q1,
      |             quantile_cont(diff, 0.50) AS q2,
      |             quantile_cont(diff, 0.75) AS q3 FROM d),
      |b AS (SELECT doc_id,
      |    1 + CAST(diff > q1 AS INT) + CAST(diff > q2 AS INT)
      |      + CAST(diff > q3 AS INT) AS band
      |  FROM d, q),
      |r AS (SELECT doc_id, band,
      |    row_number() OVER (PARTITION BY band ORDER BY doc_id) AS rn
      |  FROM b)
      |SELECT CAST((rn - 1) * 4 + band AS BIGINT) AS epoch_pos,
      |  CAST(band AS INT) AS band, doc_id
      |FROM r ORDER BY epoch_pos LIMIT 40""".stripMargin) { (s, dir) =>
    val d = docs(s, dir).select(col("doc_id"),
      floor(lit(100.0) * col("n_chars") /
        (lit(1) + length(col("text")) -
          length(expr("replace(text, ' ', '')")))).as("diff"))
    val q = d.agg(
      expr("percentile(diff, 0.25)").as("q1"),
      expr("percentile(diff, 0.50)").as("q2"),
      expr("percentile(diff, 0.75)").as("q3"))
    val banded = d.crossJoin(broadcast(q))
      .select(col("doc_id"),
        (lit(1) + (col("diff") > col("q1")).cast("int")
          + (col("diff") > col("q2")).cast("int")
          + (col("diff") > col("q3")).cast("int")).as("band"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band")).orderBy(col("doc_id"))
    banded
      .withColumn("rn", row_number().over(w))
      .select(((col("rn") - 1) * 4 + col("band")).cast("long").as("epoch_pos"),
        col("band").cast("int").as("band"), col("doc_id"))
      .orderBy(col("epoch_pos")).limit(40)
  }

  // ---- sequence packing (concat-and-chunk training batches) ----

  /** Pack documents into fixed-token-budget training sequences, the
    * concat-and-chunk scheme production packers use (documents
    * concatenate in a deterministic order and the stream is cut every
    * `budget` tokens; a document may straddle a cut): each doc is
    * assigned the sequence its FIRST token falls in, with its offset.
    * Packing is PARTITION-LOCAL by a hash bucket of the id — each bucket
    * packs its own stream — so the operator needs no global sort and no
    * single-task window at any corpus size: one shuffle on (bucket),
    * windows within. Returns (id, bucket, seq_id, pos_in_seq,
    * offset_in_seq, tokens). Token counts come from the caller (an
    * upstream counting pass — q26's operators); any deterministic
    * per-doc cost works. */
  def packSequences(corpus: DataFrame, idCol: String, tokensCol: String,
      budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
    corpus
      .select(col(idCol), col(tokensCol).cast("long").as("tokens"))
      .withColumn("bucket", pmod(xxhash64(col(idCol)), lit(buckets)).cast("int"))
      .withColumn("__cum", sum(col("tokens")).over(w))
      .withColumn("seq_id", ((col("__cum") - col("tokens")) / budget)
        .cast("long"))
      .withColumn("offset_in_seq",
        (col("__cum") - col("tokens")) % budget)
      .withColumn("pos_in_seq", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket"), col("seq_id")).orderBy(col(idCol)))
        .cast("long"))
      .select(col(idCol), col("bucket"), col("seq_id"), col("pos_in_seq"),
        col("offset_in_seq"), col("tokens"))
  }

  /** q156: SEQUENCE PACKING assignment surface — the per-doc half that
    * complements q68's per-language packing ACCOUNTING
    * ([[QualityOps.q68SequencePacking]] rolls up seq counts; this
    * operator materializes what a packing WRITER actually consumes:
    * each doc's (sequence, position, token offset) plus
    * boundary-straddler accounting, exposed as the reusable
    * [[packSequences]]). Token cost = ceil(n_chars/4) (the standard
    * chars-per-token heuristic; a real deployment feeds tokenizer
    * counts), budget 2048, 8 buckets. Every quantity the DuckDB oracle
    * recomputes with the same window-function arithmetic, so packing
    * semantics are hash-gated. Scale: ONE shuffle on bucket + windows
    * within; the final 8-row rollup is the only global step. */
  val q156SequencePacking = QueryDef(
    "q156_sequence_packing",
    """WITH t AS (SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS tokens,
      |    CAST(doc_id % 8 AS INT) AS bucket FROM documents),
      |c AS (SELECT doc_id, tokens, bucket,
      |    sum(tokens) OVER (PARTITION BY bucket ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t),
      |p AS (SELECT doc_id, tokens, bucket,
      |    CAST(floor((cum - tokens) / 2048.0) AS BIGINT) AS seq_id,
      |    (cum - tokens) % 2048 AS off,
      |    cum FROM c)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(tokens) AS BIGINT) AS total_tokens,
      |  CAST(max(seq_id) + 1 AS BIGINT) AS n_sequences,
      |  CAST(sum(CASE WHEN off + tokens > 2048 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_straddlers,
      |  max(tokens) AS max_doc_tokens
      |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    // DuckDB's hash() differs from xxhash64 — the ORACLE's bucket
    // function must be reproduced exactly, so the Spark side uses the
    // same abs(hash)-free formulation: DuckDB hash(BIGINT) is not
    // portable either, so both sides bucket by doc_id % 8 instead
    val packed = packSequencesByModulo(docs(s, dir)
      .select(col("doc_id"),
        ceil(col("n_chars") / lit(4.0)).cast("long").as("tokens")),
      "doc_id", "tokens", budget = 2048L, buckets = 8)
    packed
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        (max(col("seq_id")) + 1).cast("long").as("n_sequences"),
        sum(when(col("offset_in_seq") + col("tokens") > 2048L, 1L)
          .otherwise(0L)).as("n_straddlers"),
        max(col("tokens")).as("max_doc_tokens"))
      .orderBy(col("bucket"))
  }

  /** [[packSequences]] with a MODULO bucket (oracle-portable — hash
    * functions differ across engines; semantics identical). */
  def packSequencesByModulo(corpus: DataFrame, idCol: String,
      tokensCol: String, budget: Long, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
    corpus
      .select(col(idCol), col(tokensCol).cast("long").as("tokens"))
      .withColumn("bucket", pmod(col(idCol), lit(buckets)).cast("int"))
      .withColumn("__cum", sum(col("tokens")).over(w))
      .withColumn("seq_id", floor((col("__cum") - col("tokens")) / lit(budget.toDouble))
        .cast("long"))
      .withColumn("offset_in_seq",
        (col("__cum") - col("tokens")) % budget)
      .withColumn("pos_in_seq", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket"), col("seq_id")).orderBy(col(idCol)))
        .cast("long"))
      .select(col(idCol), col("bucket"), col("seq_id"), col("pos_in_seq"),
        col("offset_in_seq"), col("tokens"))
  }

  val all: Seq[QueryDef] = Seq(q70DocChunks, q71VocabOov, q72SourceMix,
    q79QualitySelect, q90CurationReport, q93BpeMerges, q94SplitLeakage,
    q96ContentChunks, q115SegmentDedup, q121SourceQuota, q123EpochPlan,
    q154Curriculum, q156SequencePacking)
}
