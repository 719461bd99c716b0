package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: detect and redact emails,
  * URLs, IPv4 addresses and phone numbers — the minimum scrub pass every
  * LLM data pipeline runs before training.
  *
  * Scale shape (100 TB): redaction is a PURE MAP — four codegen'd
  * `regexp_replace`/`regexp_extract_all` passes per row, no shuffle, no
  * UDF; the scan parallelism is the only knob that matters. Patterns are
  * deliberately RE2-compatible (no backreferences or lookaround) so the
  * same regexes run identically on Spark (java.util.regex) and any
  * RE2-based engine — which is also what lets DuckDB oracle-check the
  * redacted TEXT, not just the counts.
  */
object PrivacyOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** (pattern, replacement) in application order. Order matters and is
    * part of the contract: URLs first (an email- or IP-shaped substring
    * inside a URL belongs to the URL), then emails, then IPs, then
    * phones (which require a leading `+` so they can never eat an IP). */
  val Rules: Seq[(String, String, String)] = Seq(
    ("url", "https?://\\S+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d[\\d\\- ]{7,}\\d", "<PHONE>"))

  /** Adds `n_<kind>` match-count columns and a `redacted_text` column.
    * Counts are taken on the progressively redacted text (each kind sees
    * the previous kinds' replacements), so one character span is counted
    * and redacted exactly once. */
  def redactPii(corpus: DataFrame, textCol: String): DataFrame = {
    val (out, counts) = Rules.foldLeft((col(textCol), Seq.empty[Column])) {
      case ((txt, cs), (kind, pat, repl)) =>
        (regexp_replace(txt, pat, repl),
          cs :+ size(regexp_extract_all(txt, lit(pat), lit(0)))
            .cast("long").as(s"n_$kind"))
    }
    corpus.select(corpus.columns.map(col) ++ counts :+
      out.as("redacted_text"): _*)
  }

  /** q73: the synthetic docs carry no PII, so the query plants a
    * DETERMINISTIC doc_id-derived contact line (email + URL + IP + phone)
    * on every document — both dialects build the identical string — then
    * redacts and aggregates per source. `text_witness` (order-independent
    * md5-prefix sum of the redacted text, q70's idiom) makes the gate
    * fail if any dialect redacts a single character differently. */
  val q73PiiRedact = QueryDef(
    "q73_pii_redact",
    """WITH inj AS (SELECT doc_id, source,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |    '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com or https://site' ||
      |    CAST(doc_id AS VARCHAR) || '.example/p?q=1 from 10.0.' ||
      |    CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ||
      |    ' call +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
      |    AS text FROM documents),
      |r AS (SELECT doc_id, source,
      |    len(regexp_extract_all(text, 'https?://\S+')) AS n_url,
      |    regexp_replace(text, 'https?://\S+', '<URL>', 'g') AS t1
      |  FROM inj),
      |r2 AS (SELECT doc_id, source, n_url,
      |    len(regexp_extract_all(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |    regexp_replace(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t2
      |  FROM r),
      |r3 AS (SELECT doc_id, source, n_url, n_email,
      |    len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
      |    regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t3
      |  FROM r2),
      |r4 AS (SELECT doc_id, source, n_url, n_email, n_ip,
      |    len(regexp_extract_all(t3, '\+\d[\d\- ]{7,}\d')) AS n_phone,
      |    regexp_replace(t3, '\+\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS redacted
      |  FROM r3)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_email) AS BIGINT) AS emails,
      |  CAST(sum(n_url) AS BIGINT) AS urls,
      |  CAST(sum(n_ip) AS BIGINT) AS ips,
      |  CAST(sum(n_phone) AS BIGINT) AS phones,
      |  CAST(sum(CAST(('0x' || substr(md5(redacted), 1, 8)) AS BIGINT)) AS BIGINT)
      |    AS text_witness
      |FROM r4 GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val injected = docs(s, dir).select(col("doc_id"), col("source"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"),
        lit(".com or https://site"), col("doc_id").cast("string"),
        lit(".example/p?q=1 from 10.0."), (col("doc_id") % 200).cast("string"),
        lit("."), (col("doc_id") % 250).cast("string"),
        lit(" call +1 555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0")).as("text"))
    redactPii(injected, "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email")).as("emails"),
        sum(col("n_url")).as("urls"),
        sum(col("n_ip")).as("ips"),
        sum(col("n_phone")).as("phones"),
        sum(conv(substring(md5(col("redacted_text")), 1, 8), 16, 10)
          .cast("long")).as("text_witness"))
      .orderBy(col("source"))
  }

  /** q127: k-anonymity audit — the release-governance check a training-data
    * pipeline runs before publishing corpus metadata: treat
    * (source, lang, length-bucket) as the quasi-identifier, group the
    * corpus by it, and report per source how many quasi-identifier groups
    * fall below k=3 members ("violating") and how many documents sit in
    * them ("risky" — re-identifiable by the combination alone). The
    * len-bucket generalization (`n_chars div 100`) is the standard
    * k-anonymity coarsening step; the audit tells the publisher whether
    * it was coarse enough.
    *
    * Everything is integer arithmetic — counts of counts — so the audit is
    * bit-identical across engines.
    *
    * Scale shape: one partial-aggregated groupBy to quasi-identifier
    * groups (rows = distinct combos, corpus-independent), then per-source
    * rollup of that tiny frame; the corpus is scanned once, map-side. */
  val q127KAnonymity = QueryDef(
    "q127_k_anonymity",
    """WITH b AS (SELECT doc_id, source, lang, n_chars // 100 AS len_bucket
      |  FROM documents),
      |g AS (SELECT source, lang, len_bucket, CAST(count(*) AS BIGINT) AS c
      |  FROM b GROUP BY 1, 2, 3)
      |SELECT source,
      |  CAST(sum(c) AS BIGINT) AS n_docs,
      |  count(*) AS n_groups,
      |  CAST(sum(CASE WHEN c < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating_groups,
      |  CAST(sum(CASE WHEN c < 3 THEN c ELSE 0 END) AS BIGINT)
      |    AS n_risky_docs,
      |  CAST(min(c) AS BIGINT) AS min_group_size
      |FROM g GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val g = Tables.documents(s, dir)
      .groupBy(col("source"), col("lang"),
        expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("c"))
    g.groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_groups"),
        sum(when(col("c") < 3, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("c") < 3, col("c")).otherwise(0L)).as("n_risky_docs"),
        min(col("c")).as("min_group_size"))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(q73PiiRedact, q127KAnonymity)
}
