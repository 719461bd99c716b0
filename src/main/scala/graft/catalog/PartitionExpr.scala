package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-based storage partitioning.
  *
  * Behavior contract (reference: ingestor/DucklakeTableManager.java:207-219,
  * config parse connect/DucklakeSinkConfig.java:365-379): a partition spec is
  * a list of raw column names and/or `year(col)` / `month(col)` / `day(col)`
  * expressions. Spark realization: generated partition columns (`__p_*`)
  * computed at write time and used with `partitionBy`, giving Hive-style
  * directory layout and free partition pruning on read.
  */
sealed trait PartitionExpr {
  /** Source column the expression reads (first, when several). */
  def column: String
  /** ALL source columns the expression reads — guards (drop/rename/clone
    * consistency) must check every one, not just the first. */
  def sourceColumns: Seq[String] = Seq(column)
  /** Name of the generated partition column. */
  def outputName: String
  /** The Spark expression that computes the partition value. */
  def toColumn: Column
}

object PartitionExpr {
  final case class Raw(column: String) extends PartitionExpr {
    val outputName = s"__p_$column"
    def toColumn: Column = col(column)
  }
  final case class Year(column: String) extends PartitionExpr {
    val outputName = s"__p_year_$column"
    def toColumn: Column = year(col(column))
  }
  final case class Month(column: String) extends PartitionExpr {
    val outputName = s"__p_month_$column"
    def toColumn: Column = month(col(column))
  }
  final case class Day(column: String) extends PartitionExpr {
    val outputName = s"__p_day_$column"
    def toColumn: Column = dayofmonth(col(column))
  }
  /** `bucket(n, c1[, c2…])` — hash bucketing: `pmod(murmur3(c1,…), n)`,
    * Spark's own deterministic hash, so the bucket of a key is stable
    * across writes, sessions and cluster sizes. A bucket layout over the
    * table's PRIMARY KEY is the steady-state MERGE fast path: a row's
    * bucket is a pure function of its key, so an upsert flush reads and
    * rewrites exactly the buckets its batch keys hash into (bucket
    * pruning via the ordinary partition machinery — the bucket id rides
    * in the manifest's directory component) and the per-flush cost tracks
    * the BATCH, never the table. The reference gets the equivalent from
    * PK-indexed MERGE scans inside DuckDB (DucklakeWriter.java:151-168);
    * a 100 TB Spark table needs the layout to carry that locality. */
  final case class Bucket(n: Int, columns: Seq[String]) extends PartitionExpr {
    require(n > 0, s"bucket count must be positive, got $n")
    require(columns.nonEmpty, "bucket() needs at least one source column")
    def column: String = columns.head
    override def sourceColumns: Seq[String] = columns
    val outputName = s"__p_bucket_${n}_${columns.mkString("_")}"
    def toColumn: Column = pmod(hash(columns.map(col): _*), lit(n))
  }

  private val FnPattern = """(?i)^(year|month|day)\s*\(\s*([^)]+?)\s*\)$""".r
  private val BucketPattern = """(?i)^bucket\s*\(\s*(\d+)\s*,\s*([^)]+?)\s*\)$""".r

  /** Parse `"year(created_at)"`, `"month(ts)"`, `"day(ts)"`,
    * `"bucket(16, id)"` (multi-column: `"bucket(16, a, b)"`), or a raw
    * column name. */
  def parse(spec: String): PartitionExpr = spec.trim match {
    case BucketPattern(n, cols) =>
      Bucket(n.toInt,
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    case FnPattern(fn, c) => fn.toLowerCase match {
      case "year" => Year(c)
      case "month" => Month(c)
      case "day" => Day(c)
    }
    case raw if raw.nonEmpty && !raw.contains("(") => Raw(raw)
    case other => throw new IllegalArgumentException(
      s"Unsupported partition expression: '$other' (column | year(c) | " +
        "month(c) | day(c) | bucket(n, c…))")
  }

  /** Split a comma-separated partition-spec STRING into specs, respecting
    * parentheses — `"bucket(16, id), year(ts)"` is two specs, not three.
    * The SQL `partitions` table property and config strings route here. */
  def splitSpecs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  def parseList(specs: Seq[String]): Seq[PartitionExpr] = specs.map(parse)
}
