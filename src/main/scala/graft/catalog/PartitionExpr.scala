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
  /** Source column the expression reads. */
  def column: String
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

  private val FnPattern = """(?i)^(year|month|day)\s*\(\s*([^)]+?)\s*\)$""".r

  /** Parse `"year(created_at)"`, `"month(ts)"`, `"day(ts)"`, or a raw
    * column name. */
  def parse(spec: String): PartitionExpr = spec.trim match {
    case FnPattern(fn, c) => fn.toLowerCase match {
      case "year" => Year(c)
      case "month" => Month(c)
      case "day" => Day(c)
    }
    case raw if raw.nonEmpty => Raw(raw)
    case _ => throw new IllegalArgumentException(s"Empty partition expression: '$spec'")
  }

  def parseList(specs: Seq[String]): Seq[PartitionExpr] = specs.map(parse)
}
