package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownAggregates, SupportsPushDownRequiredColumns,
  SupportsPushDownVariantExtractions, VariantExtraction}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Scan builder that applies MANIFEST-LEVEL file skipping to the DSv2
  * catalog read path: when the optimizer pushes its data filters
  * ([[SupportsPushDownCatalystFilters]] — the first pushdown step), the
  * `rebuild` callback lowers them against the lake manifest's per-file
  * bounds; if files can be proven irrelevant the inner builder is swapped
  * for one over the PRUNED file list, and every later pushdown step
  * (column pruning, aggregate pushdown, build) delegates to it. The SQL
  * surface thus plans `WHERE ts > X` over only the matching files — the
  * same skipping [[graft.catalog.GraftLake.readWhere]] gives the
  * programmatic API — while row-level filtering still runs after the scan
  * (pruning stays invisible in results, it only cuts I/O).
  *
  * Lives in `org.apache.spark.sql` because the catalyst-filter pushdown
  * interface is `private[sql]`-adjacent (`sql.internal.connector`).
  */
final class PruningScanBuilder(
    initial: ScanBuilder,
    rebuild: Seq[Expression] => Option[ScanBuilder])
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  private var inner: ScanBuilder = initial

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    rebuild(filters).foreach(inner = _)
    inner match {
      case f: SupportsPushDownCatalystFilters => f.pushFilters(filters)
      case _ => filters
    }
  }

  override def pushedFilters(): Array[Predicate] = inner match {
    case f: SupportsPushDownCatalystFilters => f.pushedFilters
    case _ => Array.empty
  }

  override def pruneColumns(requiredSchema: StructType): Unit = inner match {
    case c: SupportsPushDownRequiredColumns => c.pruneColumns(requiredSchema)
    case _ => ()
  }

  override def pushAggregation(aggregation: Aggregation): Boolean = inner match {
    case a: SupportsPushDownAggregates => a.pushAggregation(aggregation)
    case _ => false
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner match {
      case a: SupportsPushDownAggregates => a.supportCompletePushDown(aggregation)
      case _ => false
    }

  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] = inner match {
    case v: SupportsPushDownVariantExtractions => v.pushVariantExtractions(extractions)
    case _ => Array.fill(extractions.length)(false)
  }

  override def build(): Scan = inner.build()
}
