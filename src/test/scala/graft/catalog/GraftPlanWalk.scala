package graft.catalog

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}

/** Test helper: walk an EXECUTED physical plan through the boundaries a
  * plain `collect()` cannot cross — [[AdaptiveSparkPlanExec]] keeps its
  * final plan and [[QueryStageExec]] its materialized subtree as FIELDS,
  * not children — and sum the `numFiles` metric of every v1 file scan.
  * Run the query first; the metric is populated at execution. */
object GraftPlanWalk {
  def v1ScannedFiles(p: SparkPlan): Long = p match {
    case a: AdaptiveSparkPlanExec => v1ScannedFiles(a.executedPlan)
    case q: QueryStageExec => v1ScannedFiles(q.plan)
    case f: FileSourceScanExec =>
      // count DATA scans only — the DV anti-join's sidecar read is its
      // own (tiny) v1 parquet scan under `_dv/`
      if (f.relation.location.rootPaths.exists(_.toString.contains("/_dv")))
        0L
      else f.metrics("numFiles").value
    case other => other.children.map(v1ScannedFiles).sum
  }
}
