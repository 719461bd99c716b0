package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileStatusWithMetadata,
  InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** V1 file index over an EXPLICIT manifest file set with planning-time
  * manifest-bounds skipping: `listFiles` receives the data filters the
  * planner pushed into the scan ([[org.apache.spark.sql.execution
  * .FileSourceScanExec]] forwards them on every v1 file-source read) and
  * drops the files `keepFor` proves irrelevant — the same skipping the
  * DSv2 catalog path gets from [[PruningScanBuilder]], but on the v1
  * read stack, where the hidden `_metadata` columns resolve (Spark's v2
  * `FileTable` does not implement `SupportsMetadataColumns`).
  *
  * This is what lets the merge-on-read deletion-vector plan KEEP file
  * skipping: the DV anti-join needs `_metadata.row_index` (v1-only), and
  * a selective predicate over a DV-carrying table must still plan a task
  * set proportional to the matching key range, not the table. Pruning
  * stays invisible in results — the row-level filter runs after the scan;
  * an over-kept file only costs I/O, and a DV entry of a pruned file
  * simply never matches the anti-join.
  *
  * Lives in `org.apache.spark.sql` because the v1 datasource internals
  * ([[InMemoryFileIndex]], [[PartitionDirectory]]) are spark-private.
  */
final class GraftPruningFileIndex(
    spark: SparkSession,
    files: Seq[Path],
    parameters: Map[String, String],
    userSpecifiedSchema: Option[StructType],
    keepFor: Seq[Expression] => Option[FileStatusWithMetadata => Boolean])
  extends InMemoryFileIndex(spark, files, parameters, userSpecifiedSchema) {

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    keepFor(dataFilters) match {
      case None => base
      case Some(keep) =>
        // an all-pruned scan is legal on the v1 stack: an empty partition
        // list plans an empty RDD (unlike the v2 path, which must keep
        // one file because ParquetTable can't express an empty relation)
        base.map(pd => pd.copy(files = pd.files.filter(keep)))
          .filter(_.files.nonEmpty)
    }
  }
}
