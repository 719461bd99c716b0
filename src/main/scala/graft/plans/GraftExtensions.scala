package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions that make graft's DML surface reachable from plain
  * SQL. Register at session build time, the same way Delta/Iceberg require:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", classOf[GraftExtensions].getName)
  *   // or .withExtensions(new GraftExtensions)
  * }}}
  *
  * Injected rules:
  *  - [[RewriteGraftMerge]] — literal `MERGE INTO` (the reference's
  *    headline operator, ingestor/DucklakeWriter.java:151-168), plus
  *    `UPDATE` and `DELETE FROM`, all routed into the engine's
  *    partition-scoped copy-on-write rewrites.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => RewriteGraftMerge)
  }
}
