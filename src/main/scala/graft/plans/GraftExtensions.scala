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
  *  - [[RewriteGraftMerge]] — `MERGE INTO graft.t USING ... ON ...` routes
  *    into the engine's merge write path (the reference's headline
  *    operator, ingestor/DucklakeWriter.java:151-168, as literal SQL).
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => RewriteGraftMerge)
  }
}
