package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central collection of every [[QueryDef]] the engine exposes. */
object Registry {
  def defs: Seq[QueryDef] =
    operators.RelationalOps.all ++ operators.RelationalOps2.all ++
      operators.RelationalOps3.all ++ operators.IngestOps.all ++
      operators.PipelineOps.all ++ operators.MergeSqlOps.all ++
      operators.SessionOps.all ++ operators.AnalyticsOps.all ++
      operators.TextOps.all ++ operators.QualityOps.all ++
      operators.CurationOps.all ++ operators.PrivacyOps.all ++
      operators.DedupOps.all ++ operators.SimilarityOps.all ++
      operators.MultimodalOps.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  lazy val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
