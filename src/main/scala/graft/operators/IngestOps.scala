package graft.operators

import graft.{QueryDef, Tables}
import graft.schema.SchemaInference
import org.apache.spark.sql.functions._

/** Queries that exercise the ingestion core (schema inference, schemaless
  * decode) end-to-end through the driver contract. */
object IngestOps {

  /** Schemaless JSON ingestion: infer the props schema distributed (map +
    * treeAggregate through the unification lattice — SURVEY §1.3.1-2), then
    * parse with `from_json` under the inferred schema and aggregate.
    *
    * Scale: inference pass ships only StructTypes to the driver (O(log n)
    * tree merge); the parse is codegen'd `from_json`, no UDF. */
  val q17InferProps = QueryDef(
    "q17_infer_props",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val inferred = SchemaInference
      .inferSchemaDistributed(ev.select($"props".as[String]))
      .getOrElse(throw new IllegalStateException("no schema inferable from props"))
    ev.select(from_json(col("props"), inferred).as("p"))
      .select((col("p.k") % 10).as("bucket"), col("p.k").as("k"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("bucket"))
  }

  val all: Seq[QueryDef] = Seq(q17InferProps)
}
