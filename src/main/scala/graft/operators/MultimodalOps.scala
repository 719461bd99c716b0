package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * executor-side functions.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake that derives metadata from the
  * byte stream — but the Spark-side plumbing is real: binary columns flow
  * through the scan, the decode runs per-partition over iterator batches
  * (the Scala analog of `mapInPandas` — no per-row driver involvement, no
  * boxing beyond the row itself), and downstream ops are plain columnar
  * aggregation. Swap [[fakeDecode]] with a real codec call and nothing
  * else changes.
  */
object MultimodalOps {

  /** Decoded media metadata (the typed side of a multimodal column). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      channels: Int, n_frames: Long)

  /** STUB decode — deterministic metadata from the payload size. A real
    * implementation would parse the container/codec header here. */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = (64 + n % 577).toInt,
      height = (64 + (n * 31) % 419).toInt,
      channels = (1 + n % 3).toInt,
      n_frames = (n + 255) / 256)
  }

  /** Batched decode over (id, payload) — executor-side, partition-local. */
  def decodeBatch(df: DataFrame, spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
  }

  /** Frame sampling: every `stride`-th fixed-size byte window of the
    * payload becomes a "frame" row (explode stays columnar; the slice runs
    * in codegen). */
  def sampleFrames(df: DataFrame, frameSize: Int, stride: Int): DataFrame =
    df.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(floor((length(col("payload")) - 1) / (frameSize * stride)).cast("int"),
            lit(0))),
        i => substring(col("payload"), (i * frameSize * stride + 1).cast("int"), lit(frameSize))))
        .as(Seq("frame_idx", "frame")))

  // ---- driver-facing query ----

  /** Multimodal pipeline over a synthesized binary column (documents.text
    * encoded to bytes — deterministic, so the stubbed decode is
    * DuckDB-checkable end-to-end): binary scan → batched decode →
    * aggregation of typed metadata per source. */
  val q33Multimodal = QueryDef(
    "q33_multimodal",
    """WITH m AS (SELECT source, octet_length(encode(text)) AS n,
      |             CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS frames
      |           FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS total_bytes,
      |  round(avg(64 + n % 577), 2) AS avg_width,
      |  round(avg(64 + (n * 31) % 419), 2) AS avg_height,
      |  CAST(sum(frames) AS BIGINT) AS total_frames
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))
    val meta = decodeBatch(docs, s).toDF()
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    meta.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 2).as("avg_width"),
        round(avg(col("height")), 2).as("avg_height"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("source"))
  }

  /** Frame sampling on the gate: fixed-size byte windows of the payload,
    * counted and content-hashed per source (ASCII text payloads make byte
    * and character slicing coincide, so DuckDB can verify the exact frame
    * hashes). */
  val q34FrameSample = QueryDef(
    "q34_frame_sample",
    """WITH f AS (
      |  SELECT source, doc_id,
      |    md5(substring(text, (i - 1) * 256 + 1, 256)) AS fh
      |  FROM documents,
      |    LATERAL (SELECT unnest(range(1,
      |      CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) + 1)) AS i)
      |  WHERE doc_id < 100)
      |SELECT source, count(*) AS n_frames,
      |  count(DISTINCT fh) AS n_unique_frames
      |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))
    sampleFrames(docs, frameSize = 256, stride = 1)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), md5(col("frame").cast("string")).as("fh"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_frames"), countDistinct(col("fh")).as("n_unique_frames"))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(q33Multimodal, q34FrameSample)
}
