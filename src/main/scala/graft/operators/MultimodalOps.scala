package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * executor-side functions.
  *
  * [[decodeHeader]] performs a REAL pure-JVM container-header parse for
  * PNG (IHDR) and WAV (RIFF fmt/data); payloads in no known container fall
  * back to a deterministic byte-stream stub (full pixel/sample decode
  * would need codec libraries absent from this environment). The
  * Spark-side plumbing is real either way: binary columns flow through
  * the scan, the decode runs per-partition over iterator batches (the
  * Scala analog of `mapInPandas` — no per-row driver involvement), and
  * downstream ops are plain columnar aggregation.
  */
object MultimodalOps {

  /** Decoded media metadata (the typed side of a multimodal column). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      channels: Int, n_frames: Long)

  /** Real header decode (pure JVM, no codec libraries): PNG IHDR and WAV
    * RIFF headers are parsed for actual metadata; any other payload falls
    * back to [[fakeDecode]]'s deterministic byte-stream metadata, keeping
    * text-shaped corpora oracle-checkable. Full pixel/sample decode would
    * need codec libraries absent from this environment — the header layer
    * is the honest real part. */
  def decodeHeader(id: Long, bytes: Array[Byte]): MediaMeta =
    parsePng(id, bytes).orElse(parseWav(id, bytes))
      .orElse(parseMp4(id, bytes)).getOrElse(fakeDecode(id, bytes))

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk (width/height big-endian,
    * bit depth, color type). Channels derive from the color type
    * (0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA); a still image is
    * one frame. */
  private[operators] def parsePng(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 33 || !b.take(8).sameElements(sig)) return None
    // chunk header at 8: length + "IHDR"
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    val colorType = b(25) & 0xff
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (width <= 0 || height <= 0) return None
    Some(MediaMeta(id, b.length.toLong, width, height, channels, 1L))
  }

  /** WAV (RIFF): fmt chunk gives channels / sample rate / bits per sample,
    * the data chunk size divided by the block align gives the sample-frame
    * count. Field mapping for audio: width = sample rate, height = bits
    * per sample, n_frames = sample frames. */
  private[operators] def parseWav(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // long offsets + unsigned chunk sizes: a corrupt 32-bit size must fall
    // back (return None -> stub), never wrap the offset and throw
    var o = 12L
    var channels = 0; var sampleRate = 0; var bits = 0; var blockAlign = 0
    var dataSize = -1L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val cid = new String(b, oi, 4, "US-ASCII")
      val size = le32(b, oi + 4).toLong & 0xffffffffL
      if (size > b.length.toLong) return None
      if (cid == "fmt " && oi + 24 <= b.length) {
        channels = le16(b, oi + 10)
        sampleRate = le32(b, oi + 12)
        blockAlign = le16(b, oi + 20)
        bits = le16(b, oi + 22)
      } else if (cid == "data") {
        dataSize = size
      }
      o += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || dataSize < 0) return None
    // frame count computed AFTER the walk: a data chunk preceding the fmt
    // chunk (legal RIFF ordering) still divides by the final block align
    val frames = if (blockAlign > 0) dataSize / blockAlign else dataSize
    Some(MediaMeta(id, b.length.toLong, sampleRate, bits, channels, frames))
  }

  /** MP4 / ISO-BMFF: a real top-level box walk — `ftyp` identifies the
    * container, `moov` is entered and its children walked: `mvhd` yields
    * the movie timescale + duration, the first video `tkhd` yields
    * width/height (16.16 fixed point), and the `trak` count lands as the
    * channel count. Field mapping for video: width/height = presentation
    * size, channels = track count, n_frames = mvhd duration in RAW
    * timescale units (the honest parsed value — frame rate lives in
    * per-track sample tables a header pass does not open). 64-bit
    * (version 1) mvhd handled; box sizes are unsigned; a corrupt size
    * falls back to the stub rather than throwing. */
  private[operators] def parseMp4(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 16 || !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return None
    var width = 0; var height = 0; var tracks = 0; var duration = -1L
    def walk(from: Long, to: Long, depth: Int): Boolean = {
      // depth bound = totality: real files nest ~4 levels; an adversarial
      // payload of thousands of nested containers would otherwise recurse
      // one frame per level and kill the executor with StackOverflowError
      if (depth > 32) return false
      var o = from
      while (o + 8 <= to) {
        val oi = o.toInt
        var size = (be32(b, oi).toLong) & 0xffffffffL
        val tpe = new String(b, oi + 4, 4, "US-ASCII")
        var hdr = 8L
        if (size == 1 && oi + 16 <= to) { // 64-bit largesize
          size = (be32(b, oi + 8).toLong << 32) | (be32(b, oi + 12).toLong & 0xffffffffL)
          hdr = 16L
        } else if (size == 0) size = to - o // box extends to EOF
        if (size < hdr || o + size > to) return false
        // field reads bound against the BOX's own end, never the
        // parent's: a truncated mvhd/tkhd must fall back to the stub,
        // not silently decode the next sibling's bytes as metadata
        val boxEnd = o + size
        tpe match {
          case "moov" => if (!walk(o + hdr, boxEnd, depth + 1)) return false
          case "trak" =>
            tracks += 1
            if (!walk(o + hdr, boxEnd, depth + 1)) return false
          case "mvhd" if o + hdr + 4 <= boxEnd =>
            val v = b((o + hdr).toInt) & 0xff
            val base = (o + hdr + 4).toInt // past version+flags
            if (v == 1 && base + 28 <= boxEnd) {
              duration = (be32(b, base + 20).toLong << 32) |
                (be32(b, base + 24).toLong & 0xffffffffL)
            } else if (v == 0 && base + 16 <= boxEnd) {
              duration = be32(b, base + 12).toLong & 0xffffffffL
            }
          case "tkhd" if width == 0 && o + hdr + 4 <= boxEnd =>
            val v = b((o + hdr).toInt) & 0xff
            val base = (o + hdr + 4).toInt
            // width/height are the LAST two 16.16 fields of the box:
            // v0 body = 5×4 (times/id/reserved/duration) + 8 reserved +
            // 8 layer/group/volume/reserved + 36 matrix = 72; v1's three
            // 64-bit time/duration fields add 12
            val wOff = base + (if (v == 1) 84 else 72)
            if (wOff + 8 <= boxEnd) {
              val w16 = be32(b, wOff) >>> 16
              val h16 = be32(b, wOff + 4) >>> 16
              if (w16 > 0 && h16 > 0) { width = w16; height = h16 }
            }
          case _ => ()
        }
        o += size
      }
      true
    }
    if (!walk(0L, b.length.toLong, 0) || duration < 0 || tracks == 0) None
    else Some(MediaMeta(id, b.length.toLong, width, height, tracks, duration))
  }

  /** Minimal valid MP4: ftyp + moov(mvhd + `nTracks`×trak(tkhd)) — real
    * box structure a header walk can read; deterministic for tests and
    * the oracle-checked query. */
  def synthMp4(width: Int, height: Int, nTracks: Int, timescale: Int,
      duration: Long): Array[Byte] = {
    def be(i: Int): Array[Byte] =
      Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be(payload.length + 8) ++ tpe.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be(512) ++
      "isomiso2".getBytes("US-ASCII"))
    // mvhd v0: version+flags, ctime, mtime, timescale, duration, then
    // rate/volume/reserved/matrix/predefined/next-track (filled zeroed,
    // 100 bytes total after version+flags per spec — the walk only reads
    // the leading fields)
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be(0) ++ be(0) ++
      be(timescale) ++ be(duration.toInt) ++ new Array[Byte](80))
    // tkhd v0: version+flags, ctime, mtime, track id, reserved, duration,
    // reserved(8), layer/group/volume/reserved (8), matrix (36),
    // width/height 16.16
    def tkhd = box("tkhd", Array[Byte](0, 0, 0, 0) ++ be(0) ++ be(0) ++
      be(1) ++ be(0) ++ be(duration.toInt) ++ new Array[Byte](16) ++
      new Array[Byte](36) ++ be(width << 16) ++ be(height << 16))
    val traks = (0 until nTracks).map(_ => box("trak", tkhd))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    ftyp ++ box("moov", mvhd ++ traks)
  }

  /** Deterministic byte-stream fallback for payloads that are no known
    * container — metadata derived from the size, reproducible in SQL. */
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

  /** Minimal valid PNG: signature + IHDR (+ empty IDAT/IEND) — a real
    * header parsers can read; synthesized deterministically for tests and
    * the oracle-checked header query. */
  def synthPng(width: Int, height: Int, colorType: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be(i: Int): Array[Byte] =
      Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    out.write(be(13)); out.write("IHDR".getBytes("US-ASCII"))
    out.write(be(width)); out.write(be(height))
    out.write(8); out.write(colorType); out.write(0); out.write(0); out.write(0)
    out.write(be(0)) // CRC unchecked by the header parser
    out.write(be(0)); out.write("IEND".getBytes("US-ASCII")); out.write(be(0))
    out.toByteArray
  }

  /** Minimal valid WAV: RIFF/WAVE + PCM fmt chunk + data chunk of
    * `nSamples` zeroed sample frames. */
  def synthWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def le32b(i: Int): Array[Byte] =
      Array(i.toByte, (i >>> 8).toByte, (i >>> 16).toByte, (i >>> 24).toByte)
    def le16b(i: Int): Array[Byte] = Array(i.toByte, (i >>> 8).toByte)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32b(36 + dataSize))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32b(16))
    out.write(le16b(1)); out.write(le16b(channels)); out.write(le32b(sampleRate))
    out.write(le32b(sampleRate * blockAlign)); out.write(le16b(blockAlign))
    out.write(le16b(bitsPerSample))
    out.write("data".getBytes("US-ASCII")); out.write(le32b(dataSize))
    out.write(new Array[Byte](dataSize))
    out.toByteArray
  }

  /** Batched decode over (id, payload) — executor-side, partition-local. */
  def decodeBatch(df: DataFrame, spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeHeader(id, bytes) })
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
    "q133_frame_sample",
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

  /** Real header decode on the gate: deterministic PNG/WAV payloads are
    * synthesized per document, parsed by [[decodeHeader]], and the parsed
    * metadata is aggregated — the oracle recomputes the expected metadata
    * arithmetically, so a mis-parsed width/rate/channel count
    * hash-mismatches. */
  val q35MultimodalHeaders = QueryDef(
    "q134_multimodal_headers",
    """WITH m AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 2 = 1 THEN doc_id % 640 + 1
      |         ELSE 8000 * (1 + doc_id % 3) END AS w,
      |    CASE WHEN doc_id % 2 = 1 THEN doc_id % 480 + 1 ELSE 16 END AS h,
      |    CASE WHEN doc_id % 2 = 1 THEN
      |        CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1
      |                        WHEN 3 THEN 2 ELSE 4 END
      |      ELSE CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 END END AS c,
      |    CASE WHEN doc_id % 2 = 1 THEN 1 ELSE (doc_id % 100 + 1) * 10 END AS f
      |  FROM documents WHERE doc_id < 400)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(w) AS BIGINT) AS total_width,
      |  CAST(sum(h) AS BIGINT) AS total_height,
      |  CAST(sum(c) AS BIGINT) AS total_channels,
      |  CAST(sum(f) AS BIGINT) AS total_frames
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 400)
      .select(col("doc_id"), col("source"))
    val withPayload = docs.as[(Long, String)].map { case (id, src) =>
      val payload =
        if (id % 2 == 1)
          synthPng((id % 640 + 1).toInt, (id % 480 + 1).toInt,
            Seq(0, 2, 3, 4, 6)((id % 5).toInt))
        else
          synthWav(if (id % 4 == 0) 1 else 2, (8000 * (1 + id % 3)).toInt, 16,
            ((id % 100 + 1) * 10).toInt)
      (id, src, payload)
    }.toDF("doc_id", "source", "payload")
    decodeBatch(withPayload, s).toDF()
      .join(withPayload.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("width")).as("total_width"),
        sum(col("height")).as("total_height"),
        sum(col("channels")).as("total_channels"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("source"))
  }

  /** Cross-document duplicate frames: frames whose content hash appears in
    * MORE THAN ONE document — the frame-level dedup signal a video/image
    * pipeline uses to catch shared intros, watermarks and boilerplate
    * segments that whole-payload hashing misses.
    *
    * Scale shape: frames explode map-side ([[sampleFrames]]), ONE shuffle
    * counts distinct docs per frame hash (partial aggs ship hashes, not
    * frame bytes), and the shared-hash set joins back on the hash key —
    * the same shape as cross-doc dup-grams, nothing quadratic in docs. */
  def frameDupStats(framed: DataFrame, idCol: String): DataFrame = {
    val f = framed.select(col(idCol), md5(col("frame").cast("string")).as("__fh"))
    val dup = f.groupBy(col("__fh"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("__fh"), lit(1L).as("__shared"))
    f.join(dup, Seq("__fh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(coalesce(col("__shared"), lit(0L))).as("n_dup_frames"))
  }

  /** q92: frame-level dedup over the text-payload gate slice (byte frames
    * of ASCII text, so DuckDB reproduces the exact frame hashes). */
  val q92FrameDedup = QueryDef(
    "q92_frame_dedup",
    """WITH f AS (
      |  SELECT source, doc_id,
      |    md5(substring(text, (i - 1) * 256 + 1, 256)) AS fh
      |  FROM documents,
      |    LATERAL (SELECT unnest(range(1,
      |      CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) + 1)) AS i)
      |  WHERE doc_id < 200),
      |dup AS (SELECT fh FROM f GROUP BY fh HAVING count(DISTINCT doc_id) > 1),
      |d AS (SELECT source, doc_id, count(*) AS n_frames,
      |        sum(CASE WHEN dup.fh IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
      |      FROM f LEFT JOIN dup USING (fh) GROUP BY source, doc_id)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |  CAST(sum(n_dup) AS BIGINT) AS dup_frames,
      |  CAST(sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_with_shared
      |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))
    frameDupStats(sampleFrames(docs, frameSize = 256, stride = 1), "doc_id")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("n_dup_frames")).as("dup_frames"),
        sum(when(col("n_dup_frames") > 0, 1L).otherwise(0L)).as("docs_with_shared"))
      .orderBy(col("source"))
  }

  /** q158: VIDEO container headers on the gate — deterministic MP4
    * (ISO-BMFF) payloads synthesized per document, parsed by the REAL box
    * walk ([[parseMp4]]: ftyp sniff, moov descent, mvhd timescale +
    * duration, tkhd 16.16 presentation size, trak count), aggregated per
    * source. The oracle recomputes the expected metadata arithmetically,
    * so a mis-walked box or a wrong fixed-point shift hash-mismatches.
    * Completes the image (q134 PNG) / audio (q134 WAV) / video triad. */
  val q158VideoHeaders = QueryDef(
    "q158_video_headers",
    """WITH m AS (
      |  SELECT source,
      |    16 + doc_id % 1280 AS w, 16 + doc_id % 720 AS h,
      |    1 + doc_id % 3 AS tracks,
      |    600 * (1 + doc_id % 100) AS dur
      |  FROM documents WHERE doc_id < 300)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(w) AS BIGINT) AS total_width,
      |  CAST(sum(h) AS BIGINT) AS total_height,
      |  CAST(sum(tracks) AS BIGINT) AS total_tracks,
      |  CAST(sum(dur) AS BIGINT) AS total_duration
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id"), col("source"))
    val withPayload = docs.as[(Long, String)].map { case (id, src) =>
      (id, src, synthMp4((16 + id % 1280).toInt, (16 + id % 720).toInt,
        (1 + id % 3).toInt, timescale = 600, duration = 600L * (1 + id % 100)))
    }.toDF("doc_id", "source", "payload")
    decodeBatch(withPayload, s).toDF()
      .join(withPayload.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("width")).as("total_width"),
        sum(col("height")).as("total_height"),
        sum(col("channels")).as("total_tracks"),
        sum(col("n_frames")).as("total_duration"))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(q33Multimodal, q34FrameSample,
    q35MultimodalHeaders, q92FrameDedup, q158VideoHeaders)
}
