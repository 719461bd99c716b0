package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line {"metric":…,"value":…,"queries":{…}} (driver
  * contract).
  *
  * Round-2 handoff hardening (BENCH_r01.json had "parsed": null because the
  * driver keeps only a bounded tail of stdout and the r1 line was longer
  * than that window):
  *   - the JSON line is kept short (3-decimal timings, no inline op_metrics)
  *   - it is printed once as soon as it is ready AND again as the very last
  *     line before shutdown, so the complete line sits inside any stdout
  *     tail window with only sbt's epilogue after it
  *   - the full payload (plus op_metrics, raw perf iterations, errors) is
  *     also written to bench.json in the working directory
  *   - query failures are recorded in an explicit "errors" map instead of
  *     masquerading as fast timings
  */
object Bench {

  private def num(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))
  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + codegen + parquet footer caches
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()

    // min of two passes per query: a single sample on a shared host mixes
    // scheduler noise into the comparison; the min is the honest capability
    // number
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def runAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120)
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val pass1 = runAll().toMap
    val results = runAll().map { case (n, t) => n -> math.min(t, pass1(n)) }
    val ok = results.filterNot { case (n, _) => errors.contains(n) }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0

    // BASELINE.md comparability: the reference's MERGE-vs-INSERT protocol
    // (100k base, 10k batches) at a 10% conflict rate, per-batch ms —
    // median of 5 alternating-order iterations after a discarded warm-up —
    // plus the amortized measurement at the reference's real default
    // flush.size of 1M rows (DucklakeSinkConfig.java:129-135).
    val perf = PerfHarness.run(spark, conflictPcts = Seq(10), iterations = 5)
    val mergeMs = PerfHarness.median(perf.map(_.mergeMs))
    val insertMs = PerfHarness.median(perf.map(_.insertMs))
    val (amortMergeMs, amortInsertMs) = PerfHarness.amortized(spark)

    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${num(total)},"unit":"sec"""" +
      s""","queries":$qs""" +
      s""","upsert_merge_ms_per_10k_batch":${num(mergeMs)}""" +
      s""","insert_ms_per_10k_batch":${num(insertMs)}""" +
      s""","upsert_merge_ms_per_10k_amortized_1m_flush":${num(amortMergeMs)}""" +
      s""","insert_ms_per_10k_amortized_1m_flush":${num(amortInsertMs)}""" +
      errJson + s""","sf":${jstr(sfDir)}}"""

    // full payload → bench.json (well-known file, immune to stdout tails)
    val ops = graft.metrics.GraftMetrics.snapshot()
      .filter { case (k, _) => k.endsWith("avg_ms") || k.endsWith("count") }
      .toSeq.sorted
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val perfIters = perf.map(r =>
      s"""{"pct":${r.conflictPct},"iter":${r.iter},"merge_ms":${num(r.mergeMs)},"insert_ms":${num(r.insertMs)}}""")
      .mkString("[", ",", "]")
    val full = line.dropRight(1) +
      s""","op_metrics":$ops,"perf_iterations":$perfIters}"""
    Files.write(Paths.get("bench.json"), (full + "\n").getBytes(StandardCharsets.UTF_8))

    println(line)
    spark.stop()
    // printed again LAST so a bounded stdout tail still contains the whole
    // line (only sbt's [success] epilogue follows)
    println(line)
  }
}
