package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` of registered queries to
  * files (the plans/r14 deliverable). Each query RUNS once first (the
  * lifecycle queries build their lakes as a side effect and their final
  * plan reads the landed state), then the returned DataFrame's formatted
  * plan is written to `<outDir>/<query>_<tag>.txt`.
  * `runMain graft.PlanDump /root/testdata/sf0.1 plans/r14 after q160_bucketed_merge,q65_merge_star_sql` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args(3).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = graft.hadoop.FastLocalFileSystem.tune(SparkSession.builder())
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // before/after captures from one binary: SPARK_GRAFT_CONF="k=v;k=v"
    // overlays the opt-out confs (ProfileOne's A/B mechanism)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // build side effects + let AQE finalize
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
