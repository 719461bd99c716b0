package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE registered query by name against a testdata dir,
  * print it, optionally dump parquet for an external oracle diff.
  * `runMain graft.RunOne q105_ingest_dedup /root/testdata/sf0.01 [/tmp/out]` */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.hadoop.FastLocalFileSystem.tune(SparkSession.builder())
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.show(100, truncate = false)
    df.printSchema()
    args.lift(2).foreach(out =>
      df.coalesce(1).write.mode("overwrite").parquet(out))
    spark.stop()
  }
}
