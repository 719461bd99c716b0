package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time ONE registered query with warm-up iterations inside a
  * single JVM — separates plan/execution cost from sbt/JVM startup, which
  * RunOne's wall time conflates.
  * `runMain graft.TimeOne q27_minhash_neardup /root/testdata/sf0.1 5` */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.hadoop.FastLocalFileSystem.tune(SparkSession.builder())
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (0 until iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] iter=$i $name%s rows=$n time=$s%.3f s")
    }
    spark.stop()
  }
}
