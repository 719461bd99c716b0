package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-job breakdown of ONE fixed-size upsert flush against a
  * PK-bucketed table — the steady-state MERGE latency budget.
  * `runMain graft.BucketFlushProbe /root/testdata/sf0.1 [buckets]` */
object BucketFlushProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nb = if (args.length > 1) args(1).toInt else 250
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.hadoop.FastLocalFileSystem.tune(SparkSession.builder())
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lake = new graft.catalog.GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft-bprobe").toString)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    lake.write("m", ord.repartition(64,
        pmod(hash(col("o_orderkey")), lit(nb))),
      partitions = Seq(s"bucket($nb, o_orderkey)"), pks = Seq("o_orderkey"))
    val maxK = ord.agg(max("o_orderkey")).head().getLong(0)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    var t0 = 0L
    val l = new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(e.jobId, System.nanoTime())
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(e.jobId, 0L)
        jobs.add((e.jobId, (s - t0) / 1000000L, (System.nanoTime() - s) / 1000000L))
      }
    }
    for (f <- 1 to 3) {
      val batch = spark.range(128).select(
        when(col("id") % 2 === 0, (col("id") * 7919L + f * 104729L) % maxK)
          .otherwise(lit(maxK) + f * 1000000L + col("id")).as("o_orderkey"),
        lit("X").as("o_orderstatus"), lit(1.0).as("o_totalprice"))
        .repartition(4)
      jobs.clear()
      spark.sparkContext.addSparkListener(l)
      t0 = System.nanoTime()
      lake.upsert("m", batch)
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      println(f"[bprobe] flush=$f wall=$wall%.0f ms, jobs:")
      jobs.forEach { case (id, at, dur) =>
        println(f"[bprobe]   job=$id%-4d at=$at%-6d dur=$dur%-6d ms")
      }
    }
    spark.stop()
  }
}
