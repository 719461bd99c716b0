package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE registered query and print (a) every Spark job it
  * submitted with the job's call site and duration-relevant description,
  * and (b) the engine op-sensor totals — the feedback loop for cutting
  * per-trigger fixed cost in the ingest pipeline (a micro-batch's cost at
  * constant data volume is mostly its JOB COUNT × scheduling latency).
  * `runMain graft.ProfileOne q105_ingest_dedup /root/testdata/sf0.1` */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiments: SPARK_GRAFT_CONF="k=v;k=v" overlays session confs
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up iteration: JVM/codegen/class-load noise out of the profile
    SparkEntry.queries(name)(spark, sfDir).collect()
    val jobs = new ConcurrentLinkedQueue[(Int, Int, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val ends = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts.put(e.jobId, e.time)
        // attribute the job to the engine frame that planned it: first
        // graft.* line in the job's last stage's call-site details
        val site = e.stageInfos.lastOption.map(_.details).getOrElse("")
          .split('\n').find(l => l.contains("graft.") && !l.contains("ProfileOne"))
          .getOrElse(e.stageInfos.lastOption.map(_.name).getOrElse("?"))
          .trim.take(110)
        jobs.add((e.jobId, e.stageInfos.size, site))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        ends.put(e.jobId, e.time)
    }
    spark.sparkContext.addSparkListener(listener)
    graft.metrics.GraftMetrics.reset()
    val t0 = System.nanoTime()
    val t0ms = System.currentTimeMillis()
    val n = SparkEntry.queries(name)(spark, sfDir).collect().length
    val s = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    println(f"[profile] $name%s rows=$n time=$s%.3f s jobs=${jobs.size}")
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, st, site) =>
      val ms = (Option(ends.get(id)), Option(starts.get(id))) match {
        case (Some(e), Some(s)) => (e - s).toString
        case _ => "?"
      }
      // at= start offset from t0: the space BETWEEN a job's end and the
      // next job's start is driver-side work (planning, commit I/O)
      val at = Option(starts.get(id))
        .map(s => (s - t0ms).toString).getOrElse("?")
      println(f"[profile]   job=$id%-4d stages=$st%-3d ${ms}%-6s ms at=$at%-7s $site")
    }
    graft.metrics.GraftMetrics.totalsMs().toSeq.sortBy(-_._2._2).foreach {
      case (op, (c, ms)) => println(f"[profile]   op=$op%-28s n=$c%-4d ${ms}%.0f ms")
    }
    spark.stop()
  }
}
