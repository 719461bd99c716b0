package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: the fixed-latency floor of this host/session — times a
  * no-shuffle job, a 1-shuffle job, a 2-shuffle job and a tiny parquet
  * write, 10 iterations each, so per-operation budgets in engine write
  * paths (N jobs x floor) can be sanity-checked against first principles
  * (guide §1.1). */
object MicroFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.hadoop.FastLocalFileSystem.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val ts = (0 until 10).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[floor] $label%-34s min=${ts.head}%7.1f ms med=${ts(5)}%7.1f ms")
    }
    // warm-up
    (0 until 3).foreach(_ => spark.range(100000).toDF("id").count())

    time("count (0-shuffle, 32 tasks)") {
      spark.range(100000).toDF("id").count()
    }
    time("collect 1 row (1 task)") {
      spark.range(1).toDF("id").collect()
    }
    time("groupBy-count (1 shuffle)") {
      spark.range(100000).toDF("id")
        .groupBy(($"id" % 100).as("k")).count().count()
    }
    time("join+groupBy (2 shuffles)") {
      val a = spark.range(100000).toDF("id")
      val b = spark.range(50000).toDF("id")
      a.join(b, "id").groupBy(($"id" % 100).as("k")).count().count()
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-floor").toString
    var i = 0
    time("write 75k rows parquet (unpart)") {
      i += 1
      spark.range(75000).select($"id", ($"id" % 97).as("v"))
        .write.mode("overwrite").parquet(s"$tmp/t$i")
    }
    time("write 75k rows parquet (5 parts)") {
      i += 1
      spark.range(75000).select($"id", ($"id" % 5).cast("string").as("p"))
        .write.mode("overwrite").partitionBy("p").parquet(s"$tmp/t$i")
    }
    time("window row_number (1 shuffle)") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"id")
      spark.range(100000).select($"id", ($"id" % 1000).as("k"))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("groupBy-count (1 shuffle, AQE off)") {
      spark.range(100000).toDF("id")
        .groupBy(($"id" % 100).as("k")).count().count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("groupBy-count (AQE off, 4 parts)") {
      spark.range(100000).toDF("id")
        .groupBy(($"id" % 100).as("k")).count().count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("groupBy-count (AQE on, 4 parts)") {
      spark.range(100000).toDF("id")
        .groupBy(($"id" % 100).as("k")).count().count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    time("groupBy-count 8 slices (AQE on)") {
      spark.range(0, 100000, 1, 8).toDF("id")
        .groupBy(($"id" % 100).as("k")).count().count()
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    time("groupBy-count (parallelismFirst=f)") {
      spark.range(100000).toDF("id")
        .groupBy(($"id" % 100).as("k")).count().count()
    }
    time("join+groupBy (parallelismFirst=f)") {
      val a = spark.range(100000).toDF("id")
      val b = spark.range(50000).toDF("id")
      a.join(b, "id").groupBy(($"id" % 100).as("k")).count().count()
    }
    var j = 100
    val tmp2 = java.nio.file.Files.createTempDirectory("graft-floor2").toString
    time("write 75k 5-part (parallelismFirst=f)") {
      j += 1
      spark.range(75000).select($"id", ($"id" % 5).cast("string").as("p"))
        .hint("rebalance", $"p")
        .write.mode("overwrite").partitionBy("p").parquet(s"$tmp2/t$j")
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    time("write 75k 5-part rebal (pf=true)") {
      j += 1
      spark.range(75000).select($"id", ($"id" % 5).cast("string").as("p"))
        .hint("rebalance", $"p")
        .write.mode("overwrite").partitionBy("p").parquet(s"$tmp2/t$j")
    }
    spark.stop()
  }
}
