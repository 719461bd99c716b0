package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}

import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.internal.io.FileNameSpec
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

/** Commit protocol that collects per-file column bounds INSIDE the write
  * job, eliminating the second-pass footer read from the lake's commit
  * path (the reference analog: DuckLake gets file stats for free from
  * DuckDB's parquet writer; Iceberg/Delta writers report them in the
  * task's commit payload the same way this does).
  *
  * Mechanics: each task records the files it opens
  * ([[newTaskTempFile]]); at [[commitTask]] — after the writer closed
  * them, before the committer renames them — it reads their parquet
  * FOOTERS locally on the executor (page-cache hot, no extra Spark job,
  * no driver I/O) and ships the bounds to the driver piggy-backed on the
  * standard [[TaskCommitMessage]]. [[commitJob]] unwraps the payloads,
  * delegates the real commit to the parent protocol, and publishes the
  * merged stats keyed by the job's output directory for the writer
  * ([[graft.catalog.GraftLake]]) to [[drain]]. Task retries and
  * speculative attempts are correct for free: only COMMITTED tasks'
  * messages reach commitJob.
  *
  * Lives in `org.apache.spark.sql` because it subclasses the
  * `execution.datasources` protocol; activated per write via
  * `spark.sql.sources.commitProtocolClass` (reflective instantiation —
  * the (jobId, path, dynamicPartitionOverwrite) constructor is the
  * contract).
  */
class StatsCommitProtocol(jobId: String, path: String,
    dynamicPartitionOverwrite: Boolean)
  extends SQLHadoopMapReduceCommitProtocol(jobId, path, dynamicPartitionOverwrite) {

  /** Executor-side: (manifest file key = rel/name, temp path) of every
    * file this task opened. Transient — rebuilt empty on each executor. */
  @transient private var taskFiles: mutable.ArrayBuffer[(String, String)] = _

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], spec: FileNameSpec): String = {
    val p = super.newTaskTempFile(taskContext, dir, spec)
    if (taskFiles == null) taskFiles = mutable.ArrayBuffer.empty
    val name = new Path(p).getName
    taskFiles += ((dir.map(d => s"$d/$name").getOrElse(name), p))
    p
  }

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage = {
    // read footers BEFORE the parent moves the files out of the task
    // attempt dir; the bytes are identical either way (commit is a rename).
    // Statless files are reported WITH an empty map — "seen, nothing
    // prunable" — so the committer never pays a footer re-read just to
    // learn the same thing (manifest rendering drops empty entries).
    val conf = taskContext.getConfiguration
    val stats: Map[String, Map[String, graft.catalog.GraftLake.Bounds]] =
      if (taskFiles == null) Map.empty
      else taskFiles.iterator.filter(_._1.endsWith(".parquet")).map {
        case (key, tmp) =>
          key -> graft.catalog.GraftLake.footerStats(new Path(tmp), conf)
      }.toMap
    val base = super.commitTask(taskContext)
    new TaskCommitMessage(StatsCommitProtocol.Wrapped(base.obj, stats))
  }

  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit = {
    val harvested = Map.newBuilder[String, Map[String, graft.catalog.GraftLake.Bounds]]
    val unwrapped = taskCommits.map { m =>
      m.obj match {
        case StatsCommitProtocol.Wrapped(inner, stats) =>
          harvested ++= stats
          new TaskCommitMessage(inner)
        case _ => m
      }
    }
    super.commitJob(jobContext, unwrapped)
    StatsCommitProtocol.publish(new Path(path).getName, harvested.result())
  }
}

object StatsCommitProtocol {
  /** The protocol class name to set as `spark.sql.sources.commitProtocolClass`. */
  val className: String = classOf[StatsCommitProtocol].getName

  /** TaskCommitMessage payload: the parent protocol's own payload plus
    * this task's per-file bounds. */
  final case class Wrapped(inner: Any,
      stats: Map[String, Map[String, graft.catalog.GraftLake.Bounds]])
    extends Serializable

  /** Driver-side mailbox: output-dir leaf name (the lake's `.stage-<uuid>`
    * dirs are globally unique) → merged per-file bounds. Bounded: a write
    * whose stats are never drained (a failure between job commit and the
    * lake's manifest commit) must not leak, so the eldest entries fall off
    * past a small cap. */
  private val mailbox = new java.util.LinkedHashMap[
      String, Map[String, Map[String, graft.catalog.GraftLake.Bounds]]](16, 0.75f, false) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, Map[String, Map[String, graft.catalog.GraftLake.Bounds]]])
        : Boolean = {
      val evict = size() > 64
      // an eviction is CORRECT (the drain falls back to footer reads) but
      // should never be routine — meter it so the bench can alert
      if (evict) graft.metrics.GraftMetrics.op("statsMailboxEvict")
        .record(0L)
      evict
    }
  }

  /** Evictions since the last metrics reset — >0 means some commit paid
    * the footer-read fallback because >64 writes were in flight. */
  def evictionCount: Long =
    graft.metrics.GraftMetrics.op("statsMailboxEvict").count.sum()

  private def publish(dirName: String,
      stats: Map[String, Map[String, graft.catalog.GraftLake.Bounds]]): Unit =
    mailbox.synchronized { mailbox.put(dirName, stats) }

  /** Fetch-and-remove the stats a write job published for `stageDir`.
    * Empty when the job ran without this protocol (or aborted) — the
    * caller falls back to footer reads. */
  def drain(stageDir: Path): Map[String, Map[String, graft.catalog.GraftLake.Bounds]] =
    mailbox.synchronized {
      Option(mailbox.remove(stageDir.getName)).getOrElse(Map.empty)
    }
}
