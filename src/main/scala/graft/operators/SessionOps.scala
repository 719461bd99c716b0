package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-mode event-sequence operators: gap sessionization and as-of joins,
  * composed from window functions (the preferred realization for operators
  * Spark lacks natively — SURVEY §7.3 option (a): compose built-ins).
  * The streaming twin of sessionization lives in
  * [[graft.streaming.StreamOps]]. */
object SessionOps {

  /** Gap-based sessionization over the events table: a new session starts
    * when a user is idle longer than the gap. One shuffle on user_id; the
    * session id is a running sum of gap breaks — identical semantics to
    * the streaming flatMapGroupsWithState version. */
  val q49SessionizeBatch = QueryDef(
    "q49_sessionize_batch",
    """WITH gaps AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > INTERVAL 30 MINUTE OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, value,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM gaps)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM sessions WHERE user_id < 10
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("__prev", lag(col("ts"), 1).over(byTime))
      // microsecond-exact gap compare (a whole-second cast would disagree
      // with the oracle's `> INTERVAL 30 MINUTE` for sub-second gaps)
      .withColumn("__brk",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__brk")).over(running).cast("long"))
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** As-of join composed from windows: for every error event, the value of
    * the same user's most recent prior purchase (null when none). The
    * union-sort-carry formulation costs one shuffle on the join key —
    * the standard Spark realization of ASOF JOIN. */
  val q50AsofJoin = QueryDef(
    "q50_asof_join",
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase
      |  FROM events)
      |SELECT user_id, event_id, round(value, 2) AS error_value,
      |  round(last_purchase, 2) AS last_purchase
      |FROM tagged WHERE event_type = 'error' AND user_id < 10
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("last_purchase",
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error" && col("user_id") < 10)
      .select(col("user_id"), col("event_id"),
        round(col("value"), 2).as("error_value"),
        round(col("last_purchase"), 2).as("last_purchase"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val all: Seq[QueryDef] = Seq(q49SessionizeBatch, q50AsofJoin)
}
