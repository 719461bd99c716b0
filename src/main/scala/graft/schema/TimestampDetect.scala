package graft.schema

import java.time.{Instant, LocalDateTime, OffsetDateTime, ZoneOffset}

/** ISO-8601 timestamp sniffing for schemaless inference.
  *
  * Behavior contract (reference: connect/TimestampUtils.java:31-95):
  *  - a string is a timestamp iff it matches `YYYY-MM-DDTHH:MM:SS` with
  *    optional fractional seconds (1-9 digits) and optional zone
  *    (`Z`, `±HH:MM`, or `±HHMM`) AND parses cleanly;
  *  - `±HHMM` zones are normalized to `±HH:MM` before parsing;
  *  - zone-less values are interpreted as UTC (naive-local-as-UTC);
  *  - result precision is epoch milliseconds.
  */
object TimestampDetect {
  private val Iso8601 =
    """^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{1,9})?(?:Z|[+-]\d{2}:?\d{2})?$""".r
  private val NoZone =
    """^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?$""".r
  private val OffsetNoColon = """.*[+-]\d{4}$""".r
  private val OffsetAny = """.*[+-]\d{2}:?\d{2}$""".r

  def isTimestamp(value: String): Boolean = {
    if (value == null) return false
    val t = value.trim
    t.nonEmpty && Iso8601.matches(t) &&
      parseToEpochMillis(t).isDefined
  }

  /** Parse an ISO-8601-ish string to epoch millis; None if unparseable. */
  def parseToEpochMillis(value: String): Option[Long] = {
    if (value == null) return None
    val t = value.trim
    if (t.isEmpty) return None
    try {
      if (t.endsWith("Z")) Some(Instant.parse(t).toEpochMilli)
      else if (OffsetAny.matches(t)) {
        val normalized =
          if (OffsetNoColon.matches(t))
            t.substring(0, t.length - 2) + ":" + t.substring(t.length - 2)
          else t
        Some(OffsetDateTime.parse(normalized).toInstant.toEpochMilli)
      } else if (NoZone.matches(t))
        Some(LocalDateTime.parse(t).atOffset(ZoneOffset.UTC).toInstant.toEpochMilli)
      else None
    } catch { case _: Exception => None }
  }
}
