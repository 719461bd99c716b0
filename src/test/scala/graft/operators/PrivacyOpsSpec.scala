package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts of the PII scrub: exact redacted text, rule
  * ordering (URL owns its email/IP-shaped substrings), per-kind counts on
  * the progressively redacted text, and the no-shuffle plan shape. */
class PrivacyOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redactOne(s: String): (String, Long, Long, Long, Long) = {
    val r = PrivacyOps.redactPii(Seq(s).toDF("text"), "text")
      .select("redacted_text", "n_email", "n_url", "n_ip", "n_phone")
      .collect().head
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("each kind redacts to its token with an exact count") {
    assert(redactOne("mail bob.smith+x@corp.example.org now") ===
      (("mail <EMAIL> now", 1L, 0L, 0L, 0L)))
    assert(redactOne("see https://a.example/p?q=1 and http://b.example ok") ===
      (("see <URL> and <URL> ok", 0L, 2L, 0L, 0L)))
    assert(redactOne("host 10.0.200.7 down") === (("host <IP> down", 0L, 0L, 1L, 0L)))
    assert(redactOne("call +44 20-7946-0958 today") ===
      (("call <PHONE> today", 0L, 0L, 0L, 1L)))
  }

  test("URLs are redacted first: embedded email/IP shapes belong to the URL") {
    // user@ and 10.0.0.1 inside the URL must NOT count as email/IP
    assert(redactOne("go https://user@10.0.0.1/login x") ===
      (("go <URL> x", 0L, 1L, 0L, 0L)))
  }

  test("phones require a leading +, so bare IPs are never phone-eaten") {
    assert(redactOne("ip 192.168.100.200 and phone +1 555-0100 end") ===
      (("ip <IP> and phone <PHONE> end", 0L, 0L, 1L, 1L)))
    // a digit run without + is untouched
    assert(redactOne("order 123456789 shipped") ===
      (("order 123456789 shipped", 0L, 0L, 0L, 0L)))
  }

  test("clean text passes through byte-identical with zero counts") {
    val s = "the quick brown fox at example dot com"
    assert(redactOne(s) === ((s, 0L, 0L, 0L, 0L)))
  }

  test("redaction is a pure map: no exchange in the plan") {
    val plan = PrivacyOps.redactPii(Seq("x").toDF("text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redact plan must not shuffle:\n$plan")
  }
}
