package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII scrubbing: redaction replaces each kind with its typed
  * placeholder, counts agree with the redactions, and clean text
  * passes through byte-identical. (The driver corpus is synthetic
  * word-salad with no PII, so these are hand-built rows — the
  * operator's scale shape is a pure regexp projection, exercised by
  * the same codegen path the corpus queries use.)
  */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  private val rows = Seq(
    "contact me at jane.doe+spam@example.co.uk for details",
    "server at 10.0.254.3 rebooted; backup at 192.168.1.10",
    "call +1 (555) 123-4567 or 555 867 5309 now",
    "mixed: bob@host.org from 8.8.8.8 dialed 020-7946-0958",
    "no pii here, just table scan row batch",
    "")

  test("redactPii replaces emails, IPs, and phone-ish runs with placeholders") {
    val out = rows.toDF("text")
      .select(TextFunctions.redactPii(col("text")).as("r")).as[String].collect()
    assert(out(0) == "contact me at <EMAIL> for details")
    assert(out(1) == "server at <IP> rebooted; backup at <IP>")
    assert(out(2) == "call <PHONE> or <PHONE> now")
    assert(out(3) == "mixed: <EMAIL> from <IP> dialed <PHONE>")
    assert(out(4) == rows(4), "clean text must pass through unchanged")
    assert(out(5) == "")
    assert(!out.exists(s => s.contains("@") || s.matches(".*\\d{3,}.*")),
      s"residual PII after redaction: ${out.mkString(" | ")}")
  }

  test("piiCounts agrees with the redaction pass") {
    val c = rows.toDF("text")
      .select(TextFunctions.piiCounts(col("text")).as("c"))
      .select("c.n_email", "c.n_ip", "c.n_phone")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(c(0) == ((1, 0, 0)))
    assert(c(1) == ((0, 2, 0)))
    assert(c(2) == ((0, 0, 2)))
    assert(c(3) == ((1, 1, 1)))
    assert(c(4) == ((0, 0, 0)))
    assert(c(5) == ((0, 0, 0)))
  }

  test("digit-heavy email local parts count as email only, not phone") {
    // redactPii consumes the email first, so its digits never reach the
    // phone pattern — piiCounts must mirror that replacement order
    val c = Seq("reach 5551234567@host.com today").toDF("text")
      .select(TextFunctions.piiCounts(col("text")).as("c"))
      .select("c.n_email", "c.n_ip", "c.n_phone")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(c(0) == ((1, 0, 0)), s"got ${c(0)}")
  }
}
