package graft.util

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Span

/** Mirrors tests/test_logging.py: JSON shape, correlation ids, scrubbing. */
class SafeLogSpec extends AnyFunSuite {

  test("records are JSON lines with time/level/logger and payload fields") {
    val line = SafeLog.safeLog("scan_started", Map("n" -> 3))
    assert(line.contains("\"event\":\"scan_started\""))
    assert(line.contains("\"level\":\"INFO\""))
    assert(line.contains("\"logger\":\"graft\""))
    assert(line.contains("\"n\":3"))
    assert(line.matches(""".*"time":"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z".*"""))
  }

  test("correlation id propagates within the context and resets after") {
    assert(SafeLog.correlationId.isEmpty)
    val line = SafeLog.withCorrelation("cid-123") {
      assert(SafeLog.correlationId.contains("cid-123"))
      SafeLog.safeLog("inner")
    }
    assert(line.contains("\"correlation_id\":\"cid-123\""))
    assert(SafeLog.correlationId.isEmpty)
  }

  test("span texts are scrubbed from all payload fields; text logs redacted only") {
    val spans = Seq(Span(8, 18, "john@x.com"), Span(0, 0, "john@x.com"))
    val line = SafeLog.safeLog("scan_contexts",
      details = Map("examples" -> Seq("mail to john@x.com", "other"), "count" -> 2),
      text = Some("send to john@x.com"),
      piiSpans = spans)
    assert(!line.contains("john@x.com"))
    assert(line.contains("xxxx@x.xxx"))
    assert(line.contains("\"redacted_text\":\"send to xxxx@x.xxx\""))
  }

  test("nested structures are scrubbed recursively") {
    val line = SafeLog.safeLog("e",
      details = Map("outer" -> Map("inner" -> Seq("ssn 123-45-6789"))),
      piiSpans = Seq(Span(4, 15, "123-45-6789")))
    assert(!line.contains("123-45-6789"))
    assert(line.contains("000-00-0000"))
  }
}
