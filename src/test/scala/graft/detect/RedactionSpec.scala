package graft.detect

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Span

/** Redaction invariants from tests/test_redaction.py:5-25. */
class RedactionSpec extends AnyFunSuite {

  test("mask is shape- and length-preserving") {
    assert(Redaction.maskToken("Ab1-x") == "Xx0-x")
    assert(Redaction.maskToken("4111 1111") == "0000 0000")
    assert(Redaction.maskToken("") == "")
    for (s <- Seq("john.doe@example.com", "(415) 555-1212", "ABCDE1234F"))
      assert(Redaction.maskToken(s).length == s.length)
  }

  test("redact splices masks, keeps length, skips overlapping spans") {
    val text = "aaa 1234 bbb"
    val spans = Seq(Span(4, 8, "1234"), Span(6, 10, "34 b")) // second overlaps
    val red = Redaction.redactText(text, spans)
    assert(red == "aaa 0000 bbb")
    assert(red.length == text.length)
  }

  test("unsorted spans are sorted by start before splicing") {
    val text = "x 12 y AB z"
    val red = Redaction.redactText(text, Seq(Span(7, 9, "AB"), Span(2, 4, "12")))
    assert(red == "x 00 y XX z")
  }

  test("redaction guarantee: no raw span text reaches model inputs") {
    val text = "Contact John Doe at john.doe@example.com or (415) 555-1212."
    val cands = Rules.proposeCandidates(text)
    val spans = cands.map(c => Span(c.start, c.end, c.value))
    val red = Redaction.redactText(text, spans)
    assert(Redaction.noRawPii(red, spans))
    // context windows built from the redacted text inherit the guarantee
    for (ctx <- Redaction.contexts(text, spans, 48); s <- spans if s.text.nonEmpty)
      assert(!ctx.contains(s.text))
  }

  test("contexts slice [start-w, end+w] of the redacted text") {
    val text = "0123456789abcdefghij"
    val spans = Seq(Span(10, 12, "ab"))
    val ctx = Redaction.contexts(text, spans, 3)
    assert(ctx == Seq("789xxcde")) // redacted[7:15]
    assert(ctx.head.length == 8)
  }
}
