package graft.detect

import graft.core.Span

/** Shape-preserving redaction. Reference: src/catalog_pii_scanner/redaction.py. */
object Redaction {

  /** digit->0, upper->X, lower->x, other unchanged; length-preserving
    * (redaction.py:16-26). Uses Unicode-aware classification like Python's
    * str.isdigit/isalpha. */
  def maskToken(token: String): String = {
    val sb = new java.lang.StringBuilder(token.length)
    var i = 0
    while (i < token.length) {
      val ch = token.charAt(i)
      if (Character.isDigit(ch)) sb.append('0')
      else if (Character.isLetter(ch)) sb.append(if (Character.isUpperCase(ch)) 'X' else 'x')
      else sb.append(ch)
      i += 1
    }
    sb.toString
  }

  /** Splice shape-preserving masks over `spans` (sorted by start; a span
    * starting before the cursor — i.e. overlapping an earlier span — is
    * skipped). Length-preserving. Reference: redaction.py:29-45. */
  def redactText(text: String, spans: Seq[Span]): String = {
    val sorted = spans.sortBy(_.start)
    val sb = new java.lang.StringBuilder(text.length)
    var cursor = 0
    for (s <- sorted) {
      if (s.start >= cursor) {
        sb.append(text, cursor, s.start)
        sb.append(maskToken(s.text))
        cursor = s.end
      }
    }
    sb.append(text, cursor, text.length)
    sb.toString
  }

  /** Redaction guarantee (redaction.py:48-54): no raw span text may appear in
    * the redacted payload. Returns true when the guarantee holds. */
  def noRawPii(redacted: String, spans: Seq[Span]): Boolean =
    spans.iterator.map(_.text).filter(_.nonEmpty).forall(t => !redacted.contains(t))

  /** Context windows: redact the whole text once, then slice
    * [start-window, end+window] per span from the REDACTED text (offsets align
    * because redaction is length-preserving). Reference: redaction.py:57-72;
    * the ensemble calls with window=48 (ensemble.py:71). */
  def contexts(text: String, spans: Seq[Span], window: Int = 32): Seq[String] = {
    val red = redactText(text, spans)
    spans.map { s =>
      val left = math.max(0, s.start - window)
      val right = math.min(text.length, s.end + window)
      red.substring(left, right)
    }
  }
}
