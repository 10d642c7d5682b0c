package graft.util

import graft.core.Span
import graft.detect.{LogScrubber, Redaction}

/** Structured, scrub-first logging (reference: logging_utils.py).
  *
  * JSON-line records with ISO-8601 UTC timestamps and correlation IDs carried
  * in an inheritable thread-local (the JVM analogue of contextvars — child
  * task threads inherit the scan's ID). `safeLog` is the only data-plane
  * entry point and scrubs every provided span's text out of the payload
  * before it can reach a sink, plus logs only the REDACTED form of any raw
  * text (logging_utils.py:188-210). Driver-side: Spark executor logging goes
  * through log4j, and nothing in the engine ships raw values into log
  * payloads in the first place.
  */
object SafeLog {

  private val corr = new InheritableThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  def newCorrelationId(): String = java.util.UUID.randomUUID().toString

  def correlationId: Option[String] = corr.get()

  /** Run `body` under a correlation ID (new one if absent), restoring the
    * previous ID afterwards (correlation_context, logging_utils.py:37-47). */
  def withCorrelation[A](id: String = newCorrelationId())(body: => A): A = {
    val prev = corr.get()
    corr.set(Some(id))
    try body finally corr.set(prev)
  }

  private def nowIso: String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + jsonEscape(s) + "\""
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double => n.toString
    case xs: Seq[_] => xs.map(jsonValue).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => "\"" + jsonEscape(k.toString) + "\":" + jsonValue(x) }
        .mkString("{", ",", "}")
    case other => "\"" + jsonEscape(other.toString) + "\""
  }

  /** Format one record as a JSON line (JsonFormatter parity: time, level,
    * logger, payload fields, correlation_id when set). */
  def formatRecord(level: String, payload: Map[String, Any],
                   logger: String = "graft"): String = {
    val base = Map("time" -> nowIso, "level" -> level, "logger" -> logger)
    val withCid = correlationId.fold(base)(id => base + ("correlation_id" -> id))
    jsonValue(withCid ++ payload)
  }

  /** Structured log with mandatory scrubbing: span texts are deduped and
    * masked across every string field; raw `text` is logged only redacted.
    * Returns the emitted line (stderr sink, like the reference). */
  def safeLog(event: String, details: Map[String, Any] = Map.empty,
              level: String = "INFO", text: Option[String] = None,
              piiSpans: Seq[Span] = Seq.empty): String = {
    // dedupe spans by text FIRST (logging_utils.py:149-158) — both the
    // redaction and the scrub see the deduped list
    val deduped = piiSpans.filter(_.text.nonEmpty)
      .foldLeft(Vector.empty[Span])((acc, s) =>
        if (acc.exists(_.text == s.text)) acc else acc :+ s)
    val spanTexts = deduped.map(_.text)
    val payload = Map("event" -> event) ++
      text.filter(_ => spanTexts.nonEmpty).map(t =>
        "redacted_text" -> Redaction.redactText(t, deduped)).toMap ++
      details.map { case (k, v) => k -> LogScrubber.scrubAny(v, spanTexts) }
    val line = formatRecord(level, payload)
    System.err.println(line)
    line
  }
}
