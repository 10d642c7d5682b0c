package graft.detect

import java.util.regex.Pattern

import graft.core.{Candidate, Checksums, PiiTypes, Span}

/** The rules layer: 10 regex detectors with fixed confidences, checksum gates,
  * and the metadata keyword heuristics.
  *
  * Patterns, confidences, and the detector *ordering* replicate the reference
  * (src/catalog_pii_scanner/rules.py:10-29, 106-166). Patterns are compiled
  * once per JVM (executor) — the Spark analogue of the reference's
  * module-level precompiled regexes.
  */
object Rules {

  val EMAIL_RE: Pattern = Pattern.compile("""\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b""")
  val PHONE_US_RE: Pattern =
    Pattern.compile("""(?:\+?\d{1,3}[\s.-]?)?(?:\(\d{3}\)|\d{3})[\s.-]?\d{3}[\s.-]?\d{4}\b""")
  val CC_RE: Pattern = Pattern.compile("""\b(?:\d[ -]*?){13,19}\b""")
  val SSN_RE: Pattern = Pattern.compile("""\b\d{3}-\d{2}-\d{4}\b""")
  val IPV4_RE: Pattern =
    Pattern.compile("""\b(?:(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\b""")
  val MAC_RE: Pattern = Pattern.compile("""\b(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}\b""")
  val DATE_RE: Pattern =
    Pattern.compile("""\b(?:\d{4}-\d{2}-\d{2}|\d{2}/\d{2}/\d{4}|\d{2}-\d{2}-\d{4})\b""")
  val AADHAAR_RE: Pattern = Pattern.compile("""\b([2-9][0-9]{3}[ -]?[0-9]{4}[ -]?[0-9]{4})\b""")
  val PAN_RE: Pattern = Pattern.compile("""\b([A-Z]{5}[0-9]{4}[A-Z])\b""", Pattern.CASE_INSENSITIVE)
  val PERSON_RE: Pattern = Pattern.compile("""\b([A-Z][a-z]+\s[A-Z][a-z]+)\b""")

  /** All matches of `p` in `text` as spans (rules.py:89-90). */
  def findRegex(text: String, p: Pattern): Seq[Span] = {
    val m = p.matcher(text)
    val out = Vector.newBuilder[Span]
    while (m.find()) out += Span(m.start, m.end, m.group(0))
    out.result()
  }

  /** The candidate pipeline: detectors run in fixed order, each appending its
    * matches (rules.py:106-166 — "Order matters a bit").
    *
    * @param enabled per-type enable gate (RulesConfig.enabled, rules.py:93-103)
    */
  def proposeCandidates(text: String, enabled: String => Boolean = _ => true): Vector[Candidate] = {
    val cands = Vector.newBuilder[Candidate]
    if (enabled(PiiTypes.EMAIL))
      for (s <- findRegex(text, EMAIL_RE))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.EMAIL, 0.95)
    if (enabled(PiiTypes.PHONE_NUMBER))
      for (s <- findRegex(text, PHONE_US_RE))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.PHONE_NUMBER, 0.85)
    if (enabled(PiiTypes.CREDIT_CARD))
      for (s <- findRegex(text, CC_RE); if Checksums.luhn(s.text))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.CREDIT_CARD, 0.9,
          Map(PiiTypes.CREDIT_CARD -> true))
    if (enabled(PiiTypes.SSN))
      for (s <- findRegex(text, SSN_RE))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.SSN, 0.9)
    if (enabled(PiiTypes.IP_ADDRESS))
      for (s <- findRegex(text, IPV4_RE))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.IP_ADDRESS, 0.9)
    if (enabled(PiiTypes.MAC_ADDRESS))
      for (s <- findRegex(text, MAC_RE))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.MAC_ADDRESS, 0.9)
    if (enabled(PiiTypes.AADHAAR))
      for (s <- findRegex(text, AADHAAR_RE); if Checksums.verhoeff(s.text))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.AADHAAR, 0.9,
          Map(PiiTypes.AADHAAR -> true))
    if (enabled(PiiTypes.PAN))
      for (s <- findRegex(text, PAN_RE))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.PAN, 0.9)
    if (enabled(PiiTypes.DATE))
      for (s <- findRegex(text, DATE_RE)) {
        // DOB context boost: ±8-char window, lowercased (rules.py:154-161)
        val left = math.max(0, s.start - 8)
        val right = math.min(text.length, s.end + 8)
        val ctx = text.substring(left, right).toLowerCase
        val boost = if (ctx.contains("dob") || ctx.contains("birth")) 0.1 else 0.0
        cands += Candidate(s.start, s.end, s.text, PiiTypes.DATE, 0.7 + boost)
      }
    if (enabled(PiiTypes.PERSON))
      for (s <- findRegex(text, PERSON_RE))
        cands += Candidate(s.start, s.end, s.text, PiiTypes.PERSON, 0.4)
    cands.result()
  }

  /** Metadata keyword table (rules.py:184-210). Tuple order within a type is
    * load-bearing: the first keyword found wins (rules.py:236-240). */
  val KEYWORDS: Seq[(String, Seq[String])] = Seq(
    PiiTypes.EMAIL -> Seq("email", "e-mail", "mailid", "mail_id", "email_address", "primary_email"),
    PiiTypes.PHONE_NUMBER -> Seq("phone", "mobile", "cell", "contact", "telephone", "mobile_no", "phone_number"),
    PiiTypes.SSN -> Seq("ssn", "social_security"),
    PiiTypes.AADHAAR -> Seq("aadhaar", "aadhar", "uidai", "uid"),
    PiiTypes.PAN -> Seq("pan", "pan_no", "pan_number"),
    PiiTypes.CREDIT_CARD -> Seq("card", "credit", "cc", "cc_number"),
    PiiTypes.IP_ADDRESS -> Seq("ip", "ipv4", "ipv6"),
    PiiTypes.MAC_ADDRESS -> Seq("mac", "mac_address"),
    PiiTypes.DATE -> Seq("dob", "date_of_birth", "birthdate"),
    PiiTypes.PERSON -> Seq("name", "first_name", "last_name", "full_name"))

  /** Keyword candidates from (field, value) metadata pairs: per value and
    * per type, the FIRST keyword (in tuple order) found in the lowercased
    * value emits one candidate at its found index, confidence 0.6
    * (rules.py:213-241). */
  def keywordCandidates(pairs: Seq[(String, String)],
                        enabled: String => Boolean = _ => true): Vector[Candidate] = {
    val out = Vector.newBuilder[Candidate]
    for ((_, value) <- pairs; if value != null && value.nonEmpty) {
      val hay = value.toLowerCase
      for ((t, kws) <- KEYWORDS; if enabled(t)) {
        kws.iterator.map(kw => (kw, hay.indexOf(kw))).find(_._2 != -1).foreach {
          case (kw, idx) =>
            out += Candidate(idx, idx + kw.length, value.substring(idx, idx + kw.length), t, 0.6)
        }
      }
    }
    out.result()
  }
}
