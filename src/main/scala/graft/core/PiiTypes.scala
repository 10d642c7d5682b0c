package graft.core

/** The closed 11-value PII type universe.
  *
  * Mirrors the reference enum (reference: src/catalog_pii_scanner/pii_types.py:8-34).
  * The ordering of [[PiiTypes.ALL]] is load-bearing: the reference attributes
  * false positives with no label to index 0 (eval.py:44), and argmax tie-breaks
  * follow dict insertion order, which is this order.
  */
object PiiTypes {
  val EMAIL = "EMAIL"
  val PHONE_NUMBER = "PHONE_NUMBER"
  val CREDIT_CARD = "CREDIT_CARD"
  val SSN = "SSN"
  val IP_ADDRESS = "IP_ADDRESS"
  val MAC_ADDRESS = "MAC_ADDRESS"
  val AADHAAR = "AADHAAR"
  val PAN = "PAN"
  val PERSON = "PERSON"
  val ADDRESS = "ADDRESS"
  val DATE = "DATE"

  /** Stable ordering (pii_types.py:22-34). */
  val ALL: IndexedSeq[String] = IndexedSeq(
    EMAIL, PHONE_NUMBER, CREDIT_CARD, SSN, IP_ADDRESS, MAC_ADDRESS,
    AADHAAR, PAN, PERSON, ADDRESS, DATE)

  val indexOf: Map[String, Int] = ALL.zipWithIndex.toMap
}
