package graft.core

/** Pure checksum validators used as candidate gates by the rules layer.
  * Reference: src/catalog_pii_scanner/rules.py:35-86. */
object Checksums {

  /** Luhn checksum over the digits of `number` (non-digits stripped).
    * Accepts only 13-19 digit payloads. Reference: rules.py:35-47. */
  def luhn(number: String): Boolean = {
    var n = 0
    var i = 0
    while (i < number.length) { if (Character.isDigit(number.charAt(i))) n += 1; i += 1 }
    if (n < 13 || n > 19) return false
    val parity = n % 2
    var sum = 0
    var di = 0
    i = 0
    while (i < number.length) {
      val ch = number.charAt(i)
      if (Character.isDigit(ch)) {
        var d = ch - '0'
        if (di % 2 == parity) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        di += 1
      }
      i += 1
    }
    sum % 10 == 0
  }

  // Verhoeff multiplication / permutation tables (rules.py:51-77).
  private val D: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    Array(1, 2, 3, 4, 0, 6, 7, 8, 9, 5),
    Array(2, 3, 4, 0, 1, 7, 8, 9, 5, 6),
    Array(3, 4, 0, 1, 2, 8, 9, 5, 6, 7),
    Array(4, 0, 1, 2, 3, 9, 5, 6, 7, 8),
    Array(5, 9, 8, 7, 6, 0, 4, 3, 2, 1),
    Array(6, 5, 9, 8, 7, 1, 0, 4, 3, 2),
    Array(7, 6, 5, 9, 8, 2, 1, 0, 4, 3),
    Array(8, 7, 6, 5, 9, 3, 2, 1, 0, 4),
    Array(9, 8, 7, 6, 5, 4, 3, 2, 1, 0))
  private val P: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    Array(1, 5, 7, 6, 2, 8, 3, 0, 9, 4),
    Array(5, 8, 0, 3, 7, 9, 6, 1, 4, 2),
    Array(8, 9, 1, 6, 0, 4, 3, 5, 2, 7),
    Array(9, 4, 5, 3, 1, 2, 6, 8, 7, 0),
    Array(4, 2, 8, 6, 5, 7, 3, 9, 0, 1),
    Array(2, 7, 9, 3, 8, 0, 6, 4, 1, 5),
    Array(7, 0, 4, 6, 9, 1, 3, 2, 5, 8))

  /** Verhoeff check for Aadhaar: exactly 12 digits after stripping,
    * leading digit not 0/1, right-to-left table recurrence ends at 0.
    * Reference: rules.py:80-86. */
  def verhoeff(number: String): Boolean = {
    val s = number.filter(Character.isDigit)
    if (s.length != 12) return false
    val c0 = s.charAt(0)
    if (c0 == '0' || c0 == '1') return false
    var c = 0
    var i = 0
    while (i < 12) {
      val ch = s.charAt(11 - i) - '0'
      c = D(c)(P(i % 8)(ch))
      i += 1
    }
    c == 0
  }
}
