package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Truth tables from the reference suite (tests/test_rules.py,
  * tests/test_rules_advanced.py). */
class ChecksumsSpec extends AnyFunSuite {

  test("luhn accepts known-valid cards") {
    assert(Checksums.luhn("4111 1111 1111 1111"))
    assert(Checksums.luhn("4111111111111111"))
    assert(Checksums.luhn("5500-0000-0000-0004"))
  }

  test("luhn rejects invalid checksum and wrong lengths") {
    assert(!Checksums.luhn("4111 1111 1111 1112"))
    assert(!Checksums.luhn("1234 5678 9012"))      // 12 digits < 13
    assert(!Checksums.luhn("12345678901234567890")) // 20 digits > 19
    assert(!Checksums.luhn(""))
  }

  test("luhn check digit closes any 13-19 digit payload") {
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(7) // payload 12..18, +1 check digit = 13..19
      val digits = Seq.fill(n)(rnd.nextInt(10))
      // compute Luhn check digit (datasets.py:30-50 _luhnify logic)
      val parity = (n + 1) % 2
      val s = digits.zipWithIndex.map { case (d, i) =>
        if (i % 2 == parity) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      val check = (10 - (s % 10)) % 10
      assert(Checksums.luhn(digits.mkString + check.toString))
    }
  }

  test("verhoeff validates aadhaar-like numbers") {
    // brute-force a valid one the way tests/test_rules_advanced.py:14-22 does
    val base = "23456789012"
    val valid = (0 to 9).map(d => base + d).find(Checksums.verhoeff)
    assert(valid.isDefined)
    assert(valid.get.length == 12)
    // exactly one check digit closes a payload
    assert((0 to 9).count(d => Checksums.verhoeff(base + d)) == 1)
  }

  test("verhoeff rejects wrong length, leading 0/1, broken checksum") {
    assert(!Checksums.verhoeff("1234 5678 9012")) // leading 1
    assert(!Checksums.verhoeff("234567890123456")) // 15 digits
    assert(!Checksums.verhoeff("0234 5678 9012")) // leading 0
    assert(!Checksums.verhoeff(""))
  }

  test("verhoeff ignores separators like the reference (re.sub \\D)") {
    val valid = (0 to 9).map(d => "23456789012" + d).find(Checksums.verhoeff).get
    val spaced = valid.grouped(4).mkString(" ")
    assert(Checksums.verhoeff(spaced))
  }
}
