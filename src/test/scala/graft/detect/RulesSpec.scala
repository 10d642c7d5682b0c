package graft.detect

import org.scalatest.funsuite.AnyFunSuite

import graft.core.PiiTypes

/** Parity with the reference rules layer: fixtures and expected outputs from
  * tests/test_rules.py:5-22 and tests/test_rules_advanced.py:13-69, verified
  * byte-for-byte against the reference implementation during development. */
class RulesSpec extends AnyFunSuite {

  val canonical = "Contact John Doe at john.doe@example.com or (415) 555-1212. " +
    "Card 4111 1111 1111 1111 and SSN 123-45-6789."

  test("canonical fixture: spans, labels, confidences, order") {
    val got = Rules.proposeCandidates(canonical)
      .map(c => (c.start, c.end, c.value, c.ruleLabel, c.ruleConfidence))
    assert(got == Vector(
      (20, 40, "john.doe@example.com", PiiTypes.EMAIL, 0.95),
      (44, 58, "(415) 555-1212", PiiTypes.PHONE_NUMBER, 0.85),
      (65, 84, "4111 1111 1111 1111", PiiTypes.CREDIT_CARD, 0.9),
      (93, 104, "123-45-6789", PiiTypes.SSN, 0.9),
      (0, 12, "Contact John", PiiTypes.PERSON, 0.4)))
  }

  test("credit card candidate carries its Luhn validation flag") {
    val cc = Rules.proposeCandidates(canonical).find(_.ruleLabel == PiiTypes.CREDIT_CARD).get
    assert(cc.validations == Map(PiiTypes.CREDIT_CARD -> true))
  }

  test("MAC / PAN / DOB-boosted date fixture") {
    val got = Rules.proposeCandidates("Device MAC aa:bb:cc:dd:ee:ff, PAN ABCDE1234F, DOB: 31/12/1990")
      .map(c => (c.start, c.end, c.value, c.ruleLabel, c.ruleConfidence))
    assert(got == Vector(
      (11, 28, "aa:bb:cc:dd:ee:ff", PiiTypes.MAC_ADDRESS, 0.9),
      (34, 44, "ABCDE1234F", PiiTypes.PAN, 0.9),
      (51, 61, "31/12/1990", PiiTypes.DATE, 0.7999999999999999)))
  }

  test("date without DOB context keeps confidence 0.7") {
    val got = Rules.proposeCandidates("shipped on 2024-05-17 ok")
    assert(got.map(c => (c.ruleLabel, c.ruleConfidence)) == Vector((PiiTypes.DATE, 0.7)))
  }

  test("negative fixtures do not label") {
    // bad PAN (5 digits), bad aadhaar (rejected by Verhoeff), bad Luhn
    assert(Rules.proposeCandidates("code ABCDE12345 x").isEmpty)
    assert(!Rules.proposeCandidates("num 1234 5678 9012 x").exists(_.ruleLabel == PiiTypes.AADHAAR))
    assert(!Rules.proposeCandidates("Card 4111 1111 1111 1112 x")
      .exists(_.ruleLabel == PiiTypes.CREDIT_CARD))
  }

  test("PAN matches case-insensitively (re.IGNORECASE parity)") {
    val got = Rules.proposeCandidates("pan abcde1234f here")
    assert(got.map(_.ruleLabel).contains(PiiTypes.PAN))
  }

  test("ipv4 octet bounds") {
    assert(Rules.proposeCandidates("ip 255.255.255.255 ok").exists(_.ruleLabel == PiiTypes.IP_ADDRESS))
    assert(!Rules.proposeCandidates("ip 256.1.1.1 ok").exists(_.ruleLabel == PiiTypes.IP_ADDRESS))
  }

  test("type gating (RulesConfig.enabled semantics)") {
    val only = Set(PiiTypes.EMAIL)
    val got = Rules.proposeCandidates(canonical, only.contains)
    assert(got.map(_.ruleLabel).distinct == Vector(PiiTypes.EMAIL))
  }

  test("keyword candidates: first keyword per (field,type) wins") {
    // fixture from tests/test_rules_advanced.py:42-51
    val got = Rules.keywordCandidates(Seq(
      "name" -> "user_pan_number",
      "description" -> "primary email address for contact"))
    val byLabel = got.groupBy(_.ruleLabel)
    assert(byLabel(PiiTypes.PAN).head.value == "pan")
    assert(byLabel(PiiTypes.EMAIL).head.value == "email")
    assert(got.forall(_.ruleConfidence == 0.6))
    // "contact" in description also hits PHONE_NUMBER's keyword list
    assert(byLabel.contains(PiiTypes.PHONE_NUMBER))
    // at most one candidate per (field, type)
    assert(got.size == got.map(c => (c.value, c.ruleLabel)).distinct.size ||
      got.groupBy(identity).forall(_._2.size == 1))
  }
}
