#!/usr/bin/env python3
"""Regenerate src/test/resources/golden_fuzz_r4.jsonl by RUNNING the reference
implementation over an adversarial corpus: boundary-jammed fragments, invalid
lookalikes, unicode, and overlap traps. Texts whose masks are fixed points
(e.g. all-zero digit runs) CRASH the reference's redaction-guarantee assert
and are excluded — the engine treats that guarantee as a test invariant, not
a data-plane abort (see BASELINE.md §C).

  python3 tools/gen_fuzz_golden.py > src/test/resources/golden_fuzz_r4.jsonl
"""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference/src")
os.environ["CPS_OFFLINE"] = "1"

from catalog_pii_scanner.redaction import contexts_for_candidates, redact_text  # noqa: E402
from catalog_pii_scanner.rules import propose_candidates  # noqa: E402

FRAGMENTS = [
    "4111 1111 1111 1111", "4111-1111-1111-1111", "4111111111111111",
    "123-45-6789", "999-99-9999", "000-12-3456",
    "a@b.co", "weird+tag@sub.domain.example.travel", "no@tld", "@nope.com", "x@y.z",
    "(415) 555-1212", "415.555.1212", "+1 415 555 1212", "41555512123456",
    "10.0.0.1", "255.255.255.255", "256.1.1.1", "1.2.3.4.5",
    "aa:bb:cc:dd:ee:ff", "AA-BB-CC-DD-EE-FF", "aa:bb:cc:dd:ee",
    "2345 6789 0123", "234567890123", "1234 5678 9012",
    "ABCDE1234F", "abcde1234f", "AbCdE1234f", "ABCDE12345",
    "2024-02-29", "2024-13-01", "31/12/2024", "12/31/2024", "00-00-0000",
    "DOB: 1999-01-01", "dob 2000-12-31",
    "Mr. Smith", "John Smith", "JOHN SMITH", "john smith",
    "señor Müller", "Ünïcode Tëxt", "数字 123", "émail@exämple.com",
    "", " ", "  ,,;;  ", "....", "\t\n", "0" * 200,
]
SEPARATORS = ["", " ", ",", ";", " and ", "\n", ":", "<", ">"]
EXTRA = [
    "Card 4111 1111 1111 1111 Aadhaar 2345 6789 0123 done",
    "23456789012345678901", "SSN 123-45-6789-000",
    "ip 10.1.2.3:8080 mac aa:bb:cc:dd:ee:ff",
    "email a@b.co.  Card: 5500 0000 0000 0004!",
    "DOB: 2024-01-02 2024-03-04 2024-05-06",
]


def main():
    rnd = random.Random(20260812)
    texts = list(FRAGMENTS)
    for _ in range(120):
        k = rnd.randint(2, 4)
        texts.append(rnd.choice(SEPARATORS).join(rnd.choice(FRAGMENTS) for _ in range(k)))
    texts += EXTRA
    crashes = 0
    for t in texts:
        try:
            cands = propose_candidates(t)
            red = redact_text(t, [c.span for c in cands]).redacted_text
            ctx = contexts_for_candidates(t, cands, window=48)
            print(json.dumps({
                "text": t,
                "candidates": [
                    {"start": c.span.start, "end": c.span.end, "value": c.span.text,
                     "label": c.rule_label.value if c.rule_label else None,
                     "conf": c.rule_confidence,
                     "valid": {k.value: v for k, v in (c.validations or {}).items()}}
                    for c in cands],
                "redacted": red,
                "contexts": [ctx[i] for i in range(len(cands))],
            }, ensure_ascii=False))
        except AssertionError:
            crashes += 1  # reference redaction-guarantee fixed-point crash
    print(f"excluded {crashes} reference-crashing texts", file=sys.stderr)


if __name__ == "__main__":
    main()
