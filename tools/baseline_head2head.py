#!/usr/bin/env python3
"""Head-to-head: reference pipeline (CPython) vs this engine, same inputs.

Times the reference's own code (/root/reference, CPS_OFFLINE semantics) on the
exact derived texts p02/p06/p07 process at a given SF. Engine-side numbers come
from `runMain graft.cli.BenchOne <query> <sfDir>` (warm rounds).

  python3 tools/baseline_head2head.py [sfDir]
"""
import os
import sys
import time

os.environ["CPS_OFFLINE"] = "1"
sys.path.insert(0, "/root/reference/src")

import duckdb  # noqa: E402

from catalog_pii_scanner import ner  # noqa: E402
from catalog_pii_scanner.embeddings import EmbedModel  # noqa: E402
from catalog_pii_scanner.ensemble import Calibrator, Ensemble  # noqa: E402
from catalog_pii_scanner.eval import _match, _prf  # noqa: E402
from catalog_pii_scanner.pii_types import ALL_PII_TYPES, PIIType, Prediction  # noqa: E402
from catalog_pii_scanner.rules import propose_candidates  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

# The exact PiiInputs.sql construction the Spark queries and oracles use.
PII_INPUTS_SQL = open(os.path.join(os.path.dirname(__file__), "pii_inputs.sql")).read()


def load_texts():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'")
    rows = con.execute(PII_INPUTS_SQL + " ORDER BY doc_id").fetchall()
    return rows  # [(doc_id, text)]


def time_p02(rows):
    """Full offline detection: propose_candidates + Ensemble.predict."""
    # Same construction as the reference CLI's scan_text: offline EmbedModel
    # (no joblib on disk -> neutral) + identity calibrator fallback.
    ens = Ensemble(embed=EmbedModel(clf_path="/nonexistent/embed.joblib"),
                   calibrator=Calibrator.load("/nonexistent/calibrator.joblib"))
    t0 = time.perf_counter()
    n = 0
    for _doc_id, text in rows:
        cands = propose_candidates(text)
        try:
            preds = ens.predict(text, cands)
            n += len(preds)
        except AssertionError:
            # The reference's redaction-guarantee assert crashes on texts whose
            # mask is a fixed point (e.g. an all-zero card). Count and continue
            # so the loop covers the same rows the engine covers.
            n += len(cands)
    return time.perf_counter() - t0, n


def time_p06(rows):
    """NER (offline provider) + per-type max-merge with rules."""
    provider = ner.SpaCyProvider()  # no spaCy installed -> regex fallback path
    t0 = time.perf_counter()
    n = 0
    texts = [t for _d, t in rows]
    spans_per_text = ner.detect_ner_spans(texts, provider=provider)
    for (_doc_id, text), spans in zip(rows, spans_per_text):
        merged = ner.merge_with_rules(text, spans)
        n += len(merged)
    return time.perf_counter() - t0, n


def time_p07(rows):
    """Greedy span matching + PRF, doc-scoped.

    NOTE: the reference's own run_eval pools predictions and golds GLOBALLY,
    which is O(P*G) in pure Python — at 15k docs (~165k preds) that is ~1e10
    span comparisons and does not complete in reasonable time. We therefore
    time its matching kernel per doc (identical semantics to the engine's
    distributed per-doc evaluator and to what p07 computes), which is the
    strongest defensible baseline the reference code can produce at this SF.
    """
    t0 = time.perf_counter()
    gold_types = {PIIType.EMAIL, PIIType.SSN, PIIType.MAC_ADDRESS, PIIType.DATE}
    tallies = {t: [0, 0, 0] for t in ALL_PII_TYPES}
    TP = FP = FN = 0
    for _doc_id, text in rows:
        cands = propose_candidates(text)
        preds = [
            Prediction(span=c.span, probs={}, label=c.rule_label, score=c.rule_confidence)
            for c in cands
        ]
        gold = [(c.span, c.rule_label) for c in cands if c.rule_label in gold_types]
        # one deliberately-unmatchable ADDRESS gold per doc: the IP span retyped
        ip = next((c for c in cands if c.rule_label == PIIType.IP_ADDRESS), None)
        if ip is not None:
            gold.append((ip.span, PIIType.ADDRESS))
        tp, fp, fn, per_type = _match(preds, gold)
        TP += tp
        FP += fp
        FN += fn
        for t, (a, b, c2) in per_type.items():
            tallies[t][0] += a
            tallies[t][1] += b
            tallies[t][2] += c2
    micro = _prf(TP, FP, FN)
    return time.perf_counter() - t0, micro


def main():
    rows = load_texts()
    print(f"docs={len(rows)} sf_dir={SF_DIR}")
    # min-of-2 passes per head: the SAME retry protocol the engine's bench
    # applies to its heavy tail (graft.Bench re-runs every >=2 s query and
    # reports min of 2 warm passes), so head-to-head ratios compare like
    # with like instead of engine-min vs reference-single (round-11 advice).
    for name, fn in [("p02", time_p02), ("p06", time_p06), ("p07", time_p07)]:
        dt1, info = fn(rows)
        dt2, _ = fn(rows)
        dt = min(dt1, dt2)
        print(f"ref_{name}: {dt:.2f}s min-of-2 (passes {dt1:.2f}/{dt2:.2f})  "
              f"({len(rows) / dt:.0f} docs/s)  info={info}")


if __name__ == "__main__":
    main()
