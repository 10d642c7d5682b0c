#!/usr/bin/env python3
"""Compare two Bench artifacts (full-line JSON, first line of each file):
per-query warm ratios b/a, sorted descending. Used for run-to-run agreement
checks and for the 10x ScaleUp stress table.

Usage: python3 tools/ratio.py A.json B.json [flag_threshold]
"""
import json
import sys


def load(p):
    return json.loads(open(p).read().splitlines()[0])


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in qa:
        if k in qb:
            # floor tiny denominators: a 0.05s -> 0.12s jump is noise, not drift
            ra = max(qa[k], 0.15)
            rows.append((max(qb[k], 0.15) / ra, k, qa[k], qb[k]))
    rows.sort(reverse=True)
    n_flag = 0
    for r, k, va, vb in rows:
        mark = " <-- FLAG" if (r > thr or r < 1 / thr) else ""
        if mark:
            n_flag += 1
        print(f"{k:36s} a={va:7.3f} b={vb:7.3f} ratio={r:5.2f}{mark}")
    print(f"== totals: a={a['value']:.1f}s b={b['value']:.1f}s "
          f"ratio={b['value']/a['value']:.2f}; {n_flag}/{len(rows)} flagged at {thr}x ==")


if __name__ == "__main__":
    main()
