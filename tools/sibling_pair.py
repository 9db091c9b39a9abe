#!/usr/bin/env python3
"""Window-invariant sibling/slot decomposition from an order-alternated
bench pair (BASELINE.md r13, "window-invariant decomposition").

Two back-to-back scale sessions can differ ~2x in ambient window with all
four markers quiet, so raw cross-session slot-matching is confounded. With
intrinsic sibling costs c (run first in session A) and p (run first in
session B), session-cold slot surcharge S, and unknown per-session window
scales wA/wB, the within-session cold/warm ratios are rA = cS/p and
rB = pS/c — the window scales cancel — giving

    sibling gap  c/p = sqrt(rA/rB)
    slot surcharge S = sqrt(rA*rB)

Usage: tools/sibling_pair.py <sessionA.json> <sessionB.json>
where each file holds Bench's per-query stdout JSON line (the one with
"queries") from a 2-query SPARK_GRAFT_ONLY run; session A ran query X
first, session B ran the SAME two queries in the opposite order. Order is
taken from the artifacts themselves via bench_full-style files if present;
for the stdout line (which carries no order), pass A's cold query name as
an optional third argument (default: the lexicographically FIRST name is
assumed cold in A — override if wrong).
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
        raise SystemExit(f"no per-query JSON line in {path}")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    names = sorted(qa)
    if len(names) != 2 or sorted(qb) != names:
        raise SystemExit(f"expected the same 2 queries in both: {names} vs {sorted(qb)}")
    cold_a = sys.argv[3] if len(sys.argv) > 3 else names[0]
    if cold_a not in qa:
        raise SystemExit(f"{cold_a} not in {names}")
    warm_a = names[1] if cold_a == names[0] else names[0]
    # B ran the opposite order: warm_a is B's cold query
    ra = qa[cold_a] / qa[warm_a]
    rb = qb[warm_a] / qb[cold_a]
    gap = math.sqrt(ra / rb)      # cost(cold_a query) / cost(other)
    slot = math.sqrt(ra * rb)
    print(json.dumps({
        "cold_in_A": cold_a, "cold_in_B": warm_a,
        "rA": round(ra, 3), "rB": round(rb, 3),
        "sibling_gap": round(gap, 3), "sibling_gap_of": cold_a,
        "slot_surcharge": round(slot, 3),
        "markers_A": {k: a.get(k) for k in
                      ("spin_ms", "membw_mt_ms", "membw_mt_end_ms", "fsmeta_ms")},
        "markers_B": {k: b.get(k) for k in
                      ("spin_ms", "membw_mt_ms", "membw_mt_end_ms", "fsmeta_ms")},
    }))


if __name__ == "__main__":
    main()
