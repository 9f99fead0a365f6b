"""Regression gate between two bench.py artifacts.

    python tools/bench_compare.py BENCH_r03.json BENCH_new.json [ratio]

Compares the per-query timings on the SHARED query set and exits non-zero
when any shared query regressed by more than ``ratio`` (default 1.3x) AND
by more than an absolute floor of 0.15 s (sub-150 ms queries are pure
single-JVM scheduling noise — a 40 ms -> 70 ms swing is not a plan
regression).  Prints a sorted delta table either way, so a neutral run
doubles as the round-over-round accounting for SCALE.md.
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_SEC = 0.15


def load(path):
    with open(path) as fh:
        data = json.load(fh)
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    qs = {k: v for k, v in data.get("queries", {}).items() if v is not None}
    return qs, data.get("aa_rerun_ratio") or {}


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    (old, _aa_o), (new, aa_n) = load(sys.argv[1]), load(sys.argv[2])
    ratio_gate = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries between artifacts")
        sys.exit(2)
    rows, failures = [], []
    for q in shared:
        o, n = old[q], new[q]
        ratio = (n / o) if o else float("inf")
        rows.append((ratio, q, o, n))
        if ratio > ratio_gate and (n - o) > ABS_FLOOR_SEC:
            failures.append(q)
    rows.sort(reverse=True)
    print(f"{'query':28s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for ratio, q, o, n in rows:
        flag = "  <-- REGRESSION" if q in failures else ""
        print(f"{q:28s} {o:8.3f} {n:8.3f} {ratio:7.2f}{flag}")
    tot_o = sum(old[q] for q in shared)
    tot_n = sum(new[q] for q in shared)
    print(f"\nshared set: {len(shared)} queries, total "
          f"{tot_o:.2f}s -> {tot_n:.2f}s ({tot_n / tot_o:.2f}x)")
    if aa_n:
        band = ", ".join(f"{q} {r:.2f}x" for q, r in sorted(aa_n.items()))
        print(f"A/A noise band (same JVM, identical code, end-of-run "
              f"re-time): {band}")
    if failures:
        print(f"FAIL: {len(failures)} quer{'y' if len(failures) == 1 else 'ies'} "
              f"regressed past {ratio_gate}x: {', '.join(failures)}")
        sys.exit(1)
    print("OK: no shared query regressed past the gate")


if __name__ == "__main__":
    main()
