"""Diff two bench JSON lines: per-query ratios, regressions, new queries.

    python tools/bench_compare.py BENCH_r02.json BENCH_r03.json
"""

import json
import sys


def load(path):
    d = json.load(open(path))
    return (d.get("parsed") or d) if "parsed" in d or "queries" in d else d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"old total {old['value']}s/{len(oq)}q  new total "
          f"{new['value']}s/{len(nq)}q  shared {len(shared)}")
    print(f"shared-set sums: old {round(sum(oq[k] for k in shared), 2)}s  "
          f"new {round(sum(nq[k] for k in shared), 2)}s")
    regs = [(k, oq[k], nq[k]) for k in shared
            if nq[k] > oq[k] * 1.3 and nq[k] - oq[k] > 0.1]
    for k, a, b in sorted(regs, key=lambda r: r[1] - r[2]):
        print(f"  REG {k}: {a} -> {b}")
    adds = sorted(set(nq) - set(oq))
    if adds:
        print("new queries:", {k: nq[k] for k in adds})


if __name__ == "__main__":
    main()
