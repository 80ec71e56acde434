"""Round-over-round bench comparison, GENERATED from the artifacts —
never hand-counted (SURVEY rule adopted r10 after §16.7 understated
the r9 sf10 outliers: any "N rows above X" claim in SURVEY must be
this tool's output, pasted).

Usage:
  python tools/bench_compare.py BEFORE.json AFTER.json [ratio_floor]

Prints shared-query count, total/median ratio, every row whose
after/before ratio exceeds ratio_floor (default 1.3), and the top
wins — as a paste-ready block.
"""
from __future__ import annotations

import json
import statistics
import sys


def load(p: str) -> dict:
    with open(p) as fh:
        for ln in fh.read().splitlines():
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    sys.exit(f"no parseable JSON line in {p}")


def main() -> None:
    before_p, after_p = sys.argv[1], sys.argv[2]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    b, a = load(before_p), load(after_p)
    bq = {k: v for k, v in b["queries"].items() if v and v > 0}
    aq = {k: v for k, v in a["queries"].items() if v and v > 0}
    shared = sorted(set(bq) & set(aq))
    if not shared:
        sys.exit("no shared queries")
    ratios = {k: aq[k] / bq[k] for k in shared}
    tb = sum(bq[k] for k in shared)
    ta = sum(aq[k] for k in shared)
    over = sorted(((k, r) for k, r in ratios.items() if r > floor),
                  key=lambda kv: -kv[1])
    wins = sorted(ratios.items(), key=lambda kv: kv[1])[:5]
    new = sorted(set(aq) - set(bq))
    gone = sorted(set(bq) - set(aq))
    print(f"shared-{len(shared)} total {tb:.2f} -> {ta:.2f} s — "
          f"ratio {ta / tb:.3f} (median "
          f"{statistics.median(ratios.values()):.3f})")
    print(f"{len(over)} row(s) above {floor}x:"
          + ("" if over else " none"))
    for k, r in over:
        print(f"  {k}: {bq[k]:.2f} -> {aq[k]:.2f} s ({r:.2f}x)")
    print("top wins:")
    for k, r in wins:
        print(f"  {k}: {bq[k]:.2f} -> {aq[k]:.2f} s ({r:.2f}x)")
    if new:
        print("new queries: " + ", ".join(
            f"{k} {aq[k]:.2f} s" for k in new))
    if gone:
        print("dropped queries: " + ", ".join(gone))


if __name__ == "__main__":
    main()
