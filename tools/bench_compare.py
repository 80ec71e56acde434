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
    # only the '--json=PATH' form is valid; the space-separated
    # '--json PATH' form used to drop the flag but leave PATH in the
    # positional list, silently mis-comparing (ADVICE r11)
    bad = [a for a in sys.argv[1:]
           if a.startswith("--json") and not a.startswith("--json=")]
    if bad:
        sys.exit(f"use --json=PATH (got {bad[0]!r})")
    args = [a for a in sys.argv[1:] if not a.startswith("--json=")]
    json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--json=")), None)
    before_p, after_p = args[0], args[1]
    floor = float(args[2]) if len(args) > 2 else 1.3
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
    # box-speed adjudication line (r11; VERDICT r10 #2): cpu_mark is
    # a LABEL, not a divisor (the marks themselves wobble with
    # neighbor noise), so print the mark ratio + a mark-normalized
    # total as a first-order correction and warn loudly when the
    # boxes differ — a uniform ratio band near the mark ratio is a
    # box constant, an outlier operator is a real regression.
    mb, ma = b.get("cpu_mark"), a.get("cpu_mark")
    if not mb or not ma:
        missing = [p for p, m in ((before_p, mb), (after_p, ma))
                   if not m]
        print("WARNING: no cpu_mark in "
              + ", ".join(missing)
              + " — cross-box wall-clock ratios are uninterpretable;"
              " prefer same-box A/Bs / value contracts")
    else:
        inv = {}
        for k in ("st_mops", "mt_gflops"):
            if mb.get(k) and ma.get(k):
                inv[k] = mb[k] / ma[k]  # >1 = after box slower
        line = (f"cpu_mark before st={mb.get('st_mops')}"
                f"/mt={mb.get('mt_gflops')} after "
                f"st={ma.get('st_mops')}/mt={ma.get('mt_gflops')}")
        if inv:
            norm = {k: (ta / tb) / v for k, v in inv.items()}
            line += ("; mark-normalized total ratio "
                     + " ".join(f"{k.split('_')[0]}={r:.3f}"
                                for k, r in norm.items()))
        print(line)
        if any(v > 1.2 or v < 1 / 1.2 for v in inv.values()):
            print("WARNING: cross-box comparison (cpu_mark differs "
                  ">1.2x) — judge the ratio DISTRIBUTION (uniform "
                  "band = box constant), not raw seconds")
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
    if json_out:
        # the SURVEY-citable summary as a committed artifact, so the
        # citation audit can verify the prose against it (r11)
        with open(json_out, "w") as fh:
            fh.write(json.dumps({
                "metric": "bench_compare",
                "before": before_p, "after": after_p,
                "n_shared": len(shared),
                "total_before_s": round(tb, 2),
                "total_after_s": round(ta, 2),
                "ratio": round(ta / tb, 3),
                "median_ratio": round(
                    statistics.median(ratios.values()), 3),
                "floor": floor,
                "over_floor": [
                    {"query": k, "before_s": round(bq[k], 2),
                     "after_s": round(aq[k], 2),
                     "ratio": round(r, 2)} for k, r in over],
                "top_wins": [
                    {"query": k, "before_s": round(bq[k], 2),
                     "after_s": round(aq[k], 2),
                     "ratio": round(r, 2)} for k, r in wins],
                "new": {k: aq[k] for k in new},
                "dropped": gone,
                "cpu_mark_before": mb, "cpu_mark_after": ma,
            }) + "\n")


if __name__ == "__main__":
    main()
