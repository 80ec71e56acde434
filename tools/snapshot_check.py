"""Pre-snapshot integrity check (r12; VERDICT r11 items 1-2).

Round 11 shipped two evidence-chain wounds this tool exists to make
impossible to repeat:

  * the end-of-round snapshot commit truncated a bench artifact to
    0 bytes (BENCH_r11_streaming.json), leaving SURVEY citations
    unbacked;
  * 144 lines of product code landed AFTER round_gate.py ran, so the
    gate artifact no longer certified the tree it shipped with.

Run this as the LAST step before the end-of-round commit:

  python tools/snapshot_check.py --round 12

Checks (all must pass; exit 1 otherwise):
  1. every git-tracked artifact in the repo root (BENCH_* / SCALE_* /
     AB_* / CORRECTNESS_* / ROUND_GATE_* / COPYCHECK / LEAKCHECK /
     BASELINE .json) is non-empty and parses as JSON or JSONL;
  2. no tracked root artifact is DIRTY — working tree differs from
     the committed blob (r13; VERDICT r12 #1: the at-HEAD gate
     re-run sat uncommitted in the working tree while the committed
     gate recorded a superseded head_sha, and this tool verified the
     working tree and passed — commit artifact updates FIRST, then
     run the check);
  3. the round's gate artifact exists, its recorded ``product_hash``
     equals a fresh hash of the working tree's product files
     (pandas_alchemy_spark/**, tests/**, __spark_entry__.py, bench.py
     — see round_gate.PRODUCT_GLOBS), and its gates all passed;
  4. tools/verify_survey_citations.py --round N exits clean.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round_gate import product_state  # noqa: E402

ARTIFACT_PREFIXES = ("BENCH_", "SCALE_", "AB_", "CORRECTNESS_",
                     "ROUND_GATE_", "COPYCHECK", "LEAKCHECK",
                     "BASELINE")


def parseable(path: str) -> bool:
    with open(path) as fh:
        text = fh.read()
    if not text.strip():
        return False
    try:
        json.loads(text)
        return True
    except json.JSONDecodeError:
        lines = [ln for ln in text.splitlines() if ln.strip()]
        if not lines:
            return False
        try:
            for ln in lines:
                json.loads(ln)
            return True
        except json.JSONDecodeError:
            return False


def dirty_tracked_artifacts(repo: str) -> list[str]:
    """Tracked root artifacts whose working-tree content differs from
    the committed (HEAD) blob — modified or deleted.  Untracked new
    artifacts are NOT dirty (they ride the snapshot commit); a
    TRACKED one that differs means a certification was regenerated
    without being committed, exactly the r12 evidence-chain wound."""
    out = subprocess.run(
        ["git", "diff", "HEAD", "--name-status", "--", "*.json"],
        cwd=repo, capture_output=True, text=True).stdout.splitlines()
    dirty = []
    for ln in out:
        parts = ln.split("\t")
        if len(parts) < 2:
            continue
        rel = parts[-1]
        if "/" in rel or not rel.startswith(ARTIFACT_PREFIXES):
            continue
        dirty.append(rel)
    return sorted(dirty)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--gate", help="gate artifact path "
                    "(default ROUND_GATE_r{N}.json)")
    args = ap.parse_args()
    failures = []

    # 1. every tracked root artifact non-empty + parseable
    tracked = subprocess.run(
        ["git", "ls-files", "--cached", "--others", "--exclude-standard",
         "--", "*.json"],
        cwd=REPO, capture_output=True, text=True).stdout.splitlines()
    n_art = 0
    for rel in sorted(set(tracked)):
        if "/" in rel or not rel.startswith(ARTIFACT_PREFIXES):
            continue
        n_art += 1
        fp = os.path.join(REPO, rel)
        if os.path.getsize(fp) == 0:
            failures.append(f"artifact {rel} is 0 bytes")
        elif not parseable(fp):
            failures.append(f"artifact {rel} is not parseable JSON/JSONL")
    print(f"artifacts: {n_art} checked, "
          f"{sum('artifact' in f for f in failures)} bad")

    # 2. no tracked root artifact dirty vs its committed blob
    dirty = dirty_tracked_artifacts(REPO)
    for rel in dirty:
        failures.append(
            f"artifact {rel} is DIRTY (working tree != committed "
            "blob) — commit the regenerated artifact before "
            "snapshotting")
    print(f"dirty tracked artifacts: {len(dirty)}")

    # 3. gate artifact certifies the CURRENT product tree
    gate_path = args.gate or f"ROUND_GATE_r{args.round}.json"
    fp = os.path.join(REPO, gate_path)
    if not os.path.isfile(fp):
        failures.append(f"gate artifact {gate_path} missing")
    else:
        gate = json.load(open(fp))
        if not gate.get("ok"):
            failures.append(f"{gate_path}: gate did not pass (ok != true)")
        recorded = gate.get("product_hash")
        if recorded is None:
            failures.append(f"{gate_path}: no product_hash recorded "
                            "(pre-r12 gate format) — re-run round_gate.py")
        else:
            head, now = product_state()
            if recorded != now:
                failures.append(
                    f"{gate_path}: product files changed after the gate "
                    f"ran (recorded {recorded[:12]}, tree is {now[:12]}) "
                    "— re-run round_gate.py before snapshotting")
            else:
                print(f"gate: product_hash match ({now[:12]}, "
                      f"gate head {gate.get('head_sha', '?')[:12]})")

    # 4. citation audit clean
    p = subprocess.run(
        [sys.executable, "tools/verify_survey_citations.py",
         "--round", str(args.round)],
        cwd=REPO, capture_output=True, text=True)
    tail = p.stdout.strip().splitlines()
    print(f"citations: {tail[1] if len(tail) > 1 else 'NO OUTPUT'}")
    if p.returncode != 0:
        for ln in tail:
            if "UNMATCHED" in ln:
                print(f"  {ln.strip()}")
        failures.append("verify_survey_citations.py not clean")

    if failures:
        print("SNAPSHOT CHECK FAILED:")
        for f in failures:
            print(f"  - {f}")
        sys.exit(1)
    print("SNAPSHOT CHECK OK")


if __name__ == "__main__":
    main()
