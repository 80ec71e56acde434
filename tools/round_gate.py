"""One-command round gate (VERDICT r6 item 7): runs every scripted
evidence gate in sequence and emits a single JSON artifact.

  1. oracle gate at sf0.001, sf0.01 and sf0.1 (tools/check_correctness
     — the driver's hash comparison, multi-scale because each extra
     scale has caught a real latent bug);
  2. adversarial-config sweep (tools/check_stress — 3 shuffle
     partitions + 64-row Arrow batches);
  3. expression-reuse plan audit (tools/audit_expr_reuse — repeated
     non-cheap expressions per optimized-plan node, 0 required);
  4. loadavg-gated bench at sf0.1 (bench.py — its own JSON line is
     captured verbatim under "bench").

Each stage runs as a subprocess so one JVM's state can't leak into
the next gate.  Exit code 0 only when every gate passes.

Usage: python tools/round_gate.py [--out ROUND_GATE_r{N}.json]
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Paths whose content the gate certifies: if any of these change after
# the gate ran, the gate artifact no longer describes HEAD (r11 verdict
# item 2 — 144 product lines landed post-gate and the gate's pytest
# count never executed their tests).
PRODUCT_GLOBS = ("pandas_alchemy_spark/", "tests/", "__spark_entry__.py",
                 "bench.py")


def product_state():
    """(head_sha, product_hash): a content hash over every tracked +
    untracked product file AS IT SITS IN THE WORKING TREE, so an
    uncommitted edit also changes the hash.  tools/snapshot_check.py
    recomputes this at snapshot time and fails on mismatch."""
    import hashlib
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    ls = subprocess.run(
        ["git", "ls-files", "--cached", "--others",
         "--exclude-standard", "--", *PRODUCT_GLOBS],
        cwd=REPO, capture_output=True, text=True).stdout.splitlines()
    h = hashlib.sha256()
    for rel in sorted(set(p for p in ls if p.strip())):
        fp = os.path.join(REPO, rel)
        if not os.path.isfile(fp):
            continue
        h.update(rel.encode())
        h.update(b"\0")
        with open(fp, "rb") as fh:
            h.update(fh.read())
        h.update(b"\0")
    return head, h.hexdigest()


def run(cmd, timeout=1800, env=None):
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=timeout, cwd=REPO, env=env)
    return p, round(time.time() - t0, 1)


def main():
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    head_sha, product_hash = product_state()
    art: dict = {"gates": {}, "head_sha": head_sha,
                 "product_hash": product_hash,
                 "product_globs": list(PRODUCT_GLOBS)}
    ok = True

    # 1. multi-scale oracle gate
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p, secs = run([sys.executable, "tools/check_correctness.py",
                       f"/root/testdata/{sf}"], timeout=2400)
        tail = [ln for ln in p.stdout.splitlines() if ln.strip()]
        m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only",
                      p.stdout)
        g = {"sec": secs,
             "pass": int(m.group(1)) if m else None,
             "fail": int(m.group(2)) if m else None,
             "rows_only": int(m.group(3)) if m else None,
             "failures": [ln for ln in tail
                          if ln.startswith("FAIL")][:10]}
        ok &= bool(m) and g["fail"] == 0
        art["gates"][f"oracle_{sf}"] = g
        print(f"oracle_{sf}: {tail[-1] if tail else 'NO OUTPUT'} "
              f"({secs}s)", file=sys.stderr)

    # 2. adversarial config sweep
    p, secs = run([sys.executable, "tools/check_stress.py"],
                  timeout=2400)
    m = re.search(r"(\d+) pass, (\d+) fail", p.stdout)
    g = {"sec": secs,
         "pass": int(m.group(1)) if m else None,
         "fail": int(m.group(2)) if m else None,
         "failures": [ln for ln in p.stdout.splitlines()
                      if ln.startswith("FAIL")][:10]}
    ok &= bool(m) and g["fail"] == 0
    art["gates"]["stress"] = g
    print(f"stress: {g['pass']} pass, {g['fail']} fail ({secs}s)",
          file=sys.stderr)

    # 3. expression-reuse plan audit (all 50 driver queries)
    p, secs = run([sys.executable, "tools/audit_expr_reuse.py"],
                  timeout=1800)
    m = re.search(r"(OK|FAIL): (\d+) repeated-expression", p.stdout)
    g = {"sec": secs,
         "findings": int(m.group(2)) if m else None,
         "detail": [ln for ln in p.stdout.splitlines()
                    if "REPEATED" in ln or "ERR" in ln][:10]}
    ok &= bool(m) and g["findings"] == 0
    art["gates"]["expr_reuse"] = g
    print(f"expr_reuse: {g['findings']} finding(s) ({secs}s)",
          file=sys.stderr)

    # 4. unit suite (r7 verdict item 7: the gate previously let a
    # unit regression through — pytest is now a first-class stage)
    p, secs = run([sys.executable, "-m", "pytest", "tests/", "-q",
                   "--tb=no"], timeout=3600)
    m = re.search(r"(\d+) passed", p.stdout)
    mf = re.search(r"(\d+) failed", p.stdout)
    g = {"sec": secs,
         "pass": int(m.group(1)) if m else None,
         "fail": int(mf.group(1)) if mf else 0,
         "failures": [ln for ln in p.stdout.splitlines()
                      if ln.startswith("FAILED")][:10]}
    ok &= bool(m) and g["fail"] == 0
    art["gates"]["pytest"] = g
    print(f"pytest: {g['pass']} pass, {g['fail']} fail ({secs}s)",
          file=sys.stderr)

    # 5. load-gated bench (bench.py prints one JSON line on stdout)
    p, secs = run([sys.executable, "bench.py"], timeout=3600)
    bench = None
    for ln in reversed(p.stdout.splitlines()):
        try:
            bench = json.loads(ln)
            break
        except json.JSONDecodeError:
            continue
    ok &= bench is not None
    art["gates"]["bench"] = {"sec": secs, "ok": bench is not None}
    art["bench"] = bench
    print(f"bench: total={bench and bench.get('value')}s "
          f"({secs}s wall)", file=sys.stderr)

    art["ok"] = ok
    line = json.dumps(art)
    print(line)
    if out_path:
        with open(os.path.join(REPO, out_path), "w") as fh:
            fh.write(line + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
