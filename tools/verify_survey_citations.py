"""Citation-drift audit (r11; VERDICT r10 #3): every number a SURVEY
round-addendum quotes must exist in a committed JSON artifact — the
r10 addendum cited append/rebuild seconds from a pre-regeneration run
and drifted from the committed file.  This tool re-extracts the
numbers and checks each against the artifacts, extending the round-10
"generated, not hand-counted" rule from bench_compare claims to ALL
artifact-cited numbers.

Usage:
  python tools/verify_survey_citations.py --round 11 [--survey SURVEY.md]
  python tools/verify_survey_citations.py --section '## 18' ART1.json ...

With --round N it audits SURVEY section "## N+7" against every
committed ``*_r{N}*.json`` artifact in the repo root.  A cited number
matches if some artifact value rounds to it (at the citation's own
precision), or — for "Nx"-style ratio claims — if some PAIR of
artifact values (or a value pair inside the same artifact) yields the
ratio at that precision.  Unmatched citations print for adjudication;
exit code 1 if any remain.  Numbers that are not artifact claims
(dates, section refs, file:line anchors, counts like 50/50, powers of
two, sf tags) are filtered heuristically or adjudicated by eye — the
goal is zero UNEXPLAINED rows at round close, not a silent gate.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# contexts that are NOT artifact citations
_SKIP_BEFORE = re.compile(
    r"(?:§|\br(?:ound)?\s?|\bsf|\bv|2\^|#|:|/|\.py:|x2\^|_r|\[)$")
_SKIP_TOKEN = re.compile(
    r"^(?:19|20)\d\d$")  # years


def extract_numbers(text: str):
    """Yield (number_string, is_ratio, line) for candidate citations.

    A number immediately followed by ``‡`` (modulo closing ``*``/
    backtick/unit) is an EXPLICIT in-prose adjudication — "this is a
    logged/derived/constant value, not an artifact claim" — and is
    skipped.  r12 addition: §18.7 listed such numbers in prose but the
    tool still flagged them, so the snapshot gate could never go
    green; the marker makes each adjudication visible at the citation
    site itself instead of in a sidecar.
    """
    for lineno, line in enumerate(text.splitlines(), 1):
        if line.lstrip().startswith("#"):  # section headers
            continue
        for m in re.finditer(
                r"(\d{1,3}(?:,\d{3})+(?:\.\d+)?|\d+\.\d+|\d+)"
                r"\s?(x|×|s\b|/s|%|GB|MB)?", line):
            tok, unit = m.group(1), m.group(2)
            before = line[:m.start()][-8:]
            if _SKIP_BEFORE.search(before):
                continue
            if _SKIP_TOKEN.match(tok):
                continue
            after = line[m.end():m.end() + 4]
            if after.lstrip("*`%sx ").startswith("‡"):
                # explicitly adjudicated non-artifact number — still
                # surfaced to the caller (r13; ADVICE r12: an
                # uncounted exemption is an unbounded audit escape
                # hatch), which prints each one and enforces a budget
                yield tok, False, lineno, line.strip(), True
                continue
            # bare small integers with no unit are usually counts /
            # prose ("two", "50/50", "N=20") — only audit unitful or
            # decimal or thousands-separated numbers
            if unit is None and "." not in tok and "," not in tok:
                continue
            yield (tok, unit in ("x", "×", "/s"), lineno,
                   line.strip(), False)


def flatten(obj, out):
    if isinstance(obj, dict):
        for v in obj.values():
            flatten(v, out)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            flatten(v, out)
    elif isinstance(obj, bool):
        pass
    elif isinstance(obj, (int, float)):
        out.append(float(obj))


def matches(cited: str, pool: list[float]) -> bool:
    val = float(cited.replace(",", ""))
    dec = len(cited.split(".")[1]) if "." in cited else 0
    for v in pool:
        if round(v, dec) == round(val, dec):
            return True
        # tolerate one-ulp-of-citation rounding drift (a hand round
        # of 12.115 to 12.1 vs banker's 12.12)
        if abs(v - val) <= 0.51 * 10 ** (-dec):
            return True
    return False


def ratio_matches(cited: str, pool: list[float]) -> bool:
    val = float(cited.replace(",", ""))
    dec = len(cited.split(".")[1]) if "." in cited else 0
    tol = 0.51 * 10 ** (-dec)
    big = sorted(v for v in pool if v > 0)
    for i, a in enumerate(big):
        lo, hi = a * (val - tol), a * (val + tol)
        import bisect
        j = bisect.bisect_left(big, lo)
        while j < len(big) and big[j] <= hi:
            return True
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int)
    ap.add_argument("--section")
    ap.add_argument("--survey", default=os.path.join(REPO, "SURVEY.md"))
    ap.add_argument("--dagger-budget", type=int, default=12,
                    help="max ‡-exempted numbers per section (each is "
                    "printed; above the budget the audit fails — the "
                    "exemption marker must stay an exception, not an "
                    "escape hatch)")
    ap.add_argument("artifacts", nargs="*")
    args = ap.parse_args()
    arts = list(args.artifacts)
    section = args.section
    if args.round:
        section = section or f"## {args.round + 7}"
        if not arts:
            # the addendum legitimately quotes the PREVIOUS round's
            # artifacts in round-over-round comparisons — pool both
            for rn in (args.round, args.round - 1):
                arts += glob.glob(os.path.join(REPO, f"*_r{rn}*.json"))
                arts += glob.glob(
                    os.path.join(REPO, f"*_r{rn:02d}*.json"))
            arts = sorted(set(arts))
    if not section:
        sys.exit("need --round or --section")
    text = open(args.survey).read()
    m = re.search(rf"^{re.escape(section)}[^\n]*$", text, re.M)
    if not m:
        sys.exit(f"section {section!r} not found in {args.survey}")
    rest = text[m.end():]
    nxt = re.search(r"^## ", rest, re.M)
    body = rest[:nxt.start()] if nxt else rest

    pool: list[float] = []
    for p in arts:
        try:
            with open(p) as fh:
                text_p = fh.read()
        except OSError as ex:
            print(f"WARNING: cannot read {p}: {ex}")
            continue
        try:
            flatten(json.loads(text_p), pool)
        except json.JSONDecodeError:
            # JSONL / trailing-junk files: per-line fallback
            for ln in text_p.splitlines():
                try:
                    flatten(json.loads(ln), pool)
                except json.JSONDecodeError:
                    continue
    # derived values the prose legitimately quotes: docs/s rates and
    # pairwise ratios come from artifact fields, so add simple
    # derivations of per-query values (handled via ratio_matches)
    print(f"auditing {section} of {os.path.basename(args.survey)} "
          f"against {len(arts)} artifact(s), {len(pool)} values")
    unmatched = []
    exempted = []
    n_checked = 0
    seen = set()
    for tok, is_ratio, lineno, line, is_exempt in extract_numbers(body):
        if is_exempt:
            exempted.append((tok, lineno, line))
            continue
        n_checked += 1
        # ratios ("Nx") and derived rates ("docs/s" = count/seconds)
        # may also match a pool-pair quotient; plain values must
        # match a pool value at the citation's precision
        ok = matches(tok, pool) or (is_ratio
                                    and ratio_matches(tok, pool))
        if not ok and (tok, lineno) not in seen:
            seen.add((tok, lineno))
            unmatched.append((tok, is_ratio, lineno, line))
    print(f"{n_checked} cited numbers checked, "
          f"{len(unmatched)} unmatched, {len(exempted)} ‡-exempted")
    for tok, lineno, line in exempted:
        print(f"  EXEMPT ‡ {tok} (line {lineno}): {line[:90]}")
    if len(exempted) > args.dagger_budget:
        print(f"‡ exemption budget exceeded: {len(exempted)} > "
              f"{args.dagger_budget} — back these numbers with an "
              "artifact or raise --dagger-budget with justification")
        sys.exit(1)
    for tok, is_ratio, lineno, line in unmatched:
        kind = "ratio" if is_ratio else "value"
        print(f"  UNMATCHED {kind} {tok} (line {lineno}): {line[:90]}")
    if unmatched:
        print("adjudicate each row: fix the citation, regenerate the "
              "artifact, or confirm it is a non-artifact number "
              "(count, external constant)")
        sys.exit(1)


if __name__ == "__main__":
    main()
