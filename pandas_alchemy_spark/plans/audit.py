"""Inspect executed physical plans for the scale properties that
matter at 100 TB: pushdown, broadcast, shuffle count, top-k form."""

from __future__ import annotations


def physical_plan(obj) -> str:
    """Executed physical plan as a string.  Accepts an engine
    DataFrame/Series (``_sdf``) or a plain Spark DataFrame."""
    sdf = getattr(obj, "_sdf", obj)
    return sdf._jdf.queryExecution().executedPlan().toString()


def exchange_count(obj) -> int:
    """Number of Exchange (shuffle) operators in the plan.  A bucketed
    or co-partitioned join should show 0; every groupBy/join key adds
    at most one."""
    plan = physical_plan(obj)
    return sum(1 for line in plan.splitlines() if "Exchange" in line)


def broadcast_join_count(obj) -> int:
    """Number of BroadcastHashJoin operators — dimension joins should
    broadcast, fact-fact joins should not."""
    plan = physical_plan(obj)
    return sum(1 for line in plan.splitlines()
               if "BroadcastHashJoin" in line)


def has_pushed_filters(obj, fragment: str | None = None) -> bool:
    """True when the scan carries PushedFilters (optionally containing
    ``fragment``, e.g. a column name) — the predicate reached parquet."""
    plan = physical_plan(obj)
    for line in plan.splitlines():
        if "PushedFilters: [" in line and "PushedFilters: []" not in line:
            if fragment is None or fragment in line:
                return True
    return False


def uses_take_ordered(obj) -> bool:
    """True when an orderBy+limit compiled to TakeOrderedAndProject
    (one-pass top-k) instead of a full sort."""
    return "TakeOrderedAndProject" in physical_plan(obj)


def scale_report(obj) -> dict:
    """Audit a frame's physical plan for 100 TB red flags and return a
    structured report — the engine's scale lessons packaged as a
    diagnostic (see SCALE.md; each finding names the fix).

    Checks:
      - ``single_partition``: any stage funnels through ONE partition
        (global Window/sort without range partitioning) — the classic
        scale killer.
      - ``cartesian``: CartesianProduct / BroadcastNestedLoopJoin in
        the plan (a join lost its equi-condition).
      - ``repeated_expensive_exprs``: a non-cheap expression (the
        text tokenizer, hashes, JSON codecs) evaluated >=2x inside
        one plan node — Catalyst does not CSE across lambdas and
        PushDownPredicate inlines aliases into filters; materialize
        the value as a column once instead.
      - ``exchanges``: shuffle count (informational — each join/
        groupBy key legitimately adds one; bucketing removes them).
      - ``unpushed_scan_filter``: a Filter sits directly over a scan
        whose PushedFilters is empty (predicate never reached the
        source).

    Returns ``{"flags": [...], "exchanges": int, "plan": str}`` where
    each flag is ``(kind, detail)``.  Empty ``flags`` == the plan
    you'd ship.
    """
    import re

    plan = physical_plan(obj)
    lines = plan.splitlines()
    flags: list = []

    if "SinglePartition" in plan:
        flags.append(("single_partition",
                      "a stage funnels through one partition "
                      "(global window/sort?) — use a range-"
                      "partitioned segmented scan"))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            flags.append(("cartesian",
                          f"{bad} in plan — the join has no "
                          f"equi-condition"))
            break
    shapes = ["split(lower(regexp_replace(", "md5(", "sha2(",
              "xxhash64(", "from_json(", "to_json("]
    skip_deeper_than = None
    for ln in lines:
        d = re.match(r"^[\s:+|*()0-9-]*", ln).end()
        if skip_deeper_than is not None:
            if d > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in ln or "InMemoryTableScan" in ln:
            skip_deeper_than = d
        for shape in shapes:
            c = ln.count(shape)
            if c >= 2:
                args = [ln[m.end():m.end() + 40]
                        for m in re.finditer(re.escape(shape), ln)]
                if len(set(args)) == 1:
                    flags.append((
                        "repeated_expensive_exprs",
                        f"{c}x {shape!r} with identical args in one "
                        f"node — materialize it as a column once"))
    for i, ln in enumerate(lines):
        if re.search(r"^\s*[:+|-]*\s*\*?\(?\d*\)?\s*Filter ", ln):
            below = "\n".join(lines[i:i + 3])
            if ("FileScan" in below and
                    "PushedFilters: []" in below):
                flags.append(("unpushed_scan_filter",
                              "Filter directly over a scan with "
                              "empty PushedFilters — the predicate "
                              "never reached the source"))
                break
    return {"flags": flags,
            "exchanges": exchange_count(obj),
            "plan": plan}
