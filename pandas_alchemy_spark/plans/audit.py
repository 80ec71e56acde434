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
