"""Exponentially-weighted mean as a distributed scan.

pandas' ``Series.ewm(alpha).mean()`` is a sequential recurrence — the
one window-family verb Spark has no native operator for.  Three
formulations, picked by shape:

- ``ewm_mean_grouped`` (JVM window, no UDF): the adjust=True weighted
  sum ``num_t = pow(w, rn_t) * running_sum(x_i * pow(w, -rn_i))``
  over an ordered per-group window.  Running window sums evaluate in
  frame order on every engine, so the result is BIT-IDENTICAL to the
  same SQL on DuckDB — it is the oracle-checkable form.  Bounded:
  ``pow(w, -rn)`` overflows past ``rn > log(DBL_MAX)/-log(w)`` rows
  per group (~700 rows at alpha=0.65, ~9700 at alpha=0.07), so it is
  the small-bounded-groups fast path.
- ``ewm_mean`` with ``by=``: applyInPandas per group — pandas' own
  stable recurrence, any group length, state bounded by the group.
- ``ewm_mean`` global: an exact two-pass segmented scan.  Pass A
  computes one carry per partition (the partition-local unnormalized
  tail sum); the driver folds the P carries into prefix states (P ~
  thousands, scalars only — never row data); pass B rebuilds the
  exact global recurrence from each partition's prefix.  No global
  window, no single-task funnel — this is how a sequential recurrence
  scales to 100 TB.

No counterpart in the reference (pandas-alchemy has no ewm); the
pandas API contract is the spec.
"""

from __future__ import annotations

import math
import sys

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F


def _check_alpha(alpha: float) -> None:
    """pandas contract: ``ewm`` requires ``0 < alpha <= 1`` (outside it
    the closed-form denominators divide by zero or alternate sign)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(
            f"alpha must satisfy 0 < alpha <= 1, got {alpha!r}")


# headroom (in nats) reserved for |x| and the 1/(1-w) factor inside the
# window sums: e^80 ~ 5.5e34 covers any realistic metric magnitude.
_GUARD_MARGIN_NATS = 80.0


def pow_trick_max_rows(alpha: float) -> int:
    """Largest per-group length the ``pow(w,-rn)`` window form can
    handle before its running sums overflow double (with margin for
    value magnitude).  ~615 rows at alpha=0.65, ~8700 at alpha=0.07."""
    w = 1.0 - alpha
    if w <= 0.0:
        return sys.maxsize  # alpha == 1: no pow in the plan at all
    return max(1, int((math.log(sys.float_info.max) - _GUARD_MARGIN_NATS)
                      / -math.log(w)))


def ewm_mean_grouped(sdf: SparkDF, value_col: str, order_cols,
                     by, alpha: float, out_col: str = "ewm") -> SparkDF:
    """adjust=True EWM mean per group, as pure JVM window expressions:
    ``sum(x*pow(w,-rn)) / sum(pow(w,-rn))`` over the ordered running
    frame (the common ``pow(w, rn)`` rescale cancels exactly).

    One shuffle on the group keys, two window passes over it, fully
    codegen — the bounded-group fast path.  ``pow(w,-rn)`` overflows
    past ``rn > log(DBL_MAX)/-log(w)`` rows per group, so a runtime
    guard RAISES (``raise_error``) on any group longer than
    :func:`pow_trick_max_rows` instead of silently returning inf/inf =
    NaN; use ``ewm_mean(by=...)`` beyond that bound."""
    _check_alpha(alpha)
    w = 1.0 - alpha
    by = [by] if isinstance(by, str) else list(by)
    order_cols = ([order_cols] if isinstance(order_cols, str)
                  else list(order_cols))
    if w == 0.0:
        # alpha == 1: adjust=True mean_t == x_t exactly (zero memory)
        return sdf.withColumn(out_col, F.col(value_col).cast("double"))
    nmax = pow_trick_max_rows(alpha)
    win = (Window.partitionBy(*by).orderBy(*order_cols)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rn = F.row_number().over(
        Window.partitionBy(*by).orderBy(*order_cols))
    d = sdf.withColumn("__rn", rn)
    num = F.sum(F.col(value_col) * F.pow(F.lit(w), -F.col("__rn"))).over(win)
    den = F.sum(F.pow(F.lit(w), -F.col("__rn"))).over(win)
    guarded = F.when(
        F.col("__rn") > F.lit(nmax),
        F.raise_error(F.lit(
            f"ewm pow-trick overflow: a group exceeds {nmax} rows at "
            f"alpha={alpha}; use the exact scan path "
            "(ewm_mean(by=...) / .ewm(alpha).mean(exact=True))"))
        .cast("double")
    ).otherwise(num / den)
    return d.withColumn(out_col, guarded).drop("__rn")


def _partition_scan(it, alpha, out):
    """Per-partition pass A: fold every Arrow batch through pandas'
    ewm recurrence, emitting ONE carry row (pid, n_rows, tail_num)."""
    w = 1.0 - alpha
    num_end = 0.0
    n = 0
    pid = None
    for pdf in it:
        if len(pdf) == 0:
            continue
        pid = int(pdf["__pid"].iloc[0])
        x = pdf["__x"].astype("float64")
        mean = x.ewm(alpha=alpha, adjust=True).mean()
        k = len(x)
        # batch-local unnormalized tail: mean_end * den_end
        den_end = (1.0 - w ** k) / (1.0 - w) if w != 0.0 else 1.0
        local_tail = float(mean.iloc[-1]) * den_end
        num_end = num_end * (w ** k) + local_tail
        n += k
    if pid is not None:
        yield pd.DataFrame({"pid": [pid], "n": [n], "tail": [num_end]})


def ewm_mean(sdf: SparkDF, value_col: str, order_cols, alpha: float,
             by=None, out_col: str = "ewm",
             num_partitions: int | None = None) -> SparkDF:
    """pandas ``ewm(alpha, adjust=True).mean()`` over ``order_col``.

    ``by=`` groups: one applyInPandas per group (exact for any group
    length).  Global: exact segmented scan (see module docstring).
    Null values in ``value_col`` are not supported — filter first
    (pandas' ignore_na semantics need a weight channel we don't carry).
    """
    _check_alpha(alpha)
    order_cols = ([order_cols] if isinstance(order_cols, str)
                  else list(order_cols))
    if by is not None:
        byl = [by] if isinstance(by, str) else list(by)
        cols = sdf.columns

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            pdf[out_col] = (pdf[value_col].astype("float64")
                            .ewm(alpha=alpha, adjust=True).mean())
            return pdf

        schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in sdf.schema.fields) + f", {out_col} double"
        return (sdf.groupBy(*byl).applyInPandas(per_group, schema)
                .select(*cols, out_col))

    w = 1.0 - alpha
    # range-partition on the scan order, then pin the layout so both
    # passes see the same rows per partition (repartitionByRange
    # samples; localCheckpoint makes the layout a fact).  Shares the
    # segscan memo: an EWM over the same series/order as other scan
    # verbs reuses their shuffle+checkpoint.
    from .segscan import _pin
    base = _pin(sdf, [F.col(c) for c in order_cols], num_partitions)

    # pass A: one scalar carry per partition — P rows to the driver,
    # never row data
    carries = (base.select("__pid", F.col(value_col).cast("double")
                           .alias("__x"))
               .mapInPandas(lambda it: _partition_scan(it, alpha, "t"),
                            "pid int, n long, tail double")
               .collect())
    carries.sort(key=lambda r: r["pid"])
    prefix_num: dict[int, float] = {}
    prefix_n: dict[int, int] = {}
    pref, off = 0.0, 0
    for r in carries:
        prefix_num[r["pid"]] = pref
        prefix_n[r["pid"]] = off
        pref = pref * (w ** r["n"]) + r["tail"]
        off += r["n"]

    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in sdf.schema.fields) + f", {out_col} double"

    def pass_b(it):
        carry = None  # (num_tail, t_local) across batches of a partition
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            if carry is None:
                carry = (prefix_num.get(pid, 0.0), 0)
            num_in, t0 = carry
            x = pdf[value_col].astype("float64")
            k = len(x)
            mean = x.ewm(alpha=alpha, adjust=True).mean()
            den_local = (1.0 - w ** pd.Series(range(1, k + 1),
                                              index=x.index)) / (1.0 - w)
            num_local = mean.to_numpy() * den_local.to_numpy()
            decay = w ** pd.Series(range(1, k + 1), index=x.index)
            num = num_local + num_in * decay.to_numpy()
            gpos = prefix_n.get(pid, 0) + t0 + pd.Series(
                range(1, k + 1), index=x.index)
            den = (1.0 - w ** gpos.to_numpy()) / (1.0 - w)
            res = pdf.drop(columns=["__pid"]).copy()
            res[out_col] = num / den
            carry = (num_in * (w ** k) + num_local[-1], t0 + k)
            yield res

    return base.mapInPandas(pass_b, out_fields)
