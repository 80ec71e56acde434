"""Frame-level GroupBy verbs (pandas DataFrameGroupBy parity).

Grouped transforms (shift/diff/cum*/rank/ffill/...) fuse every
non-key column into one Window select over partitionBy(keys) — a
single shuffle; positional slices (head/tail/nth) are one row_number
window; the extra aggregates (prod/any/all/sem/skew/kurt/describe)
fuse into the one hash aggregate.  All differential vs pandas.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_alchemy_spark as pas

PDF = pd.DataFrame({
    "k": ["a", "a", "b", "b", "b", "c", "a", "c"],
    "x": [1.0, np.nan, 3.0, 4.0, np.nan, 6.0, 7.0, 8.0],
    "y": [10, 20, 30, 40, 50, 60, 70, 80],
})


def _frame(spark):
    return pas.DataFrame.from_pandas(PDF)


def _cmp_frame(got, want):
    g = got.to_pandas().sort_index()
    w = want.sort_index()
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  check_names=False)


def _cmp_series(got, want):
    g = got.to_pandas().sort_index()
    w = want.sort_index()
    pd.testing.assert_series_equal(g, w, check_dtype=False,
                                   check_names=False)


# ------------------------------------------------- grouped transforms

@pytest.mark.parametrize("verb,args", [
    ("shift", (1,)), ("shift", (2,)), ("shift", (-1,)),
    ("diff", (1,)), ("diff", (2,)),
    ("cumsum", ()), ("cumprod", ()), ("cummax", ()), ("cummin", ()),
    ("ffill", ()), ("bfill", ()),
])
def test_frame_transform(spark, verb, args):
    df = _frame(spark)
    got = getattr(df.groupby("k"), verb)(*args)
    want = getattr(PDF.groupby("k"), verb)(*args)
    _cmp_frame(got, want)


def test_frame_pct_change(spark):
    df = _frame(spark)
    got = df.groupby("k").pct_change(1)
    want = PDF.groupby("k").pct_change(1, fill_method=None)
    _cmp_frame(got, want)


@pytest.mark.parametrize("method", ["min", "dense", "first",
                                    "average", "max"])
def test_frame_rank(spark, method):
    df = _frame(spark)
    got = df.groupby("k").rank(method)
    want = PDF.groupby("k").rank(method)
    _cmp_frame(got, want)


def test_frame_grouped_transform_mean(spark):
    df = _frame(spark)
    got = df.groupby("k").transform("mean")
    want = PDF.groupby("k").transform("mean")
    _cmp_frame(got, want)


def test_frame_transform_single_shuffle(spark):
    """Both columns' windows share partitionBy(k): the physical plan
    must contain exactly one Exchange hashpartitioning."""
    df = _frame(spark)
    plan = (df.groupby("k").cumsum()._sdf
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------- cumcount / ngroup

def test_cumcount(spark):
    df = _frame(spark)
    _cmp_series(df.groupby("k").cumcount(), PDF.groupby("k").cumcount())


def test_cumcount_descending(spark):
    df = _frame(spark)
    _cmp_series(df.groupby("k").cumcount(ascending=False),
                PDF.groupby("k").cumcount(ascending=False))


def test_ngroup(spark):
    df = _frame(spark)
    _cmp_series(df.groupby("k").ngroup(), PDF.groupby("k").ngroup())


def test_ngroup_multikey_raises(spark):
    df = _frame(spark)
    with pytest.raises(NotImplementedError, match="single grouping"):
        df.groupby(["k", "y"]).ngroup()


# ------------------------------------------------------ head/tail/nth

@pytest.mark.parametrize("n", [1, 2, -1])
def test_head(spark, n):
    df = _frame(spark)
    _cmp_frame(df.groupby("k").head(n), PDF.groupby("k").head(n))


@pytest.mark.parametrize("n", [1, 2, -1])
def test_tail(spark, n):
    df = _frame(spark)
    _cmp_frame(df.groupby("k").tail(n), PDF.groupby("k").tail(n))


@pytest.mark.parametrize("n", [0, 1, 2, -1])
def test_nth(spark, n):
    df = _frame(spark)
    got = df.groupby("k").nth(n).to_pandas().sort_index()
    want = PDF.groupby("k").nth(n).sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_names=False)


# ----------------------------------------------------- new aggregates

@pytest.mark.parametrize("verb", ["prod", "sem", "skew", "kurt"])
def test_agg_parity(spark, verb):
    df = _frame(spark)
    got = getattr(df.groupby("k"), verb)().to_pandas().sort_index()
    if verb == "kurt":
        # this pandas build has Series.kurt but no DataFrameGroupBy.kurt
        want = PDF.groupby("k")[["x", "y"]].agg(pd.Series.kurt) \
            .sort_index()
    else:
        want = getattr(PDF.groupby("k"), verb)(
            numeric_only=True).sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_names=False)


def test_any_all(spark):
    pdf = pd.DataFrame({"k": ["a", "a", "b", "b"],
                        "f": [True, False, False, False],
                        "g": [1, 0, 0, 1]})
    df = pas.DataFrame.from_pandas(pdf)
    got_any = df.groupby("k").any().to_pandas().sort_index()
    want_any = pdf.groupby("k").any().sort_index()
    assert (got_any.to_numpy() == want_any.to_numpy()).all()
    got_all = df.groupby("k").all().to_pandas().sort_index()
    want_all = pdf.groupby("k").all().sort_index()
    assert (got_all.to_numpy() == want_all.to_numpy()).all()


def test_describe(spark):
    df = _frame(spark)
    got = df.groupby("k").describe().to_pandas().sort_index()
    want = PDF.groupby("k").describe().sort_index()
    # flattened "col_stat" labels vs pandas MultiIndex columns
    for col in ("x", "y"):
        for stat in ("count", "mean", "std", "min", "25%", "50%",
                     "75%", "max"):
            np.testing.assert_allclose(
                got[f"{col}_{stat}"].to_numpy(dtype=float),
                want[(col, stat)].to_numpy(dtype=float),
                rtol=1e-12, err_msg=f"{col}_{stat}")


def test_value_counts(spark):
    pdf = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                        "v": ["x", "x", "y", "x", "x"]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.groupby("k").value_counts().to_pandas().sort_index()
    want = pdf.groupby("k").value_counts().sort_index()
    assert (got.to_numpy() == want.to_numpy()).all()
    gotn = df.groupby("k").value_counts(normalize=True) \
        .to_pandas().sort_index()
    wantn = pdf.groupby("k").value_counts(normalize=True).sort_index()
    np.testing.assert_allclose(gotn.to_numpy(dtype=float),
                               wantn.to_numpy(dtype=float))


def test_sample_deterministic(spark):
    pdf = pd.DataFrame({"k": [f"u{i % 7}" for i in range(400)],
                        "v": range(400)})
    df = pas.DataFrame.from_pandas(pdf)
    a = df.groupby("k").sample(0.5, key="v").to_pandas()
    b = df.groupby("k").sample(0.5, key="v").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert 0.3 < len(a) / len(pdf) < 0.7


# --------------------------------- frame-level rolling / expanding

def test_frame_grouped_rolling_expanding(spark):
    df = _frame(spark)
    got = df.groupby("k").rolling(2).sum().to_pandas().sort_index()
    want = (PDF.groupby("k")[["x", "y"]].rolling(2).sum()
            .reset_index(level=0, drop=True).sort_index())
    np.testing.assert_allclose(got.to_numpy(float),
                               want.to_numpy(float), equal_nan=True)
    got = df.groupby("k").expanding().mean().to_pandas().sort_index()
    want = (PDF.groupby("k")[["x", "y"]].expanding().mean()
            .reset_index(level=0, drop=True).sort_index())
    np.testing.assert_allclose(got.to_numpy(float),
                               want.to_numpy(float), equal_nan=True)


def test_frame_grouped_rolling_median_raises(spark):
    df = _frame(spark)
    with pytest.raises(NotImplementedError, match="per-column"):
        df.groupby("k").rolling(3).median()


def test_frame_grouped_interpolate(spark):
    pdf = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 4,
                        "x": [1.0, np.nan, 3.0, np.nan,
                              10.0, np.nan, np.nan, 40.0],
                        "y": [np.nan, 2.0, np.nan, 4.0,
                              5.0, 6.0, np.nan, 8.0]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.groupby("k").interpolate().to_pandas().sort_index()
    want = pdf.groupby("k")[["x", "y"]].apply(
        lambda g: g.interpolate()).reset_index(level=0, drop=True) \
        .sort_index()
    np.testing.assert_allclose(got.to_numpy(float),
                               want.to_numpy(float), equal_nan=True)
