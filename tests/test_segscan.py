"""Differential tests for the distributed global cum*/rank segmented
scan (operators/segscan) — multi-partition inputs so the carry fold
and tie co-location actually engage (the 8-row fixtures in
test_analytic land in one partition)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

import pandas_alchemy_spark as pas

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders_pdf():
    return (pd.read_parquet(f"{SF_DIR}/orders.parquet")
            .sort_values("o_orderkey").set_index("o_orderkey"))


@pytest.fixture(scope="module")
def orders(spark):
    return pas.read_parquet(f"{SF_DIR}/orders.parquet").set_index(
        "o_orderkey")


def _eq(ours, want, **kw):
    got = ours.to_pandas().sort_index()
    want = want.sort_index()
    want.name = got.name
    pdt.assert_series_equal(got, want, check_dtype=False,
                            check_index_type=False, **kw)


def test_cumsum_multi_partition(orders, orders_pdf):
    # float: the segmented fold regroups additions, so allow last-ulp
    _eq(orders["o_totalprice"].cumsum(),
        orders_pdf["o_totalprice"].cumsum(), rtol=1e-12)


def test_cumsum_integer_exact(orders, orders_pdf):
    _eq(orders["o_custkey"].cumsum(), orders_pdf["o_custkey"].cumsum())


def test_cummax_cummin_multi_partition(orders, orders_pdf):
    _eq(orders["o_totalprice"].cummax(),
        orders_pdf["o_totalprice"].cummax())
    _eq(orders["o_totalprice"].cummin(),
        orders_pdf["o_totalprice"].cummin())


def test_cumsum_null_holes_multi_partition(spark):
    rng = np.random.default_rng(7)
    v = rng.normal(size=5000)
    v[rng.integers(0, 5000, 400)] = np.nan
    pdf = pd.DataFrame({"v": v})
    df = pas.DataFrame.from_pandas(pdf)
    _eq(df.v.cumsum(), pdf.v.cumsum(), rtol=1e-12)


def test_cumprod_multi_partition(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"v": rng.uniform(0.99, 1.01, size=3000)})
    df = pas.DataFrame.from_pandas(pdf)
    _eq(df.v.cumprod(), pdf.v.cumprod(), rtol=1e-10)


@pytest.mark.parametrize("method", ["min", "first", "dense",
                                    "average", "max"])
@pytest.mark.parametrize("ascending", [True, False])
def test_rank_all_methods_multi_partition(orders, orders_pdf, method,
                                          ascending):
    # o_custkey is duplicate-heavy -> ties MUST be co-located for
    # min/dense/average/max; 'first' spreads them on the tiebreak
    _eq(orders["o_custkey"].rank(method=method, ascending=ascending),
        orders_pdf["o_custkey"].rank(method=method, ascending=ascending))


def test_rank_with_nulls_multi_partition(spark):
    rng = np.random.default_rng(3)
    v = rng.integers(0, 50, size=4000).astype("float64")
    v[rng.integers(0, 4000, 300)] = np.nan
    pdf = pd.DataFrame({"v": v})
    df = pas.DataFrame.from_pandas(pdf)
    for method in ("min", "dense", "average"):
        _eq(df.v.rank(method=method), pdf.v.rank(method=method))


def test_rank_invalid_method_raises(orders):
    with pytest.raises(ValueError, match="method"):
        orders["o_custkey"].rank(method="bogus")


def test_expanding_multi_partition(orders, orders_pdf):
    for agg in ("sum", "mean", "max", "min", "count"):
        got = (getattr(orders["o_totalprice"].expanding(), agg)()
               .to_pandas().sort_index())
        want = getattr(orders_pdf["o_totalprice"].expanding(), agg)()
        want.name = got.name
        pdt.assert_series_equal(got, want.sort_index(),
                                check_dtype=False,
                                check_index_type=False, rtol=1e-12)


def test_expanding_nulls_and_min_periods(spark):
    rng = np.random.default_rng(13)
    v = rng.normal(size=4000)
    v[rng.integers(0, 4000, 500)] = np.nan
    v[:7] = np.nan  # leading nulls cross the gate logic
    pdf = pd.DataFrame({"v": v})
    df = pas.DataFrame.from_pandas(pdf)
    for agg in ("sum", "mean", "max", "count"):
        got = (getattr(df.v.expanding(min_periods=3), agg)()
               .to_pandas().sort_index())
        want = getattr(pdf.v.expanding(min_periods=3), agg)()
        want.name = got.name
        pdt.assert_series_equal(got, want, check_dtype=False,
                                check_index_type=False, rtol=1e-12)


def test_expanding_no_single_partition_window(spark, orders):
    from pandas_alchemy_spark.plans import physical_plan
    s = orders["o_totalprice"].expanding().sum()
    plan = physical_plan(s.to_spark())
    assert "SinglePartition" not in plan
    assert "Window" not in plan


@pytest.fixture()
def tiny_arrow_batches(spark):
    """Force partitions to span MULTIPLE Arrow batches (default batch =
    10k rows hid a real bug: pass B restarted the scan at every batch
    boundary, so any partition over 10k rows came out wrong)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, "10000")
    spark.conf.set(key, "64")
    yield
    spark.conf.set(key, old)


def test_cum_scans_span_arrow_batches(spark, tiny_arrow_batches):
    rng = np.random.default_rng(23)
    v = rng.normal(size=4000)
    v[rng.integers(0, 4000, 300)] = np.nan
    pdf = pd.DataFrame({"v": v})
    df = pas.DataFrame.from_pandas(pdf)
    # 4000 rows / 32 partitions = 125 rows/partition = 2 batches at 64
    _eq(df.v.cumsum(), pdf.v.cumsum(), rtol=1e-12)
    _eq(df.v.cummax(), pdf.v.cummax())
    _eq(df.v.cummin(), pdf.v.cummin())


def test_rank_spans_arrow_batches(spark, tiny_arrow_batches):
    # duplicate-heavy so tie groups straddle batch boundaries inside a
    # partition — average/max ranks need the whole tie group
    rng = np.random.default_rng(29)
    pdf = pd.DataFrame({"v": rng.integers(0, 40, size=4000)})
    df = pas.DataFrame.from_pandas(pdf)
    for method in ("min", "dense", "average", "max", "first"):
        _eq(df.v.rank(method=method), pdf.v.rank(method=method))


def test_expanding_spans_arrow_batches(spark, tiny_arrow_batches):
    rng = np.random.default_rng(31)
    v = rng.normal(size=4000)
    v[rng.integers(0, 4000, 400)] = np.nan
    pdf = pd.DataFrame({"v": v})
    df = pas.DataFrame.from_pandas(pdf)
    for agg in ("sum", "mean", "max", "min", "count"):
        got = (getattr(pdf.v.expanding(min_periods=2), agg)())
        _eq(getattr(df.v.expanding(min_periods=2), agg)(), got,
            rtol=1e-12)
