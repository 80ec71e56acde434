"""Differential tests: shift/diff/cum*/rank/rolling and grouped
transforms vs pandas."""

import pandas as pd
import pandas.testing as pdt
import pytest

import pandas_alchemy_spark as pas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "g": ["a", "b", "a", "b", "a", "c", "b", "a"],
        "v": [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0],
        "w": [1.0, None, 2.0, 2.0, None, 3.0, 1.0, 4.0],
    })


def _series_eq(ours, want):
    got = ours.to_pandas().reset_index(drop=True)
    want = want.reset_index(drop=True)
    want.name = got.name
    pdt.assert_series_equal(got, want, check_dtype=False)


SERIES_CASES = [
    ("shift1", lambda s: s.shift(1)),
    ("shift2_fill", lambda s: s.shift(2, fill_value=0.0)),
    ("diff", lambda s: s.diff()),
    ("cumsum", lambda s: s.cumsum()),
    ("cummax", lambda s: s.cummax()),
    ("cummin", lambda s: s.cummin()),
    ("rank_min", lambda s: s.rank(method="min")),
    ("rank_first", lambda s: s.rank(method="first")),
    ("rank_dense_desc", lambda s: s.rank(method="dense", ascending=False)),
    ("rolling_sum", lambda s: s.rolling(3).sum()),
    ("rolling_mean_mp1", lambda s: s.rolling(3, min_periods=1).mean()),
]


@pytest.mark.parametrize("name,fn", SERIES_CASES,
                         ids=[c[0] for c in SERIES_CASES])
def test_series_analytic(spark, pdf, name, fn):
    df = pas.DataFrame.from_pandas(pdf)
    _series_eq(fn(df.v), fn(pdf.v))


def test_cumsum_skips_na_like_pandas(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    # pandas cumsum keeps NaN holes but continues the running sum
    _series_eq(df.w.cumsum(), pdf.w.cumsum())


GROUPED_CASES = [
    ("gshift", lambda g: g.shift(1)),
    ("gcumsum", lambda g: g.cumsum()),
    ("gcumcount", lambda g: g.cumcount()),
    ("grank", lambda g: g.rank(method="min")),
]


@pytest.mark.parametrize("name,fn", GROUPED_CASES,
                         ids=[c[0] for c in GROUPED_CASES])
def test_grouped_transforms(spark, pdf, name, fn):
    df = pas.DataFrame.from_pandas(pdf)
    got = fn(df.groupby("g")["v"]).to_pandas().reset_index(drop=True)
    want = fn(pdf.groupby("g")["v"]).reset_index(drop=True)
    want.name = got.name
    pdt.assert_series_equal(got, want, check_dtype=False)


def test_grouped_reduction(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    got = df.groupby("g")["v"].sum().to_pandas().sort_index()
    want = pdf.groupby("g")["v"].sum().sort_index()
    want.name = got.name
    pdt.assert_series_equal(got, want, check_dtype=False,
                            check_index_type=False)


def test_shift_assign_lineage(spark, pdf):
    """grouped shift assigns back onto the parent frame in-plan."""
    df = pas.DataFrame.from_pandas(pdf)
    out = df.assign(prev=df.groupby("g")["v"].shift(1)).to_pandas()
    want = pdf.assign(prev=pdf.groupby("g")["v"].shift(1))
    pdt.assert_frame_equal(out.reset_index(drop=True),
                           want.reset_index(drop=True), check_dtype=False)


class TestAsofJoin:
    """asof_join vs pandas merge_asof (operators/asof.py)."""

    def _frames(self):
        import numpy as np
        rng = np.random.RandomState(7)
        left = pd.DataFrame({
            "k": rng.randint(0, 4, 60),
            "t": rng.randint(0, 100, 60).astype("int64"),
            "lv": np.arange(60, dtype="int64"),
        }).sort_values("t", kind="stable").reset_index(drop=True)
        right = (pd.DataFrame({
            "k": rng.randint(0, 4, 40),
            "t": rng.randint(0, 100, 40).astype("int64"),
            "rv": np.arange(40, dtype="int64") * 10,
        }).drop_duplicates(["k", "t"])
          .sort_values("t", kind="stable").reset_index(drop=True))
        return left, right

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    @pytest.mark.parametrize("exact", [True, False])
    def test_vs_pandas(self, spark, direction, exact):
        from pandas_alchemy_spark.operators.asof import asof_join
        left, right = self._frames()
        want = pd.merge_asof(left, right, on="t", by="k",
                             direction=direction,
                             allow_exact_matches=exact)
        got = (asof_join(spark.createDataFrame(left),
                         spark.createDataFrame(right),
                         on="t", by="k", direction=direction,
                         allow_exact_matches=exact)
               .toPandas().sort_values(["t", "lv"], kind="stable")
               .reset_index(drop=True))
        want = (want.sort_values(["t", "lv"], kind="stable")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "t", "lv", "rv"]], want[["k", "t", "lv", "rv"]],
            check_dtype=False)


class TestIntervalJoin:
    def test_vs_bruteforce(self, spark):
        import numpy as np
        from pandas_alchemy_spark.operators.interval import interval_join
        rng = np.random.RandomState(11)
        left = pd.DataFrame({
            "k": rng.randint(0, 3, 50),
            "t": rng.randint(-50, 1000, 50).astype("int64"),
            "lid": np.arange(50, dtype="int64")})
        right = pd.DataFrame({
            "k": rng.randint(0, 3, 60),
            "t": rng.randint(-50, 1000, 60).astype("int64"),
            "rid": np.arange(60, dtype="int64")})
        got = (interval_join(spark.createDataFrame(left),
                             spark.createDataFrame(right),
                             on="t", tolerance=25, by="k")
               .toPandas())
        bf = left.merge(right, on="k", suffixes=("", "_r"))
        bf = bf[(bf.t - bf.t_r).abs() <= 25]
        want = set(zip(bf.lid, bf.rid))
        assert set(zip(got.lid, got.rid)) == want
        assert len(got) == len(bf)


def test_rolling_minmax_expanding(spark):
    pdf = pd.DataFrame({"v": [3.0, 1.0, None, 7.0, 5.0, 2.0]})
    s = pas.DataFrame.from_pandas(pdf).v
    ps = pdf["v"]
    for verb in ["max", "min", "std", "count"]:
        got = getattr(s.rolling(3, min_periods=1), verb)().to_pandas()
        want = getattr(ps.rolling(3, min_periods=1), verb)()
        pd.testing.assert_series_equal(got.reset_index(drop=True),
                                       want.reset_index(drop=True),
                                       check_dtype=False, check_names=False)
    for verb in ["sum", "mean", "max", "min"]:
        got = getattr(s.expanding(), verb)().to_pandas()
        want = getattr(ps.expanding(), verb)()
        pd.testing.assert_series_equal(got.reset_index(drop=True),
                                       want.reset_index(drop=True),
                                       check_dtype=False, check_names=False)


# ---------------------------------------------------- time-offset rolling

def _time_pdf(n=2500, seed=5, users=False):
    import numpy as np
    rng = np.random.default_rng(seed)
    secs = np.unique(rng.integers(0, 40_000_000, n))
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(secs, unit="s")
    d = {"v": rng.normal(size=len(ts))}
    if users:
        d["u"] = rng.integers(0, 7, size=len(ts))
    return pd.DataFrame(d, index=pd.Index(ts, name="ts"))


def test_rolling_time_offset_global(spark):
    pdf = _time_pdf()
    df = pas.DataFrame.from_pandas(pdf)
    for agg in ("sum", "mean", "max", "count"):
        got = (getattr(df.v.rolling("7D"), agg)()
               .to_pandas().sort_index())
        want = getattr(pdf.v.rolling("7D"), agg)().sort_index()
        pdt.assert_series_equal(got, want, check_dtype=False,
                                check_names=False, check_freq=False,
                                rtol=1e-12)


def test_rolling_time_offset_min_periods(spark):
    pdf = _time_pdf(800, seed=9)
    df = pas.DataFrame.from_pandas(pdf)
    got = df.v.rolling("24h", min_periods=3).sum().to_pandas().sort_index()
    want = pdf.v.rolling("24h", min_periods=3).sum().sort_index()
    pdt.assert_series_equal(got, want, check_dtype=False,
                            check_names=False, check_freq=False,
                            rtol=1e-12)


def test_rolling_time_offset_grouped(spark):
    pdf = _time_pdf(users=True)
    df = pas.DataFrame.from_pandas(pdf)
    got = (df.groupby("u")["v"].rolling("7D").sum()
           .to_pandas().sort_index())
    want = (pdf.groupby("u")["v"].rolling("7D").sum()
            .reset_index(level=0, drop=True).sort_index())
    pdt.assert_series_equal(got, want, check_dtype=False,
                            check_names=False, check_freq=False,
                            rtol=1e-12)


def test_rolling_time_offset_validation(spark):
    pdf = _time_pdf(50)
    df = pas.DataFrame.from_pandas(pdf)
    with pytest.raises(ValueError, match="offset"):
        df.v.rolling("3M").sum()        # calendar offsets unsupported
    ints = pas.DataFrame.from_pandas(
        pd.DataFrame({"v": [1.0, 2.0]}, index=[1, 2]))
    with pytest.raises(ValueError, match="datetime index"):
        ints.v.rolling("7D").sum()      # non-datetime index rejected


def test_rolling_time_duplicate_ts_sql_semantics(spark):
    """On TIED timestamps the engine keeps SQL RANGE semantics (all
    peers in the frame) — the documented, oracle-checkable divergence
    from pandas' positional cut."""
    import duckdb
    ts = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-02",
                         "2024-01-05", "2024-01-09"])
    pdf = pd.DataFrame({"v": [1.0, 2.0, 4.0, 8.0, 16.0]},
                       index=pd.Index(ts, name="ts"))
    df = pas.DataFrame.from_pandas(pdf)
    got = df.v.rolling("3D").sum().to_pandas().sort_index()
    flat = pdf.reset_index()
    want = duckdb.sql("""
        SELECT ts, sum(v) OVER (ORDER BY epoch_us(ts)
                  RANGE BETWEEN 259199999999 PRECEDING AND CURRENT ROW)
               AS v
        FROM flat ORDER BY ts
    """).df().set_index("ts")["v"]
    assert got.tolist() == want.tolist()
    # both tied 2024-01-02 rows see BOTH peer values (2+4) in frame
    assert got.iloc[1] == got.iloc[2] == 7.0


# ------------------- round-5 analytic review-finding regressions


def test_grouped_shift_fill_value_edge_only(spark):
    pdf = pd.DataFrame({"k": ["a", "a"], "v": [None, 5.0]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.groupby("k")["v"].shift(1, fill_value=0) \
        .to_pandas().sort_index()
    want = pdf.groupby("k")["v"].shift(1, fill_value=0)
    assert got.fillna(-9).tolist() == want.fillna(-9).tolist()
    gotn = df.groupby("k")["v"].shift(-1, fill_value=7) \
        .to_pandas().sort_index()
    wantn = pdf.groupby("k")["v"].shift(-1, fill_value=7)
    assert gotn.fillna(-9).tolist() == wantn.fillna(-9).tolist()


def test_safe_corr_pairwise_deletion(spark):
    """stddev over all non-null x with covar over pairs can exceed
    |1|; the mask must be pairwise for all three aggregates."""
    pdf = pd.DataFrame({"k": ["a"] * 3, "x": [1.0, 2.0, 3.0],
                        "y": [1.0, None, 3.0]})
    df = pas.DataFrame.from_pandas(pdf)
    out = df.groupby("k")["x"].rolling(3, min_periods=2).corr("y") \
        .to_pandas().sort_index()
    assert abs(out.iloc[-1] - 1.0) < 1e-9  # not 1.414


def test_grouped_pct_change_ieee(spark):
    pdf = pd.DataFrame({"k": ["a", "a"], "v": [0.0, 5.0]})
    df = pas.DataFrame.from_pandas(pdf)
    out = df.groupby("k")["v"].pct_change().to_pandas().sort_index()
    assert out.iloc[-1] == float("inf")


def test_grouped_bool_diff(spark):
    """pandas GroupBy.diff subtracts booleans as ints (-1/0/1) —
    distinct from Series.diff's XOR; each flavor matches its own
    pandas behavior."""
    pdf = pd.DataFrame({"k": ["a"] * 3, "f": [True, False, False]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.groupby("k")["f"].diff().to_pandas().sort_index()
    want = pdf.groupby("k")["f"].diff()
    assert got.isna().tolist() == want.isna().tolist()
    assert got.dropna().tolist() == [int(v) for v in want.dropna()]


def test_grouped_rolling_mp0_sum(spark):
    pdf = pd.DataFrame({"k": ["a"] * 3, "v": [None, None, 1.0]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.groupby("k")["v"].rolling(2, min_periods=0).sum() \
        .to_pandas().sort_index()
    want = pdf.groupby("k")["v"].rolling(2, min_periods=0).sum() \
        .reset_index(level=0, drop=True)
    assert got.tolist() == want.tolist()


def test_rolling_window_validation(spark):
    s = pas.Series.from_list([1.0, 2.0], name="v")
    with pytest.raises(ValueError, match="window"):
        s.rolling(0)
    with pytest.raises(ValueError, match="Limit"):
        s.to_frame("v").groupby("v")["v"].ffill(limit=0)
