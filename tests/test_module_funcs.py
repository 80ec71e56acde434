"""Module-level pandas functions added late in round 5:
merge_ordered, json_normalize, to_numeric, date_range, wide_to_long."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_alchemy_spark as pas


def test_merge_ordered(spark):
    a = pd.DataFrame({"t": [1, 3, 5], "x": [10.0, 30.0, 50.0]})
    b = pd.DataFrame({"t": [2, 3, 6], "y": [0.2, 0.3, 0.6]})
    got = pas.merge_ordered(pas.DataFrame.from_pandas(a),
                            pas.DataFrame.from_pandas(b), on="t",
                            fill_method="ffill").to_pandas()
    want = pd.merge_ordered(a, b, on="t", fill_method="ffill")
    g = got.sort_values("t").reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["t", "x", "y"]],
                                  want[["t", "x", "y"]],
                                  check_dtype=False, check_names=False)


def test_json_normalize(spark):
    rows = ['{"a": 1, "b": "p"}', '{"a": 2, "b": "q"}', "not json"]
    s = pas.Series.from_list(rows, name="j")
    out = pas.json_normalize(s, "a INT, b STRING") \
        .to_pandas().sort_index()
    assert out["a"].fillna(-1).tolist() == [1, 2, -1]
    assert out["b"].fillna("_").tolist() == ["p", "q", "_"]


def test_to_numeric(spark):
    s = pas.Series.from_list(["1.5", "2", "oops"], name="v")
    out = pas.to_numeric(s, errors="coerce").to_pandas().sort_index()
    assert out.fillna(-1).tolist() == [1.5, 2.0, -1.0]
    with pytest.raises(ValueError, match="Unable to parse"):
        pas.to_numeric(s)
    clean = pas.Series.from_list(["1", "2"], name="v")
    assert pas.to_numeric(clean).to_pandas().sort_index().tolist() \
        == [1.0, 2.0]


def test_date_range(spark):
    out = pas.date_range("2024-01-01", periods=5, freq="D") \
        .to_pandas().sort_index()
    want = pd.Series(pd.date_range("2024-01-01", periods=5,
                                   freq="D"))
    assert list(out) == list(want)


def test_wide_to_long(spark):
    pdf = pd.DataFrame({"id": [1, 2], "A1970": [10.0, 20.0],
                        "A1980": [11.0, 21.0], "B1970": [5.0, 6.0],
                        "B1980": [7.0, 8.0]})
    got = pas.wide_to_long(pas.DataFrame.from_pandas(pdf),
                           ["A", "B"], i="id", j="year") \
        .to_pandas().sort_index()
    want = pd.wide_to_long(pdf, ["A", "B"], i="id", j="year")
    want.index = pd.MultiIndex.from_tuples(
        [(i, str(y)) for i, y in want.index], names=["id", "year"])
    pd.testing.assert_frame_equal(got.sort_index(),
                                  want.sort_index(),
                                  check_dtype=False, check_names=False)


# ---------------------------------------------------------------------------
SF_DIR = "/root/testdata/sf0.001"

# round 6: pas.sql — the raw-SQL escape hatch
# ---------------------------------------------------------------------------

def test_sql_over_engine_frames(spark):
    """pas.sql registers engine frames as temp views and wraps the
    result: a join of two façade frames matches the verb twin."""
    cust = pas.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pas.read_parquet(f"{SF_DIR}/orders.parquet")
    out = pas.sql("""
        SELECT c.c_mktsegment AS seg,
               count(*) AS n,
               round(sum(o.o_totalprice), 2) AS total
        FROM o JOIN c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """, c=cust, o=orders).to_pandas().sort_values("seg")
    want = (orders.merge(cust, left_on="o_custkey",
                         right_on="c_custkey")
            .groupby("c_mktsegment")
            .agg(n=("o_orderkey", "count"),
                 total=("o_totalprice", "sum"))
            .to_pandas().sort_index())
    assert list(out.seg) == list(want.index)
    assert list(out.n) == list(want.n)
    import numpy as np
    np.testing.assert_allclose(out.total.to_numpy(),
                               want.total.round(2).to_numpy())


def test_sql_index_promotion_and_composition(spark):
    """index= promotes result columns; the wrapped frame composes
    with engine verbs (filter + assign on the SQL result)."""
    orders = pas.read_parquet(f"{SF_DIR}/orders.parquet")
    f = pas.sql("SELECT o_orderkey, o_totalprice FROM t "
                "WHERE o_orderkey < 100",
                index=["o_orderkey"], t=orders)
    g = f.assign(dbl=f.o_totalprice * 2)
    got = g.to_pandas()
    assert got.index.name == "o_orderkey"
    assert (got.dbl == got.o_totalprice * 2).all()


def test_sql_raw_spark_frame_kwarg(spark):
    """Raw Spark DataFrames register too (interop path)."""
    raw = spark.range(5)
    out = pas.sql("SELECT sum(id) AS s FROM r", r=raw).to_pandas()
    assert int(out.s.iloc[0]) == 10


def test_merge_ordered_left_by(spark):
    """Group-wise merge_ordered (pandas left_by): the right frame
    merges into every left group; ffill runs within each group in key
    order."""
    lp = pd.DataFrame({"g": ["a", "a", "b", "b"],
                       "k": [1, 3, 1, 4],
                       "lv": [10.0, 30.0, 100.0, 400.0]})
    rp = pd.DataFrame({"k": [2, 3], "rv": [0.2, 0.3]})
    want = pd.merge_ordered(lp, rp, on="k", left_by="g",
                            fill_method="ffill")
    got = pas.merge_ordered(
        pas.DataFrame.from_pandas(lp), pas.DataFrame.from_pandas(rp),
        on="k", left_by="g", fill_method="ffill"
    ).to_pandas().reset_index(drop=True).sort_values(["g", "k"]).reset_index(drop=True)
    want = want.sort_values(["g", "k"]).reset_index(drop=True)
    got = got[want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_merge_ordered_left_by_no_fill(spark):
    lp = pd.DataFrame({"g": ["x", "y"], "k": [1, 2],
                       "lv": [1.0, 2.0]})
    rp = pd.DataFrame({"k": [1, 3], "rv": [9.0, 7.0]})
    want = pd.merge_ordered(lp, rp, on="k", left_by="g")
    got = pas.merge_ordered(
        pas.DataFrame.from_pandas(lp), pas.DataFrame.from_pandas(rp),
        on="k", left_by="g"
    ).to_pandas().reset_index(drop=True).sort_values(["g", "k"]).reset_index(drop=True)
    want = want.sort_values(["g", "k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)
