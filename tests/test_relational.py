"""Beyond-reference relational verbs: groupby/agg, sort, merge,
drop_duplicates, set_index/reset_index — differential vs pandas."""

from __future__ import annotations

import pandas as pd
import pytest

import pandas_alchemy_spark as pas
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def li(spark):
    return pas.read_parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return pas.read_parquet(f"{SF_DIR}/orders.parquet")


def test_groupby_agg(li, lineitem_pdf):
    got = (li.groupby(["l_returnflag", "l_linestatus"])
           .agg({"l_quantity": "sum", "l_extendedprice": "mean"})
           .to_pandas().sort_index())
    want = (lineitem_pdf.groupby(["l_returnflag", "l_linestatus"])
            .agg({"l_quantity": "sum", "l_extendedprice": "mean"})
            .sort_index())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False)


def test_groupby_named_agg(li, lineitem_pdf):
    got = (li.groupby("l_returnflag")
           .agg(total=("l_quantity", "sum"), n=("l_quantity", "count"))
           .to_pandas().sort_index())
    want = (lineitem_pdf.groupby("l_returnflag")
            .agg(total=("l_quantity", "sum"), n=("l_quantity", "count"))
            .sort_index())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False)


def test_groupby_size(li, lineitem_pdf):
    got = li.groupby("l_returnflag").size().to_pandas().sort_index()
    want = lineitem_pdf.groupby("l_returnflag").size().sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_index_type=False, check_names=False)


def test_sort_values_head(li, lineitem_pdf):
    got = li.sort_values("l_extendedprice", ascending=False).head(5).to_pandas()
    want = lineitem_pdf.sort_values("l_extendedprice", ascending=False).head(5)
    assert list(got.l_extendedprice) == list(want.l_extendedprice)


def test_nlargest(li, lineitem_pdf):
    got = li.nlargest(3, "l_extendedprice").to_pandas()
    want = lineitem_pdf.nlargest(3, "l_extendedprice")
    assert list(got.l_extendedprice) == list(want.l_extendedprice)


def test_merge(li, orders, lineitem_pdf):
    orders_pdf = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    got = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey",
                   how="inner")
    want = lineitem_pdf.merge(orders_pdf, left_on="l_orderkey",
                              right_on="o_orderkey", how="inner")
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    gs = got.groupby("o_orderstatus").agg({"l_quantity": "sum"}).to_pandas().sort_index()
    ws = want.groupby("o_orderstatus").agg({"l_quantity": "sum"}).sort_index()
    pd.testing.assert_frame_equal(gs, ws, check_dtype=False, check_index_type=False)


def test_merge_on_shared_label(spark):
    a = pas.DataFrame.from_pandas(pd.DataFrame({"k": [1, 2, 3], "x": [10.0, 20.0, 30.0]}))
    b = pas.DataFrame.from_pandas(pd.DataFrame({"k": [2, 3, 4], "y": [200.0, 300.0, 400.0]}))
    got = a.merge(b, on="k", how="left").to_pandas()
    pa = pd.DataFrame({"k": [1, 2, 3], "x": [10.0, 20.0, 30.0]})
    pb = pd.DataFrame({"k": [2, 3, 4], "y": [200.0, 300.0, 400.0]})
    want = pa.merge(pb, on="k", how="left")
    assert list(got.columns) == list(want.columns)
    got_s = got.sort_values("k").reset_index(drop=True)
    want_s = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s[["k", "x", "y"]], want_s,
                                  check_dtype=False)


def test_drop_duplicates(spark):
    pdf = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "x", "y", "z", "w"]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.drop_duplicates().to_pandas()
    assert len(got) == 4
    got_sub = df.drop_duplicates(subset=["a"]).to_pandas()
    assert len(got_sub) == 3


def test_dropna_fillna(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": [None, 2.0, 3.0]})
    df = pas.DataFrame.from_pandas(pdf)
    assert len(df.dropna().to_pandas()) == 1
    assert len(df.dropna(subset=["a"]).to_pandas()) == 2
    got = df.fillna(0).to_pandas().sort_index()
    want = pdf.fillna(0)
    want.index = got.index
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_set_reset_index(spark):
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1.0, 2.0]})
    df = pas.DataFrame.from_pandas(pdf)
    si = df.set_index("k")
    got = si.to_pandas().sort_index()
    want = pdf.set_index("k").sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    ri = si.reset_index()
    got2 = ri.to_pandas()
    assert list(got2.columns) == ["k", "v"]


def test_series_reductions(li, lineitem_pdf):
    s, ps = li.l_quantity, lineitem_pdf.l_quantity
    assert s.sum() == pytest.approx(ps.sum())
    assert s.mean() == pytest.approx(ps.mean())
    assert s.min() == ps.min()
    assert s.max() == ps.max()
    assert s.count() == ps.count()
    assert s.nunique() == ps.nunique()


def test_value_counts(li, lineitem_pdf):
    got = li.l_returnflag.value_counts().to_pandas().sort_index()
    want = lineitem_pdf.l_returnflag.value_counts().sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_index_type=False, check_names=False)


def test_rename_astype(spark):
    pdf = pd.DataFrame({"a": [1, 2]})
    df = pas.DataFrame.from_pandas(pdf)
    assert list(df.rename(columns={"a": "z"}).columns) == ["z"]
    got = df.astype("float64").to_pandas()
    assert got["a"].dtype == "float64"


def test_series_stat_reductions(li, lineitem_pdf):
    import numpy as np
    s = li.l_quantity
    ps = lineitem_pdf["l_quantity"]
    assert abs(s.quantile(0.25) - ps.quantile(0.25)) < 1e-9
    assert abs(s.median() - ps.median()) < 1e-9
    assert abs(s.var() - ps.var()) < 1e-9
    got_c = li.l_quantity.corr(li.l_extendedprice)
    want_c = ps.corr(lineitem_pdf["l_extendedprice"])
    assert abs(got_c - want_c) < 1e-9
    got_v = li.l_quantity.cov(li.l_extendedprice)
    want_v = ps.cov(lineitem_pdf["l_extendedprice"])
    assert abs(got_v - want_v) / abs(want_v) < 1e-9


def test_series_idx_extrema(orders, spark):
    opdf = orders.to_pandas()
    s = orders.set_index("o_orderkey").o_totalprice
    ps = opdf.set_index("o_orderkey")["o_totalprice"]
    assert s.idxmax() == ps.idxmax()
    assert s.idxmin() == ps.idxmin()


def test_groupby_median(li, lineitem_pdf):
    got = (li.groupby("l_returnflag").agg(med=("l_quantity", "median"))
           .to_pandas().sort_index())
    want = (lineitem_pdf.groupby("l_returnflag")
            .agg(med=("l_quantity", "median")).sort_index())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False)


def test_series_explode(spark):
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": [[1, 2], [], [3]]})
    got = (pas.DataFrame.from_pandas(pdf).set_index("k").v.explode()
           .to_pandas())
    want = pdf.set_index("k")["v"].explode()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_index_type=False)


def test_frame_explode(spark):
    pdf = pd.DataFrame({"k": [1, 2], "v": [[1, 2, 3], [4]],
                        "w": ["a", "b"]})
    got = (pas.DataFrame.from_pandas(pdf).explode("v")
           .to_pandas().reset_index(drop=True))
    want = pdf.explode("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_get_dummies(li, lineitem_pdf):
    got = (pas.get_dummies(li.l_returnflag, prefix="rf",
                           categories=["A", "N", "R"])
           .to_pandas().sum())
    want = (pd.get_dummies(lineitem_pdf["l_returnflag"], prefix="rf")
            .sum())
    pd.testing.assert_series_equal(got.astype("int64"),
                                   want.astype("int64"))


def test_sample_deterministic(orders):
    s1 = orders.sample(0.1, key="o_orderkey")
    s2 = orders.sample(0.1, key="o_orderkey")
    n1, n2 = len(s1), len(s2)
    assert n1 == n2
    assert 0.05 * len(orders) < n1 < 0.2 * len(orders)


def test_where_mask_combine_first(li, lineitem_pdf):
    s, ps = li.l_quantity, lineitem_pdf["l_quantity"]
    got = s.where(s < 25, other=-1.0).to_pandas().reset_index(drop=True)
    want = ps.where(ps < 25, other=-1.0).reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)
    got = s.mask(s < 25, other=0.0).to_pandas().reset_index(drop=True)
    want = ps.mask(ps < 25, other=0.0).reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)
    holes = s.where(s < 25)
    filled = holes.combine_first(s * 100)
    pholes = ps.where(ps < 25)
    pfilled = pholes.combine_first(ps * 100)
    pd.testing.assert_series_equal(
        filled.to_pandas().reset_index(drop=True),
        pfilled.reset_index(drop=True), check_dtype=False,
        check_names=False)


def test_replace(li, lineitem_pdf):
    got = (li.l_returnflag.replace({"A": "AA", "R": "RR"})
           .to_pandas().reset_index(drop=True))
    want = (lineitem_pdf["l_returnflag"].replace({"A": "AA", "R": "RR"})
            .reset_index(drop=True))
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)


def test_duplicated(orders):
    opdf = orders.to_pandas()
    got = orders.duplicated(subset=["o_custkey"]).to_pandas().reset_index(drop=True)
    want = opdf.duplicated(subset=["o_custkey"]).reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)
    got_all = (orders.duplicated(subset=["o_custkey"], keep=False)
               .to_pandas().reset_index(drop=True))
    want_all = (opdf.duplicated(subset=["o_custkey"], keep=False)
                .reset_index(drop=True))
    pd.testing.assert_series_equal(got_all, want_all, check_dtype=False,
                                   check_names=False)


def test_cut(li, lineitem_pdf):
    bins = [0, 10, 20, 30, 40, 50]
    got = (pas.cut(li.l_quantity, bins).to_pandas()
           .reset_index(drop=True))
    want = (pd.cut(lineitem_pdf["l_quantity"], bins).astype(str)
            .replace("nan", None).reset_index(drop=True))
    # pandas prints intervals like (0, 10]; ours use the same format
    want = want.map(lambda x: x.replace(".0", "") if isinstance(x, str) else x)
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)


def test_pct_change_cumprod(li, lineitem_pdf):
    got = (li.l_quantity.head(50).pct_change().to_pandas()
           .reset_index(drop=True))
    want = (lineitem_pdf["l_quantity"].head(50).pct_change(fill_method=None)
            .reset_index(drop=True))
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)
    got = ((li.l_discount.head(20) + 1).cumprod().to_pandas()
           .reset_index(drop=True))
    want = ((lineitem_pdf["l_discount"].head(20) + 1).cumprod()
            .reset_index(drop=True))
    pd.testing.assert_series_equal(got.round(9), want.round(9),
                                   check_dtype=False, check_names=False)


def test_groupby_apply_pandas(li, lineitem_pdf):
    def top2(pdf):
        out = pdf.nlargest(2, "l_quantity")[
            ["l_returnflag", "l_orderkey", "l_quantity"]]
        return out

    got = (li[["l_returnflag", "l_orderkey", "l_quantity"]]
           .groupby("l_returnflag")
           .apply(top2, "l_returnflag string, l_orderkey long,"
                        " l_quantity double")
           .to_pandas()
           .sort_values(["l_returnflag", "l_orderkey"])
           .reset_index(drop=True))
    want = (lineitem_pdf.groupby("l_returnflag", group_keys=False)[
                ["l_returnflag", "l_orderkey", "l_quantity"]]
            .apply(top2)
            .sort_values(["l_returnflag", "l_orderkey"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_frame_reductions(li, lineitem_pdf):
    got = li[["l_quantity", "l_discount", "l_tax"]].sum().to_pandas()
    want = lineitem_pdf[["l_quantity", "l_discount", "l_tax"]].sum()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False, check_index_type=False)
    got = li[["l_quantity", "l_discount"]].mean().to_pandas()
    want = lineitem_pdf[["l_quantity", "l_discount"]].mean()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False, check_index_type=False)


def test_merge_cross(spark):
    a = pas.DataFrame.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))
    b = pas.DataFrame.from_pandas(pd.DataFrame({"y": ["u", "v"]}))
    got = (a.merge(b, how="cross").to_pandas()
           .sort_values(["x", "y"]).reset_index(drop=True))
    want = (pd.DataFrame({"x": [1, 2, 3]}).merge(
        pd.DataFrame({"y": ["u", "v"]}), how="cross")
        .sort_values(["x", "y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_qcut(li, lineitem_pdf):
    got = (pas.qcut(li.l_extendedprice, 4).to_pandas()
           .reset_index(drop=True))
    want = (pd.qcut(lineitem_pdf["l_extendedprice"], 4, labels=False)
            .reset_index(drop=True))
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)


def test_query_expr(li, lineitem_pdf):
    got = (li.query("l_quantity < 10 and l_discount >= 0.05")
           [["l_orderkey", "l_quantity"]].to_pandas()
           .sort_values(["l_orderkey", "l_quantity"]).reset_index(drop=True))
    want = (lineitem_pdf.query("l_quantity < 10 and l_discount >= 0.05")
            [["l_orderkey", "l_quantity"]]
            .sort_values(["l_orderkey", "l_quantity"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_frame_nunique_idxmax(orders):
    opdf = orders.to_pandas()
    got = orders[["o_orderstatus", "o_orderpriority"]].nunique().to_pandas()
    want = opdf[["o_orderstatus", "o_orderpriority"]].nunique()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False, check_index_type=False)
    oi = orders.set_index("o_orderkey")
    got = oi[["o_totalprice", "o_custkey"]].idxmax().to_pandas()
    want = opdf.set_index("o_orderkey")[["o_totalprice", "o_custkey"]].idxmax()
    # o_custkey max is duplicated; max_by picks an arbitrary holder,
    # pandas the first -- compare only the unique-max column strictly
    assert got["o_totalprice"] == want["o_totalprice"]


def test_series_nlargest(li, lineitem_pdf):
    got = list(li.l_extendedprice.nlargest(5).to_pandas())
    want = list(lineitem_pdf["l_extendedprice"].nlargest(5))
    assert got == want


def test_drop_map_to_frame(li, lineitem_pdf):
    got = li.drop(columns=["l_tax", "l_shipdate"]).columns.tolist()
    want = lineitem_pdf.drop(columns=["l_tax", "l_shipdate"]).columns.tolist()
    assert got == want
    with pytest.raises(KeyError):
        li.drop(columns=["nope"])
    got = (li.l_returnflag.map({"A": 1, "N": 2}).to_pandas()
           .reset_index(drop=True))
    want = (lineitem_pdf["l_returnflag"].map({"A": 1, "N": 2})
            .reset_index(drop=True))
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)
    f = li.l_quantity.to_frame("qty")
    assert f.columns.tolist() == ["qty"]
    assert len(f) == len(li)


def test_frame_corr_matrix(li, lineitem_pdf):
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = li[cols].corr()
    want = lineitem_pdf[cols].corr()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  atol=1e-9)


def test_series_agg_list(li, lineitem_pdf):
    got = li.l_quantity.agg(["sum", "mean", "max"])
    want = lineitem_pdf["l_quantity"].agg(["sum", "mean", "max"])
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)
    assert li.l_quantity.agg("sum") == lineitem_pdf["l_quantity"].sum()


def test_swaplevel_droplevel(li, lineitem_pdf):
    m = li.set_index(["l_returnflag", "l_linestatus"])
    pm = lineitem_pdf.set_index(["l_returnflag", "l_linestatus"])
    got = (m.swaplevel()[["l_quantity"]].to_pandas()
           .sort_index().groupby(level=[0, 1]).sum())
    want = (pm.swaplevel()[["l_quantity"]]
            .sort_index().groupby(level=[0, 1]).sum())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    got2 = (m.droplevel(0)[["l_quantity"]].to_pandas()
            .groupby(level=0).sum())
    want2 = (pm.droplevel(0)[["l_quantity"]].groupby(level=0).sum())
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_salted_join_equivalence(spark, orders):
    from pandas_alchemy_spark.operators.skew import salted_join
    o = orders.to_spark(index=False).select("o_orderkey", "o_custkey",
                                            "o_totalprice")
    dim = (orders.to_spark(index=False)
           .select("o_custkey").distinct()
           .withColumn("seg", (F_col := __import__("pyspark.sql.functions",
                                                   fromlist=["col"]))
                       .pmod(F_col.col("o_custkey"), F_col.lit(3))))
    got = salted_join(o, dim, on="o_custkey", salt=4)
    want = o.join(dim, "o_custkey")
    assert got.count() == want.count()
    gs = got.agg(F_col.sum("o_totalprice")).collect()[0][0]
    ws = want.agg(F_col.sum("o_totalprice")).collect()[0][0]
    assert abs(gs - ws) < 1e-6


def test_astype_dict_per_column(spark):
    df = pas.read_parquet(f"{SF_DIR}/customer.parquet")
    out = df.astype({"c_custkey": "str", "c_acctbal": "int64"})
    got = out.head(5).to_pandas()
    assert got["c_custkey"].map(type).eq(str).all()
    assert str(got["c_acctbal"].dtype) in ("int64", "Int64")
    # untouched columns keep their type
    assert got["c_nationkey"].dtype.kind == "i"
    with pytest.raises(KeyError, match="not found in columns"):
        df.astype({"nope": "int64"})


def test_resample_fixed_freq_vs_pandas(spark):
    from pandas_alchemy_spark.ext.events import load_events
    import pandas_alchemy_spark as pas_
    ev = load_events(pas_.get_session(),
                     f"{SF_DIR}/events.parquet").select("ts", "value")
    from pandas_alchemy_spark.core import DataFrame
    df = DataFrame._from_spark_scan(ev)
    got = (df.resample("6h", on="ts")
           .agg(total=("value", "sum"), n=("value", "count"))
           .to_pandas().sort_index())
    pdf = ev.toPandas()
    want = (pdf.resample("6h", on="ts")
            .agg(total=("value", "sum"), n=("value", "count")))
    want = want[want["n"] > 0]  # pandas emits empty gap bins; we don't
    assert got["n"].tolist() == want["n"].tolist()
    import numpy as np
    assert np.allclose(got["total"].to_numpy(), want["total"].to_numpy())


def test_resample_calendar_freq_vs_pandas(spark):
    o = pas.read_parquet(f"{SF_DIR}/orders.parquet")
    got = (o[["o_orderdate", "o_totalprice"]]
           .resample("MS", on="o_orderdate")
           .agg(rev=("o_totalprice", "sum"), n=("o_totalprice", "count"))
           .to_pandas().sort_index())
    pdf = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"])
    want = (pdf.resample("MS", on="o_orderdate")
            .agg(rev=("o_totalprice", "sum"), n=("o_totalprice", "count")))
    want = want[want["n"] > 0]
    assert got["n"].tolist() == want["n"].tolist()
    import numpy as np
    assert np.allclose(got["rev"].to_numpy(), want["rev"].to_numpy())


def test_resample_requires_on(spark):
    o = pas.read_parquet(f"{SF_DIR}/orders.parquet")
    with pytest.raises(NotImplementedError, match="on="):
        o.resample("1h")


def test_transpose_bounded(spark):
    df = pas.read_parquet(f"{SF_DIR}/nation.parquet")
    t = df.T
    assert list(t.columns) == list(range(25))
    assert t.shape[0] == len(df.columns)
    with pytest.raises(ValueError, match="more than 3 rows"):
        df.transpose(max_rows=3)


def test_groupby_method_wrappers_vs_pandas(spark):
    df = pas.read_parquet(f"{SF_DIR}/orders.parquet")
    sub = df[["o_orderpriority", "o_totalprice", "o_custkey"]]
    pdf = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_orderpriority", "o_totalprice", "o_custkey"]]
    for meth in ["std", "var", "median", "nunique", "first", "last"]:
        got = getattr(sub.groupby("o_orderpriority"), meth)() \
            .to_pandas().sort_index()
        want = getattr(pdf.groupby("o_orderpriority"), meth)()
        if meth in ("first", "last"):
            # order-dependent in a distributed engine: only the row
            # COUNT contract holds (pandas takes file order)
            assert got.shape == want.shape
            continue
        import numpy as np
        assert np.allclose(got["o_totalprice"].to_numpy(),
                           want["o_totalprice"].to_numpy())


def test_merge_indicator_vs_pandas(spark):
    import numpy as np
    a = pas.DataFrame.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, None], "x": [10.0, 20.0, 30.0, 40.0]}))
    b = pas.DataFrame.from_pandas(pd.DataFrame(
        {"k": [2, 3, 5], "y": [1.0, 2.0, 3.0]}))
    got = (a.merge(b, on="k", how="outer", indicator=True)
           .to_pandas().sort_values(["k", "x"], na_position="last")
           .reset_index(drop=True))
    pa = pd.DataFrame({"k": [1, 2, 3, None], "x": [10.0, 20.0, 30.0, 40.0]})
    pb = pd.DataFrame({"k": [2, 3, 5], "y": [1.0, 2.0, 3.0]})
    want = (pa.merge(pb, on="k", how="outer", indicator=True)
            .sort_values(["k", "x"], na_position="last")
            .reset_index(drop=True))
    assert got["_merge"].tolist() == want["_merge"].astype(str).tolist()
    assert np.allclose(got["x"].to_numpy(), want["x"].to_numpy(),
                       equal_nan=True)
    with pytest.raises(ValueError, match="indicator is not supported"):
        a.merge(b, on="k", how="semi", indicator=True)


def test_cut_label_precision_matches_pandas(spark):
    # pandas rounds label edges for display (precision-3 inference)
    # even for explicit bins: 1.9375 prints as 1.938
    p = pd.Series([0.5, 1.0, 1.9])
    want = [str(v) for v in
            pd.cut(p, [0.0, 1.9375], right=False).astype(object)]
    got = pas.cut(pas.Series.from_pandas(p), [0.0, 1.9375],
                  right=False).to_pandas().tolist()
    assert got == want == ["[0.0, 1.938)", "[0.0, 1.938)", "[0.0, 1.938)"]


def test_qcut_duplicates_drop(spark):
    import pandas as pd

    import pandas_alchemy_spark as pas
    # heavily skewed: 90% zeros -> duplicate quantile edges
    vals = [0.0] * 90 + list(range(10))
    s = pas.Series.from_list(vals, name="v")
    with pytest.raises(ValueError, match="unique"):
        pas.qcut(s, 4)
    binned = pas.qcut(s, 4, duplicates="drop").to_pandas()
    want = pd.qcut(pd.Series(vals), 4, labels=False,
                   duplicates="drop")
    assert sorted(binned.dropna().unique()) == \
        sorted(want.dropna().unique())
