"""Differential tests for the 9 broadcast/alignment dispatch rules
(SURVEY.md §2.8 rules 1-9; reference alchemy.py:165-236,385-447 and the
join machinery base.py:64-128)."""

from __future__ import annotations

import pandas as pd
import pytest

import pandas_alchemy_spark as pas


def _k(vals, name="k"):
    return pd.Index(vals, name=name)


def frame(pdf):
    return pas.DataFrame.from_pandas(pdf)


def cmp_frame(ours, want):
    got = ours.to_pandas().sort_index()
    want = want.sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False,
                                  check_column_type=False)


def cmp_series(ours, want):
    got = ours.to_pandas().sort_index()
    want = want.sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_index_type=False,
                                   check_names=False)


@pytest.fixture(scope="module")
def pdf_a(spark):
    return pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0],
                         "c": [7.0, 8.0, 9.0]}, index=_k(["x", "y", "z"]))


@pytest.fixture(scope="module")
def pdf_b(spark):
    return pd.DataFrame({"b": [10.0, 20.0], "c": [30.0, 40.0],
                         "d": [50.0, 60.0]}, index=_k(["y", "w"]))


def test_rule2_series_axis1(pdf_a):
    # Series labels align against DataFrame column labels
    s = pd.Series([100.0, 200.0], index=["b", "d"])
    cmp_frame(frame(pdf_a) + s, pdf_a + s)


def test_rule3_series_axis0(pdf_a):
    s = pd.Series([10.0, 20.0], index=_k(["y", "z"]))
    cmp_frame(frame(pdf_a).add(s, axis=0), pdf_a.add(s, axis=0))


def test_rule4_frame_frame(pdf_a, pdf_b):
    # outer label join + full-outer index join
    cmp_frame(frame(pdf_a) + frame(pdf_b), pdf_a + pdf_b)


def test_rule4_frame_pandas_frame(pdf_a, pdf_b):
    cmp_frame(frame(pdf_a) + pdf_b, pdf_a + pdf_b)


def test_rule5_list_axis1(pdf_a):
    cmp_frame(frame(pdf_a) + [10.0, 20.0, 30.0], pdf_a + [10.0, 20.0, 30.0])
    with pytest.raises(ValueError, match="Unable to coerce to Series"):
        frame(pdf_a) + [1.0, 2.0]


def test_rule6_list_axis0(pdf_a):
    cmp_frame(frame(pdf_a).add([10.0, 20.0, 30.0], axis=0),
              pdf_a.add([10.0, 20.0, 30.0], axis=0))
    with pytest.raises(ValueError, match="Unable to coerce to Series"):
        frame(pdf_a).add([1.0], axis=0)


def test_rule7_series_series_join(spark):
    pa = pd.Series([1.0, 2.0, 3.0], index=_k(["a", "b", "c"]))
    pb = pd.Series([10.0, 20.0], index=_k(["b", "e"]))
    cmp_series(pas.Series.from_pandas(pa) + pas.Series.from_pandas(pb), pa + pb)


def test_rule7_duplicate_index_join_semantics(spark):
    # Documented divergence: pandas aligns *identical* duplicate
    # indexes positionally ([11, 22]); relational alignment (ours and
    # the reference's SQL join) produces the per-key cartesian.  The
    # reference has the same divergence by construction (base.py:72-84).
    pa = pd.Series([1.0, 2.0], index=_k(["a", "a"]))
    pb = pd.Series([10.0, 20.0], index=_k(["a", "a"]))
    got = (pas.Series.from_pandas(pa) + pas.Series.from_pandas(pb)).to_pandas()
    assert sorted(got) == [11.0, 12.0, 21.0, 22.0]


def test_rule8_series_frame(pdf_a):
    # pandas Series + DataFrame aligns series index on COLUMNS
    s = pd.Series([10.0, 20.0], index=_k(["y", "z"]))
    cmp_frame(pas.Series.from_pandas(s) + frame(pdf_a), s + pdf_a)


def test_rule8_series_sub_frame_reflected(pdf_a):
    # reference bug: always delegated to radd; we delegate to the
    # matching reflected op (SURVEY.md §2.8 rule 8)
    s = pd.Series([10.0, 20.0, 30.0], index=["a", "b", "c"])
    got = (pas.Series.from_pandas(s) - frame(pdf_a)).to_pandas().sort_index()
    want = (s - pdf_a).sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False,
                                  check_column_type=False)


def test_rule9_type_error(pdf_a):
    with pytest.raises(TypeError, match="Cannot broadcast"):
        frame(pdf_a) + object()


def test_self_join_aliasing(spark):
    pa = pd.Series([1.0, 2.0], index=_k(["a", "b"]))
    a = pas.Series.from_pandas(pa)
    cmp_series(a + a, pa + pa)
    apdf = pd.DataFrame({"x": [1.0, 2.0]}, index=_k(["a", "b"]))
    adf = frame(apdf)
    cmp_frame(adf + adf, apdf + apdf)


def test_multiindex_level_join(spark):
    midx = pd.MultiIndex.from_tuples(
        [("a", 1), ("a", 2), ("b", 1)], names=["k1", "k2"])
    mpdf = pd.DataFrame({"v": [10.0, 20.0, 30.0]}, index=midx)
    spdf = pd.Series([1.0, 2.0], index=pd.Index(["a", "b"], name="k1"))
    mdf = frame(mpdf)
    ss = pas.Series.from_pandas(spdf)
    got = mdf.add(ss, axis=0).to_pandas().sort_index()
    want = mpdf.add(spdf, axis=0).sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False,
                                  check_column_type=False)


def test_multi_multi_refusal(spark):
    midx = pd.MultiIndex.from_tuples([("a", 1)], names=["k1", "k2"])
    m1 = frame(pd.DataFrame({"v": [1.0]}, index=midx))
    m2 = frame(pd.DataFrame({"v": [2.0]}, index=midx))
    with pytest.raises(NotImplementedError):
        m1.add(m2.v, axis=0)


def test_no_overlap_refusal(spark):
    midx = pd.MultiIndex.from_tuples([("a", 1)], names=["k1", "k2"])
    m = frame(pd.DataFrame({"v": [1.0]}, index=midx))
    s = pas.Series.from_pandas(pd.Series([1.0], index=pd.Index(["a"], name="zzz")))
    with pytest.raises(ValueError, match="no overlapping index names"):
        m.add(s, axis=0)


def test_series_add_prefix_suffix(spark):
    ps = pd.Series([1, 2], index=pd.Index(["a", "b"], name="k"))
    s = pas.Series.from_pandas(ps)
    got = s.add_prefix("pre_").to_pandas().sort_index()
    want = ps.add_prefix("pre_").sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_index_type=False, check_names=False)
    got = s.add_suffix("_suf").to_pandas().sort_index()
    want = ps.add_suffix("_suf").sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_index_type=False, check_names=False)


def test_dataframe_add_prefix_metadata_only(spark):
    pdf = pd.DataFrame({"a": [1], "b": [2]})
    df = frame(pdf)
    out = df.add_prefix("x_")
    assert list(out.columns) == ["x_a", "x_b"]
    # original untouched (copy-on-write)
    assert list(df.columns) == ["a", "b"]


def test_applymap_expression(spark):
    from pyspark.sql import functions as F
    pdf = pd.DataFrame({"a": [1.0, None, 3.0]})
    df = frame(pdf)
    got = df.applymap(lambda c: c * 2, na_action="ignore").to_pandas().sort_index()
    want = pdf.applymap(lambda v: v * 2 if v == v else v)
    want.index = got.index
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError, match="na_action"):
        df.applymap(lambda c: c, na_action="bogus")


def test_pipe(spark):
    pdf = pd.DataFrame({"a": [1.0]})
    df = frame(pdf)
    assert df.pipe(lambda d: 42) == 42
    assert df.pipe((lambda x, d: x, "d"), 1) == 1
    with pytest.raises(ValueError):
        df.pipe((lambda d: d, "d"), d=3)
