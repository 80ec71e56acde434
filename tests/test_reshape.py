"""Differential tests: pivot_table / melt / describe vs pandas."""

import pandas as pd
import pandas.testing as pdt
import pytest

import pandas_alchemy_spark as pas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "k": ["x", "y", "x", "y", "x", "z"],
        "c": ["A", "A", "B", "B", "A", "B"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, None],
        "n": [1, 2, 3, 4, 5, 6],
    })


def test_pivot_table(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    got = df.pivot_table("v", "k", "c", "sum").to_pandas().sort_index()
    want = pdf.pivot_table(values="v", index="k", columns="c",
                           aggfunc="sum").sort_index()
    want.columns = list(want.columns)
    pdt.assert_frame_equal(got, want, check_dtype=False,
                           check_names=False, check_index_type=False)


def test_pivot_table_explicit_domain(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    got = df.pivot_table("v", "k", "c", "mean",
                         columns_values=["A", "B"]).to_pandas().sort_index()
    want = pdf.pivot_table(values="v", index="k", columns="c",
                           aggfunc="mean").sort_index()
    want.columns = list(want.columns)
    pdt.assert_frame_equal(got, want, check_dtype=False,
                           check_names=False, check_index_type=False)


def test_melt(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    got = df.melt("k", ["v", "n"]).to_pandas().reset_index(drop=True)
    want = pd.melt(pdf, id_vars="k", value_vars=["v", "n"])
    # row order within melt differs (Spark emits per-row var tuples);
    # compare as multisets
    key = lambda d: sorted(map(tuple, d.fillna(-1).values.tolist()))
    assert key(got) == key(want)
    assert list(got.columns) == list(want.columns)


def test_describe(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    got = df.describe()
    want = pdf.describe()
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_unstack(spark):
    pdf = pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "c": ["x", "y", "x", "y"],
        "v": [1.0, 2.0, 3.0, 4.0]})
    m = pas.DataFrame.from_pandas(pdf).set_index(["k", "c"])
    got = m.unstack().to_pandas().sort_index()
    want = pdf.set_index(["k", "c"])["v"].unstack().sort_index()
    want.columns.name = None
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False)
