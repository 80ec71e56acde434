"""Differential tests: .loc / .iloc vs pandas."""

import pandas as pd
import pandas.testing as pdt
import pytest

import pandas_alchemy_spark as pas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "a": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        "b": ["p", "q", "r", "s", "t", "u"],
    })


def _frames_eq(ours, want):
    got = ours.to_pandas()
    pdt.assert_frame_equal(got, want, check_dtype=False,
                           check_index_type=False)


def test_iloc_slices(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    _frames_eq(df.iloc[1:4], pdf.iloc[1:4])
    _frames_eq(df.iloc[:3], pdf.iloc[:3])
    _frames_eq(df.iloc[4:], pdf.iloc[4:])
    _frames_eq(df.iloc[-2:], pdf.iloc[-2:])
    _frames_eq(df.iloc[:-4], pdf.iloc[:-4])


def test_iloc_row_and_cols(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    _frames_eq(df.iloc[1:3, [0]], pdf.iloc[1:3, [0]])
    got = df.iloc[2:5, 1].to_pandas()
    want = pdf.iloc[2:5, 1]
    pdt.assert_series_equal(got, want, check_dtype=False,
                            check_index_type=False)
    assert df.iloc[2, 1] == pdf.iloc[2, 1]


def test_loc_mask_and_cols(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    _frames_eq(df.loc[df.a > 25], pdf.loc[pdf.a > 25])
    _frames_eq(df.loc[df.a > 25, ["b"]], pdf.loc[pdf.a > 25, ["b"]])


def test_loc_labels(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    k = pdf.assign(k=["x", "y", "x", "z", "y", "x"]).set_index("k")
    dk = pas.DataFrame.from_pandas(k)
    got = dk.loc[["x", "z"]].to_pandas().sort_values("a")
    want = k.loc[["x", "z"]].sort_values("a")
    # label-loc returns rows in index-group order in pandas; compare
    # content (row order differs by design)
    pdt.assert_frame_equal(got.reset_index().sort_values("a").reset_index(drop=True),
                           want.reset_index().sort_values("a").reset_index(drop=True),
                           check_dtype=False)


def test_loc_all_rows(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    _frames_eq(df.loc[:], pdf.loc[:])
