"""Differential tests: logical ops, isin, between, concat vs pandas."""

import numpy as np
import pandas as pd
import pytest

import pandas_alchemy_spark as pas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "a": [1.0, 2.0, None, 4.0, 5.0],
        "b": [10, 20, 30, 40, 50],
        "s": ["x", "y", "z", "x", None],
    })


def _mask_rows(our_df, our_mask, pdf, pd_mask):
    got = sorted(our_df[our_mask][["b"]].to_pandas().b.tolist())
    want = sorted(pdf[pd_mask][["b"]].b.tolist())
    assert got == want


def test_and_or_invert(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    _mask_rows(df, (df.a > 1) & (df.b < 50), pdf,
               (pdf.a > 1) & (pdf.b < 50))
    _mask_rows(df, (df.a > 3) | (df.b <= 20), pdf,
               (pdf.a > 3) | (pdf.b <= 20))
    _mask_rows(df, ~(df.b > 20), pdf, ~(pdf.b > 20))
    _mask_rows(df, (df.a > 1) ^ (df.b >= 40), pdf,
               (pdf.a > 1) ^ (pdf.b >= 40))


def test_isin(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    _mask_rows(df, df.s.isin(["x", "z"]), pdf, pdf.s.isin(["x", "z"]))
    _mask_rows(df, df.b.isin([10, 40, 99]), pdf, pdf.b.isin([10, 40, 99]))
    # NULL -> False, matching pandas
    got = df.s.isin(["x"]).to_pandas().tolist()
    assert got == pdf.s.isin(["x"]).tolist()


def test_between(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    for inc in ["both", "neither", "left", "right"]:
        _mask_rows(df, df.b.between(20, 40, inclusive=inc), pdf,
                   pdf.b.between(20, 40, inclusive=inc))


def test_concat_same_columns(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    both = pas.concat([df, df])
    want = pd.concat([pdf, pdf])
    got = both.to_pandas()
    assert len(got) == len(want)
    assert sorted(got.b.tolist()) == sorted(want.b.tolist())
    assert list(got.columns) == list(want.columns)


def test_concat_label_alignment(spark):
    p1 = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    p2 = pd.DataFrame({"b": [5.0, 6.0], "c": [7.0, 8.0]})
    d1, d2 = pas.DataFrame.from_pandas(p1), pas.DataFrame.from_pandas(p2)
    got = pas.concat([d1, d2], ignore_index=True).to_pandas()
    want = pd.concat([p1, p2], ignore_index=True, sort=False)
    pd.testing.assert_frame_equal(
        got.sort_values("b").reset_index(drop=True),
        want.sort_values("b").reset_index(drop=True),
        check_dtype=False)


def test_concat_ignore_index_order(spark, pdf):
    df = pas.DataFrame.from_pandas(pdf)
    got = pas.concat([df, df], ignore_index=True).to_pandas()
    assert got.index.tolist() == list(range(2 * len(pdf)))


def test_concat_axis1(spark):
    a = pd.DataFrame({"x": [1, 2, 3]}, index=[0, 1, 2])
    b = pd.DataFrame({"y": [10.0, 30.0]}, index=[0, 2])
    got = (pas.concat([pas.DataFrame.from_pandas(a),
                       pas.DataFrame.from_pandas(b)], axis=1)
           .to_pandas().sort_index())
    want = pd.concat([a, b], axis=1).sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_index_type=False)


def test_dropna_how_thresh(spark):
    pdf = pd.DataFrame({"a": [1.0, None, None], "b": [None, None, 3.0],
                        "c": [1.0, 2.0, None]})
    df = pas.DataFrame.from_pandas(pdf)
    for kw in [dict(how="any"), dict(how="all"), dict(thresh=2)]:
        got = (df.dropna(**kw).to_pandas().reset_index(drop=True))
        want = pdf.dropna(**kw).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fillna_dict(spark):
    pdf = pd.DataFrame({"a": [1.0, None], "b": [None, 2.0]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.fillna({"a": 0.0}).to_pandas().reset_index(drop=True)
    want = pdf.fillna({"a": 0.0}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
