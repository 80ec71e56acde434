"""Differential tests for Series.str / Series.dt vs real pandas
(the reference's own oracle model, SURVEY.md §5.2)."""

import pandas as pd
import pandas.testing as pdt
import pytest

import pandas_alchemy_spark as pas


@pytest.fixture(scope="module")
def str_pdf():
    return pd.DataFrame({
        "s": ["Hello World", "  spam  ", "", None, "Ab1 c2", "ZZ top",
              "a-b-c", "UPPER lower"],
        "k": list(range(8)),
    })


@pytest.fixture(scope="module")
def ts_pdf():
    return pd.DataFrame({
        "t": pd.to_datetime([
            "2024-01-01 00:30:00", "2024-02-29 13:45:10",
            "2024-07-04 23:59:59", None, "1999-12-31 06:00:00",
        ]),
        "k": list(range(5)),
    })


def _series_eq(ours, pds, check_dtype=False):
    got = ours.to_pandas().reset_index(drop=True)
    want = pds.reset_index(drop=True)
    want.name = got.name
    pdt.assert_series_equal(got, want, check_dtype=check_dtype)


STR_CASES = [
    ("lower", lambda s: s.str.lower()),
    ("upper", lambda s: s.str.upper()),
    ("title", lambda s: s.str.title()),
    ("len", lambda s: s.str.len()),
    ("strip", lambda s: s.str.strip()),
    ("lstrip", lambda s: s.str.lstrip()),
    ("rstrip", lambda s: s.str.rstrip()),
    ("contains_re", lambda s: s.str.contains(r"[A-Z]{2}")),
    ("contains_lit", lambda s: s.str.contains("lo", regex=False)),
    ("startswith", lambda s: s.str.startswith("He")),
    ("endswith", lambda s: s.str.endswith("c2")),
    ("replace_lit", lambda s: s.str.replace("-", "_")),
    ("replace_re", lambda s: s.str.replace(r"[0-9]", "#", regex=True)),
    ("slice", lambda s: s.str.slice(1, 4)),
    ("slice_open", lambda s: s.str.slice(2)),
    ("get", lambda s: s.str.get(1)),
    ("zfill", lambda s: s.str.zfill(6)),
    ("pad_r", lambda s: s.str.pad(10, side="right", fillchar=".")),
]


@pytest.mark.parametrize("name,fn", STR_CASES, ids=[c[0] for c in STR_CASES])
def test_str_differential(spark, str_pdf, name, fn):
    df = pas.DataFrame.from_pandas(str_pdf)
    _series_eq(fn(df.s), fn(str_pdf.s))


DT_CASES = [
    ("year", lambda s: s.dt.year),
    ("month", lambda s: s.dt.month),
    ("day", lambda s: s.dt.day),
    ("hour", lambda s: s.dt.hour),
    ("minute", lambda s: s.dt.minute),
    ("second", lambda s: s.dt.second),
    ("dayofweek", lambda s: s.dt.dayofweek),
    ("dayofyear", lambda s: s.dt.dayofyear),
    ("quarter", lambda s: s.dt.quarter),
    ("floor_D", lambda s: s.dt.floor("D")),
    ("strftime", lambda s: s.dt.strftime("%Y-%m-%d %H:%M")),
]


@pytest.mark.parametrize("name,fn", DT_CASES, ids=[c[0] for c in DT_CASES])
def test_dt_differential(spark, ts_pdf, name, fn):
    df = pas.DataFrame.from_pandas(ts_pdf)
    got = fn(df.t).to_pandas().reset_index(drop=True)
    want = fn(ts_pdf.t).reset_index(drop=True)
    want.name = got.name
    if name == "floor_D":
        got = pd.to_datetime(got)
    pdt.assert_series_equal(got, want, check_dtype=False)


def test_str_filter_lineage(spark, str_pdf):
    """mask from .str stays in-plan (no join) and matches pandas."""
    df = pas.DataFrame.from_pandas(str_pdf)
    ours = df[df.s.str.contains("o", regex=False)][["k"]].to_pandas()
    want = str_pdf[str_pdf.s.str.contains("o", regex=False).fillna(False)][["k"]]
    assert sorted(ours.k.tolist()) == sorted(want.k.tolist())


def test_str_extract_count_find_repeat_capitalize(spark):
    pdf = pd.DataFrame({"s": ["foo123bar", "no digits", "a1b2c3", "XYZ"]})
    df = pas.DataFrame.from_pandas(pdf)
    got = df.s.str.extract(r"([0-9]+)").to_pandas().reset_index(drop=True)
    want = pdf["s"].str.extract(r"([0-9]+)", expand=False).reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_names=False)
    got = df.s.str.count(r"[0-9]").to_pandas().reset_index(drop=True)
    want = pdf["s"].str.count(r"[0-9]").reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)
    got = df.s.str.find("b").to_pandas().reset_index(drop=True)
    want = pdf["s"].str.find("b").reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)
    got = df.s.str.repeat(2).to_pandas().reset_index(drop=True)
    want = pdf["s"].str.repeat(2).reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_names=False)
    got = df.s.str.capitalize().to_pandas().reset_index(drop=True)
    want = pdf["s"].str.capitalize().reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_dt_calendar_extras(spark):
    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-02-29 12:30:00",
                         "2023-12-31 23:59:59", "2024-06-15 08:00:00"])
    pdf = pd.DataFrame({"t": ts})
    df = pas.DataFrame.from_pandas(pdf)
    for attr in ["days_in_month", "is_month_start", "is_month_end"]:
        got = getattr(df.t.dt, attr).to_pandas().reset_index(drop=True)
        want = getattr(pdf["t"].dt, attr).reset_index(drop=True)
        pd.testing.assert_series_equal(got, want, check_dtype=False,
                                       check_names=False)
    got = df.t.dt.month_name().to_pandas().reset_index(drop=True)
    want = pdf["t"].dt.month_name().reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_names=False)
    got = df.t.dt.day_name().to_pandas().reset_index(drop=True)
    want = pdf["t"].dt.day_name().reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_names=False)
