"""Differential tests for the dt timezone subset (round 6):
tz_localize / tz_convert / dt.tz vs pandas.  The engine stores
WALL-CLOCK values plus a tz tag, so comparisons strip pandas' tz with
tz_localize(None) — wall equality IS the contract."""
from __future__ import annotations

import pandas as pd
import pandas.testing as pdt
import pytest

import pandas_alchemy_spark as pas


@pytest.fixture(scope="module")
def stamps():
    # spans a US DST spring-forward (2024-03-10) and fall-back
    # (2024-11-03) so offset changes actually engage
    return pd.Series(pd.to_datetime([
        "2024-03-09 23:30:00", "2024-03-10 12:00:00",
        "2024-06-15 08:45:10", "2024-11-02 23:59:59",
        "2024-11-03 12:00:00", "2024-12-31 00:00:00"]))


def _wall(aware: pd.Series) -> pd.Series:
    return aware.dt.tz_localize(None)


def _eq(ours, want):
    got = ours.to_pandas().sort_index()
    got.name = want.name
    pdt.assert_series_equal(got, want, check_dtype=False,
                            check_index_type=False)


def test_tz_localize_keeps_wall(spark, stamps):
    s = pas.Series.from_pandas(stamps)
    loc = s.dt.tz_localize("America/New_York")
    assert loc.dt.tz == "America/New_York"
    _eq(loc, _wall(stamps.dt.tz_localize("America/New_York")))


@pytest.mark.parametrize("tz", ["UTC", "+05:30", "America/New_York",
                                "Asia/Tokyo"])
def test_tz_convert_matches_pandas(spark, stamps, tz):
    s = pas.Series.from_pandas(stamps)
    got = s.dt.tz_localize("UTC").dt.tz_convert(tz)
    want = stamps.dt.tz_localize("UTC").dt.tz_convert(tz)
    assert got.dt.tz == tz
    _eq(got, _wall(want))


def test_tz_convert_across_dst(spark, stamps):
    s = pas.Series.from_pandas(stamps)
    got = (s.dt.tz_localize("America/New_York")
           .dt.tz_convert("Europe/Berlin"))
    want = (stamps.dt.tz_localize("America/New_York")
            .dt.tz_convert("Europe/Berlin"))
    _eq(got, _wall(want))


def test_tz_convert_none_renders_utc(spark, stamps):
    s = pas.Series.from_pandas(stamps)
    got = s.dt.tz_localize("+05:30").dt.tz_convert(None)
    want = stamps.dt.tz_localize("+05:30").dt.tz_convert(None)
    assert got.dt.tz is None
    _eq(got, want)


def test_tz_localize_none_drops_tag(spark, stamps):
    s = pas.Series.from_pandas(stamps)
    aware = s.dt.tz_localize("Asia/Tokyo")
    naive = aware.dt.tz_localize(None)
    assert naive.dt.tz is None
    _eq(naive, stamps)


def test_tz_components_are_wall(spark, stamps):
    """dt.hour of an aware series = local wall hour (pandas parity),
    for free from the wall representation."""
    s = pas.Series.from_pandas(stamps)
    got = (s.dt.tz_localize("UTC").dt.tz_convert("Asia/Tokyo")
           .dt.hour)
    want = (stamps.dt.tz_localize("UTC").dt.tz_convert("Asia/Tokyo")
            .dt.hour)
    _eq(got, want)


def test_tz_error_contracts(spark, stamps):
    s = pas.Series.from_pandas(stamps)
    with pytest.raises(TypeError, match="tz-naive"):
        s.dt.tz_convert("UTC")
    with pytest.raises(TypeError, match="Already tz-naive"):
        s.dt.tz_localize(None)
    aware = s.dt.tz_localize("UTC")
    with pytest.raises(TypeError, match="Already tz-aware"):
        aware.dt.tz_localize("Asia/Tokyo")
    with pytest.raises(ValueError, match="unknown timezone"):
        s.dt.tz_localize("Mars/Olympus")


def test_tz_tag_drops_on_rewrite(spark, stamps):
    """Any verb that replaces the plan drops the tag (the documented
    subset contract, same as Series.cat)."""
    s = pas.Series.from_pandas(stamps)
    aware = s.dt.tz_localize("UTC")
    shifted = aware + pd.Timedelta(0)  # arithmetic rewrites the plan
    assert shifted.dt.tz is None
