"""Differential tests for the element-wise layer: the coercion matrix
and IEEE-754 semantics (SURVEY.md §2.8; reference coercion.py:45-116).

pandas is the oracle — the reference's own stated contract
("zero difference ... even when an exception is raised", reference
README.md)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_alchemy_spark as pas
from tests.conftest import assert_series_equal_sorted

EDGE = [0.0, -0.0, 1.5, -2.5, float("inf"), float("-inf"), None, 7.0]
DIVISORS = [0.0, 2.0, -3.0, float("inf"), float("-inf"), 1.5]


def _pd_edge():
    return pd.Series(EDGE, dtype="float64")


@pytest.fixture(scope="module")
def edge(spark):
    return pas.Series.from_list(EDGE, name="v")


def _cmp(ours: pd.Series, want: pd.Series):
    got = ours.reset_index(drop=True)
    want = want.reset_index(drop=True)
    # engine NULL materializes as NaN in float columns; pandas NaN-vs-NaN
    # equality is handled by assert_series_equal.
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_names=False)


@pytest.mark.parametrize("divisor", DIVISORS)
def test_truediv_scalar(edge, divisor):
    _cmp((edge / divisor).to_pandas().sort_index(), _pd_edge() / divisor)


@pytest.mark.parametrize("divisor", DIVISORS)
def test_floordiv_scalar(edge, divisor):
    _cmp((edge // divisor).to_pandas().sort_index(), _pd_edge() // divisor)


@pytest.mark.parametrize("divisor", DIVISORS)
def test_mod_scalar(edge, divisor):
    _cmp((edge % divisor).to_pandas().sort_index(), _pd_edge() % divisor)


@pytest.mark.parametrize("divisor", [2.0, -3.0, 0.5])
def test_rdiv_scalar(edge, divisor):
    _cmp((divisor / edge).to_pandas().sort_index(), divisor / _pd_edge())


def test_pow_scalar(edge):
    _cmp((edge ** 2).to_pandas().sort_index(), _pd_edge() ** 2)


def test_add_sub_mul(edge):
    _cmp((edge + 3).to_pandas().sort_index(), _pd_edge() + 3)
    _cmp((edge - 3).to_pandas().sort_index(), _pd_edge() - 3)
    _cmp((edge * -2).to_pandas().sort_index(), _pd_edge() * -2)
    _cmp((3 - edge).to_pandas().sort_index(), 3 - _pd_edge())


def test_series_series_elementwise(spark):
    a = pas.Series.from_list([1.0, 4.0, 0.0, None], name="a")
    b = pas.Series.from_list([0.0, 2.0, 0.0, 3.0], name="b")
    pa = pd.Series([1.0, 4.0, 0.0, None])
    pb = pd.Series([0.0, 2.0, 0.0, 3.0])
    _cmp((a / b).to_pandas().sort_index(), pa / pb)
    _cmp((a % b).to_pandas().sort_index(), pa % pb)
    _cmp((a * b).to_pandas().sort_index(), pa * pb)


def test_bool_coercion(spark):
    t = pas.Series.from_list([True, False, True], name="t")
    pt = pd.Series([True, False, True])
    _cmp((t + 1).to_pandas().sort_index(), pt + 1)
    _cmp((t * 2.5).to_pandas().sort_index(), pt * 2.5)
    # bool vs bool arithmetic: both coerce to int
    u = pas.Series.from_list([True, True, False], name="u")
    pu = pd.Series([True, True, False])
    _cmp((t + u).to_pandas().sort_index(), pt + pu)


def test_bool_numeric_comparison(spark):
    t = pas.Series.from_list([True, False], name="t")
    got = (t == 1).to_pandas().sort_index().reset_index(drop=True)
    want = (pd.Series([True, False]) == 1)
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)


def test_comparisons(edge):
    # NA comparison semantics are pandas-true: NA==x -> False,
    # NA!=x -> True, ordered -> False (never NULL).
    pe = _pd_edge()
    for op in ["eq", "ne", "le", "lt", "ge", "gt"]:
        got = getattr(edge, op)(1.5).to_pandas().sort_index().reset_index(drop=True)
        want = getattr(pe, op)(1.5)
        pd.testing.assert_series_equal(got, want, check_dtype=False,
                                       check_names=False)


def test_fill_value_pandas_true(spark):
    # one side missing -> filled; both missing -> stays missing
    a = pas.Series.from_pandas(pd.Series([1.0, None, None], index=pd.Index(["x", "y", "z"], name="k")))
    b = pas.Series.from_pandas(pd.Series([10.0, 20.0, None], index=pd.Index(["x", "y", "z"], name="k")))
    got = a.add(b, fill_value=100).to_pandas().sort_index()
    pa = pd.Series([1.0, None, None], index=["x", "y", "z"])
    pb = pd.Series([10.0, 20.0, None], index=["x", "y", "z"])
    want = pa.add(pb, fill_value=100)
    _cmp(got, want.sort_index())


def test_clip_round_abs(spark):
    s = pas.Series.from_list([-5.234, 2.789, 9.1, None], name="s")
    ps = pd.Series([-5.234, 2.789, 9.1, None])
    _cmp(s.clip(-2, 5).to_pandas().sort_index(), ps.clip(-2, 5))
    _cmp(s.round(1).to_pandas().sort_index(), ps.round(1))
    _cmp(s.abs().to_pandas().sort_index(), ps.abs())


def test_isna_notna(spark):
    s = pas.Series.from_list([1.0, None, 3.0], name="s")
    ps = pd.Series([1.0, None, 3.0])
    _cmp(s.isna().to_pandas().sort_index(), ps.isna())
    _cmp(s.notna().to_pandas().sort_index(), ps.notna())


def test_floordiv_int_like(spark):
    a = pas.Series.from_list([7, -7, 8, 0], name="a")
    pa = pd.Series([7, -7, 8, 0])
    _cmp((a // 3).to_pandas().sort_index(), (pa // 3).astype("float64"))
    _cmp((a % 3).to_pandas().sort_index(), (pa % 3).astype("float64"))
    _cmp((a % -3).to_pandas().sort_index(), (pa % -3).astype("float64"))


def test_floordiv_mod_pow_boundary_cases(spark):
    """Denormal/absorbing boundaries found by the deep hypothesis fuzz:
    NumPy floor_divide is remainder-based (not floor(a/b)); CPython mod
    is one conditional add; x**0 and 1**x absorb NA."""
    import numpy as np
    cases_fd = [(5e-324, -1e308), (-5e-324, 1.0), (7.0, 2.5),
                (-7.0, 2.5), (1e300, 1e-5), (-1e300, 1e-5)]
    a = pas.Series.from_list([c[0] for c in cases_fd])
    b = pas.Series.from_list([c[1] for c in cases_fd])
    got = (a // b).to_pandas().tolist()
    want = [np.floor_divide(x, y) for x, y in cases_fd]
    assert got == want, (got, want)
    got_mod = (a % b).to_pandas().tolist()
    want_mod = [np.mod(x, y) for x, y in cases_fd]
    assert got_mod == want_mod, (got_mod, want_mod)
    n = pas.Series.from_list([float("nan"), 1.0, float("nan")])
    e = pas.Series.from_list([0.0, float("nan"), 2.0])
    got_pow = (n ** e).to_pandas().tolist()
    assert got_pow[0] == 1.0 and got_pow[1] == 1.0
    assert got_pow[2] != got_pow[2]  # NaN**2 stays NaN
