"""Series.cat accessor + JSON bridge functions vs pandas.

The categorical tag is plan-pinned (accessors.tag_categorical): any
verb that rewrites the plan drops categorical-ness, so these tests
also pin that invalidation contract.
"""

from __future__ import annotations

import pandas as pd
import pytest

import pandas_alchemy_spark as pas

from tests.conftest import assert_series_equal_sorted

VALS = ["b", "a", "c", "a", None, "b", "a"]


def _ours(spark):
    return pas.Series.from_list(VALS, name="s")


def _theirs():
    return pd.Series(VALS, name="s")


def test_astype_category_codes(spark):
    ours = _ours(spark).astype("category")
    theirs = _theirs().astype("category")
    assert list(ours.cat.categories) == list(theirs.cat.categories)
    assert ours.cat.ordered == theirs.cat.ordered
    assert_series_equal_sorted(ours.cat.codes.to_pandas(),
                               theirs.cat.codes, check_names=False)


def test_explicit_dtype_nulls_unknown_zero_jobs(spark):
    dt = pd.CategoricalDtype(["a", "b"], ordered=True)
    ours = _ours(spark).astype(dt)
    theirs = _theirs().astype(dt)
    assert list(ours.cat.categories) == ["a", "b"]
    assert ours.cat.ordered is True
    # 'c' is out of domain -> code -1 / NaN value, like pandas
    assert_series_equal_sorted(ours.cat.codes.to_pandas(),
                               theirs.cat.codes, check_names=False)
    assert_series_equal_sorted(ours.to_pandas(), theirs.astype(object))


def test_rename_categories_dict_and_list(spark):
    ours = _ours(spark).astype("category")
    theirs = _theirs().astype("category")
    for arg in ({"a": "x"}, ["u", "v", "w"]):
        o = ours.cat.rename_categories(arg)
        t = theirs.cat.rename_categories(arg)
        assert list(o.cat.categories) == list(t.cat.categories)
        assert_series_equal_sorted(o.to_pandas(), t.astype(object))


def test_add_remove_categories(spark):
    ours = _ours(spark).astype("category")
    theirs = _theirs().astype("category")
    o = ours.cat.add_categories(["z"])
    t = theirs.cat.add_categories(["z"])
    assert list(o.cat.categories) == list(t.cat.categories)
    assert_series_equal_sorted(o.cat.codes.to_pandas(), t.cat.codes,
                               check_names=False)
    o2 = o.cat.remove_categories(["a"])
    t2 = t.cat.remove_categories(["a"])
    assert list(o2.cat.categories) == list(t2.cat.categories)
    assert_series_equal_sorted(o2.cat.codes.to_pandas(), t2.cat.codes,
                               check_names=False)
    o3 = o2.cat.remove_unused_categories()
    t3 = t2.cat.remove_unused_categories()
    assert list(o3.cat.categories) == list(t3.cat.categories)


def test_set_reorder_ordered(spark):
    ours = _ours(spark).astype("category")
    theirs = _theirs().astype("category")
    o = ours.cat.set_categories(["c", "b"])
    t = theirs.cat.set_categories(["c", "b"])
    assert list(o.cat.categories) == ["c", "b"]
    assert_series_equal_sorted(o.cat.codes.to_pandas(), t.cat.codes,
                               check_names=False)
    o2 = ours.cat.reorder_categories(["c", "a", "b"], ordered=True)
    t2 = theirs.cat.reorder_categories(["c", "a", "b"], ordered=True)
    assert list(o2.cat.categories) == ["c", "a", "b"]
    assert o2.cat.ordered is True
    assert_series_equal_sorted(o2.cat.codes.to_pandas(), t2.cat.codes,
                               check_names=False)
    assert o2.cat.as_unordered().cat.ordered is False


def test_cat_error_contracts(spark):
    s = _ours(spark)
    with pytest.raises(AttributeError, match="Can only use .cat accessor"):
        s.cat
    c = s.astype("category")
    # a plan rewrite invalidates the tag
    with pytest.raises(AttributeError, match="Can only use .cat accessor"):
        c.str.upper().cat
    with pytest.raises(ValueError, match="must not include old"):
        c.cat.add_categories(["a"])
    with pytest.raises(ValueError, match="must all be in old"):
        c.cat.remove_categories(["zz"])
    with pytest.raises(ValueError, match="not the same as in old"):
        c.cat.reorder_categories(["a", "b"])
    with pytest.raises(ValueError, match="same number of items"):
        c.cat.rename_categories(["only-one"])
    with pytest.raises(ValueError, match="must be unique"):
        c.cat.rename_categories({"a": "b"})


def test_codes_broadcast_join_path(spark):
    # force the wide-domain path by dropping the literal-map threshold
    from pandas_alchemy_spark.accessors import CategoricalMethods
    ours = _ours(spark).astype("category")
    old = CategoricalMethods._MAP_MAX
    CategoricalMethods._MAP_MAX = 0
    try:
        got = ours.cat.codes.to_pandas()
    finally:
        CategoricalMethods._MAP_MAX = old
    assert_series_equal_sorted(got, _theirs().astype("category").cat.codes,
                               check_names=False)


JROWS = ['{"a": 1, "b": {"c": "x"}}', '{"a": 2, "b": {"c": "y"}}',
         'not json', None]


def test_json_extract_and_from_json(spark):
    s = pas.Series.from_list(JROWS, name="j")
    got = pas.json_extract(s, "$.b.c").to_pandas()
    want = pd.Series(["x", "y", None, None], name="j",
                     index=pd.RangeIndex(4))
    assert_series_equal_sorted(got, want)
    parsed = pas.from_json(s, "a INT, b STRUCT<c: STRING>")
    a = parsed._app(lambda c: c.getField("a")).to_pandas()
    assert_series_equal_sorted(
        a, pd.Series([1, 2, None, None], name="j"), check_names=False)


def test_to_json_roundtrip(spark):
    s = pas.Series.from_list(JROWS[:2], name="j")
    back = pas.to_json(pas.from_json(s, "a INT, b STRUCT<c: STRING>"))
    got = back.to_pandas()
    assert got.iloc[0] == '{"a":1,"b":{"c":"x"}}'
    assert got.iloc[1] == '{"a":2,"b":{"c":"y"}}'
