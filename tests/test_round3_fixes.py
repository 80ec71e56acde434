"""Round-3 regression tests for the ADVICE findings.

Covers: cross-scan provisional-mid alignment (join / assign / mask /
concat axis=1), mid-flag propagation through DataFrame.join, and
pandas-true part-major ordering of concat(axis=0).
"""
from __future__ import annotations

import pandas as pd
import pytest

import pandas_alchemy_spark as pas

from conftest import assert_frame_equal_sorted


def _write_multifile(tmp_path, name, pdf, cuts):
    """Write pdf into several parquet part files (multi-file scan ->
    monotonic, NON-dense provisional mid).  ``cuts`` are row-count
    splits; uneven splits give the two scans different partition
    layouts so raw monotonic ids disagree between them."""
    d = tmp_path / name
    d.mkdir()
    start = 0
    for i, n in enumerate(cuts):
        pdf.iloc[start:start + n].to_parquet(
            d / f"part-{i:02d}.parquet", index=False)
        start += n
    assert start == len(pdf)
    return str(d)


@pytest.fixture()
def two_scans(spark, tmp_path):
    n = 90
    pa_ = pd.DataFrame({"x": [float(i) for i in range(n)]})
    pb = pd.DataFrame({"y": [i * 10.0 for i in range(n)]})
    path_a = _write_multifile(tmp_path, "a", pa_, [40, 35, 15])
    path_b = _write_multifile(tmp_path, "b", pb, [10, 65, 15])
    a = pas.read_parquet(path_a)
    b = pas.read_parquet(path_b)
    assert a._mid_index and not a._mid_dense
    assert b._mid_index and not b._mid_dense
    return a, b


def test_join_cross_scan_multifile(two_scans):
    # ADVICE high: join of two default-index multi-file scans must pair
    # row i of A (in A's export order) with row i of B, and must NOT
    # leak raw monotonically_increasing_id values as index labels.
    a, b = two_scans
    got = a.join(b).to_pandas()
    want = a.to_pandas().join(b.to_pandas())
    assert sorted(got.index) == list(range(90))  # no raw-mid labels
    assert_frame_equal_sorted(got, want)


def test_join_same_scan_propagates_mid_flags(spark, tmp_path):
    # same-origin mids join directly, and the output must keep the mid
    # flags so export ranks the mids instead of leaking raw ids
    pdf = pd.DataFrame({"x": [float(i) for i in range(50)],
                        "y": [i * 2.0 for i in range(50)]})
    path = _write_multifile(tmp_path, "same", pdf, [20, 30])
    df = pas.read_parquet(path)
    j = df[["x"]].join(df[["y"]])
    assert j._mid_index and not j._mid_dense
    got = j.to_pandas()
    assert sorted(got.index) == list(range(50))
    assert_frame_equal_sorted(got, df.to_pandas())


def test_mids_aligned_fast_paths(two_scans, tmp_path):
    a, b = two_scans
    # same-object-derived frames share the origin token -> no densify
    s = a.x
    t1, t2 = a._mids_aligned(s)
    assert t1 is a and t2 is s
    # a re-read of the SAME path has the same file set -> comparable
    a2 = pas.read_parquet(str(tmp_path / "a"))
    u1, u2 = a._mids_aligned(a2)
    assert u1 is a and u2 is a2
    # different scans are NOT comparable -> both densified
    v1, v2 = a._mids_aligned(b)
    assert not v1._mid_index and not v2._mid_index


def test_assign_aligned_cross_scan(two_scans):
    # ADVICE medium: assigning a Series from another multi-file scan
    # must align by POSITION (densified), not raw monotonic ids
    a, b = two_scans
    out = a.assign(y=b.y).to_pandas()
    want = a.to_pandas().assign(y=b.to_pandas().y)
    assert_frame_equal_sorted(out, want)


def test_filter_mask_cross_scan(two_scans):
    a, b = two_scans
    got = a[b.y >= 300.0].to_pandas()
    want = a.to_pandas()[b.to_pandas().y >= 300.0]
    assert_frame_equal_sorted(got, want)


def test_arith_cross_scan(two_scans):
    a, b = two_scans
    got = (a.x + b.y).to_pandas()
    want = a.to_pandas().x + b.to_pandas().y
    got.name = None
    want.name = None
    pd.testing.assert_series_equal(got.sort_index(), want.sort_index(),
                                   check_dtype=False)


def test_concat_axis1_cross_scan(two_scans):
    a, b = two_scans
    got = pas.concat([a, b], axis=1).to_pandas()
    want = pd.concat([a.to_pandas(), b.to_pandas()], axis=1)
    assert sorted(got.index) == list(range(90))
    assert_frame_equal_sorted(got, want)


def test_concat_rows_part_major_order(spark, tmp_path):
    # ADVICE medium: concat(axis=0) of dense frames must come back in
    # part-major order with each part's own labels (0..n-1, 0..m-1),
    # not interleaved by a positional re-sort
    pa_ = pd.DataFrame({"x": [0.0, 1.0, 2.0]})
    pb = pd.DataFrame({"x": [10.0, 11.0]})
    (tmp_path / "single_a").mkdir()
    (tmp_path / "single_b").mkdir()
    pa_.to_parquet(tmp_path / "single_a" / "f.parquet", index=False)
    pb.to_parquet(tmp_path / "single_b" / "f.parquet", index=False)
    a = pas.read_parquet(str(tmp_path / "single_a"))
    b = pas.read_parquet(str(tmp_path / "single_b"))
    assert a._mid_dense and b._mid_dense
    cat = pas.concat([a, b])
    got = cat.to_pandas()
    want = pd.concat([pa_, pb])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # duplicate positions must not hit the dense tail() fast path
    tail = cat.tail(3).to_pandas()
    pd.testing.assert_frame_equal(tail, want.tail(3), check_dtype=False)
    head = cat.head(4).to_pandas()
    pd.testing.assert_frame_equal(head, want.head(4), check_dtype=False)


def test_concat_rows_ignore_index_unchanged(spark, tmp_path):
    pa_ = pd.DataFrame({"x": [0.0, 1.0, 2.0]})
    pb = pd.DataFrame({"x": [10.0, 11.0]})
    a = pas.DataFrame.from_pandas(pa_)
    b = pas.DataFrame.from_pandas(pb)
    got = pas.concat([a, b], ignore_index=True).to_pandas()
    want = pd.concat([pa_, pb], ignore_index=True)
    assert_frame_equal_sorted(got, want)


def test_unicode_str_predicates(spark):
    pdf = pd.DataFrame({"s": ["été", "Ωμέγα", "１２３", "a1é", "  ",
                              "abc", "123", "", None]})
    df = pas.DataFrame.from_pandas(pdf)
    for meth in ("isalpha", "isdigit", "isalnum", "isspace"):
        got = getattr(df.s.str, meth)().to_pandas().sort_index()
        want = getattr(pdf.s.str, meth)()
        pd.testing.assert_series_equal(got, want, check_dtype=False,
                                       check_names=False)


def test_crosstab_index_values(spark):
    pdf = pd.DataFrame({"a": ["x", "x", "y", "z", "z", "z"],
                        "b": ["p", "q", "p", "p", "q", "q"]})
    df = pas.DataFrame.from_pandas(pdf)
    got = pas.crosstab(df.a, df.b, index_values=["x", "z"]).to_pandas()
    want = pd.crosstab(pdf.a, pdf.b)
    want = want.loc[["x", "z"]]
    got = got.sort_index()[sorted(got.columns)]
    want = want.sort_index()[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_names=False,
                                  check_index_type=False)


def test_embedding_near_dup_cache_bounded(spark):
    """Round-5 revision: a finalizer on the returned handle released
    the cache the moment callers chained off it (before any action!),
    so the release is now a BOUNDED ring — repeated calls must not
    grow the cache manager beyond the ring size."""
    from pandas_alchemy_spark.ext import similarity as S

    def n_cached():
        jsc = pas.get_session().sparkContext._jsc.sc()
        return jsc.getPersistentRDDs().size()

    emb = pas.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    sdf = emb.to_spark(index=False)
    dim = len(sdf.select("embedding").head()[0])
    before = n_cached()  # other tests may hold session-scoped caches
    for _ in range(S._CACHE_RING_MAX + 2):
        out = S.embedding_near_dup_pairs(sdf, id_col="vec_id",
                                         vec_col="embedding", dim=dim)
        assert out.count() >= 0
    assert n_cached() - before <= S._CACHE_RING_MAX
    # chained-derivation usage keeps the cache alive for the action
    out = S.embedding_near_dup_pairs(sdf, id_col="vec_id",
                                     vec_col="embedding", dim=dim)
    derived = out.filter("cosine > -2")
    assert derived.count() >= 0


def test_unique_bounded_raise(spark):
    s = pas.Series.from_list(list(range(50)), name="v")
    assert sorted(s.unique()) == list(range(50))
    with pytest.raises(ValueError, match="distinct"):
        s.unique(max_values=10)


def test_sample_fast_hash(spark):
    o = pas.read_parquet("/root/testdata/sf0.001/orders.parquet")
    a = o.sample(0.1, key="o_orderkey", fast_hash=True)
    b = o.sample(0.1, key="o_orderkey", fast_hash=True)
    na = a.to_spark(index=False).count()
    nb = b.to_spark(index=False).count()
    assert na == nb  # deterministic across runs
    total = o.to_spark(index=False).count()
    assert 0.05 * total < na < 0.15 * total  # ~frac rate


def test_mode_no_global_window(spark):
    pdf = pd.DataFrame({"v": [1, 2, 2, 3, 3, None]})
    s = pas.DataFrame.from_pandas(pdf).v
    got = s.mode()
    want = pdf.v.mode()
    assert sorted(got.tolist()) == sorted(want.tolist())
