"""Corpus profiling operators (ext/profile.py, round 10)."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pandas_alchemy_spark.ext import profile as P

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_profile_exact_matches_duckdb(spark, docs):
    """mode='exact' is the oracle path: every column reproduces in
    DuckDB (same tokenizer, quantile_cont == percentile)."""
    got = {r["grp"]: r.asDict() for r in
           P.corpus_profile(docs, mode="exact").collect()}
    toks = ("list_filter(string_split_regex(lower(regexp_replace(text, "
            "'[^a-zA-Z0-9]+', ' ', 'g')), ' '), t -> t != '')")
    nt = f"case when text is null then 0 else len({toks}) end"
    want = duckdb.sql(f"""
        select coalesce(lang, '<null>') grp, count(*) n_docs,
               sum({nt}) total_tokens, avg({nt}) avg_tokens,
               min({nt}) min_tokens, max({nt}) max_tokens,
               quantile_cont({nt}, 0.5) p50,
               quantile_cont({nt}, 0.9) p90,
               quantile_cont({nt}, 0.99) p99,
               avg(coalesce(length(text), 0)) avg_chars,
               count(distinct coalesce(text, '')) distinct_texts
        from '{SF_DIR}/documents.parquet' group by 1
    """).fetchall()
    assert len(want) == len(got)
    for (grp, n, tt, at, mn, mx, p50, p90, p99, ac, dt) in want:
        g = got[grp]
        assert g["n_docs"] == n
        assert g["total_tokens"] == tt
        assert g["avg_tokens"] == pytest.approx(at)
        assert (g["min_tokens"], g["max_tokens"]) == (mn, mx)
        assert g["p50_tokens"] == pytest.approx(p50)
        assert g["p90_tokens"] == pytest.approx(p90)
        assert g["p99_tokens"] == pytest.approx(p99)
        assert g["avg_chars"] == pytest.approx(ac)
        assert g["distinct_texts"] == dt
        assert g["dup_ratio"] == pytest.approx(1.0 - dt / n)


def test_profile_sketch_within_bounds(spark, docs):
    """Sketch mode agrees with exact mode to the sketches' contracts:
    HLL++ distinct within 3*rsd, KLL quantiles within one rank step
    (here: between the exact neighboring order statistics)."""
    ex = {r["grp"]: r for r in
          P.corpus_profile(docs, mode="exact").collect()}
    sk = {r["grp"]: r for r in
          P.corpus_profile(docs, mode="sketch", rsd=0.02).collect()}
    assert set(ex) == set(sk)
    for grp, e in ex.items():
        s = sk[grp]
        # exact scalar aggregates are identical in both modes
        for c in ("n_docs", "total_tokens", "avg_tokens",
                  "min_tokens", "max_tokens", "avg_chars"):
            assert s[c] == e[c], (grp, c)
        assert abs(s["distinct_texts"] - e["distinct_texts"]) \
            <= max(3, 3 * 0.02 * e["distinct_texts"])
        # approx_percentile returns a REAL order statistic near the
        # target rank; exact interpolates between them
        for c in ("p50_tokens", "p90_tokens", "p99_tokens"):
            assert e["min_tokens"] <= s[c] <= e["max_tokens"]
            assert abs(s[c] - e[c]) <= 0.15 * max(e[c], 1.0)


def test_profile_group_none_and_nulls(spark):
    """group_col=None profiles the whole corpus as one '<all>' row;
    NULL text counts as a 0-token doc; NULL group -> '<null>'."""
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, None, "en"), (3, "a b c", None)],
        "id long, text string, lang string")
    allrow = P.corpus_profile(df, group_col=None).collect()
    assert len(allrow) == 1 and allrow[0]["grp"] == "<all>"
    assert allrow[0]["n_docs"] == 3
    assert allrow[0]["total_tokens"] == 6
    assert allrow[0]["min_tokens"] == 0
    # the two 'a b c' docs collapse; NULL text is its own ('') value
    assert allrow[0]["distinct_texts"] == 2
    by = {r["grp"]: r for r in P.corpus_profile(df).collect()}
    assert set(by) == {"en", "<null>"}
    assert by["en"]["min_tokens"] == 0  # the NULL-text doc
    assert by["<null>"]["n_docs"] == 1


def test_profile_sketch_plan_single_shuffle(spark, docs):
    """The 100-TB contract: sketch mode is ONE partial/final aggregate
    pair — a single Exchange, no Expand.  Exact mode's count(distinct)
    plans an Expand (documented cost of the oracle path)."""
    sk = P.corpus_profile(docs, mode="sketch")
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Expand" not in plan, plan
    ex = P.corpus_profile(docs, mode="exact")
    eplan = ex._jdf.queryExecution().optimizedPlan().toString()
    assert "Expand" in eplan or "distinct" in eplan.lower()


def test_profile_tokenizer_evaluated_once_per_row(spark, docs):
    """The regex tokenizer appears exactly once in the optimized plan
    (the __pas_toks family rule: aggregates consume the projected
    scalar, never re-tokenize)."""
    for mode in ("exact", "sketch"):
        plan = (P.corpus_profile(docs, mode=mode)
                ._jdf.queryExecution().optimizedPlan().toString())
        assert plan.count("regexp_replace") == 1, (mode, plan)


def test_profile_sketches_merge_equals_whole(spark, docs):
    """Shard-and-merge == whole-corpus: sums/extrema trivially, the
    HLL union exactly (union of sketches == sketch of union), the
    histogram bucket-wise.  finalize_profile renders both to
    IDENTICAL reports."""
    whole = P.finalize_profile(P.profile_sketches(docs))
    parts = [P.profile_sketches(docs.filter(f"doc_id % 3 = {i}"))
             for i in range(3)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    merged = P.finalize_profile(P.merge_profile_sketches(u))
    a = sorted([r.asDict() for r in whole.collect()],
               key=lambda r: r["grp"])
    b = sorted([r.asDict() for r in merged.collect()],
               key=lambda r: r["grp"])
    assert a == b


def test_profile_finalize_quantiles_within_bucket_bound(spark, docs):
    """Histogram quantiles reproduce the exact percentile within the
    documented relative value bound (half a bucket width each side
    plus one-bucket edge slack)."""
    bound = P.histogram_quantile_error_bound()
    ex = {r["grp"]: r for r in
          P.corpus_profile(docs, mode="exact").collect()}
    fin = {r["grp"]: r for r in
           P.finalize_profile(P.profile_sketches(docs)).collect()}
    for grp, e in ex.items():
        f = fin[grp]
        assert f["n_docs"] == e["n_docs"]
        assert f["total_tokens"] == e["total_tokens"]
        assert f["min_tokens"] == e["min_tokens"]
        assert f["max_tokens"] == e["max_tokens"]
        assert f["distinct_texts"] == pytest.approx(
            e["distinct_texts"], rel=0.06)
        for c in ("p50_tokens", "p90_tokens", "p99_tokens"):
            assert f[c] == pytest.approx(e[c], rel=bound), (grp, c)


def test_profile_sketch_state_parquet_roundtrip(spark, docs, tmp_path):
    """The shard state is a plain parquet row (HLL binary + map
    column): write, read back, merge with a second shard, finalize —
    the incremental-profiling contract (profile each ingest wave,
    never re-read the corpus)."""
    p1 = str(tmp_path / "shard1")
    P.profile_sketches(docs.filter("doc_id % 2 = 0")).write.parquet(p1)
    s1 = spark.read.parquet(p1)
    s2 = P.profile_sketches(docs.filter("doc_id % 2 = 1"))
    got = P.finalize_profile(
        P.merge_profile_sketches(s1.unionAll(s2)))
    want = P.finalize_profile(P.profile_sketches(docs))
    assert sorted([r.asDict() for r in got.collect()],
                  key=lambda r: r["grp"]) == \
        sorted([r.asDict() for r in want.collect()],
               key=lambda r: r["grp"])


def test_profile_rejects_bad_mode(spark, docs):
    with pytest.raises(ValueError, match="mode"):
        P.corpus_profile(docs, mode="bogus")


def test_profile_clamps_hll_overestimate(spark, docs):
    """HLL overestimation can push the distinct estimate past n_docs
    on small groups (ADVICE r10): the report must never show
    distinct_texts > n_docs or a negative dup_ratio.  Simulated by
    shrinking n_docs under a real sketch state — the clamp is
    algebraic, so the trigger need not be a lucky HLL run."""
    st = P.profile_sketches(docs)
    forged = st.withColumn("n_docs", F.lit(1).cast("long"))
    out = P.finalize_profile(forged).collect()
    assert out
    for r in out:
        assert r["distinct_texts"] <= r["n_docs"]
        assert r["dup_ratio"] >= 0.0
    # sketch-mode corpus_profile has the same exposure via
    # approx_count_distinct; the clamp there is value-neutral when
    # the estimate is in range
    sk = P.corpus_profile(docs, mode="sketch").collect()
    for r in sk:
        assert r["distinct_texts"] <= r["n_docs"]
        assert r["dup_ratio"] >= 0.0


def test_streaming_profile_report_empty_state(spark, tmp_path):
    """A report over a state path the sink never wrote (zero
    non-empty batches drained) is an EMPTY frame in the report
    schema, not a path error (ADVICE r10)."""
    from pandas_alchemy_spark.streaming.stream_events import (
        streaming_profile_report)
    rep = streaming_profile_report(spark, str(tmp_path / "nowhere"))
    assert rep.count() == 0
    want = {"grp", "n_docs", "total_tokens", "avg_tokens",
            "min_tokens", "max_tokens", "p50_tokens", "p90_tokens",
            "p99_tokens", "avg_chars", "distinct_texts", "dup_ratio"}
    assert set(rep.columns) == want
