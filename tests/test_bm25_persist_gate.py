"""r13 batch 6: size-gated single-tokenize persist in bm25_search.

Above ``text._BM25_PERSIST_FLOOR_BYTES`` (Catalyst's no-pass input
estimate) the tokenized corpus persists so the stats aggregate and
the explode pass share ONE regex pass; below it the shipped
two-branch plan is kept (persist measured slower at small scale).
These tests pin (a) output equality across the gate on the same
corpus, (b) the gate actually switching on the estimate, and (c)
the estimator's behavior on statistics-free relations.
"""
from __future__ import annotations

import pandas as pd

from pandas_alchemy_spark.ext import text


def _topk(docs, qs, k=8):
    out = text.bm25_search(docs, qs, k=k).toPandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_bm25_gate_output_equal_both_paths(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(i, f"hash join filter scan {'batch ' * (i % 5)} row {i % 7}")
         for i in range(400)], "doc_id long, text string")
    qs = spark.createDataFrame(
        [("q0", "hash join filter"), ("q1", "batch row")],
        "query_id string, query string")
    monkeypatch.setattr(text, "_BM25_PERSIST_FLOOR_BYTES", 1 << 70)
    no_persist = _topk(docs, qs)
    spark.catalog.clearCache()
    monkeypatch.setattr(text, "_BM25_PERSIST_FLOOR_BYTES", 0)
    persist = _topk(docs, qs)
    spark.catalog.clearCache()
    pd.testing.assert_frame_equal(no_persist, persist)
    assert len(no_persist) > 0


def test_bm25_gate_switches_on_estimate(spark, monkeypatch, capsys):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string")
    qs = spark.createDataFrame([("q0", "beta")],
                               "query_id string, query string")
    monkeypatch.setattr(text, "_BM25_PERSIST_FLOOR_BYTES", 0)
    text.bm25_search(docs, qs, k=1).collect()
    assert "tokenized corpus persisted" in capsys.readouterr().err
    spark.catalog.clearCache()
    monkeypatch.setattr(text, "_BM25_PERSIST_FLOOR_BYTES", 1 << 70)
    text.bm25_search(docs, qs, k=1).collect()
    assert "tokenized corpus persisted" not in capsys.readouterr().err


def test_est_plan_bytes(spark, tmp_path):
    # file source: the estimate tracks file bytes (and is finite)
    p = str(tmp_path / "docs.parquet")
    spark.range(1000).selectExpr("id as doc_id",
                                 "repeat('word ', 20) as text") \
        .write.parquet(p)
    est = text._est_plan_bytes(spark.read.parquet(p))
    assert 0 < est < 1 << 40
    # statistics-free relation: "huge", so production-sized literal
    # frames err toward persisting
    lit = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert text._est_plan_bytes(lit.repartition(2)) >= 1 << 60
