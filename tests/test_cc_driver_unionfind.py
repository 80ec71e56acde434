"""r13 batch 5: size-gated driver-side union-find in
connected_components.

Below ``dedup._CC_DRIVER_EDGE_FLOOR`` directed edge rows the CC loop
collects the (bounded) edge list and solves exactly on the driver —
the broadcast-join principle applied to the propagation loop, whose
per-round cost at small scale is pure fixed overhead.  These tests
pin (a) label equality between the two paths on every graph shape the
suite knows to be adversarial for min-label propagation, (b) the
floor gate actually switching paths, and (c) type fidelity (string
ids, schema) through the driver round-trip.
"""
from __future__ import annotations

import pytest

from pandas_alchemy_spark.ext import dedup


def _labels(pairs, **kw):
    return {(r["id"], r["component"])
            for r in dedup.connected_components(pairs, **kw).collect()}


def _both_paths(monkeypatch, pairs, **kw):
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 10**9)
    drv = _labels(pairs, **kw)
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 0)
    dist = _labels(pairs, **kw)
    return drv, dist


GRAPHS = {
    # two chains + isolated pair (the original CC pin)
    "chains": [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
    # deep chain: diameter 16 — propagation-hostile
    "deep_chain": [(i, i + 1) for i in range(16)],
    # clique + flood star (over-cap emission shape)
    "clique_star": ([(a, b) for a in range(5) for b in range(a + 1, 5)]
                    + [(100, m) for m in range(101, 140)]),
    # duplicate + reversed + self-loop edges (must be cleaned identically)
    "dirty": [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)],
    # two components that merge only through a late bridge edge
    "bridge": [(0, 1), (2, 3), (1, 2), (7, 8), (9, 7)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_driver_equals_distributed(spark, monkeypatch, name):
    pairs = spark.createDataFrame(GRAPHS[name], "id_a long, id_b long")
    drv, dist = _both_paths(monkeypatch, pairs)
    assert drv == dist and drv


def test_driver_equals_distributed_string_ids(spark, monkeypatch):
    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x9", "x2")],
        "id_a string, id_b string")
    drv, dist = _both_paths(monkeypatch, pairs)
    assert drv == dist
    assert drv == {("doc-a", "doc-a"), ("doc-b", "doc-a"),
                   ("doc-c", "doc-a"), ("x2", "x2"), ("x9", "x2")}
    # schema fidelity through the driver round-trip
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 10**9)
    out = dedup.connected_components(pairs)
    assert [f.name for f in out.schema.fields] == ["id", "component"]
    assert all(f.dataType.typeName() == "string"
               for f in out.schema.fields)


def test_empty_graph_both_paths(spark, monkeypatch):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    drv, dist = _both_paths(monkeypatch, pairs)
    assert drv == dist == set()


def test_floor_gate_switches_paths(spark, monkeypatch, capsys):
    pairs = spark.createDataFrame(GRAPHS["chains"],
                                  "id_a long, id_b long")
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 10**9)
    dedup.connected_components(pairs).collect()
    assert "union-find on the driver" in capsys.readouterr().err
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 0)
    dedup.connected_components(pairs).collect()
    assert "converged in" in capsys.readouterr().err


def test_driver_path_ignores_max_iters_budget(spark, monkeypatch):
    """The driver solve is exact — the iteration budget (a guard
    against pathological distributed loops) never binds on it."""
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 10**9)
    pairs = spark.createDataFrame([(i, i + 1) for i in range(8)],
                                  "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(
               pairs, max_iters=1).collect()}
    assert got == {i: 0 for i in range(9)}


def test_collect_failure_falls_back_to_distributed(spark,
                                                   monkeypatch,
                                                   capsys):
    """ADVICE r13: the edge-row floor bounds rows, not bytes — when
    the bounded collect itself fails (maxResultSize), the caller must
    fall through to the distributed loop, not raise."""
    class _Boom:
        def collect(self):
            raise RuntimeError("bigger than spark.driver.maxResultSize")

    assert dedup._cc_driver_union_find(_Boom(), 1) is None

    real = dedup._cc_driver_union_find
    monkeypatch.setattr(dedup, "_cc_driver_union_find",
                        lambda edges, n: None)
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)],
                                  "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    assert "converged in" in capsys.readouterr().err
    monkeypatch.setattr(dedup, "_cc_driver_union_find", real)


def test_broadcast_hint_byte_gated(spark, monkeypatch, capsys):
    """ADVICE r13: wide string ids past the byte cap return the label
    frame UNHINTED (AQE decides); labels are unchanged either way."""
    wide = "x" * 4096
    pairs = spark.createDataFrame(
        [(wide + "a", wide + "b"), (wide + "b", wide + "c")],
        "id_a string, id_b string")
    want = {r["id"]: r["component"]
            for r in dedup.connected_components(pairs).collect()}
    monkeypatch.setattr(dedup, "_CC_BROADCAST_BYTE_CAP", 1)
    out = dedup.connected_components(pairs)
    err = capsys.readouterr().err
    assert "exceeds the broadcast-hint cap" in err
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == want
    assert "ResolvedHint" not in out._jdf.queryExecution() \
        .analyzed().toString()
