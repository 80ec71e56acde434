"""Round-7 fixes for the round-6 ADVICE items: NULL-payload isolation
in decode_media, _GroupedEwm agg dispatch, merge_ordered(left_by=)
appearance order, and pas.sql probe/concurrency hardening."""
from __future__ import annotations

import threading

import pandas as pd
import pytest

import pandas_alchemy_spark as pas
import pandas_alchemy_spark.ext.multimodal as mm


def test_decode_media_null_payload_isolated(spark):
    """A NULL payload must flow through on_error like any corrupt
    input (ADVICE r6: len(payload) outside the try killed the job)."""
    rows = [(1, bytearray(b"\x00" * 16), "image/png"),
            (2, None, "image/png")]
    sdf = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string")
    nul = {r["doc_id"]: (r["width"], r["n_bytes"])
           for r in mm.decode_media(sdf, kernel="stub",
                                    on_error="null").collect()}
    assert nul[2] == (None, 0)
    assert nul[1][0] is not None and nul[1][1] == 16
    skip = mm.decode_media(sdf, kernel="stub",
                           on_error="skip").collect()
    assert {r["doc_id"] for r in skip} == {1}
    with pytest.raises(Exception):
        mm.decode_media(sdf, kernel="png", on_error="raise").collect()


def test_grouped_ewm_agg_dispatch(spark):
    """groupby()[c].ewm(a).agg('mean') must work like the global
    ewm.agg (ADVICE r6: _GroupedEwm lacked the dispatch)."""
    pdf = pd.DataFrame({"g": ["a", "a", "b", "b"],
                        "v": [1.0, 2.0, 3.0, 5.0]})
    df = pas.DataFrame.from_pandas(pdf)
    for how in ("mean", "sum", "var", "std"):
        got = getattr(df.groupby("g")["v"].ewm(alpha=0.5),
                      "agg")(how).to_pandas().sort_index()
        want = (pdf.groupby("g")["v"].ewm(alpha=0.5).agg(how)
                .reset_index(level=0, drop=True).sort_index())
        pd.testing.assert_series_equal(got, want, check_dtype=False,
                                       check_names=False)
    with pytest.raises(ValueError, match="unknown ewm aggregate"):
        df.groupby("g")["v"].ewm(alpha=0.5).agg("median")
    # aggregate alias present on both surfaces
    df.groupby("g")["v"].ewm(alpha=0.5).aggregate("mean")


def test_merge_ordered_left_by_appearance_order(spark):
    """pandas keeps groups in the LEFT frame's appearance order, not
    lexicographic (ADVICE r6) — use groups that sort differently."""
    lp = pd.DataFrame({"g": ["z", "z", "a", "a"],
                       "k": [1, 3, 1, 4],
                       "lv": [10.0, 30.0, 100.0, 400.0]})
    rp = pd.DataFrame({"k": [2, 3], "rv": [0.2, 0.3]})
    for fm in (None, "ffill"):
        want = pd.merge_ordered(lp, rp, on="k", left_by="g",
                                fill_method=fm)
        got = pas.merge_ordered(
            pas.DataFrame.from_pandas(lp),
            pas.DataFrame.from_pandas(rp),
            on="k", left_by="g", fill_method=fm,
        ).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)


def test_sql_concurrent_same_view_name(spark):
    """Two threads using the same kwarg view name must not cross-read
    each other's frames (pas.sql serializes on a module lock)."""
    a = pas.DataFrame.from_pandas(pd.DataFrame({"x": [1] * 50}))
    b = pas.DataFrame.from_pandas(pd.DataFrame({"x": [2] * 50}))
    results, errors = {}, []

    def run(tag, frame, want):
        try:
            for _ in range(5):
                out = pas.sql("SELECT sum(x) AS s FROM t",
                              t=frame).to_pandas()
                results.setdefault(tag, []).append(int(out.s.iloc[0]))
                assert int(out.s.iloc[0]) == want
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    ts = [threading.Thread(target=run, args=("a", a, 50)),
          threading.Thread(target=run, args=("b", b, 100))]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors
    assert set(results["a"]) == {50} and set(results["b"]) == {100}


def test_sql_preexisting_view_restored(spark):
    """A same-named pre-existing LOCAL temp view is restored after the
    call, never dropped."""
    spark.range(7).createOrReplaceTempView("pre_t")
    f = pas.DataFrame.from_pandas(pd.DataFrame({"x": [5]}))
    out = pas.sql("SELECT sum(x) AS s FROM pre_t", pre_t=f).to_pandas()
    assert int(out.s.iloc[0]) == 5
    assert spark.table("pre_t").count() == 7
    spark.catalog.dropTempView("pre_t")
