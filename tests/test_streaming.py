"""Structured Streaming: windowed counts with watermark, file source ->
memory sink, compared against the batch twin."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest

from pandas_alchemy_spark.ext import events
from pandas_alchemy_spark.streaming import stream_events
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream_dir(spark):
    """Events re-written as micro-batch-friendly parquet files with
    microsecond timestamps (streaming schema needs real timestamps)."""
    d = tempfile.mkdtemp(prefix="pas_stream_")
    ev = events.load_events(spark, f"{SF_DIR}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, stream_dir):
    stream = stream_events.read_event_stream(spark, stream_dir,
                                             max_files_per_trigger=2)
    assert stream.isStreaming
    windowed = stream_events.windowed_counts(stream)
    q = stream_events.run_to_memory_sink(windowed, "t_windowed")
    try:
        got = spark.table("t_windowed").toPandas()
        batch = events.tumbling_window_agg(
            spark.read.parquet(stream_dir)).toPandas()
        want = (batch.groupby(["window_start", "event_type"])
                .agg(n_events=("n_events", "sum"),
                     sum_value=("sum_value", "sum")).reset_index())
        m = got.merge(want, on=["window_start", "event_type"],
                      suffixes=("", "_b"))
        assert len(m) == len(got) == len(want)
        assert (m.n_events == m.n_events_b).all()
    finally:
        q.stop()
