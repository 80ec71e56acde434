from __future__ import annotations

import pandas as pd
import pytest

import pandas_alchemy_spark as pas

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    session = pas.init_db(master="local[4]", **{
        "spark.sql.shuffle.partitions": "4",
        "spark.default.parallelism": "4",
    })
    yield session
    pas.close_db()


@pytest.fixture(scope="session")
def lineitem_pdf(spark) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/lineitem.parquet")


def assert_series_equal_sorted(ours, theirs, **kw):
    """Compare engine output against pandas ignoring row order (the
    engine, like the reference, does not promise an ordering)."""
    left = ours.sort_index()
    right = theirs.sort_index()
    pd.testing.assert_series_equal(left, right, check_dtype=False, **kw)


def assert_frame_equal_sorted(ours, theirs, **kw):
    left = ours.sort_index()
    right = theirs.sort_index()
    pd.testing.assert_frame_equal(left, right, check_dtype=False, **kw)
