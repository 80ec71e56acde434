"""SparkSession lifecycle — the engine's analogue of the reference's
``init_db``/``close_db`` global-engine singleton (reference:
pandas_alchemy/db.py:12-27).

The reference holds a global SQLAlchemy engine + MetaData; every frame
compiles its CTE against that engine.  Here the "engine" is a
SparkSession; all optimization is delegated to Catalyst the way the
reference delegates to the backing RDBMS optimizer.

Scale notes (100 TB / 1000-executor design intent):
- AQE is on: runtime coalescing, skew-join splitting and
  dynamic broadcast decisions replan per-stage at real cardinalities.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces.  On a real cluster this should be ~2-3x total cores.
- Arrow is enabled so `to_pandas`/`from_pandas` interop is columnar,
  not row-at-a-time (the reference ships literal rows as UNION ALL
  SQL text — an anti-pattern we deliberately do not reproduce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_SESSION: SparkSession | None = None


def _default_parallelism() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "32")


def init_db(master: str | None = None, app_name: str = "pandas_alchemy_spark",
            **conf: str) -> SparkSession:
    """Create (or fetch) the global SparkSession.

    Mirrors reference ``init_db`` (db.py:12-19): repeated calls without
    an intervening :func:`close_db` raise, matching its assertion that
    the DB is not already initialized.
    """
    global _SESSION
    if _SESSION is not None:
        raise RuntimeError("Session already initialized; call close_db() first")
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # driver testdata uses nanosecond parquet timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate inlines expensive generators into
        # pushed-down filters (O(n^2) re-evaluation; see ext/dedup.py)
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    )
    for k, v in conf.items():
        builder = builder.config(k, v)
    _SESSION = builder.getOrCreate()
    _SESSION.sparkContext.setLogLevel("WARN")
    return _SESSION


def close_db() -> None:
    """Stop and clear the global session (reference db.py:22-27)."""
    global _SESSION
    if _SESSION is None:
        raise RuntimeError("Session not initialized")
    _SESSION.stop()
    _SESSION = None


def get_session() -> SparkSession:
    """Active session: the explicit singleton, else any live Spark
    session (so the engine composes with a driver-provided session)."""
    if _SESSION is not None:
        return _SESSION
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    raise RuntimeError("No SparkSession; call init_db() first")
