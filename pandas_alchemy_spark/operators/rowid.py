"""Scalable 0-based rowid synthesis.

The reference synthesizes a default index as ``row_number() OVER () - 1``
(reference alchemy.py:332-334) and re-synthesizes rowids for positional
joins (base.py:58-62).  A bare ``row_number() OVER ()`` in Spark is a
single-partition window — every row funnels through one task, which is
the canonical 100 TB scale hazard (SURVEY.md §4.2).

We instead use the classic two-pass *partition-offset* trick:

  1. per-partition local ``row_number`` ordered by
     ``monotonically_increasing_id()`` (preserves intra-partition order,
     no shuffle);
  2. a tiny per-partition count aggregate (`#partitions` rows) collected
     to the driver, turned into cumulative offsets, and mapped back with
     a broadcast join.

Total cost: one narrow pass + one O(#partitions) aggregate.  No global
shuffle, no single-task window, works identically on 1000 executors.

When a caller *does* have a meaningful total order (an ``order_by``
column list), we emit a global ``row_number`` over that order only if
asked (deterministic semantics for tests); the scalable path is the
default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PART = "__pa_part"
_LOCAL = "__pa_local_rn"
_OFFSET = "__pa_part_offset"


def with_rowid(sdf: DataFrame, name: str, order_by: list | None = None) -> DataFrame:
    """Attach a 0-based ``long`` rowid column called ``name``.

    ``order_by=None`` -> scalable partition-offset rowid following
    current partition order (the analogue of the reference's
    order-of-the-query rowid).  ``order_by=[cols]`` -> deterministic
    global row_number over that order (single-partition window: only for
    small/test frames or already-aggregated data).
    """
    if order_by:
        w = Window.orderBy(*order_by)
        return sdf.withColumn(name, F.row_number().over(w).cast("long") - 1)

    part = sdf.withColumn(_PART, F.spark_partition_id()).withColumn(
        _LOCAL,
        F.row_number().over(
            Window.partitionBy(_PART).orderBy(F.monotonically_increasing_id())
        ),
    )
    # O(#partitions) rows: safe to collect on any cluster size.
    counts = part.groupBy(_PART).count().collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r[_PART]):
        offsets[row[_PART]] = acc
        acc += row["count"]
    spark = sdf.sparkSession
    offset_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], f"{_PART} int, {_OFFSET} long"
    )
    return (
        part.join(F.broadcast(offset_df), _PART)
        .withColumn(name, (F.col(_LOCAL).cast("long") - 1 + F.col(_OFFSET)))
        .drop(_PART, _LOCAL, _OFFSET)
    )
