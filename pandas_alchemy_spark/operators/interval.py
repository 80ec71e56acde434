"""Interval (tolerance-bounded) join — all right rows within
±tolerance of each left row's time/number, per key.

Spark would execute the naive encoding (equi-join on key + range
predicate) as a join with a non-equi residual — fine — but with NO
key at all, or with hot keys, it degenerates to a per-key cross
product filtered late.  This implementation buckets the ``on`` value
into tolerance-width bins and equi-joins on (key, bin) with the left
side probing its own bin and both neighbors: every pair within
tolerance shares a probed bin, so the range filter only runs on
candidates whose bins already match.  ONE shuffle on (key, bin);
candidate volume is bounded by 3× bucket occupancy instead of the
key's full row count — the classic banding trick (same family as the
LSH band join in ext/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def interval_join(left: SparkDF, right: SparkDF, on: str,
                  tolerance: int | float,
                  by: str | list[str] | None = None,
                  suffix: str = "_r") -> SparkDF:
    """All (left, right) pairs with ``|left.on - right.on| <=
    tolerance``, equal ``by`` keys.  ``on`` must be numeric (convert
    timestamps with ``unix_micros`` first).  Right columns that clash
    with left names get ``suffix``."""
    by = [by] if isinstance(by, str) else list(by or [])
    # floor (not cast-truncate): negatives must bin consistently
    lbin = F.floor(F.col(on) / F.lit(tolerance)).cast("long")

    l = left.withColumn("__bin0", lbin).withColumn(
        "__bin", F.explode(F.array(F.col("__bin0") - 1, F.col("__bin0"),
                                   F.col("__bin0") + 1))).drop("__bin0")
    rename = {c: (c + suffix if c in left.columns and c not in by else c)
              for c in right.columns}
    r = right.select(
        *[F.col(c).alias(rename[c]) for c in right.columns]
    ).withColumn("__bin", F.floor(F.col(rename[on]) / F.lit(tolerance))
                 .cast("long"))

    keys = by + ["__bin"]
    joined = l.join(r, keys)
    out = joined.filter(
        F.abs(F.col(on) - F.col(rename[on])) <= F.lit(tolerance))
    return out.drop("__bin")
