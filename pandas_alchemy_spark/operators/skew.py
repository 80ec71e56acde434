"""Salted join — explicit skew mitigation for hot join keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) splits
oversized partitions at runtime and is the right default.  This
operator is the *static* form for when you know the skew up front
(e.g. a null-heavy or celebrity key in a 100 TB fact table) or the
join sits under an operator AQE can't rewrite: left rows get a
deterministic per-row salt in [0, salt), the (small) right side is
replicated ``salt`` times, and the join key becomes (key, salt) — a
hot key's rows now spread over ``salt`` reducers instead of one.

Result is exactly the plain join's multiset: each left row matches
exactly the one right replica carrying its salt.  Cost: right side
× salt (keep the replicated side the small one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(left: SparkDF, right: SparkDF, on: str | list[str],
                how: str = "inner", salt: int = 8) -> SparkDF:
    """Equi-join with a salted key.  ``right`` is replicated ``salt``
    times — pass the smaller side as ``right``.  Supports inner/left
    joins (the semantics where each left row joins independently)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    on = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    r = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return l.join(r, on + [_SALT], how).drop(_SALT)
