"""Internal column-name scheme for the frame representation.

The reference stores its relation *positionally* — SQL column names are
anonymized with ``label(None)`` and all addressing is by position
(reference base.py:18-23,39-46, alchemy.py:341,348).  Spark columns must
be named, so we reserve a positional internal namespace:

    __idx_0, __idx_1, ...   index-level columns (first, like the
                            reference's index prefix)
    __c_0,  __c_1,  ...     data columns

User-facing labels (possibly duplicated, non-string, tuples) live
client-side in ``pd.Index`` objects exactly as in the reference
(base.py:9-12); the label -> internal-name mapping is purely positional,
which sidesteps Spark's no-duplicate-names rule for free.
"""

from __future__ import annotations

IDX_PREFIX = "__idx_"
COL_PREFIX = "__c_"
ROWID = "__rowid"


def idx_name(i: int) -> str:
    return f"{IDX_PREFIX}{i}"


def col_name(i: int) -> str:
    return f"{COL_PREFIX}{i}"


def idx_names(n: int) -> list[str]:
    return [idx_name(i) for i in range(n)]


def col_names(n: int) -> list[str]:
    return [col_name(i) for i in range(n)]
