"""Small helpers mirroring reference pandas_alchemy/utils.py.

``copied`` (utils.py:5-16 in the reference) implemented copy-on-write
over a mutable CTE triple.  PySpark DataFrames are immutable, so our
verbs build a *new* wrapper; ``copied`` here only standardizes the
``inplace=`` contract.
"""

from __future__ import annotations

import functools


def copied(func):
    """Decorate a mutating verb: run it against a shallow copy and
    return the copy, unless ``inplace=True`` (reference utils.py:5-16)."""

    @functools.wraps(func)
    def wrapper(self, *args, inplace=False, **kwargs):
        if inplace:
            return func(self, *args, **kwargs)
        target = self._shallow_copy()
        result = func(target, *args, **kwargs)
        # a verb may return a different object (e.g. Series<op>DataFrame
        # delegates to the reflected DataFrame op); propagate it
        # (reference utils.py:5-16 does the same).
        return target if result is None else result

    return wrapper


def merge(a: dict, b: dict) -> dict:
    """Dict union, right side wins (reference utils.py:19-22)."""
    out = dict(a)
    out.update(b)
    return out


def wrap(index: int, length: int) -> int:
    """Wrap a possibly-negative positional index (reference utils.py:25-26)."""
    return index + length if index < 0 else index
