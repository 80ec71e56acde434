"""``.iat`` positional scalar indexer (reference pandas_alchemy/indexer.py:1-21)."""

from __future__ import annotations


class _iAtIndexer:
    def __init__(self, obj):
        self._obj = obj

    def __getitem__(self, key):
        if self._obj.ndim == 2:
            if not isinstance(key, tuple) or len(key) != 2:
                raise ValueError("Invalid call for scalar access (getting)!")
            row, col = key
            if not isinstance(row, int) or not isinstance(col, int):
                raise ValueError("iAt based indexing can only have integer indexers")
            return self._obj._get_value(row, col, takeable=True)
        if not isinstance(key, int):
            raise ValueError("iAt based indexing can only have integer indexers")
        return self._obj._get_value(key, takeable=True)
