"""OpsMixin — dunder -> named-method forwarding.

Mirrors reference pandas_alchemy/ops_mixin.py:1-69: every arithmetic /
comparison dunder forwards to the generated named method (``__add__`` ->
``add`` etc.), including ``__eq__`` returning a frame — pandas-
compatible, which intentionally breaks hashing just as in pandas.
"""

from __future__ import annotations


class OpsMixin:
    __hash__ = None  # frames compare elementwise, so they are unhashable

    def __add__(self, other):
        return self.add(other)

    def __radd__(self, other):
        return self.radd(other)

    def __sub__(self, other):
        return self.sub(other)

    def __rsub__(self, other):
        return self.rsub(other)

    def __mul__(self, other):
        return self.mul(other)

    def __rmul__(self, other):
        return self.rmul(other)

    def __truediv__(self, other):
        return self.truediv(other)

    def __rtruediv__(self, other):
        return self.rtruediv(other)

    def __floordiv__(self, other):
        return self.floordiv(other)

    def __rfloordiv__(self, other):
        return self.rfloordiv(other)

    def __mod__(self, other):
        return self.mod(other)

    def __rmod__(self, other):
        return self.rmod(other)

    def __pow__(self, other):
        return self.pow(other)

    def __rpow__(self, other):
        return self.rpow(other)

    def __eq__(self, other):
        return self.eq(other)

    def __ne__(self, other):
        return self.ne(other)

    def __le__(self, other):
        return self.le(other)

    def __lt__(self, other):
        return self.lt(other)

    def __ge__(self, other):
        return self.ge(other)

    def __gt__(self, other):
        return self.gt(other)

    # -- logical ops (beyond-reference; mask composition) ------------------

    def __and__(self, other):
        return self._op("and", other)

    def __rand__(self, other):
        return self._op("and", other)

    def __or__(self, other):
        return self._op("or", other)

    def __ror__(self, other):
        return self._op("or", other)

    def __xor__(self, other):
        return self._op("xor", other)

    def __rxor__(self, other):
        return self._op("xor", other)

    def __invert__(self):
        # pandas ~mask; NULL stays NULL (masks built by our comparisons
        # are never NULL)
        return self._app(lambda c: ~c)
