"""``Series.str`` / ``Series.dt`` accessor namespaces.

Beyond-reference extension: the reference has no ``.str``/``.dt``
surface at all (API_COVERAGE.md:187-307, all unchecked — SURVEY.md
§2.9), but a pandas user switching to this engine expects them.  Every
method is a thin wrapper over a built-in JVM-side Spark function via
``Series._app`` (whole-stage codegen; no Python in the hot path), and
preserves expression lineage so ``df[df.s.str.contains(...)]``
filters in-plan with parquet pushdown where Spark supports it.

pandas semantic notes encoded here:
- missing propagates: every function maps NULL -> NULL (pandas NaN);
- ``str.replace`` defaults to ``regex=False`` (pandas >= 2.0);
- ``dt.dayofweek`` is Monday=0 (Spark ``weekday``, not ``dayofweek``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


class StringMethods:
    """Vectorized string functions under ``Series.str``."""

    def __init__(self, series):
        self._s = series

    def _map(self, fn):
        return self._s._app(fn)

    def lower(self):
        return self._map(F.lower)

    def upper(self):
        return self._map(F.upper)

    def title(self):
        # pandas title() capitalizes after ANY non-alpha ("a-b" ->
        # "A-B"); initcap only after whitespace.  Split on alpha/non-
        # alpha boundaries (zero-width lookarounds keep delimiters),
        # capitalize each run, re-join.
        return self._map(lambda c: F.array_join(F.transform(
            F.split(c, "(?<=[^A-Za-z])|(?=[^A-Za-z])"),
            lambda t: F.concat(F.upper(F.substring(t, 1, 1)),
                               F.lower(F.substring(t, 2, 2147483647)))), ""))

    def len(self):
        return self._map(F.length)

    def strip(self):
        return self._map(F.trim)

    def lstrip(self):
        return self._map(F.ltrim)

    def rstrip(self):
        return self._map(F.rtrim)

    def contains(self, pat, regex: bool = True):
        if regex:
            return self._map(lambda c: c.rlike(pat))
        return self._map(lambda c: c.contains(pat))

    def startswith(self, pat):
        return self._map(lambda c: c.startswith(pat))

    def endswith(self, pat):
        return self._map(lambda c: c.endswith(pat))

    def replace(self, pat, repl, regex: bool = False):
        if regex:
            return self._map(lambda c: F.regexp_replace(c, pat, repl))
        return self._map(lambda c: F.replace(c, F.lit(pat), F.lit(repl)))

    def slice(self, start=None, stop=None, step=None):
        if step not in (None, 1):
            raise NotImplementedError("str.slice step is not supported")
        lo = 0 if start is None else start
        if lo < 0 or (stop is not None and stop < 0):
            raise NotImplementedError("negative str.slice bounds")
        length = None if stop is None else max(stop - lo, 0)
        if length is None:
            return self._map(lambda c: F.substring(c, lo + 1, 2147483647))
        return self._map(lambda c: F.substring(c, lo + 1, length))

    def get(self, i: int):
        """i-th character (pandas .str.get on strings)."""
        if i < 0:
            return self._map(
                lambda c: F.when(F.length(c) >= -i,
                                 F.substring(c, i, 1)))
        return self._map(
            lambda c: F.when(F.length(c) > i, F.substring(c, i + 1, 1)))

    def split(self, pat: str = r"\s+", regex: bool = True):
        if not regex:
            pat = "".join(f"\\{ch}" if not ch.isalnum() else ch
                          for ch in pat)
        return self._map(lambda c: F.split(c, pat))

    @staticmethod
    def _no_trunc(padded, width):
        # Spark lpad/rpad TRUNCATE strings longer than width; pandas
        # zfill/pad leave them unchanged.
        def fn(c):
            return F.when(F.length(c) >= width, c).otherwise(padded(c))
        return fn

    def extract(self, pat: str, group: int = 1):
        """First regex capture group (pandas str.extract with one
        group; NULL when no match, like pandas NaN)."""
        return self._map(lambda c: F.when(
            c.rlike(pat), F.regexp_extract(c, pat, group)))

    def count(self, pat: str):
        """Count non-overlapping regex matches."""
        return self._map(lambda c: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))))

    def find(self, sub: str):
        """Position of first occurrence, -1 if absent (pandas find)."""
        return self._map(lambda c: F.instr(c, sub) - F.lit(1))

    def repeat(self, n: int):
        return self._map(lambda c: F.repeat(c, n))

    def capitalize(self):
        return self._map(lambda c: F.concat(
            F.upper(F.substring(c, 1, 1)),
            F.lower(F.substring(c, 2, 2147483647))))

    def zfill(self, width: int):
        return self._map(self._no_trunc(
            lambda c: F.lpad(c, width, "0"), width))

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        if side == "left":
            return self._map(self._no_trunc(
                lambda c: F.lpad(c, width, fillchar), width))
        if side == "right":
            return self._map(self._no_trunc(
                lambda c: F.rpad(c, width, fillchar), width))
        raise ValueError(f"Invalid side: {side}")


class DatetimeProperties:
    """Datetime component accessors under ``Series.dt``."""

    def __init__(self, series):
        self._s = series

    def _map(self, fn):
        return self._s._app(fn)

    @property
    def year(self):
        return self._map(F.year)

    @property
    def month(self):
        return self._map(F.month)

    @property
    def day(self):
        return self._map(F.dayofmonth)

    @property
    def hour(self):
        return self._map(F.hour)

    @property
    def minute(self):
        return self._map(F.minute)

    @property
    def second(self):
        return self._map(F.second)

    @property
    def dayofweek(self):
        # pandas: Monday=0 .. Sunday=6 == Spark `weekday`
        return self._map(F.weekday)

    weekday = dayofweek

    @property
    def dayofyear(self):
        return self._map(F.dayofyear)

    @property
    def quarter(self):
        return self._map(F.quarter)

    @property
    def date(self):
        return self._map(F.to_date)

    @property
    def days_in_month(self):
        return self._map(lambda c: F.dayofmonth(F.last_day(c)))

    daysinmonth = days_in_month

    @property
    def is_month_start(self):
        return self._map(lambda c: F.dayofmonth(c) == 1)

    @property
    def is_month_end(self):
        return self._map(lambda c: F.to_date(c) == F.last_day(c))

    @property
    def isocalendar_week(self):
        return self._map(F.weekofyear)

    def month_name(self):
        return self._map(lambda c: F.date_format(c, "MMMM"))

    def day_name(self):
        return self._map(lambda c: F.date_format(c, "EEEE"))

    def floor(self, freq: str):
        unit = {"D": "day", "h": "hour", "H": "hour", "min": "minute",
                "T": "minute", "s": "second", "S": "second"}.get(freq)
        if unit is None:
            raise NotImplementedError(f"dt.floor freq {freq!r}")
        return self._map(lambda c: F.date_trunc(unit, c))

    def strftime(self, fmt: str):
        """pandas strftime with the common %-codes mapped to Spark's
        java.time pattern letters."""
        mapping = [("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"),
                   ("%H", "HH"), ("%M", "mm"), ("%S", "ss")]
        out = fmt
        for py, jv in mapping:
            out = out.replace(py, jv)
        if "%" in out:
            raise NotImplementedError(f"strftime code in {fmt!r}")
        return self._map(lambda c: F.date_format(c, out))
