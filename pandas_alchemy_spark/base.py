"""BaseFrame — the shared representation behind DataFrame and Series.

The reference's frame is a triple ``(_index, _columns, _cte)``
(reference base.py:6-23): label metadata client-side, data as a lazy
relational query addressed positionally.  Ours is the same triple with
the CTE replaced by a lazy PySpark DataFrame whose columns follow the
reserved layout of :mod:`..internal` — index levels first, then data
columns, exactly the reference's positional convention (base.py:18-23).

All alignment joins (the reference's internal machinery for pandas
index alignment, base.py:64-128) are implemented here as Spark joins:

- full-outer equi-join on index equality for single×single alignment
  (base.py:72-84) — native ``full_outer``; the reference's LEFT JOIN ∪
  anti-join polyfill (dialect.py:52-56) is unnecessary;
- left join on one level for single×multi (base.py:86-102);
- name-inferred level resolution (base.py:104-116) with the same
  refusal errors for multi×multi;
- positional paste-join via scalable rowids (base.py:118-128).

Everything is a plan rewrite; only ``_fetch``/``__len__``-style calls
execute.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F

from . import internal as I
from .operators.rowid import with_rowid
from .utils import wrap


class BaseFrame:
    ndim: int

    #: True when __idx_0 holds a *provisional* rowid — a
    #: monotonically_increasing_id captured at scan time (unique,
    #: order-correlated, NOT contiguous).  The contiguous 0-based values
    #: the reference synthesizes eagerly (row_number() OVER () - 1,
    #: alchemy.py:332-334) are only produced when index *values* become
    #: observable: export, positional ops, or alignment against a
    #: value-indexed frame.  This keeps a plain scan->project->agg
    #: pipeline completely free of rowid jobs — the 100 TB-relevant
    #: property (no count pass, no broadcast join under every query).
    _mid_index = False

    #: True when the user imposed a row order (sort_values/sort_index/
    #: nlargest, or a non-default index on ingest): export then follows
    #: PLAN order.  False (default) means row order IS index order, so
    #: export re-sorts client-side by the index — this makes the
    #: materialized order immune to plan-level reordering (window
    #: partitionBy, join shuffles), which the reference never faced
    #: because its RDBMS never reordered single-table scans
    #: (SURVEY.md §2.6 "no ORDER BY is ever emitted").
    _explicit_order = False

    #: True when a verb may have reordered rows in the PLAN relative to
    #: the positional index (window evaluation sorts by value/key,
    #: joins shuffle).  Export already re-sorts positional frames
    #: client-side (_fetch_pandas); positional ACCESSORS (head/tail/
    #: iloc/iat) consult this flag to re-sort plan-side first, so they
    #: return the same rows the export shows.  Kept False on the plain
    #: scan->project->filter path so head() stays an early-exit LIMIT
    #: (no full-scan TakeOrdered under every repr).
    _rows_reordered = False

    #: True when the provisional mid-index holds TRUE file positions
    #: (parquet _metadata.row_index on a single-file scan) rather than
    #: arbitrary monotonic ids.  Then no densify pass is ever needed
    #: (the mid IS the pandas RangeIndex), and export keeps the raw
    #: values — after a filter that yields pandas' sparse original
    #: labels exactly, where ranked monotonic mids would renumber.
    _mid_dense = False

    #: Identity token for NON-dense mids: monotonically_increasing_id
    #: encodes partition layout, so raw values are only comparable
    #: between frames whose mids were minted by the SAME scan (file
    #: scans are deterministically partitioned within a session, so a
    #: file-set key works across re-reads of the same path).  Frames
    #: derived from one another share the token via _shallow_copy.
    #: ``None`` means "never directly comparable" — alignment densifies.
    _mid_origin = None

    def __init__(self, index: pd.Index, columns: pd.Index | None, sdf: SparkDF):
        # index: pd.Index of *level names* (values live in the plan),
        # reference base.py:9-12.
        self._index = index
        self._columns = columns
        self._sdf = sdf

    # -- structure ---------------------------------------------------------

    @property
    def _is_mindex(self) -> bool:
        return len(self._index) > 1  # reference base.py:14-16

    def _n_idx(self) -> int:
        return len(self._index)

    def _n_cols(self) -> int:
        return len(self._columns) if self._columns is not None else 1

    def _idx_cols(self) -> list[Column]:
        return [self._sdf[I.idx_name(i)] for i in range(self._n_idx())]

    def _data_cols(self) -> list[Column]:
        return [self._sdf[I.col_name(i)] for i in range(self._n_cols())]

    def _col_at(self, i: int) -> Column:
        # position -1 = the NULL column injected for unmatched labels
        # (reference base.py:42-46 -> sa Null()).
        if i == -1:
            return F.lit(None)
        return self._sdf[I.col_name(i)]

    def _idx_at(self, i: int) -> Column:
        return self._sdf[I.idx_name(i)]

    def _dtypes(self) -> list:
        """Spark dtypes of the data columns, positional."""
        schema = {f.name: f.dataType for f in self._sdf.schema.fields}
        return [schema[I.col_name(i)] for i in range(self._n_cols())]

    def _idx_dtypes(self) -> list:
        schema = {f.name: f.dataType for f in self._sdf.schema.fields}
        return [schema[I.idx_name(i)] for i in range(self._n_idx())]

    def _shallow_copy(self):
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        return new

    def _level_of(self, level) -> int:
        """Resolve a level name/position (reference base.py:25-37)."""
        if isinstance(level, int):
            n = self._n_idx()
            i = wrap(level, n)
            if not 0 <= i < n:
                raise IndexError(
                    f"Too many levels: Index has only {n} level(s), "
                    f"{level} is not a valid level number")
            return i
        if level in list(self._index):
            return list(self._index).index(level)
        raise KeyError(f"Level {level} not found")

    # -- canonical select --------------------------------------------------

    def _project(self, idx_exprs: list[Column], data_exprs: list[Column]) -> SparkDF:
        """Re-emit the reserved positional layout from arbitrary
        expressions — every verb funnels through here, so the layout
        invariant holds everywhere."""
        sel = [e.alias(I.idx_name(i)) for i, e in enumerate(idx_exprs)]
        sel += [e.alias(I.col_name(i)) for i, e in enumerate(data_exprs)]
        return self._sdf.select(*sel)

    # -- rowid -------------------------------------------------------------

    def _add_rowid(self, sdf: SparkDF, name: str = I.ROWID) -> SparkDF:
        """Positional rowid for paste-joins (reference base.py:58-62) —
        scalable partition-offset variant, not a global window."""
        return with_rowid(sdf, name)

    def _densify(self) -> None:
        """Replace a provisional mid-index with contiguous 0-based
        rowids in current physical order (one O(#partitions) count
        pass).  Mirrors the reference's on-demand rowid re-synthesis
        (base.py:58-62).  In place; no-op when already dense.

        A ``_mid_dense`` mid already HOLDS the true positional labels
        (parquet row_index), so densify is a pure metadata flip — zero
        jobs — and filtered frames keep pandas' sparse original
        labels."""
        if not self._mid_index:
            return
        if self._mid_dense:
            self._mid_index = False
            return
        body = self._sdf.drop(I.idx_name(0))
        rid = with_rowid(body, I.idx_name(0))
        order = [I.idx_name(0)] + [c for c in body.columns]
        self._sdf = rid.select(*order)
        self._mid_index = False

    def _densified(self) -> "BaseFrame":
        if not self._mid_index:
            return self
        new = self._shallow_copy()
        new._densify()
        return new

    def _mids_aligned(self, other: "BaseFrame"):
        """Make two frames' indexes label-comparable for an
        index-equality join, densifying provisional mids that are not.

        Raw mids join directly ONLY when (a) both are dense (true file
        positions — comparable across any two scans) or (b) both are
        monotonic ids minted by the SAME scan (``_mid_origin`` match —
        monotonically_increasing_id encodes partition layout, so values
        from two different scans pair arbitrary rows).  Everything else
        (mixed mid/value, mixed dense/monotonic, monotonic mids of
        different or unknown origin) densifies the mid side(s) first:
        contiguous 0-based positions ARE comparable across plans."""
        a, b = self._mid_index, other._mid_index
        if not a and not b:
            return self, other
        if a and b:
            if self._mid_dense and getattr(other, "_mid_dense", False):
                return self, other
            if (not self._mid_dense
                    and not getattr(other, "_mid_dense", False)
                    and self._mid_origin is not None
                    and self._mid_origin == getattr(other, "_mid_origin",
                                                    None)):
                return self, other
        return self._densified(), other._densified()

    def _align_mids_with(self, other: "BaseFrame") -> "BaseFrame":
        """In-place twin of ``_mids_aligned`` for callers that mutate a
        copied self: densify SELF when the pair requires it and return
        the (possibly densified) other, so the caller's post-join flag
        bookkeeping reads post-alignment state."""
        a, b = self._mids_aligned(other)
        if a is not self:
            self._densify()
        return b

    # -- positional-order contract ----------------------------------------

    def _positional_export(self) -> bool:
        """True when ``_fetch_pandas`` re-sorts rows by ``__idx_0`` at
        export (the positional contract: row order IS index order)."""
        if self._explicit_order or self._n_idx() != 1:
            return False
        if self._mid_index:
            return True
        if self._index[0] is not None:
            return False
        from pyspark.sql import types as T
        return isinstance(self._idx_dtypes()[0],
                          (T.LongType, T.IntegerType, T.ShortType,
                           T.ByteType))

    def _positional_reordered(self) -> bool:
        """True when a positional accessor (head/tail/iloc/iat) must
        re-sort the plan by the index before slicing: the export
        contract is index order, but the plan may not be in it."""
        return self._rows_reordered and self._positional_export()

    # -- alignment joins ---------------------------------------------------

    @staticmethod
    def _join_cols(left: pd.Index, right: pd.Index):
        """Column-label alignment, pure client-side metadata
        (reference base.py:64-70): outer-join the two label Indexes,
        returning (joined_labels, left_positions, right_positions) with
        -1 marking a missing side (consumed by ``_col_at``)."""
        joined, lidx, ridx = left.join(right, how="outer", return_indexers=True)
        if lidx is None:
            lidx = list(range(len(joined)))
        if ridx is None:
            ridx = list(range(len(joined)))
        return joined, list(lidx), list(ridx)

    @staticmethod
    def _rename_all(sdf: SparkDF, prefix: str) -> SparkDF:
        return sdf.select([F.col(c).alias(prefix + c) for c in sdf.columns])

    def _join_idx(self, other: "BaseFrame"):
        """Row alignment single×single: FULL OUTER JOIN on index
        equality, result index = coalesce(l, r) (reference base.py:72-84).

        Returns (joined_sdf, lcol, rcol, idx_exprs) where lcol/rcol map
        positions to Columns of each side.  At 100 TB this is a shuffle
        on the index key — unavoidable for true pandas alignment; AQE
        picks broadcast automatically when one side is small.
        """
        if self._is_mindex or other._is_mindex:
            return self._join_idx_names(other)
        # provisional-mid handling: two mid-indexed frames from the same
        # scan share row identity — join on the mids directly (zero
        # extra jobs; exactly the eager-rowid alignment semantics).
        # Anything else densifies first (_mids_aligned).
        this, other = self._mids_aligned(other)
        l = this._rename_all(this._sdf, "l_")
        r = this._rename_all(other._sdf, "r_")
        lk, rk = f"l_{I.idx_name(0)}", f"r_{I.idx_name(0)}"
        joined = l.join(r, l[lk] == r[rk], "full_outer")
        idx = [F.coalesce(joined[lk], joined[rk])]

        def lcol(i):
            return F.lit(None) if i == -1 else joined[f"l_{I.col_name(i)}"]

        def rcol(i):
            return F.lit(None) if i == -1 else joined[f"r_{I.col_name(i)}"]

        return joined, lcol, rcol, idx, self._index

    def _join_idx_level(self, other: "BaseFrame", swapped: bool = False):
        """single-index self × one level of MultiIndex other: LEFT JOIN
        the single frame onto the multi frame's matching level, keeping
        the multi side's index (reference base.py:86-102)."""
        single, multi = (self, other)
        if single._is_mindex:
            raise TypeError("Cannot join two frames with MultiIndex")
        name = single._index[0]
        level = multi._level_of(name)
        m = self._rename_all(multi._sdf, "m_")
        s = self._rename_all(single._sdf, "s_")
        joined = m.join(
            s, m[f"m_{I.idx_name(level)}"] == s[f"s_{I.idx_name(0)}"], "left")
        idx = [joined[f"m_{I.idx_name(i)}"] for i in range(multi._n_idx())]

        def mcol(i):
            return F.lit(None) if i == -1 else joined[f"m_{I.col_name(i)}"]

        def scol(i):
            return F.lit(None) if i == -1 else joined[f"s_{I.col_name(i)}"]

        if swapped:
            return joined, mcol, scol, idx, multi._index
        return joined, scol, mcol, idx, multi._index

    def _join_idx_names(self, other: "BaseFrame"):
        """Infer the join level from overlapping index *names*
        (reference base.py:104-116), with the reference's refusals:
        no overlap -> ValueError; multi×multi -> NotImplementedError."""
        if self._is_mindex and other._is_mindex:
            raise NotImplementedError(
                "Joining two frames with MultiIndex is not supported")
        overlap = set(self._index) & set(other._index)
        if not overlap:
            raise ValueError("cannot join with no overlapping index names")
        if self._is_mindex:
            j, scol, mcol, idx, names = other._join_idx_level(self, swapped=False)
            # other is the single side -> lcol must be self (the multi side)
            return j, mcol, scol, idx, names
        return self._join_idx_level(other, swapped=False)

    def _paste_join(self, other_sdf: SparkDF, n_other_cols: int,
                    other_rowid: str | None = None):
        """Positional alignment (reference base.py:118-128): rowid both
        sides, INNER JOIN on rowid.  Self's rowid comes from the
        scalable partition-offset pass (operators/rowid.py); the other
        side reuses its enumerated index column when it has one (the
        reference does the same: from_list's rowid is passed in as
        ``other_rowid``, alchemy.py:231-232)."""
        l = self._add_rowid(self._sdf, I.ROWID)
        l = self._rename_all(l, "l_")
        if other_rowid is None:
            r = with_rowid(other_sdf, I.ROWID)
        else:
            r = other_sdf.withColumn(I.ROWID, F.col(other_rowid).cast("long"))
        r = self._rename_all(r, "r_")
        joined = l.join(r, l[f"l_{I.ROWID}"] == r[f"r_{I.ROWID}"], "inner")
        idx = [joined[f"l_{I.idx_name(i)}"] for i in range(self._n_idx())]

        def lcol(i):
            return F.lit(None) if i == -1 else joined[f"l_{I.col_name(i)}"]

        def rcol(i):
            return F.lit(None) if i == -1 else joined[f"r_{I.col_name(i)}"]

        return joined, lcol, rcol, idx

    def to_spark(self, index: bool = True) -> SparkDF:
        """Export the plan as a plain Spark DataFrame with user-facing
        names: index levels under their level names (or ``index``),
        data columns under their labels.  Labels must be unique strings
        (the general duplicate-label case stays inside the façade).
        ``index=False`` skips the index entirely — a mid-indexed frame
        then exports with zero rowid cost."""
        this = self._densified() if index else self
        sel = []
        if index:
            for i, name in enumerate(this._index):
                sel.append(this._idx_at(i).alias(str(name) if name is not None else "index"))
        if this._columns is not None:
            labels = list(this._columns)
        else:
            labels = [getattr(this, "name", None) or "value"]
        for i, lab in enumerate(labels):
            sel.append(this._col_at(i).alias(str(lab)))
        return this._sdf.select(*sel)

    # -- execution boundary ------------------------------------------------

    def _fetch(self):
        """Materialize all rows (reference base.py:55-56) — Arrow path."""
        return self._sdf.toPandas()

    def _fetch_pandas(self) -> tuple[pd.Index, pd.DataFrame]:
        """Fetch and split the positional layout back into a pandas
        (Multi)Index + data block (reference alchemy.py:287-299).

        A provisional mid-index is ranked *client-side* on the fetched
        rows (free — the data already crossed the wire), yielding the
        0-based contiguous index the reference synthesizes in-query."""
        pdf = self._fetch()
        n = self._n_idx()
        if (not self._explicit_order and n == 1 and len(pdf) > 1
                and (self._mid_index
                     or (self._index[0] is None
                         and pd.api.types.is_integer_dtype(pdf.iloc[:, 0])))):
            # positional frame: row order is index order by contract;
            # re-sort the fetched rows (client-side, data already here)
            # so plan-level reordering (window/join shuffles) never
            # leaks into the materialized result
            pdf = pdf.sort_values(pdf.columns[0], kind="stable")
        idx_part = pdf.iloc[:, :n]
        data_part = pdf.iloc[:, n:]
        if n > 1:
            index = pd.MultiIndex.from_frame(idx_part)
            index.names = list(self._index)
        else:
            values = idx_part.iloc[:, 0]
            if self._mid_index and not self._mid_dense:
                # arbitrary monotonic mids -> rank into 0-based labels;
                # dense mids already ARE the positional labels
                values = values.rank(method="first").astype("int64") - 1
            index = pd.Index(values)
            index.name = self._index[0]
        return index, data_part
