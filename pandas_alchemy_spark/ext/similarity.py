"""Similarity search over an embedding column (array<float>).

Beyond-reference extension (SURVEY.md §7 Phase 4).  Two paths:

- :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set against the corpus; dot products via ``zip_with``/``aggregate``
  higher-order functions (JVM-side, no Python).  O(|Q|·N) work spread
  across all partitions — the right baseline, and exactly what you run
  at 100 TB when |Q| is small.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: deterministic
  md5-derived hyperplanes, sign-bit bucket codes, candidates only from
  matching buckets (multi-probe over Hamming-1 neighbors), then exact
  re-rank.  Sublinear candidate generation for large |Q|; approximate
  (tested for recall against brute force, not for equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (s, v) -> s + v)"
_NORM = "sqrt(aggregate({a}, cast(0.0 as double), (s, v) -> s + v * v))"


def dot_expr(a: str, b: str):
    return F.expr(_DOT.format(a=a, b=b))


def norm_expr(a: str):
    return F.expr(_NORM.format(a=a))


def cosine_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, vec) — small; broadcast.  Result:
    (query_id, neighbor_id, cosine, rank), excluding self-matches."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("cv"))
    dot = _DOT.format(a="qv", b="cv")
    na, nb = _NORM.format(a="qv"), _NORM.format(a="cv")
    cos = F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0.0)")
    scored = (c.join(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id", cos.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplane_sql(dim: int, planes: int, table: str = "0") -> str:
    """Deterministic pseudo-random hyperplanes: component (t, p, d) is
    an md5-derived value in [-0.5, 0.5).  Same formula is reproducible
    in any SQL engine with md5 — no RNG state, no driver-side
    materialization."""
    comp = (f"(cast(conv(substr(md5(concat(cast({table} as string), '#', "
            "cast(p as string), '_', cast(d as string))), 1, 8), 16, 10) as double)"
            " / 4294967296.0 - 0.5)")
    return (f"transform(sequence(0, {planes - 1}), p -> "
            f"transform(sequence(0, {dim - 1}), d -> {comp}))")


def bucket_code_expr(vec_col: str, dim: int, planes: int = 12,
                     table: str = "0"):
    """Sign-bit LSH bucket code (int) from ``planes`` hyperplanes."""
    hp = _hyperplane_sql(dim, planes, table)
    dot = _DOT.format(a="hp_p", b=vec_col)
    return F.expr(
        f"aggregate(zip_with({hp}, sequence(0, {planes - 1}), (hp_p, p) -> "
        f"case when ({dot}) >= 0 then shiftleft(1, p) else 0 end), 0, (s, x) -> s + x)")


def _table_codes_expr(vec_col: str, dim: int, planes: int, tables: int):
    """array of (table, code) structs — one sign-bit code per hash
    table, all computed in one narrow pass."""
    hp = _hyperplane_sql(dim, planes, table="t")
    dot = _DOT.format(a="hp_p", b=vec_col)
    code = (f"aggregate(zip_with({hp}, sequence(0, {planes - 1}), (hp_p, p) -> "
            f"case when ({dot}) >= 0 then shiftleft(1, p) else 0 end), 0, (s, x) -> s + x)")
    return F.expr(
        f"transform(sequence(0, {tables - 1}), t -> "
        f"struct(t as tbl, {code} as code))")


def lsh_topk(df: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 32, planes: int = 6, tables: int = 8) -> DataFrame:
    """Approximate top-k via multi-table sign-bit LSH.

    ``tables`` independent hyperplane sets; a corpus vector is a
    candidate if it lands in the query's bucket in ANY table (classic
    L-table LSH: recall compounds as 1-(1-p^planes)^tables).  The
    corpus explodes to ``tables`` rows (narrow); the join shuffles on
    (table, code) buckets; exact cosine re-rank at the end.  Multi-probe
    (1-bit flips) widens query buckets without touching the corpus."""
    codes = _table_codes_expr(vec_col, dim, planes, tables)
    c = (df.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cv"),
                   F.explode(codes).alias("tc"))
         .select("neighbor_id", "cv", "tc.tbl", "tc.code"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       codes.alias("qcodes"))
    # multi-probe: each table's code plus all 1-bit flips
    probes = F.explode(F.expr(
        f"flatten(transform(qcodes, tc -> concat("
        f"array(struct(tc.tbl as tbl, tc.code as code)), "
        f"transform(sequence(0, {planes - 1}), p -> "
        f"struct(tc.tbl as tbl, cast(tc.code ^ shiftleft(1, p) as int) as code)))))"
    )).alias("probe")
    qp = q.select("query_id", "qv", probes).select(
        "query_id", "qv", "probe.tbl", "probe.code")
    dot = _DOT.format(a="qv", b="cv")
    na, nb = _NORM.format(a="qv"), _NORM.format(a="cv")
    cos = F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0.0)")
    scored = (c.join(F.broadcast(qp), ["tbl", "code"])
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .dropDuplicates(["query_id", "neighbor_id"])
              .select("query_id", "neighbor_id", cos.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding", dim: int = 32,
                             planes: int = 10,
                             threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket join (no cross
    product), exact cosine verify at ``threshold``."""
    code = bucket_code_expr(vec_col, dim, planes)
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                  code.alias("code"))
    l, r = b.alias("l"), b.alias("r")
    dot = _DOT.format(a="l.v", b="r.v")
    na, nb = _NORM.format(a="l.v"), _NORM.format(a="r.v")
    cos = F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0.0)")
    return (l.join(r, (F.col("l.code") == F.col("r.code"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                    cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))
