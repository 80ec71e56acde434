"""Deduplication operators for large-scale text corpora.

Beyond-reference extension (SURVEY.md §7 Phase 4): exact dedup,
MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection over a
``documents``-shaped table (doc_id, text, ...).

Scale design (100 TB intent):
- Everything is expression-level (no Python UDFs): tokenization,
  shingling, hashing, signatures all run in whole-stage codegen via
  higher-order array functions.
- SimHash signatures are computed entirely *narrow* (per-row array
  fold) — zero shuffle until the final candidate join.
- MinHash/LSH shuffles only on (band, band_hash) buckets — the classic
  sublinear candidate generation; no O(n^2) cross join.
- Exact dedup is a single hash-aggregate; first-per-key via max-struct,
  no window sort.

Hashing uses md5-derived 60-bit integers (not xxhash64) so the DuckDB
correctness oracle can reproduce signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tokenize: lowercase, strip non-alphanumerics, split
_TOKENS = "filter(split(lower(regexp_replace({col}, '[^a-zA-Z0-9]+', ' ')), ' '), t -> t != '')"

#: md5-based 60-bit hash of a string expression (15 hex chars < 2^60),
#: reproducible in DuckDB as: ('0x' || substr(md5(s),1,15))::BIGINT
_H60 = "cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)"


def tokens_expr(col: str):
    return F.expr(_TOKENS.format(col=col))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text hash.  One hash-aggregate
    (map-side partial min), no window."""
    h = F.md5(F.col(text_col))
    return (df.select(h.alias("text_hash"), F.col(id_col))
              .groupBy("text_hash")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_copies")))


def shingles_expr(col: str, n: int = 3):
    """Word n-gram shingles as an array<string> (distinct)."""
    toks = _TOKENS.format(col=col)
    return F.expr(
        f"array_distinct(transform(sequence(0, greatest(size({toks}) - {n}, 0)),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {n}))))")


def minhash_signature(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 32,
                      shingle_n: int = 3) -> DataFrame:
    """(id, signature array<long>) — sig[k] = min over shingles of
    h60(k || shingle).  Pure narrow computation."""
    sh = shingles_expr(text_col, shingle_n).alias("__sh")
    base = df.select(F.col(id_col), sh).filter(F.size("__sh") > 0)
    sig = F.expr(
        "transform(sequence(0, %d), k -> "
        " array_min(transform(__sh, s -> %s)))"
        % (num_hashes - 1, _H60.format(s="concat(cast(k as string), '|', s)")))
    return base.select(id_col, sig.alias("signature"), F.col("__sh"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 32,
                      bands: int = 8, shingle_n: int = 3,
                      threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    signature -> ``bands`` bands of ``num_hashes/bands`` rows; docs
    sharing any band hash become candidates (shuffle on band buckets
    only); candidates are verified with exact shingle Jaccard and
    filtered at ``threshold``.  Returns (id_a, id_b, jaccard)."""
    rows = num_hashes // bands
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    # band key = the band's signature values themselves (joined as a
    # string) — deterministic and oracle-reproducible.  At very large
    # scale, re-hashing the band string (xxhash64) narrows the shuffle
    # key; the candidate set is identical up to hash collisions.
    banded = sigs.select(
        id_col, "__sh",
        F.explode(F.expr(
            f"transform(sequence(0, {bands - 1}), b -> "
            f" struct(b as band, concat_ws(',', slice(signature, b * {rows} + 1, {rows})) as bh))"
        )).alias("bb"))
    banded = banded.select(id_col, "__sh", "bb.band", "bb.bh")
    l = banded.alias("l")
    r = banded.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.bh") == F.col("r.bh"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.__sh").alias("sh_a"),
                    F.col("r.__sh").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (cand.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash_expr(col: str, bits: int = 64):
    """SimHash of the token multiset, as one narrow array fold: for each
    bit position, sum ±1 over token hashes, take the sign bit."""
    toks = _TOKENS.format(col=col)
    th = _H60.format(s="t")
    # per-token ±1 vector for each bit, folded elementwise
    acc = (f"aggregate({toks}, array_repeat(0, {bits}), (acc, t) -> "
           f"zip_with(acc, transform(sequence(0, {bits - 1}), b -> "
           f"case when (shiftright({th}, b) & 1) = 1 then 1 else -1 end), "
           f"(a, x) -> a + x))")
    # sign bits -> integer
    return F.expr(
        f"aggregate(zip_with({acc}, sequence(0, {bits - 1}), (v, b) -> "
        f"case when v > 0 then shiftleft(cast(1 as bigint), b) else cast(0 as bigint) end), "
        f"cast(0 as bigint), (s, x) -> s + x)")


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4
    16-bit chunks (pigeonhole: hamming<=3 -> >=1 chunk equal), join on
    chunk equality, verify with bit_count(a XOR b)."""
    sig = df.select(id_col, simhash_expr(text_col).alias("sh"))
    chunked = sig.select(
        id_col, "sh",
        F.explode(F.expr(
            "transform(sequence(0, 3), c -> "
            "struct(c as chunk, (shiftright(sh, c * 16) & 65535) as ch))"
        )).alias("cc")).select(id_col, "sh", "cc.chunk", "cc.ch")
    l, r = chunked.alias("l"), chunked.alias("r")
    cand = (l.join(r, (F.col("l.chunk") == F.col("r.chunk"))
                   & (F.col("l.ch") == F.col("r.ch"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.sh").alias("sh_a"), F.col("r.sh").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing at least one shingle.

    Explode shingles -> inner self-join on shingle (the shuffle is on
    shingle values, not the cross product) -> per-pair intersection
    count -> Jaccard against per-doc set sizes."""
    sh = df.select(F.col(id_col),
                   shingles_expr(text_col, n).alias("sh")) \
        .filter(F.size("sh") > 0)
    sizes = sh.select(id_col, F.size("sh").alias("sz"))
    ex = sh.select(id_col, F.explode("sh").alias("g"))
    l, r = ex.alias("l"), ex.alias("r")
    inter = (l.join(r, (F.col("l.g") == F.col("r.g"))
                    & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .groupBy(F.col(f"l.{id_col}").alias("id_a"),
                      F.col(f"r.{id_col}").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    return (inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
            .select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))
