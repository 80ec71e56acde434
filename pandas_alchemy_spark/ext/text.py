"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Beyond-reference extension (SURVEY.md §7 Phase 4).  Everything is
built-in expressions (regexp / array higher-order functions) — no UDFs,
fully codegen'd, and reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small, fixed stopword inventories per language (n-gram-free heuristic
# language ID by stopword hit-rate; deterministic and SQL-expressible)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "des",
           "dem", "ein", "eine", "zu", "im", "nicht", "sich", "auf", "als"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "qui", "pour",
           "pas", "sur", "sont", "avec", "son", "au", "par", "plus", "ne"],
    "es": ["el", "los", "las", "una", "es", "del", "por", "con", "para",
           "como", "mas", "pero", "sus", "le", "ha", "si", "sin", "sobre"],
}

# ONE tokenizer definition for the whole pipeline: dedup keys,
# fingerprints and token budgets must agree on tokenization, so the
# expression lives in dedup and is imported here (a drifted copy
# would silently desynchronize them)
from .dedup import _TOKENS, _claim_col


def _tok(col: str) -> str:
    return _TOKENS.format(col=col)


# r13 batch 6: bm25_search persists its tokenized corpus (one regex
# pass instead of two) only when Catalyst's no-pass size estimate of
# the input is at or above this floor.  Below it the two tokenize
# branches execute as parallel stages that absorb the second pass in
# wall-clock while the corpus-sized cache write/read serializes —
# persist measured 1.2x SLOWER at sf0.1 (OPTIMIZATION_r13.md batch-2
# rejection) but 1.73x FASTER at 500k docs (AB_BM25_PERSIST_r13.json,
# outputs bit-equal).  Module-level so tests/production can repin it,
# same pattern as dedup._CC_DRIVER_EDGE_FLOOR.
_BM25_PERSIST_FLOOR_BYTES = 16 << 20


def _est_plan_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan — no data pass
    (for file sources: the pruned file-byte sum; relations without
    statistics, e.g. literal/ExistingRDD frames, report "huge")."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j converts scala.math.BigInt to a Python int already;
        # str() round-trip covers a JavaObject handle on older bridges
        return size if isinstance(size, int) else int(str(size))
    except Exception:  # noqa: BLE001 — estimate only, never fail the query
        return 1 << 62


def _toks_col(text_col: str, tokenizer: str | None):
    """The token-array Column: the codegen'd regex expression by
    default, or a registered subword kernel (ONE Arrow-vectorized
    pandas_udf — see :mod:`.tokenize`) when ``tokenizer`` names one.
    Either way callers materialize it ONCE (the __pas_toks rule)."""
    if tokenizer is None:
        return F.expr(_tok(text_col))
    from .tokenize import tokenizer_column
    return tokenizer_column(tokenizer, text_col)


def _stop_ratio_over(toks_col: str, words: list[str]) -> str:
    """Stopword hit-rate over an ALREADY-tokenized array column.
    Catalyst does not common-subexpression-eliminate the regexp
    tokenizer across filter lambdas, so expressions that mention the
    token array k times pay k regex passes unless the tokens are
    materialized once first (measured 3.6x on language_id at sf0.1)."""
    lst = ", ".join(f"'{w}'" for w in words)
    return (f"size(filter({toks_col}, t -> array_contains(array({lst}), t)))"
            f" / cast(greatest(size({toks_col}), 1) as double)")


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect language by stopword hit-rate; adds ``lang_pred`` and
    ``lang_score``.  Ties break alphabetically (deterministic).

    Tokenizes ONCE into a hidden column (8 mentions of the token
    array otherwise cost 8 regex passes per row — see
    :func:`_stop_ratio_over`)."""
    _claim_col(df, "__pas_toks", "language_id")
    pairs = ", ".join(
        f"struct(cast({_stop_ratio_over('__pas_toks', ws)} as double)"
        f" as score, '{lang}' as lang)"
        for lang, ws in sorted(STOPWORDS.items()))
    best = (f"array_max(array({pairs}))")
    return df.withColumn("__pas_toks", F.expr(_tok(text_col))) \
             .withColumn("__best", F.expr(best)) \
             .withColumn("lang_pred", F.expr("case when __best.score > 0 then __best.lang else 'unknown' end")) \
             .withColumn("lang_score", F.round(F.expr("__best.score"), 6)) \
             .drop("__best", "__pas_toks")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score:
    length, token count, mean word length, punctuation ratio, stopword
    ratio, uppercase ratio.  All pure expressions."""
    _claim_col(df, "__pas_toks", "quality_score")
    n_chars = F.length(F.col(text_col))
    toks = "__pas_toks"       # tokenize once; see _stop_ratio_over
    n_tokens = F.expr(f"size({toks})")
    mean_wlen = F.expr(
        f"aggregate({toks}, cast(0 as bigint), (s, t) -> s + length(t))"
        f" / cast(greatest(size({toks}), 1) as double)")
    punct = F.expr(
        f"length(regexp_replace({text_col}, '[a-zA-Z0-9\\\\s]+', ''))"
        f" / cast(greatest(length({text_col}), 1) as double)")
    stop_en = F.expr(_stop_ratio_over(toks, STOPWORDS["en"]))
    score = (
        F.when(n_tokens < 5, F.lit(0.0))
        .otherwise(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.3
            + (1.0 - F.least(F.lit(1.0), punct * 5)) * 0.3
            + F.least(F.lit(1.0), stop_en * 4) * 0.2
            + F.when((mean_wlen >= 3) & (mean_wlen <= 8), 0.2).otherwise(0.0)))
    cols = list(df.columns)
    return df.withColumn(toks, F.expr(_tok(text_col))).select(
        *cols,
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        F.round(mean_wlen, 6).alias("q_mean_word_len"),
        F.round(punct, 6).alias("q_punct_ratio"),
        F.round(stop_en, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"))


def token_stats(df: DataFrame, text_col: str = "text",
                tokenizer: str | None = None) -> DataFrame:
    """Token counting: whitespace tokens and a subword count.

    By default ``n_bpe_tokens`` is a deterministic expression PROXY
    (word chars in runs of <=4 plus punctuation marks).  Pass
    ``tokenizer=`` (a :mod:`.tokenize` kernel name, e.g. from
    :func:`~.tokenize.train_bpe_tokenizer`) and ``n_bpe_tokens``
    becomes the REAL subword count under that kernel — the unit
    training budgets are actually set in — while ``n_ws_tokens``
    stays the regex word count (same output schema either way)."""
    _claim_col(df, "__pas_toks", "token_stats")
    ws = F.expr("greatest(size(__pas_toks), 0)")
    if tokenizer is None:
        # BPE-ish proxy: ceil(len(word)/4) per word + punctuation marks
        bpe = F.expr(
            f"aggregate(__pas_toks, cast(0 as bigint), (s, t) -> s + cast(ceil(length(t) / 4.0) as bigint))"
            f" + length(regexp_replace({text_col}, '[a-zA-Z0-9\\\\s]+', ''))")
    else:
        _claim_col(df, "__pas_sub", "token_stats")
        bpe = F.expr("cast(greatest(size(__pas_sub), 0) as bigint)")
    cols = list(df.columns)
    out = df.withColumn("__pas_toks", F.expr(_tok(text_col)))
    if tokenizer is not None:
        out = out.withColumn("__pas_sub", _toks_col(text_col, tokenizer))
    return out.select(*cols, ws.alias("n_ws_tokens"),
                      bpe.alias("n_bpe_tokens"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization fingerprint (OpenRefine-style key collision): md5
    of the sorted distinct token set.  Collision => same content up to
    word order / punctuation / case."""
    fp = F.expr(
        f"md5(concat_ws(' ', array_sort(array_distinct({_tok(text_col)}))))")
    return df.select("*", fp.alias("fingerprint"))


# PII patterns (scrubbing for training-data pipelines): email, intl/US
# phone, IPv4.  Kept simple & deterministic — the goal is redaction
# plumbing, not NER-grade recall.
PII_PATTERNS = [
    ("[EMAIL]", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    # 3-3-4 shapes (optionally +CC) or a +international run - the
    # old any-9-digitish-run pattern redacted ISO dates and spaced
    # digit sequences as [PHONE], destroying legitimate content
    ("[PHONE]",
     r"(\+\d{1,3}[\s.-]?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}\b"
     r"|\+\d{7,15}"),
    ("[IP]", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"),
]


def normalize_text(df: DataFrame, text_col: str = "text",
                   scrub_pii: bool = True) -> DataFrame:
    """Normalization + PII scrub: lowercase, strip control chars,
    collapse whitespace, redact emails/phones/IPs.  Chained
    ``regexp_replace`` — single codegen'd projection, no UDF, no
    shuffle; scales linearly and pushes through AQE untouched."""
    c = F.col(text_col)
    if scrub_pii:
        for token, pat in PII_PATTERNS:
            c = F.regexp_replace(c, pat, token)
    c = F.lower(c)
    c = F.regexp_replace(c, r"[\x00-\x1f]+", " ")
    c = F.regexp_replace(c, r"\s{2,}", " ")
    c = F.trim(c)
    return df.select("*", c.alias("norm_text"))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str | None = None) -> DataFrame:
    """Gopher-style repetition signals per document: 2-gram count,
    distinct 2-gram count, top-2-gram frequency, duplicate-2-gram
    fraction.

    Set-based formulation: explode grams -> two codegen'd hash
    aggregates -> join the per-document stats back.  An earlier
    array-expression version (higher-order ``aggregate`` lambda over
    the sorted gram array) kept everything in one stage but evaluated
    the lambda interpreted per element — 6× slower at sf0.1 (28 s vs
    4.4 s).  Whole-stage-codegen hash aggregation beats shuffle
    avoidance here; gram rows are narrow (key, string) and partial
    aggregation collapses them map-side."""
    if id_col is None:
        # PIN the synthesized ids: monotonically_increasing_id is
        # nondeterministic across re-evaluations, and `body` feeds
        # both sides of the join below — without the checkpoint the
        # two subtrees could assign DIFFERENT ids to the same row
        # (dropped rows / stats attached to the wrong document)
        body = (df.withColumn("__rid",
                              F.monotonically_increasing_id())
                .localCheckpoint(eager=False))
        key = "__rid"
    else:
        # NB: id_col must uniquely identify documents — same-id rows
        # would pool their grams into one merged stat set
        body = df
        key = id_col
    # stage tokens as a REAL column before referencing them inside the
    # transform lambda: an element_at(<tokenizer-expr>, i) inside the
    # lambda re-tokenizes the document per element — O(n_tokens²) per
    # row, measured 20× slower at sf0.1 (25 s vs 1.2 s).  A multi-
    # referenced non-cheap column survives CollapseProject, so the
    # tokenizer runs exactly once per row.
    toked = body.select(key, F.expr(_tok(text_col)).alias("__tk"))
    # NB sequence(0, -1) DESCENDS in Spark — short docs need the guard
    grams = ("case when size(__tk) < 2 then array() "
             "else transform(sequence(0, size(__tk) - 2), "
             "i -> concat(element_at(__tk, i + 1), ' ', "
             "element_at(__tk, i + 2))) end")
    e = toked.select(key, F.explode_outer(F.expr(grams)).alias("__g"))
    c = e.groupBy(key, "__g").agg(F.count("__g").alias("__cnt"))
    s = (c.groupBy(key)
         .agg(F.sum("__cnt").alias("__n"),
              F.count("__g").alias("__nd"),
              F.max("__cnt").alias("__top")))
    joined = body.join(s, key)
    out = joined.select(
        *[c_ for c_ in df.columns],
        F.col("__n").cast("bigint").alias("n_2grams"),
        F.col("__nd").cast("bigint").alias("n_distinct_2grams"),
        F.col("__top").cast("bigint").alias("top_2gram_count"),
        F.round(F.expr(
            "if(__n = 0, 0.0, 1.0 - __nd / cast(__n as double))"), 6
        ).alias("dup_2gram_frac"))
    return out


def top_terms(df: DataFrame, text_col: str = "text", k: int = 50,
              min_len: int = 1) -> DataFrame:
    """Corpus-wide term frequencies, top-k: explode tokens -> one hash
    aggregate (map-side partial) -> top-k sort of the tiny aggregate.
    The classic first look at any new text corpus."""
    toks = _tok(text_col)
    e = df.select(F.explode(F.expr(toks)).alias("term"))
    if min_len > 1:
        e = e.filter(F.length("term") >= min_len)
    return (e.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
            .orderBy(F.col("tf").desc(), F.col("term").asc())
            .limit(k))


def pack_sequences(df: DataFrame, capacity: int = 2048,
                   n_shards: int = 32, id_col: str = "doc_id",
                   text_col: str = "text",
                   tokenizer: str | None = None) -> DataFrame:
    """Offset-pack documents into fixed-token-budget bins for training
    batch assembly: each document lands in the bin whose token range
    ``[bin*capacity, (bin+1)*capacity)`` contains its starting offset.

    Scalable formulation: documents shard by ``pmod(id, n_shards)`` and
    each shard packs independently with ONE keyed window (cumulative
    token sum ordered by id) — no single-partition global window, and
    shards parallelize across the cluster.  Deterministic given the
    id column, so results reproduce across engines.

    Contract: a bin's token total is bounded by ``capacity`` plus at
    most one straddling document (exact greedy bin-packing is
    inherently sequential; the offset rule is the standard one-pass
    approximation).  Returns (id, shard, n_tokens, start_offset, bin).
    """
    from pyspark.sql import Window
    base = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        F.greatest(F.size(_toks_col(text_col, tokenizer)), F.lit(0))
        .cast("long").alias("n_tokens"))
    # ROWS frame: the default RANGE frame sums ORDER-BY PEERS, so
    # duplicate ids would each absorb all peers' tokens (overlapping
    # offsets); ROWS sums strictly preceding rows plus self
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = base.withColumn(
        "start_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"))
    return packed.withColumn(
        "bin", F.floor(F.col("start_offset") / F.lit(capacity))
        .cast("long"))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 256,
                    overlap: int = 32,
                    tokenizer: str | None = None) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    context-window chunking step of training-data / RAG ingestion.

    Window ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; starts are generated
    while ``start < n_tokens - overlap`` (plus start 0), so every
    token lands in at least one chunk, the tail chunk may be short,
    and no chunk is fully contained in its predecessor.  A document
    shorter than one window yields exactly one chunk; a token-less
    document yields none.

    Scale: tokenize ONCE into a materialized column (Catalyst does not
    CSE the regex tokenizer across lambdas — see
    :func:`_stop_ratio_over`), then ``posexplode`` over the start
    offsets and ``slice`` — narrow built-in expressions only, no
    shuffle, whole-stage codegen end to end; output rows ≈
    ``n_tokens / stride`` per document regardless of cluster size.

    Returns ``(id_col, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_text)``.
    """
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens "
            f"(got overlap={overlap}, chunk_tokens={chunk_tokens})")
    stride = chunk_tokens - overlap
    _claim_col(df, "__pas_toks", "chunk_documents")
    toked = df.withColumn("__pas_toks", _toks_col(text_col, tokenizer))
    if tokenizer is None:
        joiner = " "
    else:
        from .tokenize import tokenizer_joiner
        joiner = tokenizer_joiner(tokenizer)
    # token-less docs yield an EMPTY starts array (posexplode then
    # emits no rows) instead of being filtered out: a filter on
    # size(__pas_toks) gets predicate-pushed below the projection,
    # inlining the tokenizer into the Filter — one full extra
    # tokenization per row (the optimized plan showed regexp_replace
    # twice; r8 plan audit)
    starts = F.expr(
        f"case when size(__pas_toks) < 1 then array() else "
        f"sequence(0, greatest(size(__pas_toks) - {overlap} - 1, 0), "
        f"{stride}) end")
    ex = (toked.select(F.col(id_col), F.col("__pas_toks"),
                       F.posexplode(starts)
                       .alias("chunk_idx", "chunk_start")))
    chunk = F.expr(f"slice(__pas_toks, chunk_start + 1, {chunk_tokens})")
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, joiner).alias("chunk_text"))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    vocab: DataFrame | None = None) -> DataFrame:
    """Corpus-trained unigram language-model score per document — the
    classic perplexity-style quality filter (CCNet-style, with the
    n-gram LM reduced to unigrams so the whole thing stays in exact
    JVM expressions): ``score = avg_t ln P(t)`` with
    ``P(t) = count(t) / total`` estimated from the corpus itself (or
    from ``vocab``: a (term, cnt) frame from a reference corpus —
    score one corpus under another's model).  More-negative scores =
    rarer vocabulary; gibberish and boilerplate sit at the two ends.

    Determinism contract: the per-document sum folds ``ln(count)``
    over the SORTED count list (counts are exact ints from one hash
    aggregate), so the float result is bit-identical across runs and
    partitionings — no groupBy-order float drift.  Across ENGINES the
    last ulp can differ (JVM ``Math.log`` vs C libm ``log`` are each
    correctly-rounded to within 1 ulp, not to the same ulp), so
    cross-engine comparisons must round (the driver leg rounds to 6
    decimals; a 1-ulp input diff crosses that boundary with
    probability ~1e-10 per row).

    Plan shape at 100 TB: when self-training, the exploded token
    stream is PERSISTED (r10 — the bigram_logprob pattern: it feeds
    both the vocab aggregate and the scoring join, and without the
    persist the scan + regex tokenize + explode re-derived per use —
    the whole corpus tokenized TWICE, measured 52.6 s vs bigram's
    27.2 s at 500k docs despite bigram doing strictly more modeling
    work).  The frame is corpus-token-sized, spills under
    MEMORY_AND_DISK, and trades one local-disk round-trip for the
    second scan + tokenization — the regex is the dominant cost, so
    the trade wins at every scale the family has been measured at.
    The vocab aggregate is persisted too (vocabulary-sized; reused by
    the token join and the total).  The scoring join is unhinted —
    AQE picks broadcast vs shuffle by the persisted vocab's actual
    size.  Both persists release through the bounded module cache
    ring (the oldest of 8 registered frames unpersists as new ones
    register), so repeated calls don't accumulate session-lifetime
    storage.  With an EXTERNAL ``vocab`` the token stream is consumed
    once and is not persisted (one corpus pass total).
    Self-training also excludes ``InferFiltersFromGenerate`` for the
    session (the rule re-inlines the tokenizer into a pushed filter —
    one extra tokenization per row per scan; same exclusion
    ``init_db`` and the dedup ops apply).
    Returns ``(id_col, n_lm_tokens, logprob)``.
    """
    from .dedup import _tune
    _tune(df)
    _claim_col(df, "__pas_toks", "unigram_logprob")
    toked = df.withColumn("__pas_toks", F.expr(_tok(text_col)))
    ex = toked.select(F.col(id_col),
                      F.explode("__pas_toks").alias("term"))
    if vocab is None:
        from .dedup import _register_cache
        ex = ex.persist()
        _register_cache(ex)
        vocab = (ex.groupBy("term")
                 .agg(F.count(F.lit(1)).alias("cnt")).persist())
        _register_cache(vocab)
    else:
        # an external model may carry zero/negative counts; ln() of
        # those is -inf/NaN — treat them as OOV (dropped by the join)
        vocab = vocab.filter(F.col("cnt") > 0)
    total = vocab.agg(F.sum("cnt").alias("__tot")).coalesce(1)
    per = (ex.join(vocab, "term")
           .groupBy(id_col)
           .agg(F.sort_array(F.collect_list("cnt")).alias("__cs"),
                F.count(F.lit(1)).alias("n_lm_tokens")))
    fold = F.expr(
        "aggregate(__cs, cast(0.0 as double), (s, c) -> s + ln(c))")
    return (per.crossJoin(total)
            .select(F.col(id_col), F.col("n_lm_tokens"),
                    ((fold - F.col("n_lm_tokens")
                      * F.log(F.col("__tot")))
                     / F.col("n_lm_tokens")).alias("logprob")))


def bm25_search(df: DataFrame, queries: DataFrame, k: int = 10,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Distributed BM25 keyword search over the corpus (Robertson &
    Zaragoza 2009, the Okapi/Lucene formulation) — the retrieval
    primitive a curation pipeline needs for targeted audits ("show me
    the docs about X") and for building retrieval eval sets.

    ``queries`` is a frame of ``(query_id, query)``.  Per (query,
    doc) score:

        sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))
        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)   [Lucene: >= 0]

    with N, df, tf, dl all exact BIGINT corpus statistics and the
    float sum folded over the per-pair term list SORTED by term (the
    module's bit-stability contract).  Returns the top ``k`` docs per
    query: ``(query_id, doc_id, rank, score)``.

    Plan shape at 100 TB: query terms are a broadcast-sized set, so
    the corpus explodes its tokens ONCE and inner-joins the broadcast
    — only matching (doc, term) rows survive into the tf aggregate
    (the shuffle carries the MATCHING subset, never the corpus).  df
    is a |query terms|-row aggregate over that same subset; N and
    avgdl are one tiny corpus aggregate cross-joined in.  Per-query
    top-k is one window over docs-with-hits, partitioned by query —
    bounded by hit counts, not corpus size.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .dedup import _tune
    _tune(df)
    from pyspark.sql import Window

    _claim_col(df, "__pas_toks", "bm25_search")
    toked = df.withColumn("__pas_toks", F.expr(_tok(text_col)))
    # size-gated single-tokenize persist (r13 batch 6; guide §5 reuse
    # rule): `toked` feeds BOTH the full-corpus stats aggregate below
    # and the explode+join pass, so unpersisted the corpus pays the
    # regex tokenize twice.  Gated on the no-pass Catalyst estimate
    # because the trade flips with scale — see
    # _BM25_PERSIST_FLOOR_BYTES.  Results are unaffected either way
    # (AB_BM25_PERSIST_r13.json asserts bit-equal top-k sets).
    est = _est_plan_bytes(df)
    if est >= _BM25_PERSIST_FLOOR_BYTES:
        toked = toked.persist()
        from .similarity import _register_cache
        _register_cache(toked)
        import sys as _sys
        print(f"[pandas_alchemy_spark] bm25_search: corpus estimate "
              f"{est} B >= {_BM25_PERSIST_FLOOR_BYTES} B; tokenized "
              f"corpus persisted (single tokenize pass)",
              file=_sys.stderr)
    # dl must count EVERY doc (BM25 normalizes against the full
    # corpus average, not the matching subset)
    stats = (toked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.size("__pas_toks")).alias("__dl_sum")).coalesce(1))
    qterms = (queries
              .withColumn("__qt", F.expr(_tok("query")))
              .select("query_id", F.explode("__qt").alias("term"))
              .distinct())
    ex = (toked.select(F.col(id_col), F.size("__pas_toks").alias("dl"),
                       F.explode("__pas_toks").alias("term")))
    tf = (ex.join(F.broadcast(qterms.select("term").distinct()), "term")
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    # persist the matching-subset aggregate (r13; guide §5 reuse
    # rule): `dfreq` is materialized as a BROADCAST build whose
    # subtree is the whole corpus explode+join+aggregate, and
    # `per_term` then probes the SAME tf pipeline again — without
    # the persist the corpus pass runs twice inside one query.
    # Bounded by (matching docs x query terms), tiny by design.
    tf = tf.persist()
    from .similarity import _register_cache
    _register_cache(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    per_term = (tf.join(F.broadcast(dfreq), "term")
                .join(F.broadcast(qterms), "term"))
    pairs = (per_term.groupBy("query_id", id_col)
             .agg(F.sort_array(F.collect_list(
                      F.struct("term", "tf", "df", "dl"))).alias("__ts")))
    fold = F.expr(
        f"aggregate(__ts, cast(0.0 as double), (s, x) -> s + "
        f"ln((__n - x.df + 0.5) / (x.df + 0.5) + 1.0) * x.tf / "
        f"(x.tf + {k1!r} * (1.0 - {b!r} + {b!r} * x.dl "
        f" / (__dl_sum / cast(__n as double)))))")
    scored = (pairs.crossJoin(F.broadcast(stats))
              .select("query_id", id_col, fold.alias("score")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col,
                    F.col("rank").cast("long").alias("rank"), "score"))


def tfidf_vectors(df: DataFrame, dim: int = 256,
                  text_col: str = "text", id_col: str = "doc_id",
                  normalize: bool = True,
                  fast_hash: bool = False) -> DataFrame:
    """Hashed TF-IDF document vectors — `array<double>` embeddings
    from raw text with NO external model, so the whole
    text → embedding → ANN / SemDeDup / near-dup path
    (:mod:`.similarity`) runs on corpora that ship without
    embeddings.  The classic hashing-vectorizer recipe
    (Weinberger et al. 2009 feature hashing; scikit-learn's
    HashingVectorizer + TfidfTransformer composition): term →
    md5-60bit → bucket ``h % dim``; weight = tf · idf with the
    smoothed idf ``ln((N + 1) / (df_b + 1)) + 1`` (df counted per
    BUCKET, post-collision — the oracle must replay what the hash
    actually produced); optional L2 normalization so downstream
    cosine is a plain dot product.

    Determinism: tf/df/N are exact BIGINTs from hash aggregates; the
    dense array is materialized by GAP-FILLING the (bucket-sorted,
    bucket-unique) entry list — zeros between consecutive buckets,
    then the tail pad — so every float lands at a fixed position and
    the L2 fold runs in fixed index order: bit-stable across runs
    and partitionings, same ≤1-ulp-per-engine ``ln`` caveat as every
    scorer here.  (The r8 form probed a map per index —
    ``element_at`` on MapData is a LINEAR key scan, the same pitfall
    :func:`~..streaming.stream_events.streaming_lm_scores`
    documents, O(dim·entries) per doc vs gap-fill's O(dim).  The BIG
    r8 cost was elsewhere though: the normalization lambda — see the
    in-body note.  Together 117.8 → ~31 s at 500k docs × dim 256,
    identical output; the stage profile that found it is in SURVEY
    §16.)

    Plan shape at 100 TB: one corpus explode → (doc, bucket) tf
    aggregate; df/N are a ``dim``-row and a 1-row aggregate DERIVED
    from that same pre-aggregated frame (persisted — corpus-sized,
    but columnar-narrow: id + bucket + count); the dense assembly is
    one per-doc aggregate.  Token-less docs produce no (doc, bucket)
    rows and are absent from the output entirely (the documented
    token-less contract every scorer here shares — they have no
    direction to embed).
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    from .dedup import _h60, _tune
    _tune(df)
    _claim_col(df, "__pas_toks", "tfidf_vectors")
    toked = df.withColumn("__pas_toks", F.expr(_tok(text_col)))
    ex = (toked.select(F.col(id_col),
                       F.explode("__pas_toks").alias("t"))
          .select(id_col,
                  F.pmod(F.expr(_h60("t", fast_hash)),
                         F.lit(dim)).alias("b")))
    tf = (ex.groupBy(id_col, "b")
          .agg(F.count(F.lit(1)).alias("tf")).persist())
    from .dedup import _register_cache
    _register_cache(tf)
    dfreq = tf.groupBy("b").agg(F.count(F.lit(1)).alias("df"))
    ndocs = (toked.agg(F.count(F.lit(1)).alias("__n")).coalesce(1))
    w = (tf.join(F.broadcast(dfreq), "b")
         .crossJoin(F.broadcast(ndocs))
         .select(id_col, "b",
                 (F.col("tf")
                  * (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0))
                     + 1.0)).alias("w")))
    # __es is sorted by bucket and bucket-unique (one row per (doc,
    # bucket) from the tf aggregate), so the dense vector is one
    # linear pass: before each entry, the zero-run since the previous
    # bucket; after the last, the tail pad.  element_at on an ARRAY
    # is O(1) (1-based; the i=0 branch never evaluates it — CASE is
    # lazy), unlike the map probe this replaced.
    dense = F.expr(
        f"concat("
        f"flatten(transform(__es, (e, i) -> concat("
        f"array_repeat(cast(0.0 as double), cast(e.b - (case when "
        f"i = 0 then -1 else element_at(__es, i).b end) - 1 as int)), "
        f"array(e.w)))), "
        f"array_repeat(cast(0.0 as double), "
        f"cast({dim - 1} - element_at(__es, -1).b as int)))")
    vec = (w.groupBy(id_col)
           .agg(F.sort_array(F.collect_list(F.struct("b", "w")))
                .alias("__es"))
           .select(id_col, dense.alias("embedding")))
    if not normalize:
        return vec
    # The norm is evaluated ONCE via zip_with against an array_repeat
    # of it (ArrayRepeat evaluates its element child a single time).
    # The obvious form — __nrm as a withColumn referenced inside the
    # division lambda — is a 29x cliff: the filter on __nrm pushes
    # below the projection and CollapseProject then inlines the whole
    # L2 fold INTO the per-element lambda, re-running the dim-step
    # aggregate for every element (dim² interpreted ops/row; measured
    # 116.7 s for this step alone vs 4.0 s unnormalized at 500k docs
    # x dim 256 — the derived-column cousin of the pushed-filter
    # tokenizer cliff).  NOT the let-binding-by-outer-lambda form
    # (transform(array(nrm), n -> ...)): a pandas_udf applied over a
    # nested-lambda-CAPTURE expression sitting directly on an
    # Aggregate fails Python-UDF extraction in Spark 4.1 (the UDF is
    # left raw in the projection and dies "Cannot evaluate
    # expression" at runtime) — and tfidf's embedding feeds exactly
    # such UDFs (cluster_documents, the ANN matmuls).  No zero-norm
    # filter is needed: every (doc, bucket) entry has w = tf·idf >= 1
    # (tf >= 1 by count; idf = ln((N+1)/(df+1)) + 1 >= 1 since
    # df <= N), so any doc reaching the aggregate has norm >= 1 —
    # the r8 filter was vacuous AND pushed a full dense-rebuild+fold
    # into the Filter.
    return (vec.select(id_col, F.expr(
        "zip_with(embedding, array_repeat(sqrt(aggregate(embedding, "
        "cast(0.0 as double), (s, v) -> s + v * v)), "
        "size(embedding)), (v, n) -> v / n)")
        .alias("embedding")))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   lam: float = 0.75) -> DataFrame:
    """Corpus-trained INTERPOLATED BIGRAM language-model score per
    document — one modeling step past :func:`unigram_logprob` toward
    the CCNet perplexity filter while staying in exact JVM
    expressions:

        P(t | p) = lam * c(p,t) / c(p,·) + (1 - lam) * c(t) / T
        score    = avg_i ln P(t_i | t_{i-1})      (t_1 scored by the
                                                   unigram term alone)

    with c(p,t) the corpus bigram count, c(p,·) the count of bigrams
    STARTING with p (not the unigram count — a document-final token
    starts nothing), c(t)/T the unigram model, all exact BIGINTs from
    hash aggregates.  Gibberish scores low under both terms; stitched
    boilerplate scores high on unigrams but low on bigrams — the
    signal the unigram filter cannot see.

    Determinism contract: the per-document fold runs over the token
    list SORTED BY POSITION (collect_list of (pos, counts) structs,
    sort_array, then one ln-fold), so the result is bit-stable across
    runs and partitionings; cross-engine comparison rounds (the same
    ≤1-ulp ``ln`` caveat as unigram_logprob).

    Plan shape at 100 TB: one corpus pass builds the bigram model
    (posexplode pairs → hash aggregate, map-side partials),
    PERSISTED; the unigram model and the per-prev totals are two
    aggregates DERIVED from corpus tokens / the bigram table (both
    vocabulary-bounded).  A second corpus pass re-derives (pos,
    prev, t) and left-joins the three model tables UNHINTED — the
    bigram vocabulary is unbounded at web scale, so the join
    strategy is AQE's call (broadcast when the persisted model
    actually fits, shuffle otherwise), never a forced broadcast.
    Then one per-doc aggregate.  Two corpus passes is the floor —
    the model must be complete before scoring.
    """
    if not (0.0 < lam < 1.0):
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    from .dedup import _tune
    _tune(df)
    _claim_col(df, "__pas_toks", "bigram_logprob")
    toked = df.withColumn("__pas_toks", F.expr(_tok(text_col)))
    # (pos, prev, t) stream: pos 1-based; prev NULL for the first.
    # No size filter — posexplode of an empty array already emits no
    # rows, and the filter's predicate-pushdown inlined the tokenizer
    # into the Filter (one extra tokenization per row; r8 plan audit).
    pairs = (toked
             .select(F.col(id_col),
                     F.posexplode("__pas_toks").alias("__p0", "t"),
                     F.col("__pas_toks"))
             .select(id_col, (F.col("__p0") + 1).alias("pos"), "t",
                     F.expr("CASE WHEN __p0 >= 1 THEN "
                            "element_at(__pas_toks, __p0) END")
                     .alias("prev")))
    # PERSIST the token-pair stream: it feeds THREE derivations (the
    # unigram model, the bigram model, and the scoring join) and each
    # would otherwise re-run the scan + tokenize + explode — measured
    # as 3 full corpus tokenizations per call (r8 plan audit).  The
    # frame is corpus-token-sized (the bigram cost structure), spills
    # under MEMORY_AND_DISK, and releases through the cache ring.
    pairs = pairs.persist()
    uni = (pairs.groupBy("t")
           .agg(F.count(F.lit(1)).alias("ct")).persist())
    big = (pairs.filter(F.col("prev").isNotNull())
           .groupBy("prev", "t")
           .agg(F.count(F.lit(1)).alias("c2")).persist())
    from .dedup import _register_cache
    _register_cache(pairs)
    _register_cache(uni)
    _register_cache(big)
    ptot = big.groupBy("prev").agg(F.sum("c2").alias("cp"))
    total = uni.agg(F.sum("ct").alias("__tt")).coalesce(1)
    # NO broadcast hints: the bigram table is corpus-bigram-vocabulary
    # sized — unbounded at web scale (billions of distinct pairs), so
    # a forced broadcast is a driver OOM waiting for a big corpus.
    # AQE picks broadcast at runtime when the tables actually fit
    # (the unigram_logprob pattern); the persisted models make the
    # size estimate accurate.
    joined = (pairs
              .join(uni, "t")
              .join(big, ["prev", "t"], "left")
              .join(ptot, "prev", "left"))
    per = (joined.groupBy(id_col)
           .agg(F.sort_array(F.collect_list(F.struct(
                    "pos",
                    F.coalesce("c2", F.lit(0)).alias("c2"),
                    F.coalesce("cp", F.lit(0)).alias("cp"),
                    F.col("ct")))).alias("__xs"),
                F.count(F.lit(1)).alias("n_lm_tokens")))
    fold = F.expr(
        f"aggregate(__xs, cast(0.0 as double), (s, x) -> s + "
        f"ln(CASE WHEN x.cp > 0 THEN "
        f"{lam!r} * x.c2 / x.cp + {1.0 - lam!r} * x.ct / __tt "
        f"ELSE x.ct / __tt END))")
    return (per.crossJoin(F.broadcast(total))
            .select(F.col(id_col), F.col("n_lm_tokens"),
                    (fold / F.col("n_lm_tokens")).alias("logprob2")))
