"""Pluggable subword tokenizer kernels (r7 verdict item 3).

Every token-budgeted operator in :mod:`.text` (``chunk_documents``,
``pack_sequences``, ``token_stats``) counts regex-whitespace tokens by
default — the wrong unit for training budgets, which are set in BPE
tokens (~1.3–1.5× the word count for English, worse for code/CJK).
This module adds a kernel registry (the ``DECODE_KERNELS`` pattern
from :mod:`.multimodal`) plus a self-contained byte-level BPE:

- :func:`register_tokenizer` — plug in any ``pd.Series[str] ->
  pd.Series[list[str]]`` callable; it runs as ONE Arrow-vectorized
  ``pandas_udf`` column (never a row-at-a-time Python UDF).
- :func:`train_bpe` / :func:`train_bpe_tokenizer` — classic
  byte-level BPE merge learning (Sennrich et al. 2016,
  arXiv:1508.07909; the GPT-2 byte-level formulation, Radford et al.
  2019) trained on a content-addressed corpus sample, fully
  deterministic (no RNG; ties break lexicographically).
- a built-in ``"chars4"`` kernel (fixed 4-char pieces) whose output
  is SQL-replayable — it exists so the driver oracle can pin the
  whole registry → UDF → chunk/pack plumbing with a value-hash match
  while the BPE kernel's semantics are pinned by the pure-Python
  oracle in tests.

Losslessness contract: every kernel here partitions its input —
``"".join(tokens)`` restores the pre-token stream exactly (for BPE,
the latin-1 byte string; byte-level tokens may split a multi-byte
UTF-8 character, exactly like real byte-level BPE vocabularies).

Scale shape: training collects a BOUNDED sample to the driver
(``sample_docs`` smallest-xxhash64 documents — training needs a
sample, not the population); the learned merge table (vocab-bounded,
a few thousand string pairs) ships to executors inside the UDF
closure via cloudpickle; application is embarrassingly parallel with
a per-word memo (natural-language words repeat heavily, so the hot
path is a dict hit, not the merge loop).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pre-tokenizer: GPT-2-style "leading space attaches to the word"
#: segmentation, simplified to stdlib `re`.  PARTITIONS the string
#: (every char lands in exactly one pre-token) so BPE stays lossless.
_PRETOK = re.compile(r" ?\S+|\s+")


def _pretokens(text: str) -> list:
    return _PRETOK.findall(text)


def train_bpe(texts, vocab_size: int = 512) -> list:
    """Learn byte-level BPE merges from an in-memory text sample.

    Classic frequency-greedy merge learning: start from single bytes
    (as latin-1 chars — a lossless 1:1 byte<->char mapping), repeatedly
    merge the most frequent adjacent pair within pre-token boundaries
    until ``vocab_size - 256`` merges exist or no pair repeats.
    Deterministic: ties break on the lexicographically smallest pair.
    Returns the ordered merge list (rank = list position).

    INCREMENTAL pair maintenance (r8 verdict item 4): the original
    formulation recounted every pair over every word per merge —
    O(vocab x corpus-words), fine at vocab 512 and quadratic pain at
    a realistic 16k-32k.  This one updates only the words CONTAINING
    the merged pair (a pair -> word-ids index) and selects the next
    merge from a lazy max-heap keyed ``(-count, pair)`` — heap order
    IS the old ``max count, lexicographically smallest pair`` rule,
    so the merge list is identical (pinned against the quadratic
    oracle in tests/test_tokenize.py).  Stale heap entries (a pair
    whose count changed after push) are discarded on pop: every
    count CHANGE pushes a fresh entry, so the current count always
    has one.  Measured: 16k vocab on the 10k-doc bench sample in
    ~1 min vs hours quadratic."""
    if vocab_size < 256:
        raise ValueError(
            f"vocab_size must be >= 256 (the byte alphabet), "
            f"got {vocab_size}")
    import heapq
    from collections import Counter
    wf: Counter = Counter()
    for t in texts:
        if not t:
            continue
        for w in _pretokens(t):
            wf[tuple(w.encode("utf-8").decode("latin-1"))] += 1
    # unique words as mutable symbol lists; pair stats over them.
    # (The quadratic form re-aggregated words that became equal after
    # a merge; aggregation only coalesces identical contributions, so
    # skipping it changes nothing about pair counts or merges.)
    words = [list(w) for w in wf]
    freqs = list(wf.values())
    pair_counts: dict = {}
    pair_words: dict = {}  # pair -> {word idx}; grows stale, checked on use
    for idx, (w, f) in enumerate(zip(words, freqs)):
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + f
            s = pair_words.get(p)
            if s is None:
                pair_words[p] = s = set()
            s.add(idx)
    # only pairs that repeat are ever mergeable (the top<2 stop rule)
    heap = [(-c, p) for p, c in pair_counts.items() if c >= 2]
    heapq.heapify(heap)
    merges: list = []
    want = vocab_size - 256
    while len(merges) < want and heap:
        negc, best = heapq.heappop(heap)
        if pair_counts.get(best, 0) != -negc:
            continue  # stale: a fresher entry carries the live count
        merges.append(best)
        a, b = best
        ab = a + b
        touched: dict = {}
        for idx in pair_words.pop(best, ()):
            w = words[idx]
            f = freqs[idx]
            # membership sets are never purged when OTHER merges
            # rewrite a word — skip words that no longer contain it
            if not any(w[i] == a and w[i + 1] == b
                       for i in range(len(w) - 1)):
                continue
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pair_counts[p] -= f
                touched[p] = True
            out = []
            i = 0
            L = len(w)
            while i < L:
                if i < L - 1 and w[i] == a and w[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            words[idx] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
                s = pair_words.get(p)
                if s is None:
                    pair_words[p] = s = set()
                s.add(idx)
                touched[p] = True
        for p in touched:
            c2 = pair_counts.get(p, 0)
            if c2 >= 2:
                heapq.heappush(heap, (-c2, p))
            elif c2 <= 0:
                pair_counts.pop(p, None)
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list:
    """Apply merges to ONE pre-token (latin-1 byte chars), lowest
    rank first — the canonical BPE application order."""
    parts = list(word)
    while len(parts) > 1:
        best_i = -1
        best_r = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def make_bpe_kernel(merges):
    """Build a vectorized kernel from a merge list: ``pd.Series[str]
    -> pd.Series[list[str]]`` with a per-word memo (words repeat, so
    amortized cost is one dict lookup per word)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def kernel(texts):
        import pandas as pd
        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list = []
            for w in _pretokens(t):
                wb = w.encode("utf-8").decode("latin-1")
                got = memo.get(wb)
                if got is None:
                    got = bpe_encode_word(wb, ranks)
                    memo[wb] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out, dtype=object)

    return kernel


def _chars4_kernel(texts):
    """Fixed 4-char pieces — the SQL-replayable plumbing probe (the
    DuckDB oracle reproduces it with substr + generate_series, so the
    driver can value-hash the registry→UDF→chunk path end to end)."""
    import pandas as pd
    out = []
    for t in texts:
        if t is None:
            out.append(None)
        else:
            out.append([t[i:i + 4] for i in range(0, len(t), 4)])
    return pd.Series(out, dtype=object)


#: name -> (kernel fn, joiner).  The joiner is what reassembles a
#: token slice into text (kernels here are lossless partitions, so
#: it is "" — the regex expression path joins with " ").
TOKENIZER_KERNELS: dict = {
    "chars4": (_chars4_kernel, ""),
}


def register_tokenizer(name: str, fn, joiner: str = "") -> None:
    """Plug in a tokenizer kernel: ``fn(pd.Series[str]) ->
    pd.Series[list[str] | None]``.  Runs Arrow-batched on executors;
    ship model state inside the closure (cloudpickle carries it)."""
    TOKENIZER_KERNELS[str(name)] = (fn, joiner)


def train_bpe_tokenizer(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        vocab_size: int = 512,
                        sample_docs: int = 10_000,
                        name: str | None = None) -> str:
    """Train byte-level BPE on a content-addressed corpus sample and
    register it.  The sample is the ``sample_docs`` documents with
    smallest ``xxhash64(id)`` (deterministic, no RNG, bounded driver
    memory — same sampling rule as IVF centroid seeding).  Returns
    the registered kernel name (default ``"bpe{vocab_size}"``)."""
    rows = (df.select(F.col(text_col).alias("t"),
                      F.xxhash64(F.col(id_col)).alias("__h"))
            .orderBy("__h").limit(sample_docs).collect())
    merges = train_bpe([r["t"] for r in rows], vocab_size=vocab_size)
    kname = name if name is not None else f"bpe{vocab_size}"
    register_tokenizer(kname, make_bpe_kernel(merges), joiner="")
    return kname


def tokenizer_column(name: str, text_col: str):
    """The token-array Column for a registered kernel — ONE
    Arrow-vectorized ``pandas_udf`` call (plans that mention the
    tokens k times must materialize this once, exactly like the
    regex path's ``__pas_toks`` rule)."""
    if name not in TOKENIZER_KERNELS:
        raise ValueError(
            f"unknown tokenizer {name!r}; registered: "
            f"{sorted(TOKENIZER_KERNELS)}.  Register one with "
            f"register_tokenizer() or train one with "
            f"train_bpe_tokenizer().")
    fn, _ = TOKENIZER_KERNELS[name]
    return F.pandas_udf(fn, "array<string>")(F.col(text_col))


def tokenizer_joiner(name: str) -> str:
    if name not in TOKENIZER_KERNELS:
        raise ValueError(f"unknown tokenizer {name!r}")
    return TOKENIZER_KERNELS[name][1]
