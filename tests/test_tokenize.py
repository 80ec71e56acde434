"""Pluggable tokenizer kernels (ext/tokenize.py): BPE merge learning
vs a pure-Python oracle, losslessness, determinism, and the Spark
integration through token_stats / chunk_documents / pack_sequences."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_alchemy_spark.ext import text, tokenize
from tests.conftest import SF_DIR

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "the the the quick quick brown brown",
]


def test_train_bpe_matches_hand_oracle():
    """First merges on a tiny corpus are hand-computable.  Pre-tokens
    are 'aaab', ' aaab', ' aaab' (leading space attaches): round 1
    counts ('a','a') x6 — merged; round 2 ties ('a','b') x3 with
    ('aa','a') x3 and the lexicographic tie-break picks ('a','b');
    round 3 merges ('aa','ab') x3."""
    merges = tokenize.train_bpe(["aaab aaab aaab"], vocab_size=256 + 3)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert tokenize.bpe_encode_word("aaab", ranks) == ["aaab"]
    assert tokenize.bpe_encode_word("aab", ranks) == ["aa", "b"]
    assert tokenize.bpe_encode_word("xyz", ranks) == ["x", "y", "z"]


def test_train_bpe_deterministic_and_tie_break():
    m1 = tokenize.train_bpe(CORPUS, vocab_size=300)
    m2 = tokenize.train_bpe(CORPUS, vocab_size=300)
    assert m1 == m2
    # ties break on the lexicographically smallest pair: 'abab' has
    # ('a','b') x2 and ('b','a') x1; 'baba' the reverse — together
    # both pairs tie at 3, ('a','b') < ('b','a') wins
    m = tokenize.train_bpe(["abab baba"], vocab_size=257)
    assert m[0] == ("a", "b")


def _train_bpe_quadratic(texts, vocab_size):
    """The original full-recount merge learner, kept verbatim as the
    oracle for the incremental trainer (r9): recompute every pair
    count over every word per merge; max count, lexicographically
    smallest pair wins."""
    from collections import Counter
    wf = Counter()
    for t in texts:
        if not t:
            continue
        for w in tokenize._pretokens(t):
            wf[tuple(w.encode("utf-8").decode("latin-1"))] += 1
    merges = []
    words = dict(wf)
    for _ in range(vocab_size - 256):
        pairs = Counter()
        for w, f in words.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        if top < 2:
            break
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        ab = a + b
        new_words = {}
        for w, f in words.items():
            if len(w) >= 2:
                out = []
                i = 0
                while i < len(w):
                    if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(w[i])
                        i += 1
                w = tuple(out)
            new_words[w] = new_words.get(w, 0) + f
        words = new_words
    return merges


def test_train_bpe_incremental_matches_quadratic_oracle():
    """The r9 incremental trainer (lazy max-heap + pair->word index)
    must produce the IDENTICAL merge list the full-recount
    formulation does — including tie-breaks, overlap handling
    ('aaa'), and the top<2 stop — on corpora that exercise all
    three."""
    cases = [
        (CORPUS, 360),
        (["aaab aaab aaab"], 280),          # overlap: 'aaa' counts 2
        (["abab baba", "zz zz qq"], 300),   # ties + early stop
        (["x"], 300),                       # nothing repeats at all
        (["the cat sat on the mat", "a cat and a mat", ""], 330),
    ]
    for texts, vs in cases:
        got = tokenize.train_bpe(texts, vocab_size=vs)
        want = _train_bpe_quadratic(texts, vocab_size=vs)
        assert got == want, (texts[:1], vs)


def test_bpe_kernel_lossless_roundtrip():
    """Every kernel partitions its input: ''.join(tokens) restores
    the latin-1 byte stream exactly, including unicode and weird
    whitespace (byte-level contract)."""
    merges = tokenize.train_bpe(CORPUS, vocab_size=320)
    kern = tokenize.make_bpe_kernel(merges)
    texts = CORPUS + ["", "  leading and   runs\t\ttabs\n",
                      "café naïve 中文 emoji \U0001f600"]
    out = kern(pd.Series(texts))
    for t, toks in zip(texts, out):
        rejoined = "".join(toks).encode("latin-1").decode("utf-8")
        assert rejoined == t
    # None flows through as None
    assert kern(pd.Series([None], dtype=object))[0] is None


def test_bpe_compresses_vs_bytes():
    """Merges must actually merge: token count under BPE is strictly
    below the byte count on the training corpus (else training did
    nothing) and at least the pre-token count."""
    merges = tokenize.train_bpe(CORPUS, vocab_size=400)
    assert len(merges) > 0
    kern = tokenize.make_bpe_kernel(merges)
    toks = kern(pd.Series([CORPUS[0]]))[0]
    n_bytes = len(CORPUS[0].encode("utf-8"))
    assert len(toks) < n_bytes
    assert len(toks) >= len(CORPUS[0].split())


def test_chars4_kernel_shape():
    out = tokenize._chars4_kernel(pd.Series(["abcdefghij", "", "xy"]))
    assert list(out[0]) == ["abcd", "efgh", "ij"]
    assert list(out[1]) == []
    assert list(out[2]) == ["xy"]


def test_register_and_errors():
    with pytest.raises(ValueError, match="unknown tokenizer"):
        tokenize.tokenizer_column("nope_missing", "text")
    with pytest.raises(ValueError, match="vocab_size"):
        tokenize.train_bpe([], vocab_size=10)
    tokenize.register_tokenizer(
        "unit_ws", lambda s: s.map(
            lambda t: None if t is None else t.split()), joiner=" ")
    assert "unit_ws" in tokenize.TOKENIZER_KERNELS


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_train_bpe_tokenizer_spark_sample(docs):
    """Driver-side training on the content-addressed sample is
    deterministic and registers under the returned name."""
    n1 = tokenize.train_bpe_tokenizer(docs, vocab_size=300,
                                      sample_docs=200)
    assert n1 == "bpe300"
    k1, j1 = tokenize.TOKENIZER_KERNELS[n1]
    assert j1 == ""
    n2 = tokenize.train_bpe_tokenizer(docs, vocab_size=300,
                                      sample_docs=200, name="bpe300b")
    k2, _ = tokenize.TOKENIZER_KERNELS["bpe300b"]
    s = pd.Series(["the quick brown fox"])
    assert list(k1(s)[0]) == list(k2(s)[0])


def test_token_stats_with_kernel_matches_python(docs):
    """token_stats(tokenizer=) n_bpe_tokens == the kernel applied in
    pure pandas, row for row (the Spark plumbing adds nothing)."""
    name = tokenize.train_bpe_tokenizer(docs, vocab_size=300,
                                        sample_docs=200,
                                        name="unit_bpe_stats")
    out = (text.token_stats(docs, tokenizer=name)
           .select("doc_id", "n_ws_tokens", "n_bpe_tokens").toPandas()
           .set_index("doc_id").sort_index())
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index(
        "doc_id").sort_index()
    kern, _ = tokenize.TOKENIZER_KERNELS[name]
    want = kern(pdf.text).map(len)
    assert (out.n_bpe_tokens.to_numpy()
            == want.to_numpy()).all()
    # schema identical to the proxy path
    assert list(out.columns) == ["n_ws_tokens", "n_bpe_tokens"]


def test_chunk_documents_with_kernel_lossless(docs):
    """chunk_documents(tokenizer=, overlap=0) chunks must concatenate
    back to each document's exact byte stream (joiner '' + lossless
    kernel), and n_chunk_tokens must sum to the kernel token count."""
    name = tokenize.train_bpe_tokenizer(docs, vocab_size=280,
                                        sample_docs=100,
                                        name="unit_bpe_chunk")
    out = (text.chunk_documents(docs, chunk_tokens=32, overlap=0,
                                tokenizer=name)
           .orderBy("doc_id", "chunk_idx").toPandas())
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    kern, _ = tokenize.TOKENIZER_KERNELS[name]
    toks = {r.doc_id: kern(pd.Series([r.text]))[0]
            for r in pdf.head(50).itertuples()}
    for did, want in toks.items():
        got = out[out.doc_id == did]
        if len(want) == 0:
            assert len(got) == 0
            continue
        rejoined = "".join(got.chunk_text)
        orig = pdf[pdf.doc_id == did].text.iloc[0]
        assert rejoined.encode("latin-1").decode("utf-8") == orig
        assert got.n_chunk_tokens.sum() == len(want)


def test_pack_sequences_with_kernel(docs):
    """pack_sequences(tokenizer=) budgets in kernel tokens: n_tokens
    equals the kernel count and offsets stay contiguous per shard."""
    name = tokenize.train_bpe_tokenizer(docs, vocab_size=280,
                                        sample_docs=100,
                                        name="unit_bpe_pack")
    out = (text.pack_sequences(docs, capacity=128, n_shards=4,
                               tokenizer=name)
           .orderBy("shard", "doc_id").toPandas())
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index(
        "doc_id")
    kern, _ = tokenize.TOKENIZER_KERNELS[name]
    sample = out.head(20)
    for r in sample.itertuples():
        assert r.n_tokens == len(kern(
            pd.Series([pdf.loc[r.doc_id, "text"]]))[0])
    for sh, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        assert (g.start_offset.to_numpy()
                == (g.n_tokens.cumsum() - g.n_tokens).to_numpy()).all()
