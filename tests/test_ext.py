"""Pipeline-extension operators: dedup, similarity, text analysis,
events, multimodal plumbing.  Correctness checks use brute-force /
pandas re-implementations on the small sf0.001 tables."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_alchemy_spark.ext import dedup, events, multimodal, similarity, text
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def ev(spark):
    return events.load_events(spark, f"{SF_DIR}/events.parquet")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).toPandas()
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert len(out) == pdf.text.nunique()
    assert out.n_copies.sum() == len(pdf)


def test_minhash_vs_exact_jaccard(docs):
    """LSH candidates are verified with exact Jaccard, so every
    reported pair must match a brute-force pandas Jaccard."""
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                    threshold=0.4).toPandas()
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def shingles(t, n=3):
        toks = [w for w in "".join(c.lower() if c.isalnum() else " " for c in t).split() if w]
        return set(" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 1)))

    sh = {r.doc_id: shingles(r.text) for r in pdf.itertuples()}
    for row in pairs.itertuples():
        a, b = sh[row.id_a], sh[row.id_b]
        want = len(a & b) / len(a | b)
        assert row.jaccard == pytest.approx(want, abs=1e-9)
        assert row.jaccard >= 0.4


def test_ngram_jaccard_exact(docs):
    """ngram_jaccard_pairs is exhaustive for pairs sharing a shingle:
    it must find every pair above threshold that MinHash found."""
    mh = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16,
                                 threshold=0.5).toPandas()
    ng = dedup.ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
    mh_pairs = set(zip(mh.id_a, mh.id_b))
    ng_pairs = set(zip(ng.id_a, ng.id_b))
    assert mh_pairs <= ng_pairs


def test_simhash_symmetric_bound(docs):
    out = dedup.simhash_pairs(docs, max_hamming=3).toPandas()
    assert (out.hamming <= 3).all()
    assert (out.id_a < out.id_b).all()


def test_cosine_topk_vs_numpy(emb):
    got = similarity.cosine_topk(emb, emb.filter("vec_id < 3"), k=5).toPandas()
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.stack(pdf.embedding.to_numpy())
    ids = pdf.vec_id.to_numpy()
    for qid in [0, 1, 2]:
        qv = mat[ids == qid][0]
        cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
        order = [(i, c) for i, c in zip(ids, cos) if i != qid]
        order.sort(key=lambda t: (-t[1], t[0]))
        want_ids = [i for i, _ in order[:5]]
        got_ids = list(got[got.query_id == qid].sort_values("rank").neighbor_id)
        assert got_ids == want_ids


def test_lsh_topk_recall(emb):
    """Multi-table LSH is approximate: demand >=70% top-5 recall vs
    brute force at defaults (6 planes x 8 tables, deterministic
    hyperplanes so the number is stable; measured 92%)."""
    dim = len(emb.take(1)[0]["embedding"])
    bf = similarity.cosine_topk(emb, emb.filter("vec_id < 10"), k=5).toPandas()
    ls = similarity.lsh_topk(emb, emb.filter("vec_id < 10"), k=5, dim=dim).toPandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    ls_set = set(zip(ls.query_id, ls.neighbor_id))
    recall = len(bf_set & ls_set) / len(bf_set)
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_language_id_deterministic(docs):
    out = text.language_id(docs).select("doc_id", "lang_pred", "lang_score").toPandas()
    assert set(out.lang_pred) <= {"en", "de", "fr", "es", "unknown"}
    again = text.language_id(docs).select("doc_id", "lang_pred", "lang_score").toPandas()
    pd.testing.assert_frame_equal(out.sort_values("doc_id").reset_index(drop=True),
                                  again.sort_values("doc_id").reset_index(drop=True))


def test_quality_score_bounds(docs):
    out = text.quality_score(docs).toPandas()
    assert ((out.q_score >= 0) & (out.q_score <= 1)).all()
    assert (out.q_n_tokens > 0).all()


def test_token_stats_vs_python(docs):
    out = text.token_stats(docs).drop("text").toPandas()
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    merged = out.merge(pdf[["doc_id", "text"]], on="doc_id")
    for row in merged.head(20).itertuples():
        toks = [w for w in "".join(
            c.lower() if c.isalnum() else " " for c in row.text).split() if w]
        assert row.n_ws_tokens == len(toks)
        bpe = sum(math.ceil(len(t) / 4) for t in toks) + sum(
            1 for c in row.text if not (c.isalnum() or c.isspace()))
        assert row.n_bpe_tokens == bpe


def test_fingerprint_collisions(docs):
    out = text.fingerprint(docs).toPandas()
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def fp_key(t):
        toks = sorted(set(w for w in "".join(
            c.lower() if c.isalnum() else " " for c in t).split() if w))
        return " ".join(toks)

    want_distinct = pdf.text.map(fp_key).nunique()
    assert out.fingerprint.nunique() == want_distinct


def test_tumbling_window_agg(ev):
    out = events.tumbling_window_agg(ev).toPandas()
    raw = ev.toPandas()
    want = (raw.assign(window_start=raw.ts.dt.floor("h"))
            .groupby(["window_start", "event_type"])
            .agg(n_events=("event_id", "count"),
                 sum_value=("value", "sum"),
                 n_users=("user_id", "nunique")).reset_index())
    assert len(out) == len(want)
    m = out.merge(want, on=["window_start", "event_type"], suffixes=("", "_w"))
    assert (m.n_events == m.n_events_w).all()
    assert np.allclose(m.sum_value, m.sum_value_w.round(4))
    assert (m.n_users == m.n_users_w).all()


def test_sessionize(ev):
    out = events.sessionize(ev, gap_minutes=30).toPandas()
    assert (out.session_start <= out.session_end).all()
    raw = ev.toPandas()
    assert out.n_events.sum() == len(raw)
    one = raw[raw.user_id == raw.user_id.iloc[0]].sort_values("ts")
    gaps = one.ts.diff().dt.total_seconds()
    want_sessions = 1 + (gaps > 1800).sum()
    assert len(out[out.user_id == one.user_id.iloc[0]]) == want_sessions


def test_multimodal_plumbing(docs):
    mm = multimodal.attach_fake_payload(docs)
    assert dict(mm.dtypes)["payload"] == "binary"
    dec = multimodal.decode_media(mm)
    out = dec.toPandas()
    assert len(out) == docs.count()
    assert (out.width.between(16, 255)).all()
    assert out.feature.map(len).eq(8).all()
    stats = multimodal.media_stats(dec).toPandas()
    assert stats.n_items.sum() == len(out)


def test_multimodal_resize_and_frames(docs):
    mm = multimodal.attach_fake_payload(docs)
    rs = multimodal.resize_media(mm, max_w=64, max_h=64).toPandas()
    assert len(rs) == docs.count()
    assert (rs.width <= 64).all() and (rs.height <= 64).all()
    assert (rs.width > 0).all()
    fr = multimodal.sample_frames(mm).toPandas()
    # stills yield exactly one frame; temporal media 1..5
    per_doc = fr.groupby(["doc_id", "media_type"]).frame_idx.count()
    stills = per_doc[per_doc.index.get_level_values(1) != "audio/wav"]
    assert (stills == 1).all()
    audio = per_doc[per_doc.index.get_level_values(1) == "audio/wav"]
    assert audio.between(1, 5).all() and (audio > 1).any()
    assert fr.frame_feature.map(len).eq(4).all()


def test_normalize_text_pii(spark):
    from pandas_alchemy_spark.ext import text
    df = spark.createDataFrame(
        [(1, "Contact Bob.Smith+x@corp.example.COM  or +1 (415) 555-0199 now"),
         (2, "server at 10.0.42.7 \x01\x02 DOWN"),
         (3, "just  plain   text")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["norm_text"]
           for r in text.normalize_text(df).collect()}
    assert got[1] == "contact [email] or [phone] now"
    assert got[2] == "server at [ip] down"
    assert got[3] == "just plain text"


def test_repetition_stats(spark):
    from pandas_alchemy_spark.ext import text
    df = spark.createDataFrame(
        [(1, "a b a b a b"),     # grams: ab ba ab ba ab -> top 3 of 5
         (2, "x y z"),           # grams: xy yz -> no repeats
         (3, "solo")],           # 1 token -> no grams
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
    assert rows[1]["n_2grams"] == 5
    assert rows[1]["n_distinct_2grams"] == 2
    assert rows[1]["top_2gram_count"] == 3
    assert rows[2]["top_2gram_count"] == 1
    assert rows[3]["n_2grams"] == 0
    assert rows[3]["top_2gram_count"] == 0
    assert rows[3]["dup_2gram_frac"] == 0.0


def test_ivf_topk_recall(emb):
    """IVF ANN is approximate: demand >=70% top-5 recall vs brute
    force at nlist=16/nprobe=6 on the 500-vector corpus (deterministic
    seed pick so the number is stable)."""
    dim = len(emb.take(1)[0]["embedding"])
    bf = similarity.cosine_topk(emb, emb.filter("vec_id < 10"), k=5).toPandas()
    iv = similarity.ivf_topk(emb, emb.filter("vec_id < 10"), k=5, dim=dim,
                             nlist=16, nprobe=6).toPandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    iv_set = set(zip(iv.query_id, iv.neighbor_id))
    recall = len(bf_set & iv_set) / len(bf_set)
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_ivf_auto_recall_contract(emb):
    """RECALL CONTRACT for the auto geometry (r7 verdict item 1: the
    fixed nlist=16/nprobe=4 default measured 0.763 recall@5 at 200k
    vectors with no floor anywhere).  nlist='auto' sizes cells to
    ~sqrt(n); nprobe='auto' runs the analytic tuner against a sampled
    truth set for target 0.9.  The tuner's estimate comes from a
    64-query sample, so the full-query-set recall is asserted at 0.8
    (sampling margin); the LSH contract has the same shape."""
    dim = len(emb.take(1)[0]["embedding"])
    bf = similarity.cosine_topk(emb, emb.filter("vec_id < 10"), k=5).toPandas()
    iv = similarity.ivf_topk(emb, emb.filter("vec_id < 10"), k=5,
                             dim=dim).toPandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    iv_set = set(zip(iv.query_id, iv.neighbor_id))
    recall = len(bf_set & iv_set) / len(bf_set)
    assert recall >= 0.8, f"auto-IVF recall below contract: {recall}"


def test_ivf_nprobe_tuner_estimate(emb):
    """The tuner itself must hit its target on the sample it tuned
    against, pick a minimal probe count (nprobe <= nlist), and be
    deterministic (content-addressed sample, no RNG)."""
    dim = len(emb.take(1)[0]["embedding"])
    cents = similarity.train_ivf_centroids(emb, dim=dim, nlist="auto")
    np1, est1 = similarity.tune_ivf_nprobe(emb, cents,
                                           target_recall=0.9, k=5)
    np2, est2 = similarity.tune_ivf_nprobe(emb, cents,
                                           target_recall=0.9, k=5)
    assert (np1, est1) == (np2, est2)
    assert 1 <= np1 <= len(cents)
    assert est1 >= 0.9
    # a lower target can never need more probes
    np_low, _ = similarity.tune_ivf_nprobe(emb, cents,
                                           target_recall=0.5, k=5)
    assert np_low <= np1


def test_ivf_index_build_search_pruned(spark, emb, tmp_path):
    """Persistent IVF index (build_ivf_index / search_ivf_index): the
    search must (a) read ONLY the probed cells' partition directories
    (partition pruning — checked via input_file_name), (b) reach the
    same recall floor as in-memory ivf_topk at equal geometry, and
    (c) reload centroids from the sidecar."""
    dim = len(emb.take(1)[0]["embedding"])
    path = str(tmp_path / "ivf_idx")
    cents = similarity.build_ivf_index(emb, path, dim=dim, nlist=16)
    assert len(cents) == 16
    q = emb.filter("vec_id < 10")
    got = similarity.search_ivf_index(spark, path, q, k=5, nprobe=6)
    bf = similarity.cosine_topk(emb, q, k=5).toPandas()
    gp = got.toPandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    iv_set = set(zip(gp.query_id, gp.neighbor_id))
    assert len(bf_set & iv_set) / len(bf_set) >= 0.7
    # pruning: the scan of the probed-cell filter touches at most
    # (distinct probed cells) partition directories — use a narrow
    # query set (2 queries x 3 probes) so the union is a strict
    # subset of the 16 cells
    import numpy as np
    C = np.asarray(cents)
    half = 0.5 * (C * C).sum(axis=1)
    qv = np.stack([np.asarray(r["embedding"], dtype=float)
                   for r in emb.filter("vec_id < 2").collect()])
    probed = {int(c) for row in np.argsort(-(qv @ C.T - half), axis=1)
              [:, :3] for c in row}
    assert len(probed) < 16
    touched = (spark.read.parquet(path)
               .filter(F.col("cell").isin(sorted(probed)))
               .select(F.input_file_name().alias("f"))
               .distinct().collect())
    dirs = {r["f"].rsplit("/", 2)[-2] for r in touched}
    assert dirs <= {f"cell={c}" for c in probed}
    assert len(dirs) < 16  # strictly fewer than all cells
    # sidecar round-trip: search without passing centroids/cols
    again = similarity.search_ivf_index(spark, path, q, k=5, nprobe=6)
    assert (again.toPandas().sort_values(["query_id", "rank"])
            .neighbor_id.tolist()
            == gp.sort_values(["query_id", "rank"])
            .neighbor_id.tolist())
    # r9: no dedup shuffle on the index query path — (query, neighbor)
    # is unique BY CONSTRUCTION (one cell directory per corpus vector,
    # distinct (query, cell) probe rows), so the plan must carry no
    # Aggregate/Deduplicate between the cell join and the ranking
    # window (the r8 defensive dropDuplicates added one no-op
    # exchange).  Value-level: a duplicated pair would surface twice
    # with consecutive ranks.
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan and "Deduplicate" not in plan
    assert not gp.duplicated(["query_id", "neighbor_id"]).any()
    # r9: nprobe="auto" (the default) tunes against the WRITTEN table
    # — recall-honest indexed search, same contract as ivf_topk
    tuned = similarity.search_ivf_index(spark, path, q, k=5)
    tp = tuned.toPandas()
    tn_set = set(zip(tp.query_id, tp.neighbor_id))
    assert len(bf_set & tn_set) / len(bf_set) >= 0.7
    # r10 (ADVICE r9): the tune result is cached in the index dir
    # keyed by (target_recall, k) — a second "auto" search reuses it
    # (no second brute-force tuner pass) and returns the same frame
    import json as _json
    import os as _os
    side = _os.path.join(path, "_ivf_nprobe.json")
    assert _os.path.exists(side)
    cache1 = _json.load(open(side))
    assert "r0.9000@k5" in cache1
    t2 = similarity.search_ivf_index(spark, path, q, k=5).toPandas()
    assert _json.load(open(side)) == cache1  # reused, not re-tuned
    assert (t2.sort_values(["query_id", "rank"]).neighbor_id.tolist()
            == tp.sort_values(["query_id", "rank"])
            .neighbor_id.tolist())
    # a different target_recall gets its own cache key
    similarity.search_ivf_index(spark, path, q, k=5,
                                target_recall=0.5)
    assert "r0.5000@k5" in _json.load(open(side))
    with pytest.raises(ValueError, match="nprobe"):
        similarity.search_ivf_index(spark, path, q, k=5, nprobe=0)


def test_ivf_index_append_equals_rebuild(spark, emb, tmp_path):
    """append_to_ivf_index (r10): growing the index in place under
    the frozen centroid sidecar must be search-VALUE-EQUAL to a
    from-scratch rebuild on the union with the same centroids (hard
    assignment is a pure function of (vector, centroids) — only file
    layout may differ), must cost one pass over the NEW batch only
    (old cell files untouched), and must invalidate the tuned-nprobe
    cache (the recall point belongs to the written data)."""
    import json as _json
    import os as _os
    dim = len(emb.take(1)[0]["embedding"])
    old = emb.filter("vec_id % 5 <> 0")
    new = emb.filter("vec_id % 5 = 0")
    grown = str(tmp_path / "grown")
    rebuilt = str(tmp_path / "rebuilt")
    cents = similarity.build_ivf_index(old, grown, dim=dim, nlist=16)
    pre_files = {f for _, _, fs in _os.walk(grown) for f in fs
                 if f.endswith(".parquet")}
    # seed a tuned-nprobe cache entry; the append must drop it
    with open(_os.path.join(grown, "_ivf_nprobe.json"), "w") as fh:
        _json.dump({"r0.9000@k5": {"nprobe": 3, "est": 0.9}}, fh)
    n = similarity.append_to_ivf_index(new, grown)
    assert n == new.count() > 0
    assert not _os.path.exists(_os.path.join(grown,
                                             "_ivf_nprobe.json"))
    post_files = {f for _, _, fs in _os.walk(grown) for f in fs
                  if f.endswith(".parquet")}
    assert pre_files <= post_files  # old cell files untouched
    similarity.build_ivf_index(emb, rebuilt, dim=dim, nlist=16,
                               centroids=cents)
    q = emb.filter("vec_id < 8")
    a = (similarity.search_ivf_index(spark, grown, q, k=5, nprobe=4)
         .toPandas().sort_values(["query_id", "rank"]))
    b = (similarity.search_ivf_index(spark, rebuilt, q, k=5, nprobe=4)
         .toPandas().sort_values(["query_id", "rank"]))
    assert a.neighbor_id.tolist() == b.neighbor_id.tolist()
    assert np.allclose(a.cosine.values, b.cosine.values)
    # per-cell row counts agree with the union
    ga = (spark.read.parquet(grown).groupBy("cell").count()
          .toPandas().set_index("cell")["count"].sort_index())
    gb = (spark.read.parquet(rebuilt).groupBy("cell").count()
          .toPandas().set_index("cell")["count"].sort_index())
    assert ga.equals(gb)
    # appending an empty batch is a no-op that still reports 0
    assert similarity.append_to_ivf_index(
        new.filter("vec_id < 0"), grown) == 0


def test_ivf_centroids_deterministic(emb):
    dim = len(emb.take(1)[0]["embedding"])
    c1 = similarity.train_ivf_centroids(emb, dim=dim, nlist=8)
    c2 = similarity.train_ivf_centroids(emb, dim=dim, nlist=8)
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0]) == dim


def test_connected_components(spark):
    from pandas_alchemy_spark.ext import dedup
    # two chains + an isolated pair: {1-2-3}, {10-11}, {20-21-22-23}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_deep_chain_shortcut(spark, monkeypatch):
    """r13 pointer-jump + round-1 init: a 17-vertex chain (diameter
    16) must converge WITHIN a round budget the plain 1-hop-per-round
    propagation could not meet (it needs ~16 rounds), and the labels
    must equal the min reachable id.  Pins both the shortcut's
    existence and its fixpoint-preserving correctness.  (Floor
    patched to 0 — this pins the DISTRIBUTED loop; the r13 driver
    union-find would otherwise absorb a graph this small.)"""
    from pandas_alchemy_spark.ext import dedup
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 0)
    chain = [(i, i + 1) for i in range(16)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(
               pairs, max_iters=12).collect()}
    assert got == {i: 0 for i in range(17)}


def test_connected_components_shallow_clique_fast(spark, monkeypatch):
    """Shallow graphs (the dominant near-dup shape at scale) must
    converge in ONE loop round post-init — the doc-scale contract the
    r13 round-1 initialization created; the pointer-jump gate keys
    off exactly this.  (Floor patched to 0 to pin the distributed
    loop.)"""
    from pandas_alchemy_spark.ext import dedup
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGE_FLOOR", 0)
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pairs = spark.createDataFrame(clique + [(10, 11)],
                                  "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(
               pairs, max_iters=1).collect()}
    assert got == {**{i: 0 for i in range(5)}, 10: 10, 11: 10}


def test_cluster_near_dups(docs):
    from pandas_alchemy_spark.ext import dedup
    out = dedup.cluster_near_dups(docs, threshold=0.5).toPandas()
    assert len(out) == docs.count()
    # component rep is its own min and marked keep
    reps = out[out.keep]
    assert (reps.id == reps.component).all()
    # transitivity: every component's min id is the component label
    gmin = out.groupby("component")["id"].min()
    assert (gmin.index == gmin.values).all()
    # clustering must not keep MORE docs than pairwise dedup drops
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    assert len(reps) <= len(out) - len(set(pairs.id_b))


def test_embed_media_to_ann(docs, spark):
    """Multimodal -> embedding -> ANN end-to-end: fake payloads get
    deterministic unit embeddings; cosine_topk runs on them."""
    from pandas_alchemy_spark.ext import multimodal, similarity
    pay = multimodal.attach_fake_payload(docs)
    emb = multimodal.embed_media(pay, dim=16)
    first = emb.orderBy("doc_id").limit(3).collect()
    again = multimodal.embed_media(pay, dim=16).orderBy("doc_id").limit(3).collect()
    assert [r["embedding"] for r in first] == [r["embedding"] for r in again]
    import numpy as np
    for r in first:
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-5
    top = similarity.cosine_topk(
        emb, emb.filter("doc_id < 3"), k=3,
        id_col="doc_id", vec_col="embedding").toPandas()
    assert set(top.query("rank == 1").query_id) == {0, 1, 2}
    assert (top.cosine <= 1.0 + 1e-6).all()


def test_funnel_ordering(spark):
    from pandas_alchemy_spark.ext import events as ev
    import datetime as dt
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: full ordered funnel
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: click BEFORE view -> stops at step0
        (2, t(5), "click"), (2, t(6), "view"),
        # user 3: view+click, purchase before click -> stops at step1
        (3, t(1), "view"), (3, t(4), "click"), (3, t(2), "purchase"),
        # user 4: never viewed
        (4, t(1), "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, ts, et) for u, ts, et in rows],
        "user_id long, ts timestamp, event_type string")
    out = ev.funnel(df, ["view", "click", "purchase"]).collect()[0]
    assert (out["n_step0"], out["n_step1"], out["n_step2"]) == (3, 2, 1)


def test_top_terms(docs):
    from pandas_alchemy_spark.ext import text
    out = text.top_terms(docs, k=10).toPandas()
    assert len(out) == 10
    assert (out.tf.values == sorted(out.tf.values, reverse=True)).all()


def test_curate_corpus_end_to_end(spark):
    from pandas_alchemy_spark.ext import pipeline
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = pipeline.curate_corpus(docs, min_quality=0.2,
                                     near_dup_threshold=0.5,
                                     capacity=1024, n_shards=4)
    n_raw = docs.count()
    rows = curated.collect()
    assert 0 < len(rows) <= n_raw
    # one row per kept doc, no duplicates
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    # each kept doc is its own cluster representative
    assert all(r["component"] == r["doc_id"] for r in rows)
    # deterministic: re-running the whole pipeline reproduces exactly
    again = {(r["doc_id"], r["shard"], r["bin"]) for r in
             pipeline.curate_corpus(docs, min_quality=0.2,
                                    near_dup_threshold=0.5,
                                    capacity=1024, n_shards=4).collect()}
    assert again == {(r["doc_id"], r["shard"], r["bin"]) for r in rows}
    stats = pipeline.curation_stats(curated).collect()[0]
    assert stats["n_docs"] == len(rows)
    assert stats["n_tokens"] > 0 and stats["n_bins"] > 0


def test_fast_hash_minhash_agrees_with_md5_path(spark):
    """xxhash64 fast path: same candidate QUALITY as the md5/oracle
    path — the exact-Jaccard verify makes the pair set nearly
    identical (signatures differ, the verified pairs shouldn't)."""
    from pandas_alchemy_spark.ext import dedup
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    slow = {(r["id_a"], r["id_b"]) for r in
            dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                    threshold=0.4).collect()}
    fast = {(r["id_a"], r["id_b"]) for r in
            dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                    threshold=0.4,
                                    fast_hash=True).collect()}
    # both paths verify with exact Jaccard, so overlap must be high
    assert slow and fast
    inter = len(slow & fast)
    assert inter / max(len(slow), len(fast)) >= 0.9


# --------------------------------------------------- corpus mixture

def test_mix_corpora_weights(docs):
    """Equal-weight mixture: every domain's sampled unit total lands
    near the limiting domain's total; the limiting domain survives
    whole (frac 1.0)."""
    from pandas_alchemy_spark.ext.pipeline import mix_corpora
    weights = {"en": 1, "de": 1, "fr": 1}
    mixed = mix_corpora(docs, weights, by="lang")
    counts = {r["lang"]: r["count"]
              for r in mixed.groupBy("lang").count().collect()}
    avail = {r["lang"]: r["count"]
             for r in docs.groupBy("lang").count().collect()}
    limiting = min(weights, key=lambda d: avail[d])
    assert counts[limiting] == avail[limiting]
    target = avail[limiting]
    for d in weights:
        assert abs(counts[d] - target) / target < 0.5  # binomial slop
    # domains outside the mixture drop entirely
    assert set(counts) == set(weights)


def test_mix_corpora_target_and_determinism(docs):
    from pandas_alchemy_spark.ext.pipeline import mix_corpora
    a = mix_corpora(docs, {"en": 2, "zh": 1}, by="lang",
                    unit_col="n_chars", target_units=20000)
    b = mix_corpora(docs, {"en": 2, "zh": 1}, by="lang",
                    unit_col="n_chars", target_units=20000)
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b
    total = a.agg(F.sum("n_chars")).collect()[0][0]
    assert total < 2 * 20000  # capped near the target


def test_mix_corpora_validation(docs):
    from pandas_alchemy_spark.ext.pipeline import mix_corpora
    with pytest.raises(ValueError, match="non-empty"):
        mix_corpora(docs, {}, by="lang")
    with pytest.raises(ValueError, match="non-negative"):
        mix_corpora(docs, {"en": -1}, by="lang")
    with pytest.raises(ValueError, match="no rows"):
        mix_corpora(docs, {"klingon": 1}, by="lang")


# --------------------------- round-5 dedup review regressions


def test_tokenless_docs_never_near_dup(spark):
    """Token-less docs (non-Latin under the ASCII tokenizer, pure
    punctuation) must produce NO shingles — the bare expression
    emitted [''] and unrelated docs verified at jaccard 1.0."""
    pdf = __import__("pandas").DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["你好世界 这是文本", "!!! ???", "hello world foo",
                 "hello world foo"]})
    sdf = spark.createDataFrame(pdf)
    pairs = dedup.minhash_lsh_pairs(sdf, num_hashes=16, bands=4,
                                    shingle_n=2, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(3, 4)}  # only the real duplicates
    jac = dedup.ngram_jaccard_pairs(sdf, n=2, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in jac.collect()}
    assert got == {(3, 4)}


def test_minhash_band_validation(spark, docs):
    import pytest
    with pytest.raises(ValueError, match="multiple"):
        dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="multiple"):
        dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=10)


def test_dedup_paragraphs_regex_sep(spark):
    pdf = __import__("pandas").DataFrame({
        "doc_id": [1, 2],
        "text": ["alpha beta|shared para", "gamma delta|shared para"]})
    sdf = spark.createDataFrame(pdf)
    out = {r["doc_id"]: r["text_deduped"]
           for r in dedup.dedup_paragraphs(sdf, sep="|").collect()}
    # '|' must split LITERALLY (it is a regex metachar); the shared
    # paragraph survives only in doc 1
    assert out[1] == "alpha beta|shared para"
    assert out[2] == "gamma delta"


def test_simhash_60_bit_chunks(spark, docs):
    sig = dedup.simhash_signature(docs.limit(20))
    vals = [r["sh"] for r in sig.collect()]
    assert all(0 <= v < (1 << 60) for v in vals)


# ------------------------ round-5 similarity review regressions


def test_ann_tolerates_null_embeddings(spark, emb):
    from pyspark.sql import functions as F
    dim = len(emb.select("embedding").head()[0])
    withnull = emb.limit(50).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("embedding")))
    q = withnull.filter("vec_id % 11 = 1").limit(3)
    out = similarity.lsh_topk(withnull, q, k=3, dim=dim)
    assert out.count() >= 0  # no ragged-batch crash
    pairs = similarity.embedding_near_dup_pairs(
        withnull, dim=dim, planes=8, threshold=0.2)
    assert pairs.count() >= 0
    out2 = similarity.ivf_topk(withnull, q, k=3, dim=dim, nlist=4)
    assert out2.count() >= 0


def test_ivf_training_validation(spark, emb):
    import pytest
    dim = len(emb.select("embedding").head()[0])
    with pytest.raises(ValueError, match="does not match"):
        similarity.train_ivf_centroids(emb.limit(20), dim=dim // 2,
                                       nlist=4)
    with pytest.raises(ValueError, match="no training vectors"):
        similarity.train_ivf_centroids(emb.limit(0), dim=dim,
                                       nlist=4)


# ------------------------- round-5 text review regressions


def test_phone_pattern_spares_dates(spark):
    pdf = __import__("pandas").DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["meeting on 2026-08-14 07:53 in room 4",
                 "pi digits 3 1 4 1 5 9 2 6 5",
                 "call 202-555-0147 or +14155550123 now"]})
    out = {r["doc_id"]: r["norm_text"]
           for r in text.normalize_text(
               spark.createDataFrame(pdf)).collect()}
    assert "2026-08-14" in out[1] and "[phone]" not in out[1]
    assert "[phone]" not in out[2]
    assert out[3].count("[phone]") == 2


def test_pack_sequences_null_and_duplicate_ids(spark):
    pdf = __import__("pandas").DataFrame({
        "doc_id": [0, 1, 2], "text": ["a b c", None, "d e f g"]})
    out = {r["doc_id"]: (r["n_tokens"], r["start_offset"])
           for r in text.pack_sequences(
               spark.createDataFrame(pdf), capacity=4,
               n_shards=1).collect()}
    assert out[1][0] == 0          # null text = 0 tokens, not -1
    assert out[2][1] == 3          # offsets never decremented
    dup = __import__("pandas").DataFrame({
        "doc_id": [1, 1, 2], "text": ["a b", "c d e", "f"]})
    rows = text.pack_sequences(spark.createDataFrame(dup),
                               capacity=4, n_shards=1).collect()
    offs = sorted(r["start_offset"] for r in rows)
    assert offs == [0, 2, 5]       # ROWS frame: no peer absorption


def test_token_stats_null_text(spark):
    pdf = __import__("pandas").DataFrame({
        "doc_id": [1, 2], "text": ["two words", None]})
    out = {r["doc_id"]: r["n_ws_tokens"]
           for r in text.token_stats(
               spark.createDataFrame(pdf)).collect()}
    assert out[2] == 0  # not -1


# ---------------------- round-5 events review regressions


def test_sessionize_subsecond_gap(spark):
    import pandas as _pd
    pdf = _pd.DataFrame({
        "user_id": [1, 1],
        "ts": _pd.to_datetime(["2024-01-01 00:00:00.000000",
                               "2024-01-01 00:30:00.500000"]),
        "event_type": ["a", "a"], "value": [1.0, 1.0],
        "event_id": [1, 2], "props": ["{}", "{}"]})
    out = events.sessionize(spark.createDataFrame(pdf))
    # gap is 1800.5s > 30min -> TWO sessions (whole-second
    # truncation said 1800 and merged them)
    assert out.count() == 2


def test_densify_time_pre_epoch_and_null_keys(spark):
    import pandas as _pd
    pdf = _pd.DataFrame({
        "ts": _pd.to_datetime(["1969-12-31 23:59:59",
                               "1970-01-01 00:30:00"]),
        "k": [None, "a"], "v": [1, 2]})
    out = events.densify_time(spark.createDataFrame(pdf), "ts", 3600,
                              by="k").collect()
    vals = {(str(r["ts"]), r["k"]): r["v"] for r in out}
    # pre-epoch row buckets to its floor hour (not truncated-to-zero)
    assert vals[("1969-12-31 23:00:00", None)] == 1
    # NULL group key survives the null-safe join
    assert vals[("1970-01-01 00:00:00", "a")] == 2


def test_tumbling_arbitrary_width(spark, ev):
    out = events.tumbling_window_agg(ev, window="15 minutes")
    assert out.count() > 0
    import pytest
    with pytest.raises(ValueError, match="unsupported window"):
        events.tumbling_window_agg(ev, window="1 month")


def test_emb_near_dup_auto_planes(spark):
    """planes='auto' sizes the bucket count to the corpus and keeps
    the same pair semantics (recall may differ per LSH contract; the
    exact-cosine verify keeps precision at 1)."""
    from pandas_alchemy_spark.ext import similarity
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").head(1)[0][0])
    out = similarity.embedding_near_dup_pairs(
        emb, dim=dim, planes="auto", threshold=0.9)
    rows = out.collect()
    # exact verify: every emitted pair really is >= threshold
    assert all(r["cosine"] >= 0.9 for r in rows)
    import pytest as _pt
    with _pt.raises(ValueError, match="positive int or 'auto'"):
        similarity.embedding_near_dup_pairs(emb, dim=dim, planes=0)
    with _pt.raises(ValueError, match="positive int or 'auto'"):
        similarity.embedding_near_dup_pairs(emb, dim=dim, tables=0)


def test_emb_near_dup_cost_only_auto(spark):
    """target_recall=None selects cost-only auto planes (throughput
    mode for low-threshold screening): no recall clamp, fixed tables
    required, exact-cosine verify still guarantees precision 1."""
    import pytest as _pt

    from pandas_alchemy_spark.ext import similarity
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").head(1)[0][0])
    out = similarity.embedding_near_dup_pairs(
        emb, dim=dim, planes="auto", tables=2, target_recall=None,
        threshold=0.45)
    rows = out.collect()
    assert all(r["cosine"] >= 0.45 for r in rows)
    # tables='auto' has no L without a recall target
    with _pt.raises(ValueError, match="target_recall"):
        similarity.embedding_near_dup_pairs(
            emb, dim=dim, planes="auto", tables="auto",
            target_recall=None)


def test_lsh_auto_tables_geometry():
    """tables='auto' sizes L for the target recall from the public
    sign-LSH collision model p = 1 - acos(s)/pi; the cap binds (and
    warns) when the threshold is too low to reach cheaply."""
    import math

    from pandas_alchemy_spark.ext import similarity as sim
    p95 = sim.lsh_collision_prob(0.95)
    assert abs(p95 - (1 - math.acos(0.95) / math.pi)) < 1e-12
    L = sim._auto_tables(13, 0.95, target_recall=0.9)
    # the chosen L actually achieves the target
    assert 1 - (1 - p95 ** 13) ** L >= 0.9
    # and L-1 would not (minimality)
    assert 1 - (1 - p95 ** 13) ** (L - 1) < 0.9
    # low threshold + many planes -> cap binds
    assert sim._auto_tables(13, 0.45, target_recall=0.9) == 32


def test_emb_near_dup_auto_tables_recall(spark):
    """planes='auto', tables='auto' at a high threshold must actually
    recall planted near-duplicates (the r6 geometry was time-verified
    only; this pins the recall half on a live corpus)."""
    import pyspark.sql.functions as F

    from pandas_alchemy_spark.ext import similarity
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").head(1)[0][0])
    # plant perturbed copies of every 10th vector at cosine ~0.97
    noise = (f"transform(embedding, (x, i) -> CAST(x + 0.25 * "
             f"sqrt(aggregate(embedding, cast(0.0 as double), "
             f"(s, v) -> s + v * v) / {dim}) * sqrt(3.0) * "
             f"(pmod(xxhash64(vec_id, i), 1000003) / 1000003.0 * 2.0 "
             f"- 1.0) AS FLOAT))")
    planted = (emb.filter(F.col("vec_id") % 10 == 0)
               .withColumn("vec_id", F.col("vec_id") + 1_000_000)
               .withColumn("embedding", F.expr(noise)))
    truth = {(r[0], r[0] + 1_000_000)
             for r in planted.select(F.col("vec_id") - 1_000_000)
             .collect()}
    out = similarity.embedding_near_dup_pairs(
        emb.unionAll(planted), dim=dim, planes="auto", tables="auto",
        threshold=0.93)
    found = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
             for r in out.collect()}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.85, f"planted-pair recall {recall}"


def test_decontaminate_mark_and_drop(spark):
    """decontaminate vs a hand-computed pure-pandas oracle: per-doc
    count of distinct n-grams shared with the eval set, and the drop
    mode's min_hits gate."""
    import re as _re

    from pandas_alchemy_spark.ext import dedup as dd
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the quick brown fox sleeps all day long"),
        (4, "completely unrelated text about spark engines"),
        (5, ""),  # token-less: must never match anything
    ]
    ev_rows = [(100, "the quick brown fox jumps far"),
               (101, "five dozen liquor jugs")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")

    def grams(t, n=3):
        toks = [w for w in _re.split(r"[^a-zA-Z0-9]+", t.lower()) if w]
        if not toks:
            return set()
        return {" ".join(toks[i:i + n])
                for i in range(max(len(toks) - n, 0) + 1)}

    evg = set().union(*(grams(t) for _, t in ev_rows))
    want = {i: len(grams(t) & evg) for i, t in rows}

    got = {r["doc_id"]: r["n_contam_ngrams"]
           for r in dd.decontaminate(docs, ev, n=3).collect()}
    assert got == want, (got, want)
    kept = {r["doc_id"]
            for r in dd.decontaminate(docs, ev, n=3,
                                      mode="drop").collect()}
    assert kept == {i for i, w in want.items() if w == 0}
    kept2 = {r["doc_id"]
             for r in dd.decontaminate(docs, ev, n=3, mode="drop",
                                       min_hits=3).collect()}
    assert kept2 == {i for i, w in want.items() if w < 3}
    with pytest.raises(ValueError, match="mode must be"):
        dd.decontaminate(docs, ev, mode="purge")
    with pytest.raises(ValueError, match="positive integer"):
        dd.decontaminate(docs, ev, n=0)


def test_decontaminate_broadcasts_eval(spark):
    """The eval-gram side must reach the join as a broadcast (the
    corpus is never shuffled into the candidate join)."""
    from pandas_alchemy_spark.ext import dedup as dd
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter("doc_id % 97 = 0")
    plan = (dd.decontaminate(docs, ev, n=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_decontaminate_idempotent_and_min_hits_guard(spark):
    from pandas_alchemy_spark.ext import dedup as dd
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "omega psi chi phi")],
        "doc_id long, text string")
    ev = spark.createDataFrame([(9, "alpha beta gamma")],
                               "doc_id long, text string")
    once = dd.decontaminate(docs, ev, n=3)
    twice = dd.decontaminate(once, ev, n=3)  # re-mark: no dup column
    assert twice.columns.count("n_contam_ngrams") == 1
    got = {r["doc_id"]: r["n_contam_ngrams"] for r in twice.collect()}
    assert got == {1: 1, 2: 0}
    with pytest.raises(ValueError, match="min_hits must be"):
        dd.decontaminate(docs, ev, mode="drop", min_hits=0)


def test_curate_corpus_decontaminate_stage(spark, docs):
    """eval_df= switches on the decontamination gate first: every doc
    sharing an n-gram with the eval slice drops before curation, and
    the default (eval_df=None) plan is unchanged."""
    from pandas_alchemy_spark.ext import dedup, pipeline
    ev = docs.filter("doc_id % 101 = 0")
    base = pipeline.curate_corpus(
        docs, min_quality=0.2, near_dup_threshold=0.4,
        capacity=2048, n_shards=8, num_hashes=16, bands=4)
    dec = pipeline.curate_corpus(
        docs, min_quality=0.2, near_dup_threshold=0.4,
        capacity=2048, n_shards=8, num_hashes=16, bands=4,
        eval_df=ev, decontam_n=5)
    contaminated = {
        r["doc_id"]
        for r in dedup.decontaminate(docs, ev, n=5)
        .filter("n_contam_ngrams >= 1").select("doc_id").collect()}
    kept_dec = {r["doc_id"] for r in dec.select("doc_id").collect()}
    kept_base = {r["doc_id"] for r in base.select("doc_id").collect()}
    assert kept_dec.isdisjoint(contaminated)
    # the decon gate only ever REMOVES docs relative to the baseline
    # (up to near-dup representative reshuffling within components;
    # the doc count can only shrink)
    assert len(kept_dec) <= len(kept_base)
    assert kept_dec  # something survives


def test_curate_from_raw_text_shards(spark, tmp_path):
    """The raw-corpus user story end-to-end: .txt shards ->
    read_text(wholetext) -> content-addressed ids -> curate_corpus.
    Near-dup whitespace/case variants collapse; the short junk shard
    fails the quality gate."""
    import pyspark.sql.functions as F

    from pandas_alchemy_spark.ext import pipeline
    from pandas_alchemy_spark.sources import io as pio
    d = tmp_path / "shards"
    d.mkdir()
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to the hills where it rests for a while "
            "before it returns to the farm for the night")
    (d / "a.txt").write_text(base)
    (d / "b.txt").write_text(base.upper())      # exact dup after normalize
    (d / "junk.txt").write_text("x")            # fails the quality gate
    docs = (pio.read_text(str(d), wholetext=True).to_spark(index=False)
            .withColumn("doc_id", F.xxhash64("text")))
    curated = pipeline.curate_corpus(docs, min_quality=0.2,
                                     capacity=64, n_shards=2)
    rows = curated.collect()
    # the two case-variants fold to ONE representative; junk is gone
    assert len(rows) == 1
    assert rows[0]["n_tokens"] > 20


# ------------------------- round-7: context-window chunking


def _py_chunks(text_s, chunk, overlap):
    import re
    toks = [t for t in re.sub(r"[^a-zA-Z0-9]+", " ", text_s or "")
            .lower().split(" ") if t]
    n, stride, out, start, i = len(toks), chunk - overlap, [], 0, 0
    if n == 0:
        return out
    while True:
        piece = toks[start:start + chunk]
        out.append((i, start, len(piece), " ".join(piece)))
        i += 1
        start += stride
        if start > max(n - overlap - 1, 0):
            break
    return out


def test_chunk_documents_matches_python(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["w" + " x" * 99,                  # 100 tokens
                 "solo",                           # 1 token < window
                 "",                               # 0 tokens -> none
                 " ".join(f"t{i}" for i in range(53))]})
    out = (text.chunk_documents(spark.createDataFrame(pdf),
                                chunk_tokens=50, overlap=10)
           .orderBy("doc_id", "chunk_idx").collect())
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["n_chunk_tokens"],
             r["chunk_text"]))
    for did in (1, 2, 4):
        assert got[did] == _py_chunks(pdf.text[pdf.doc_id == did].iloc[0],
                                      50, 10), did
    assert 3 not in got                      # token-less doc drops
    # coverage: every token index of doc 1 is inside some chunk
    spans = [(s, s + n) for _, s, n, _ in got[1]]
    assert all(any(a <= i < b for a, b in spans) for i in range(100))


def test_chunk_documents_corpus_no_token_loss(spark, docs):
    """sum of chunk tokens == n_tokens + overlap*(n_chunks-1) per doc."""
    ch = text.chunk_documents(docs.limit(200), chunk_tokens=40, overlap=8)
    per = (ch.groupBy("doc_id")
           .agg(F.sum("n_chunk_tokens").alias("s"),
                F.count(F.lit(1)).alias("c")).toPandas())
    base = (docs.limit(200)
            .select("doc_id", F.expr(
                "size(" + text._tok("text") + ")").alias("n"))
            .toPandas())
    m = per.merge(base, on="doc_id")
    assert ((m.s == m.n + 8 * (m.c - 1)).all())


def test_chunk_documents_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        text.chunk_documents(spark.range(1).withColumn(
            "text", F.lit("a")).withColumnRenamed("id", "doc_id"),
            chunk_tokens=10, overlap=10)


# ------------------------- round-7: deterministic corpus splits


def test_split_corpus_disjoint_exhaustive_and_stable(spark, docs):
    from pandas_alchemy_spark.ext import pipeline
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = pipeline.split_corpus(docs, fr).select("doc_id", "split").toPandas()
    # exhaustive (sum == 1) and one label per row
    assert len(a) == docs.count()
    assert a.doc_id.is_unique
    # stable across a re-read AND a repartition
    b = (pipeline.split_corpus(docs.repartition(7), fr)
         .select("doc_id", "split").toPandas())
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (m.split_a == m.split_b).all()
    # roughly the requested proportions (md5 is uniform)
    frac = a.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    # append-stability: adding rows never flips existing assignments
    c = (pipeline.split_corpus(docs.limit(100), fr)
         .select("doc_id", "split").toPandas())
    m2 = c.merge(a, on="doc_id", suffixes=("_c", "_a"))
    assert (m2.split_c == m2.split_a).all()


def test_split_corpus_holdout_drops_and_validates(spark, docs):
    from pandas_alchemy_spark.ext import pipeline
    kept = pipeline.split_corpus(docs, {"train": 0.5}).count()
    n = docs.count()
    assert 0 < kept < n
    with pytest.raises(ValueError):
        pipeline.split_thresholds({"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        pipeline.split_thresholds({})
    # fast-hash path agrees with itself and is exhaustive at sum=1
    f = pipeline.split_corpus(docs, {"x": 0.25, "y": 0.75},
                              fast_hash=True)
    assert f.count() == n


# ------------------------- round-7: SemDeDup semantic dedup


def _semdedup_frame(spark, n_base=60, groups=(3, 7, 11), copies=4):
    rng = np.random.default_rng(42)
    base = rng.normal(size=(n_base, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(n_base)]
    nid = n_base
    planted = {}
    for g in groups:
        planted[g] = [g]
        for _ in range(copies):
            v = base[g] + rng.normal(scale=0.01, size=16)
            v /= np.linalg.norm(v)
            rows.append((nid, v.astype(np.float32).tolist()))
            planted[g].append(nid)
            nid += 1
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return sdf, planted, nid


def test_semantic_dedup_collapses_planted_groups(spark):
    sdf, planted, n_total = _semdedup_frame(spark)
    lab = similarity.semantic_dedup(sdf, dim=16, nlist=4,
                                    threshold=0.9).toPandas()
    assert len(lab) == n_total
    by_id = dict(zip(lab.id, lab.component))
    keep = set(lab[lab.keep].id)
    for g, members in planted.items():
        comps = {by_id[m] for m in members}
        assert comps == {g}, (g, comps)      # one transitive group
        assert set(members) & keep == {g}    # min-id representative
    # determinism across partitionings
    lab2 = similarity.semantic_dedup(sdf.repartition(5), dim=16,
                                     nlist=4, threshold=0.9).toPandas()
    assert set(lab2[lab2.keep].id) == keep


def test_semantic_dedup_kept_pairwise_invariant(spark):
    sdf, planted, n_total = _semdedup_frame(spark)
    cents = similarity.train_ivf_centroids(sdf, dim=16, nlist=4)
    pairs = similarity.semantic_dedup_pairs(
        sdf, dim=16, nlist=4, threshold=0.9, centroids=cents)
    lab = similarity.semantic_dedup(
        sdf, dim=16, nlist=4, threshold=0.9, centroids=cents)
    kept = lab.filter("keep").select(F.col("id"))
    bad = (pairs.join(kept.withColumnRenamed("id", "id_a"), "id_a",
                      "left_semi")
           .join(kept.withColumnRenamed("id", "id_b"), "id_b",
                 "left_semi").count())
    assert bad == 0


def test_semantic_dedup_cell_cap_excludes(spark):
    sdf, planted, n_total = _semdedup_frame(spark)
    lab = similarity.semantic_dedup(sdf, dim=16, nlist=4,
                                    threshold=0.9, cell_cap=1).toPandas()
    assert lab.keep.all()            # no pairing possible -> all kept


# ------------------------- round-7: unigram LM scoring


def test_unigram_logprob_matches_numpy(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the cat sat", "the the the", "dog", ""]})
    out = {r["doc_id"]: (r["n_lm_tokens"], r["logprob"])
           for r in text.unigram_logprob(
               spark.createDataFrame(pdf)).collect()}
    from collections import Counter
    toks = {1: ["the", "cat", "sat"], 2: ["the", "the", "the"],
            3: ["dog"]}
    cnt = Counter(t for ts in toks.values() for t in ts)
    tot = sum(cnt.values())
    for did, ts in toks.items():
        cs = sorted(cnt[t] for t in ts)
        s = 0.0
        for c in cs:
            s += math.log(c)
        want = (s - len(ts) * math.log(tot)) / len(ts)
        n, got = out[did]
        assert n == len(ts)
        # bit-exact across runs/partitionings; vs CPython's libm the
        # last ulp may differ (JVM Math.log) -- allow exactly that
        assert abs(got - want) < 5e-15, (did, got, want)
    assert 4 not in out                        # token-less doc drops
    # the common-word doc scores higher than the rare-word doc
    assert out[2][1] > out[3][1]


def test_unigram_logprob_external_vocab_drops_oov(spark):
    pdf = pd.DataFrame({"doc_id": [1], "text": ["aa bb zz"]})
    vocab = spark.createDataFrame(
        pd.DataFrame({"term": ["aa", "bb"], "cnt": [3, 1]}))
    r = text.unigram_logprob(
        spark.createDataFrame(pdf), vocab=vocab).collect()[0]
    assert r["n_lm_tokens"] == 2               # zz is OOV, dropped
    want = (math.log(3) + math.log(1) - 2 * math.log(4)) / 2
    assert abs(r["logprob"] - want) < 5e-15


def test_unigram_logprob_deterministic_across_partitionings(spark, docs):
    a = (text.unigram_logprob(docs.limit(300)).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (text.unigram_logprob(docs.limit(300).repartition(13))
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert (a.logprob.values == b.logprob.values).all()


def test_semantic_dedup_nprobe_superset_no_dup_pairs(spark):
    sdf, planted, n_total = _semdedup_frame(spark)
    cents = similarity.train_ivf_centroids(sdf, dim=16, nlist=4)
    p1 = similarity.semantic_dedup_pairs(
        sdf, dim=16, nlist=4, threshold=0.9, centroids=cents).toPandas()
    p2 = similarity.semantic_dedup_pairs(
        sdf, dim=16, nlist=4, threshold=0.9, centroids=cents,
        nprobe=2).toPandas()
    s1 = set(zip(p1.id_a, p1.id_b))
    s2 = set(zip(p2.id_a, p2.id_b))
    assert s1 <= s2                       # soft assignment only adds
    assert len(p2) == len(s2)             # multi-cell hits collapsed


# ------------------------- round-7: deterministic corpus shuffle


def test_shuffle_corpus_positions_and_determinism(spark, docs):
    from pandas_alchemy_spark.ext import pipeline
    a = (pipeline.shuffle_corpus(docs, n_shards=8)
         .select("doc_id", "shard", "shard_pos").toPandas())
    assert len(a) == docs.count() and a.doc_id.is_unique
    # positions are 1..m contiguous per shard
    for s, g in a.groupby("shard"):
        assert sorted(g.shard_pos) == list(range(1, len(g) + 1))
    # deterministic under repartition
    b = (pipeline.shuffle_corpus(docs.repartition(11), n_shards=8)
         .select("doc_id", "shard", "shard_pos").toPandas())
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (m.shard_a == m.shard_b).all()
    assert (m.shard_pos_a == m.shard_pos_b).all()
    # the permutation is not the identity order (it shuffles)
    g0 = a[a.shard == a.shard.iloc[0]].sort_values("shard_pos")
    assert not g0.doc_id.is_monotonic_increasing
    # shard membership is append-stable
    c = (pipeline.shuffle_corpus(docs.limit(100), n_shards=8)
         .select("doc_id", "shard").toPandas())
    m2 = c.merge(a, on="doc_id")
    assert (m2.shard_x == m2.shard_y).all()


def test_shuffle_corpus_validates(spark, docs):
    from pandas_alchemy_spark.ext import pipeline
    with pytest.raises(ValueError):
        pipeline.shuffle_corpus(docs, n_shards=0)


# ------------------------- round-7: DSIR importance resampling


def test_importance_weights_favor_target_like_docs(spark, docs):
    from pandas_alchemy_spark.ext import pipeline
    target = docs.filter("doc_id % 7 = 0")
    w = pipeline.importance_weights(docs, target, buckets=4096)
    pdf = w.toPandas()
    # every doc with at least one token is scored (token-less docs
    # have no grams and are dropped by the explode, like unigram)
    from pandas_alchemy_spark.ext.text import _tok
    n_tok = docs.filter(F.expr(f"size({_tok('text')}) >= 1")).count()
    assert len(pdf) == n_tok
    assert pdf.doc_id.is_unique
    # docs IN the target should on average look more target-like
    # than the rest (they contributed their own grams to the model)
    pdf["in_t"] = pdf.doc_id % 7 == 0
    per_gram = pdf.logw / pdf.n_grams
    assert per_gram[pdf.in_t].mean() > per_gram[~pdf.in_t].mean()
    # partitioning-invariant, bit-stable (sorted fold contract)
    w2 = pipeline.importance_weights(
        docs.repartition(13), target.repartition(5), buckets=4096)
    m = pdf.merge(w2.toPandas(), on="doc_id", suffixes=("", "_b"))
    assert (m.logw == m.logw_b).all()
    assert (m.n_grams == m.n_grams_b).all()


def test_importance_weights_validation_and_fast_hash(spark, docs):
    import pytest as _pt
    from pandas_alchemy_spark.ext import pipeline
    with _pt.raises(ValueError):
        pipeline.importance_weights(docs, docs, buckets=1)
    target = docs.filter("doc_id % 11 = 0")
    w = pipeline.importance_weights(docs, target, buckets=1024,
                                    fast_hash=True)
    assert w.columns == ["doc_id", "n_grams", "logw"]
    assert w.count() > 0


def test_resample_corpus_gumbel_topk(spark, docs):
    import pytest as _pt
    from pandas_alchemy_spark.ext import pipeline
    target = docs.filter("doc_id % 7 = 0")
    w = pipeline.importance_weights(docs, target, buckets=4096)
    sel = pipeline.resample_corpus(w, k=25)
    a = sorted(r.doc_id for r in sel.collect())
    assert len(a) == 25
    # deterministic under repartitioning
    b = sorted(r.doc_id for r in
               pipeline.resample_corpus(w.repartition(9), k=25)
               .collect())
    assert a == b
    # a different seed draws a different set
    c = sorted(r.doc_id for r in
               pipeline.resample_corpus(w, k=25, seed="other")
               .collect())
    assert a != c
    # temperature -> 0 approaches greedy top-k by weight
    greedy = sorted(
        r.doc_id for r in
        w.orderBy(F.col("logw").desc(), F.col("doc_id")).limit(25)
        .collect())
    cold = sorted(r.doc_id for r in
                  pipeline.resample_corpus(w, k=25, temperature=1e-9)
                  .collect())
    assert cold == greedy
    with _pt.raises(ValueError):
        pipeline.resample_corpus(w, k=0)
    with _pt.raises(ValueError):
        pipeline.resample_corpus(w, k=5, temperature=0)


def test_resample_corpus_sketch_path(spark, docs):
    """method='sketch' (the billion-row selection path, r7 verdict
    item 5): the result must be a PREFIX of the exact key ordering —
    set-equal to the exact top-|result| — with |result| within the
    sketch's rank-error tolerance of k.  Under a DIFFERENT
    partitioning the GK threshold estimate may shift within the
    rank-error tolerance (ADVICE r8: the sketch depends on insertion/
    merge order), so the cross-partitioning assertion is the CONTRACT
    (prefix property + size tolerance), not bit-equality."""
    import pytest as _pt
    from pandas_alchemy_spark.ext import pipeline
    target = docs.filter("doc_id % 7 = 0")
    w = pipeline.importance_weights(docs, target, buckets=4096)
    n = w.count()
    k = 40
    sel = pipeline.resample_corpus(w, k=k, method="sketch",
                                   sketch_rel_err=0.01)
    got = sorted(r.doc_id for r in sel.collect())
    # size within the sketch tolerance of k
    assert abs(len(got) - k) <= max(1, int(0.01 * n) + 1), \
        f"|result|={len(got)} vs k={k} (n={n})"
    # prefix property: set-equal to the EXACT top-|result| by key
    exact = sorted(
        r.doc_id for r in
        pipeline.resample_corpus(w, k=len(got), method="topk")
        .collect())
    assert got == exact
    # under a different partitioning: the CONTRACT holds (prefix of
    # the exact ordering, size within tolerance) even though the GK
    # threshold — hence boundary membership — may legitimately shift
    again = sorted(r.doc_id for r in
                   pipeline.resample_corpus(
                       w.repartition(9), k=k, method="sketch",
                       sketch_rel_err=0.01).collect())
    assert abs(len(again) - k) <= max(1, int(0.01 * n) + 1)
    exact_again = sorted(
        r.doc_id for r in
        pipeline.resample_corpus(w, k=len(again), method="topk")
        .collect())
    assert again == exact_again
    # reruns under the SAME partitioning reproduce exactly
    rerun = sorted(r.doc_id for r in
                   pipeline.resample_corpus(
                       w, k=k, method="sketch",
                       sketch_rel_err=0.01).collect())
    assert got == rerun
    # k >= n degenerates to the whole corpus
    assert (pipeline.resample_corpus(w, k=n + 10, method="sketch")
            .count() == n)
    with _pt.raises(ValueError, match="method"):
        pipeline.resample_corpus(w, k=5, method="nope")
    with _pt.raises(ValueError, match="sketch_rel_err"):
        pipeline.resample_corpus(w, k=5, method="sketch",
                                 sketch_rel_err=0.0)


def test_write_training_shards_readback_order(spark, docs, tmp_path):
    """Writer-side shard contract (r7 verdict item 8): after
    write_training_shards, reading any ONE shard directory back gives
    documents in exactly shard_pos order WITHOUT re-sorting, and the
    union of shards is the whole corpus.  The transposition-sensitive
    checksum sum(pos * (doc_id % 97)) from the driver leg re-pins the
    permutation through the writer."""
    from pandas_alchemy_spark.ext import pipeline
    path = str(tmp_path / "shards")
    pipeline.write_training_shards(docs, path, n_shards=8)
    sh = pipeline.shuffle_corpus(docs, n_shards=8).toPandas()
    assert len(sh) >= 500, "need a 500+ doc corpus for this contract"
    seen = 0
    for k in sorted(sh["shard"].unique()):
        back = spark.read.parquet(f"{path}/shard={k}").toPandas()
        want = (sh[sh["shard"] == k]
                .sort_values("shard_pos"))
        # read-back file order IS shard_pos order — no sort applied
        assert list(back["shard_pos"]) == list(want["shard_pos"])
        assert list(back["doc_id"]) == list(want["doc_id"])
        # permutation checksum survives the writer round-trip
        got_chk = int((back["shard_pos"]
                       * (back["doc_id"] % 97)).sum())
        want_chk = int((want["shard_pos"]
                        * (want["doc_id"] % 97)).sum())
        assert got_chk == want_chk
        seen += len(back)
    assert seen == len(sh)


def test_duplicate_spans_planted(spark):
    """Plant a 6-token passage inside otherwise-unique documents: the
    span detector must find exactly the non-first occurrences, merge
    overlapping window hits into ONE maximal span, and removal must
    keep the first occurrence while stripping the rest."""
    passage = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (1, f"unique one {passage} tail words here"),
        (2, f"other start text {passage} closing remark"),
        (3, "completely unrelated document with its own words"),
        # within-document repetition: second copy must be flagged
        (4, f"{passage} middle filler {passage}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dedup.duplicate_spans(docs, n=6).toPandas()
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in spans.itertuples()}
    # doc 1 tokens: unique(0) one(1) alpha(2)..foxtrot(7) tail... ->
    # first global occurrence (smallest (id, pos)) KEEPS; doc 2's copy
    # starts at token 3, doc 4's copies at 0 and 8
    assert (2, 3, 9) in got
    assert (4, 8, 14) in got
    assert (4, 0, 6) in got
    assert not any(r.doc_id in (1, 3) for r in spans.itertuples())
    out = dedup.remove_duplicate_spans(docs, n=6).toPandas() \
        .set_index("doc_id")
    assert passage in out.loc[1, "text_deduped"]
    assert passage not in out.loc[2, "text_deduped"]
    assert out.loc[2, "n_removed"] == 6
    # doc 4 loses both copies? No: its FIRST copy is not the global
    # first (doc 1 holds it), so both doc-4 copies strip
    assert passage not in out.loc[4, "text_deduped"]
    assert out.loc[4, "n_removed"] == 12
    assert out.loc[3, "n_removed"] == 0
    # untouched docs keep their full token stream
    assert out.loc[3, "text_deduped"] == rows[2][1]


def test_duplicate_spans_overlap_merge(spark):
    """A long repeated region produces many overlapping window hits;
    they must merge into one span covering the whole region."""
    region = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, f"{region} first home"), (2, f"prefix {region} suffix")],
        "doc_id long, text string")
    spans = dedup.duplicate_spans(docs, n=6).toPandas()
    assert len(spans) == 1
    r = spans.iloc[0]
    assert (r.doc_id, r.span_start, r.span_end) == (2, 1, 13)
    assert r.n_windows == 7
    import pytest as _pt
    with _pt.raises(ValueError, match="n must be"):
        dedup.duplicate_spans(docs, n=1)


# ------------------------- round-7: cross-corpus incremental dedup


def test_cross_dedup_pairs_finds_cross_matches_only(spark, docs):
    n = docs.count()
    new = docs.filter(f"doc_id < {n // 3}")
    # reference: disjoint ids; seed EXACT copies of 5 new docs under
    # shifted ids so known cross pairs exist
    ref = docs.filter(f"doc_id >= {n // 3}").select("doc_id", "text")
    copies = (new.filter("doc_id % 20 = 0").limit(5)
              .select((F.col("doc_id") + 1000000).alias("doc_id"),
                      "text"))
    ref = ref.select("doc_id", "text").unionAll(copies)
    pairs = dedup.cross_dedup_pairs(
        new.select("doc_id", "text"), ref, threshold=0.9)
    got = {(r.id_new, r.id_ref) for r in pairs.collect()}
    planted = {(r.doc_id, r.doc_id + 1000000)
               for r in new.filter("doc_id % 20 = 0").limit(5)
               .select("doc_id").collect()}
    assert planted <= got
    # every verified pair is genuinely cross (new ids on the left)
    assert all(a < n // 3 and (b >= n // 3 or b >= 1000000)
               for a, b in got)
    # exact copies verify at jaccard 1.0
    ones = {(r.id_new, r.id_ref) for r in
            pairs.filter("jaccard = 1.0").collect()}
    assert planted <= ones


def test_dedup_against_drops_matches_keeps_rest(spark, docs):
    n = docs.count()
    new = docs.filter(f"doc_id < {n // 3}").select("doc_id", "text")
    ref = (new.filter("doc_id % 10 = 0")
           .select((F.col("doc_id") + 5000000).alias("doc_id"),
                   "text"))
    kept = dedup.dedup_against(new, ref, threshold=0.9)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    dropped = {r.doc_id for r in
               new.filter("doc_id % 10 = 0").select("doc_id")
               .collect()}
    assert kept_ids.isdisjoint(dropped)
    all_ids = {r.doc_id for r in new.select("doc_id").collect()}
    # nothing else disappears beyond near-dups of the planted docs;
    # at 0.9 jaccard on this corpus the planted set is exactly the
    # drop set unless the corpus itself contains >=0.9 cross matches
    extra = all_ids - kept_ids - dropped
    pairs = dedup.cross_dedup_pairs(new, ref, threshold=0.9)
    verified = {r.id_new for r in pairs.collect()}
    assert extra <= verified
    with pytest.raises(ValueError):
        dedup.cross_dedup_pairs(new, ref, num_hashes=10, bands=4)


def test_cross_dedup_pairs_prebuilt_index_matches_inline(spark, docs):
    """cross_dedup_pairs(index=) / dedup_against(index=) — the batch
    build-once-query-many path (r9): identical pair set + Jaccard
    values to the inline path at the same parameters, with the hash
    family coming FROM the index (mismatched args ignored); both/
    neither of reference=/index= raises."""
    n = docs.count()
    new = docs.filter(f"doc_id < {n // 3}").select("doc_id", "text")
    ref = docs.filter(f"doc_id >= {n // 3}").select("doc_id", "text")
    inline = dedup.cross_dedup_pairs(new, ref, num_hashes=16,
                                     bands=4, threshold=0.4)
    want = {(r.id_new, r.id_ref): round(r.jaccard, 9)
            for r in inline.collect()}
    assert len(want) > 0
    idx = dedup.build_reference_index(ref, num_hashes=16, bands=4)
    # wrong explicit args: the index's family must win
    got = {(r.id_new, r.id_ref): round(r.jaccard, 9)
           for r in dedup.cross_dedup_pairs(
               new, index=idx, num_hashes=8, bands=2,
               threshold=0.4).collect()}
    assert got == want
    # dedup_against keeps exactly the unmatched new docs either way
    k_inline = {r.doc_id for r in dedup.dedup_against(
        new, ref, num_hashes=16, bands=4, threshold=0.4).collect()}
    k_idx = {r.doc_id for r in dedup.dedup_against(
        new, index=idx, threshold=0.4).collect()}
    assert k_idx == k_inline
    idx.release()
    with pytest.raises(ValueError, match="exactly one"):
        dedup.cross_dedup_pairs(new)
    with pytest.raises(ValueError, match="exactly one"):
        dedup.cross_dedup_pairs(new, ref, index=idx)


def test_split_corpus_by_group_is_leakage_safe(spark, docs):
    from pandas_alchemy_spark.ext import pipeline
    g = docs.withColumn("src", F.expr("concat('h', doc_id % 13)"))
    out = (pipeline.split_corpus(g, {"train": 0.6, "test": 0.4},
                                 by="src")
           .select("doc_id", "src", "split").toPandas())
    # a group never straddles splits
    assert (out.groupby("src").split.nunique() == 1).all()
    # and the assignment matches hashing the group key directly
    direct = (pipeline.split_corpus(
        g.select(F.col("src").alias("doc_id")).distinct(),
        {"train": 0.6, "test": 0.4})
        .toPandas().rename(columns={"doc_id": "src"}))
    m = out.merge(direct, on="src", suffixes=("", "_d"))
    assert (m.split == m.split_d).all()
    # NULL group key raises instead of pooling
    withnull = g.withColumn(
        "src", F.expr("CASE WHEN doc_id = 0 THEN NULL ELSE src END"))
    with pytest.raises(Exception, match="NULL group key"):
        pipeline.split_corpus(withnull, {"a": 1.0}, by="src").collect()


# ------------------------- round-7: BM25 keyword search


def test_bm25_search_matches_reference_formula(spark, docs):
    queries = spark.createDataFrame(
        [("q0", "data model training"), ("q1", "the of and")],
        "query_id string, query string")
    got = text.bm25_search(docs, queries, k=8).toPandas()
    # reference BM25 in pure python on the same tokenizer
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def tok(t):
        return [w for w in "".join(
            c.lower() if c.isalnum() else " " for c in t).split() if w]

    toks = {r.doc_id: tok(r.text) for r in pdf.itertuples()}
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    import collections
    want_rows = []
    for qid, q in [("q0", "data model training"), ("q1", "the of and")]:
        qt = sorted(set(tok(q)))
        dfreq = {t: sum(1 for v in toks.values() if t in v) for t in qt}
        scores = []
        for d, v in toks.items():
            cnt = collections.Counter(v)
            s = 0.0
            hit = False
            for t in qt:
                tf = cnt.get(t, 0)
                if tf == 0 or dfreq[t] == 0:
                    continue
                hit = True
                idf = math.log((N - dfreq[t] + 0.5)
                               / (dfreq[t] + 0.5) + 1.0)
                s += idf * tf / (tf + 1.2 * (1 - 0.75
                                             + 0.75 * len(v) / avgdl))
            if hit:
                scores.append((d, s))
        scores.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scores[:8], 1):
            want_rows.append((qid, d, r, s))
    want = pd.DataFrame(want_rows,
                        columns=["query_id", "doc_id", "rank", "score"])
    m = (got.sort_values(["query_id", "rank"]).reset_index(drop=True)
         .merge(want, on=["query_id", "rank"], suffixes=("", "_w")))
    assert len(m) == len(want)
    assert (m.doc_id == m.doc_id_w).all()
    assert np.allclose(m.score, m.score_w, rtol=1e-9)


def test_bm25_search_edge_cases(spark, docs):
    # no-hit query yields zero rows; k validation raises
    q = spark.createDataFrame([("qz", "zzzqqqxxx notaword")],
                              "query_id string, query string")
    assert text.bm25_search(docs, q, k=5).count() == 0
    with pytest.raises(ValueError):
        text.bm25_search(docs, q, k=0)
    # deterministic under repartitioning
    q2 = spark.createDataFrame([("q0", "data model")],
                               "query_id string, query string")
    a = text.bm25_search(docs, q2, k=10).toPandas()
    bdf = text.bm25_search(docs.repartition(17), q2, k=10).toPandas()
    m = a.merge(bdf, on=["query_id", "rank"], suffixes=("", "_b"))
    assert (m.doc_id == m.doc_id_b).all()
    assert (m.score == m.score_b).all()


# ------------------------- round-7: hashed TF-IDF vectors


def test_tfidf_vectors_match_python_reference(spark, docs):
    import hashlib
    got = text.tfidf_vectors(docs, dim=64).toPandas()
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def tok(t):
        return [w for w in "".join(
            c.lower() if c.isalnum() else " " for c in t).split() if w]

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = {r.doc_id: tok(r.text) for r in pdf.itertuples()}
    N = len(toks)
    import collections
    bt = {d: collections.Counter(h60(t) % 64 for t in v)
          for d, v in toks.items() if v}
    dfreq = collections.Counter()
    for cnt in bt.values():
        for b in cnt:
            dfreq[b] += 1
    assert len(got) == len(bt)
    for row in got.head(20).itertuples():
        v = np.zeros(64)
        for b, tf in bt[row.doc_id].items():
            v[b] = tf * (math.log((N + 1) / (dfreq[b] + 1)) + 1.0)
        v = v / np.linalg.norm(v)
        assert np.allclose(np.array(row.embedding), v, atol=1e-12)
    # unit norm everywhere
    nrm = got.embedding.map(lambda e: float(np.linalg.norm(e)))
    assert np.allclose(nrm, 1.0, atol=1e-9)
    # partitioning-invariant
    again = (text.tfidf_vectors(docs.repartition(13), dim=64)
             .toPandas())
    m = got.merge(again, on="doc_id", suffixes=("", "_b"))
    assert all(list(a) == list(b)
               for a, b in zip(m.embedding, m.embedding_b))


def test_tfidf_vectors_feed_semantic_dedup(spark, docs):
    # the no-external-model path: text -> tfidf -> SemDeDup runs and
    # collapses planted exact copies (identical text => identical
    # vector => cosine 1)
    base = docs.select("doc_id", "text").limit(200)
    copies = base.limit(8).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text")
    corpus = base.unionAll(copies)
    vecs = text.tfidf_vectors(corpus, dim=64).withColumnRenamed(
        "doc_id", "vec_id")
    lab = similarity.semantic_dedup(
        vecs, dim=64, nlist=4, threshold=0.999, nprobe=2)
    out = lab.toPandas()
    planted = {r.doc_id for r in base.limit(8).collect()}
    pairs = out.set_index("id").component
    for d in planted:
        assert pairs[d] == pairs[d + 900000]
    with pytest.raises(ValueError):
        text.tfidf_vectors(docs, dim=1)


def test_quality_classifier_separates_and_filters(spark, docs):
    """Model-based quality filter (r9; the GPT-3/CCNet fastText-style
    gate): logistic regression over hashed unigram+bigram counts must
    separate the planted language signal, the hard threshold must
    gate on it, and the content-addressed Pareto rule must be
    reproducible per seed and seed-sensitive."""
    from pandas_alchemy_spark.ext import pipeline
    pos = docs.filter("lang = 'en'")
    neg = docs.filter("lang <> 'en'")
    m = pipeline.train_quality_classifier(pos, neg, max_iter=15)
    sc = pipeline.score_quality(docs, m)
    pdf = (sc.join(docs.select("doc_id", "lang"), "doc_id")
           .toPandas())
    assert len(pdf) == docs.filter("text is not null").count()
    assert ((pdf.q_prob >= 0) & (pdf.q_prob <= 1)).all()
    en = pdf[pdf.lang == "en"].q_prob
    rest = pdf[pdf.lang != "en"].q_prob
    assert en.median() > 0.9 and rest.median() < 0.1
    # hard gate == score >= t
    kept = pipeline.quality_classifier_filter(docs, m, threshold=0.5)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    want_ids = set(pdf[pdf.q_prob >= 0.5].doc_id)
    assert kept_ids == want_ids
    # kept frame carries the score and the original columns
    assert "q_prob" in kept.columns and "text" in kept.columns
    # Pareto mode: reproducible for a seed, different across seeds,
    # and keeps essentially all high scorers
    k1 = {r.doc_id for r in pipeline.quality_classifier_filter(
        docs, m, seed="a").select("doc_id").collect()}
    k1b = {r.doc_id for r in pipeline.quality_classifier_filter(
        docs, m, seed="a").select("doc_id").collect()}
    k2 = {r.doc_id for r in pipeline.quality_classifier_filter(
        docs, m, seed="b").select("doc_id").collect()}
    assert k1 == k1b and k1 != k2
    high = set(pdf[pdf.q_prob > 0.99].doc_id)
    assert high and len(high & k1) / len(high) > 0.9
    with pytest.raises(ValueError, match="threshold"):
        pipeline.quality_classifier_filter(docs, m, threshold=1.5)
    with pytest.raises(ValueError, match="pareto_alpha"):
        pipeline.quality_classifier_filter(docs, m, pareto_alpha=0)
    with pytest.raises(ValueError, match="seed"):
        pipeline.quality_classifier_filter(docs, m, seed="bad seed!")
    with pytest.raises(ValueError, match="buckets"):
        pipeline.train_quality_classifier(pos, neg, buckets=1)


def test_quality_classifier_model_roundtrip(spark, docs, tmp_path):
    """The fitted PipelineModel saves/loads with its featurization
    intact: identical scores (same JVM, same aggregation order)."""
    from pyspark.ml import PipelineModel

    from pandas_alchemy_spark.ext import pipeline
    pos = docs.filter("lang = 'en'").limit(120)
    neg = docs.filter("lang <> 'en'").limit(120)
    m = pipeline.train_quality_classifier(pos, neg, max_iter=8)
    path = str(tmp_path / "qc_model")
    m.save(path)
    m2 = PipelineModel.load(path)
    a = (pipeline.score_quality(docs, m).toPandas()
         .set_index("doc_id").sort_index())
    b = (pipeline.score_quality(docs, m2).toPandas()
         .set_index("doc_id").sort_index())
    assert (a.q_prob == b.q_prob).all()


def test_resample_corpus_seed_validation(spark, docs):
    from pandas_alchemy_spark.ext import pipeline
    target = docs.filter("doc_id % 7 = 0")
    w = pipeline.importance_weights(docs, target, buckets=1024)
    with pytest.raises(ValueError, match="seed"):
        pipeline.resample_corpus(w, k=5, seed="bad'quote")
    with pytest.raises(ValueError, match="seed"):
        pipeline.resample_corpus(w, k=5, seed="")
    assert pipeline.resample_corpus(w, k=5, seed="run-2.a").count() == 5


# ------------------------- round-7: interpolated bigram LM


def test_bigram_logprob_matches_python_reference(spark, docs):
    got = text.bigram_logprob(docs).toPandas()
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def tok(t):
        return [w for w in "".join(
            c.lower() if c.isalnum() else " " for c in t).split() if w]

    toks = {r.doc_id: tok(r.text) for r in pdf.itertuples()}
    import collections
    uni = collections.Counter()
    big = collections.Counter()
    for v in toks.values():
        uni.update(v)
        big.update(zip(v[:-1], v[1:]))
    cp = collections.Counter()
    for (p, _), c in big.items():
        cp[p] += c
    T = sum(uni.values())
    lam = 0.75
    want = {}
    for d, v in toks.items():
        if not v:
            continue
        s = 0.0
        for i, t in enumerate(v):
            if i == 0:
                s += math.log(uni[t] / T)
            else:
                p = v[i - 1]
                s += math.log(lam * big[(p, t)] / cp[p]
                              + (1 - lam) * uni[t] / T)
        want[d] = s / len(v)
    assert len(got) == len(want)
    for row in got.head(30).itertuples():
        assert row.logprob2 == pytest.approx(want[row.doc_id],
                                             rel=1e-12)
    # the bigram term sees word ORDER where the unigram filter is
    # blind: in a corpus dominated by "alpha beta" bigrams, a doc in
    # corpus order must outscore the same TOKEN MULTISET reversed
    # (identical unigram score by construction)
    # (alpha, beta) dominant; the "beta gamma" docs split beta's
    # continuations so P(a|b) < P(b|a) strictly (a corpus where every
    # prev has ONE continuation is conditionally symmetric and the
    # reversal scores EQUAL — found by this test's first version).
    # The probe docs are reversals: same token multiset, forward doc
    # holds 3 frequent + 2 rare transitions vs 2 + 3.
    ctl = spark.createDataFrame(
        [(i, "alpha beta") for i in range(2, 30)]
        + [(i, "beta gamma") for i in range(30, 34)]
        + [(0, "alpha beta alpha beta alpha beta"),
           (1, "beta alpha beta alpha beta alpha")],
        "doc_id long, text string")
    sc = {r.doc_id: r.logprob2
          for r in text.bigram_logprob(ctl).collect()
          if r.doc_id in (0, 1)}
    assert sc[0] > sc[1]
    # determinism under repartitioning
    a = text.bigram_logprob(docs).toPandas()
    b = text.bigram_logprob(docs.repartition(11)).toPandas()
    m = a.merge(b, on="doc_id", suffixes=("", "_b"))
    assert (m.logprob2 == m.logprob2_b).all()
    with pytest.raises(ValueError):
        text.bigram_logprob(docs, lam=1.0)


# ------------------------- round-7: document clustering


def test_cluster_documents_groups_planted_topics(spark):
    from pandas_alchemy_spark.ext import pipeline
    # two synthetic "topics" with disjoint vocabulary + exact copies
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta " * 4))
    for i in range(40, 80):
        rows.append((i, "omega sigma tau upsilon " * 4))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lab = pipeline.cluster_documents(docs, k=2, dim=32,
                                     refine_iters=2).toPandas()
    assert len(lab) == 80
    a = set(lab[lab.doc_id < 40].cluster)
    b = set(lab[lab.doc_id >= 40].cluster)
    # identical texts MUST co-cluster; the two topics must separate
    assert len(a) == 1 and len(b) == 1 and a != b
    # deterministic under repartitioning
    again = pipeline.cluster_documents(
        docs.repartition(7), k=2, dim=32, refine_iters=2).toPandas()
    m = lab.merge(again, on="doc_id", suffixes=("", "_b"))
    assert (m.cluster == m.cluster_b).all()
    with pytest.raises(ValueError):
        pipeline.cluster_documents(docs, k=1)


def test_quality_classifier_filter_join_and_fast_paths_agree(spark, docs):
    """r10 (VERDICT r9 #1): the no-join fast path (one corpus scan
    through model.transform) must keep exactly the set the score+join
    path keeps, in both gate modes."""
    from pandas_alchemy_spark.ext import pipeline
    m = pipeline.train_quality_classifier(
        docs.filter("lang = 'en'"), docs.filter("lang <> 'en'"),
        max_iter=8)
    sc = pipeline.score_quality(docs, m)
    for kw in ({"seed": "agree"}, {"threshold": 0.5}):
        fast = {(r.doc_id, round(r.q_prob, 9))
                for r in pipeline.quality_classifier_filter(
                    docs, m, **kw).select("doc_id", "q_prob")
                .collect()}
        join = {(r.doc_id, round(r.q_prob, 9))
                for r in pipeline.quality_classifier_filter(
                    docs, m, scores=sc, **kw)
                .select("doc_id", "q_prob").collect()}
        assert fast == join and fast
    # a corpus column colliding with the model's appended names
    # falls back to the join path with the same kept set
    clash = docs.withColumn("prediction", F.lit(0))
    k1 = {r.doc_id for r in pipeline.quality_classifier_filter(
        clash, m, seed="agree").select("doc_id").collect()}
    k2 = {r.doc_id for r in pipeline.quality_classifier_filter(
        docs, m, seed="agree").select("doc_id").collect()}
    assert k1 == k2


def test_quality_classifier_max_train_docs_bound(spark, docs):
    """r10 (VERDICT r9 #5): the bounded-training contract is
    ENFORCED — a side above max_train_docs is hash-sampled to ~the
    bound, deterministically (same model coefficients on re-train),
    and max_train_docs=None deliberately fits the population."""
    from pandas_alchemy_spark.ext import pipeline
    pos = docs.filter("lang = 'en'")
    neg = docs.filter("lang <> 'en'")

    def coefs(m):
        lr = m.stages[-1]
        arr = lr.coefficients.toArray()
        # the hashed feature space is sparse — summarize the FULL
        # vector, not a prefix of mostly-empty slots
        return (float(lr.intercept), float(arr.sum()),
                int((arr != 0).sum()))

    # bound smaller than the side sizes: the training set shrinks but
    # the planted signal still separates
    m1 = pipeline.train_quality_classifier(
        pos, neg, max_iter=8, max_train_docs=50)
    m2 = pipeline.train_quality_classifier(
        pos, neg, max_iter=8, max_train_docs=50)
    assert coefs(m1) == coefs(m2)  # content-addressed: no RNG state
    mfull = pipeline.train_quality_classifier(
        pos, neg, max_iter=8, max_train_docs=None)
    assert coefs(m1) != coefs(mfull)  # the bound really bit
    sc = (pipeline.score_quality(docs, m1)
          .join(docs.select("doc_id", "lang"), "doc_id").toPandas())
    assert (sc[sc.lang == "en"].q_prob.median()
            > sc[sc.lang != "en"].q_prob.median())
    with pytest.raises(ValueError, match="max_train_docs"):
        pipeline.train_quality_classifier(pos, neg, max_train_docs=0)


def test_quality_classifier_heldout_eval(spark):
    """r10 (VERDICT r9 #4): held-out evaluation on a PLANTED fixture
    with a generalizable vocabulary signal — train on one half,
    evaluate on the disjoint half; AUC floor and gate-metric sanity.
    (The sf0.001 documents fixture's lang sides share vocabulary —
    500 docs generalize at chance there, an honest small-data result;
    the planted fixture tests the evaluator, the doc-scale artifact
    carries the real-fixture numbers.)"""
    from pandas_alchemy_spark.ext import pipeline
    posv = ("curated edited encyclopedia citation reviewed prose "
            "paragraph chapter reference archive").split()
    negv = ("spam casino winner click banner popup lottery crypto "
            "pills refinance").split()

    def corpus(vocab, n, tag):
        # deterministic index-addressed docs: ~12 words each, vocab
        # rotated by doc index so every doc differs but the signal
        # generalizes across the split
        rows = [(i, " ".join(vocab[(i + j) % len(vocab)]
                             for j in range(12)) + f" {tag}{i}")
                for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    pos, neg = corpus(posv, 300, "p"), corpus(negv, 300, "n")
    m = pipeline.train_quality_classifier(
        pos.filter("doc_id % 2 = 0"), neg.filter("doc_id % 2 = 0"),
        max_iter=15)
    ev = pipeline.evaluate_quality_classifier(
        m, pos.filter("doc_id % 2 = 1"), neg.filter("doc_id % 2 = 1"))
    assert ev["auc"] >= 0.95
    assert ev["n_pos"] == 150 and ev["n_neg"] == 150
    assert 0 < ev["kept_rate"] < 1
    assert ev["precision_at_kept"] >= 0.9
    assert 0 < ev["recall_at_kept"] <= 1
    # hard-gate mode evaluates too and is at least as precise
    evh = pipeline.evaluate_quality_classifier(
        m, pos.filter("doc_id % 2 = 1"), neg.filter("doc_id % 2 = 1"),
        threshold=0.5)
    assert evh["precision_at_kept"] >= ev["precision_at_kept"] - 0.05


def test_quality_classifier_no_signal_control(spark, docs):
    """Leakage guard for the planted AUC floor (r10 session 2): a
    model trained on labels UNCORRELATED with text (the fixture's
    lang label — every lang shares one vocabulary) must evaluate at
    ~chance on held-out data.  If document identity ever leaked into
    the features, the train/eval split, or the gate, this AUC would
    rise well above 0.5 — the same control the doc-scale artifact
    records as quality_eval_control."""
    from pandas_alchemy_spark.ext import pipeline
    pool = docs.filter("doc_id % 3 <> 0")
    hold = docs.filter("doc_id % 3 = 0")
    m = pipeline.train_quality_classifier(
        pool.filter("lang = 'en'"), pool.filter("lang <> 'en'"),
        max_iter=8)
    ev = pipeline.evaluate_quality_classifier(
        m, hold.filter("lang = 'en'"), hold.filter("lang <> 'en'"))
    # small held-out set (~160 docs) -> wide chance band; the guard
    # is against STRONG separation, which leakage would produce
    assert ev["auc"] <= 0.75, ev


def test_quality_classifier_planted_corruption_split(spark, docs):
    """The doc-scale artifact's planted task, at test scale: clean
    text vs the same corpus with every 3rd token reversed, trained
    and evaluated on DISJOINT doc ids.  Reversed tokens are new
    vocabulary, so the hashed unigram features separate and the
    signal generalizes across the split — the learnable counterpart
    to the no-signal control above."""
    from pandas_alchemy_spark.ext import pipeline
    corrupt = F.expr(
        "concat_ws(' ', transform(split(text, ' '), "
        "(t, i) -> CASE WHEN i % 3 = 0 THEN reverse(t) ELSE t END))"
    ).alias("text")

    def planted(frame):
        pos = frame.filter("doc_id % 2 = 0").select("doc_id", "text")
        neg = frame.filter("doc_id % 2 = 1").select("doc_id", corrupt)
        return pos, neg

    pool = docs.filter("doc_id % 3 <> 0")
    hold = docs.filter("doc_id % 3 = 0")
    m = pipeline.train_quality_classifier(*planted(pool), max_iter=15)
    ev = pipeline.evaluate_quality_classifier(m, *planted(hold))
    assert ev["auc"] >= 0.9, ev
    assert ev["precision_at_kept"] >= 0.8, ev


def test_reference_index_append_equals_rebuild(spark, docs):
    """ReferenceIndex.append (r10, VERDICT r9 #6): growing the
    reference without re-minhashing the old corpus must be
    VALUE-EQUAL to a from-scratch rebuild on the union — buckets,
    per-doc sets, surviving bands, and tombstones — including when
    the bucket cap binds (planted boilerplate saturates a bucket at
    build; its key must stay dropped after the append, not
    resurrect with only the new members)."""
    base = docs.select("doc_id", "text")
    boiler = docs.limit(1).select(F.col("text").alias("btext"))
    # 10 identical boilerplate docs in A: every one of their band
    # buckets holds >= 10 members, over the cap of 3 -> tombstoned
    planted_a = (spark.range(10).crossJoin(boiler)
                 .select((F.col("id") + 800000).alias("doc_id"),
                         F.col("btext").alias("text")))
    a_side = base.filter("doc_id % 2 = 0").unionAll(planted_a)
    # 2 more copies arrive in the append batch
    planted_b = (spark.range(2).crossJoin(boiler)
                 .select((F.col("id") + 900000).alias("doc_id"),
                         F.col("btext").alias("text")))
    b_side = base.filter("doc_id % 2 = 1").unionAll(planted_b)

    def snap(idx):
        b = {(r.band, r.bh, tuple(r.ids))
             for r in idx.ref_buckets.collect()}
        s = {(r["id_ref"], tuple(sorted(r["hs_r"])),
              tuple(r["sig_r"]), tuple(sorted(r["__sb"])))
             for r in idx.ref_sets.collect()}
        o = {(r.band, r.bh) for r in idx.ref_over.collect()}
        return b, s, o

    i_a = dedup.build_reference_index(a_side, num_hashes=16,
                                      bands=4, bucket_cap=3)
    assert i_a.ref_over.count() > 0  # the cap really bound at build
    i_app = i_a.append(b_side)
    i_reb = dedup.build_reference_index(
        a_side.unionAll(b_side), num_hashes=16, bands=4,
        bucket_cap=3)
    assert snap(i_app) == snap(i_reb)
    # and the gate sees identical pairs through either index
    q = docs.filter("doc_id % 7 = 0").select("doc_id", "text")
    p_app = {(r.id_new, r.id_ref): round(r.jaccard, 9)
             for r in dedup.cross_dedup_pairs(
                 q, index=i_app, threshold=0.3).collect()}
    p_reb = {(r.id_new, r.id_ref): round(r.jaccard, 9)
             for r in dedup.cross_dedup_pairs(
                 q, index=i_reb, threshold=0.3).collect()}
    assert p_app == p_reb and p_app
    # tombstones survive a save/load round trip
    import tempfile
    d = tempfile.mkdtemp()
    i_app.save(d)
    loaded = dedup.load_reference_index(spark, d)
    assert snap(loaded) == snap(i_reb)
    # re-appending an already-indexed id violates the contract
    with pytest.raises(ValueError, match="fresh ids"):
        i_app.append(b_side.limit(1))
    for i in (i_a, i_app, i_reb, loaded):
        i.release()


def test_semantic_dedup_numpy_kernel_matches_sql(spark, emb):
    """kernel="numpy" (r10; SURVEY §17 profile put the SQL fold at
    122 of SemDeDup's ~166 s @200k×64d): the blocked-BLAS per-cell
    pairwise must produce the SAME pair set as the SQL path at both
    hard and soft assignment, cosines within the f32 data's own
    precision (1e-6), and identical end-to-end labels/keep sets."""
    base = emb.select("vec_id", "embedding")
    copies = base.limit(12).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding")
    corpus = base.unionAll(copies)
    dim = len(base.take(1)[0]["embedding"])
    cents = similarity.train_ivf_centroids(corpus, dim=dim, nlist=8)
    for nprobe in (1, 2):
        sa = {(r.id_a, r.id_b): r.cosine
              for r in similarity.semantic_dedup_pairs(
                  corpus, dim=dim, nlist=8, threshold=0.8,
                  nprobe=nprobe, centroids=cents).collect()}
        sb = {(r.id_a, r.id_b): r.cosine
              for r in similarity.semantic_dedup_pairs(
                  corpus, dim=dim, nlist=8, threshold=0.8,
                  nprobe=nprobe, centroids=cents,
                  kernel="numpy").collect()}
        assert sa.keys() == sb.keys() and sa
        assert all(abs(sa[k] - sb[k]) < 1e-6 for k in sa)
    la = (similarity.semantic_dedup(
        corpus, dim=dim, nlist=8, threshold=0.8, nprobe=2,
        centroids=cents).toPandas().set_index("id").sort_index())
    lb = (similarity.semantic_dedup(
        corpus, dim=dim, nlist=8, threshold=0.8, nprobe=2,
        centroids=cents, kernel="numpy").toPandas()
        .set_index("id").sort_index())
    assert (la.component == lb.component).all()
    assert (la.keep == lb.keep).all()
    with pytest.raises(ValueError, match="kernel"):
        similarity.semantic_dedup_pairs(corpus, dim=dim, nlist=8,
                                        kernel="blas")


# ---------------------------------------------------------------------------
# model-based language ID (round 10)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def planted_langs(spark):
    """Deterministic multilingual fixture: each doc mixes its
    language's stopword inventory with shared neutral vocabulary —
    no RNG, so every run trains on the identical corpus."""
    from pandas_alchemy_spark.ext.text import STOPWORDS
    shared = ["data", "spark", "table", "row", "merge", "batch"]
    rows, i = [], 0
    for lang, sws in sorted(STOPWORDS.items()):
        for d in range(180):
            words = ([sws[(d + j) % len(sws)] for j in range(12)]
                     + [shared[(d + j) % len(shared)]
                        for j in range(4)])
            rows.append((i, " ".join(words), lang))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string")


def test_langid_classifier_learns_planted_languages(spark,
                                                    planted_langs):
    """fastText-style char-ngram multinomial LR separates the planted
    languages on a held-out split (train/holdout disjoint by parity),
    and predict_language carries the winning posterior."""
    from pandas_alchemy_spark.ext import pipeline
    train = planted_langs.filter("doc_id % 3 <> 0")
    hold = planted_langs.filter("doc_id % 3 = 0")
    m = pipeline.train_langid_classifier(train, max_iter=15,
                                         buckets=1 << 14)
    ev = pipeline.evaluate_langid_classifier(m, hold)
    assert ev["accuracy"] >= 0.95, ev
    assert ev["macro_f1"] >= 0.95, ev
    assert set(ev["per_lang"]) == {"de", "en", "es", "fr"}
    pred = pipeline.predict_language(hold, m).toPandas()
    assert set(pred.columns) == {"doc_id", "lang_pred", "lang_prob"}
    assert (pred.lang_prob > 0.25).all()  # above uniform over 4
    assert ((pred.lang_prob >= 0) & (pred.lang_prob <= 1)).all()


def test_langid_classifier_deterministic_and_bounded(spark,
                                                     planted_langs):
    """Content-addressed stratified sampling: retrain reproduces the
    model exactly; a per-language bound really bites and still keeps
    every language learnable (no starvation of small languages)."""
    from pandas_alchemy_spark.ext import pipeline

    def coefs(m):
        lr = m.stages[-2]
        arr = lr.coefficientMatrix.toArray()
        return (float(arr.sum()), int((arr != 0).sum()),
                tuple(float(x) for x in
                      lr.interceptVector.toArray()))

    m1 = pipeline.train_langid_classifier(
        planted_langs, max_iter=8, buckets=1 << 12,
        max_train_docs_per_lang=60)
    m2 = pipeline.train_langid_classifier(
        planted_langs, max_iter=8, buckets=1 << 12,
        max_train_docs_per_lang=60)
    assert coefs(m1) == coefs(m2)
    mfull = pipeline.train_langid_classifier(
        planted_langs, max_iter=8, buckets=1 << 12,
        max_train_docs_per_lang=None)
    assert coefs(m1) != coefs(mfull)  # the bound really bit
    ev = pipeline.evaluate_langid_classifier(m1, planted_langs)
    assert ev["accuracy"] >= 0.9, ev


def test_langid_classifier_save_load_roundtrip(spark, planted_langs,
                                               tmp_path):
    """The PipelineModel carries featurization AND the IndexToString
    label mapping: save/load round-trips the whole predictor with no
    side state (the label list is not python-side)."""
    from pyspark.ml import PipelineModel

    from pandas_alchemy_spark.ext import pipeline
    m = pipeline.train_langid_classifier(
        planted_langs.filter("doc_id % 3 <> 0"), max_iter=8,
        buckets=1 << 12)
    path = str(tmp_path / "langid_model")
    m.save(path)
    m2 = PipelineModel.load(path)
    hold = planted_langs.filter("doc_id % 3 = 0")
    a = (pipeline.predict_language(hold, m).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (pipeline.predict_language(hold, m2).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert (a.lang_pred == b.lang_pred).all()
    assert (a.lang_prob - b.lang_prob).abs().max() < 1e-12


def test_langid_classifier_error_paths(spark, planted_langs):
    from pandas_alchemy_spark.ext import pipeline
    with pytest.raises(ValueError, match="buckets"):
        pipeline.train_langid_classifier(planted_langs, buckets=1)
    with pytest.raises(ValueError, match="max_chars"):
        pipeline.train_langid_classifier(planted_langs, max_chars=0)
    with pytest.raises(ValueError, match="max_train_docs_per_lang"):
        pipeline.train_langid_classifier(
            planted_langs, max_train_docs_per_lang=0)
    with pytest.raises(ValueError, match="distinct"):
        pipeline.train_langid_classifier(
            planted_langs.filter("lang = 'en'"))


def test_langid_classifier_naughty_label_values(spark, planted_langs):
    """Label values are arbitrary user data (ADVICE r10): quotes,
    backslashes and SQL-ish fragments in the label column must train
    and round-trip through IndexToString unharmed — the index map is
    built with F.when chains, not an interpolated SQL CASE."""
    from pandas_alchemy_spark.ext import pipeline
    naughty = {"en": "en'); DROP--", "fr": "fr\\'\"", "de": "de\nx",
               "es": "es"}
    relabeled = planted_langs.replace(naughty, subset=["lang"])
    m = pipeline.train_langid_classifier(
        relabeled, max_iter=8, buckets=1 << 12,
        max_train_docs_per_lang=60)
    ev = pipeline.evaluate_langid_classifier(m, relabeled)
    assert ev["accuracy"] >= 0.9, ev
    assert set(ev["per_lang"]) == set(naughty.values())


def test_langid_classifier_null_text_and_agreement(spark,
                                                   planted_langs):
    """NULL text/label rows are excluded from training and scoring;
    on stopword-planted docs the trained model agrees with the
    heuristic language_id (the zero-training baseline) on nearly
    every doc."""
    from pandas_alchemy_spark.ext import pipeline, text
    withnull = planted_langs.unionAll(planted_langs.sparkSession
                                      .createDataFrame(
                                          [(99999, None, "en"),
                                           (99998, "der die und", None)],
                                          planted_langs.schema))
    m = pipeline.train_langid_classifier(withnull, max_iter=10,
                                         buckets=1 << 13)
    pred = pipeline.predict_language(withnull, m)
    assert pred.filter("doc_id = 99999").count() == 0  # null text
    assert pred.filter("doc_id = 99998").count() == 1  # label-less ok
    both = (pred.join(text.language_id(planted_langs)
                      .select("doc_id", F.col("lang_pred")
                              .alias("lang_heur")), "doc_id"))
    agree = both.filter("lang_pred = lang_heur").count() / both.count()
    assert agree >= 0.9, agree


def test_semdedup_auto_kernel(spark, emb):
    """kernel='auto' (r11): the pure decision rule picks numpy for
    big-cell geometries and sql for tiny-cell ones, and the auto
    path produces the same keep set as both explicit kernels."""
    from pandas_alchemy_spark.ext.similarity import (
        _SEMDEDUP_AUTO_WORK_FLOOR, _auto_semdedup_kernel)
    # forged geometries around the floor
    assert _auto_semdedup_kernel(0, 0) == "sql"
    assert _auto_semdedup_kernel(
        100, 100 * (_SEMDEDUP_AUTO_WORK_FLOOR - 1)) == "sql"
    assert _auto_semdedup_kernel(
        100, 100 * _SEMDEDUP_AUTO_WORK_FLOOR) == "numpy"
    # tiny cells -> sql; a few fat cells -> numpy
    assert _auto_semdedup_kernel(10_000, 10_000 * 4) == "sql"
    assert _auto_semdedup_kernel(4, 4 * 300 * 300) == "numpy"
    # the density veto is RETIRED (r13): above the work floor the
    # pick is numpy at ANY emit density — the controlled moderate-
    # band A/Bs measured numpy 1.258x at density 0.185 and 1.232x at
    # density 0.777 (AB_SEMDEDUP_MID_r13.json /
    # AB_SEMDEDUP_MID_HI_r13.json), closing the r11 veto's last band
    mod = 4 * 40_000  # squarely inside the former moderate band
    assert _auto_semdedup_kernel(4, mod, 0.0) == "numpy"
    assert _auto_semdedup_kernel(4, mod, 0.5) == "numpy"
    assert _auto_semdedup_kernel(4, mod, 1.0) == "numpy"
    # RECORDED geometries (artifact-backed): r12 exact-copy/dense
    # (AB_SEMDEDUP_DENSE_r12.json), r12 near-dup/sparse
    # (BENCH_r12_dedup_sf10.json), and both r13 mid-band fixtures
    assert _auto_semdedup_kernel(760, 760 * 91657.9, 0.5992) == "numpy"
    assert _auto_semdedup_kernel(
        512, 512 * 624467.0, 0.0) == "numpy"  # sparse, fat cells
    assert _auto_semdedup_kernel(502, 502 * 41475.7, 0.185) == "numpy"
    assert _auto_semdedup_kernel(402, 402 * 36616.9, 0.777) == "numpy"
    corpus = emb.select("vec_id", "embedding")
    dim = len(corpus.take(1)[0]["embedding"])
    cents = similarity.train_ivf_centroids(corpus, dim=dim, nlist=8)
    frames = {k: similarity.semantic_dedup(
        corpus, dim=dim, nlist=8, threshold=0.3, centroids=cents,
        kernel=k).toPandas().set_index("id").sort_index()
        for k in ("auto", "sql", "numpy")}
    # both kernels agree on this fixture, so auto matches whichever
    # side of the floor the geometry lands on
    assert (frames["sql"].keep == frames["numpy"].keep).all()
    assert (frames["auto"].keep == frames["sql"].keep).all()
    with pytest.raises(ValueError, match="kernel"):
        similarity.semantic_dedup_pairs(corpus, dim=dim, kernel="av")


def test_reference_index_deep_append_chain_and_compaction(spark, docs):
    """Longevity contract (r11; VERDICT r10 #7): a 20-deep append
    chain stays VALUE-EQUAL to one union rebuild (tombstones keep
    cap-saturation monotone at any depth), the appended-mass
    accounting survives the chain and a save/load, and
    needs_compaction trips exactly at the policy threshold."""
    base = docs.filter("doc_id % 21 = 0").select("doc_id", "text")
    idx = dedup.build_reference_index(base, num_hashes=16, bands=4,
                                      bucket_cap=3)
    n_base = base.count()
    assert idx.n_base == n_base and idx.n_appended == 0
    assert idx.appended_fraction() == 0.0
    first = idx
    n_app = 0
    for w in range(1, 21):
        wave = docs.filter(f"doc_id % 21 = {w}").select(
            "doc_id", "text")
        nxt = idx.append(wave)
        # the ingest-loop lifecycle: the new index is materialized,
        # so the predecessor releases immediately (keeping all 21
        # alive is 60+ persisted frames — not the operator contract)
        if idx is not first:
            idx.release()
        idx = nxt
        n_app += wave.count()
    deep = idx
    assert deep.n_appended == n_app
    reb = dedup.build_reference_index(docs.select("doc_id", "text"),
                                      num_hashes=16, bands=4,
                                      bucket_cap=3)

    def snap(i):
        b = {(r.band, r.bh, tuple(r.ids))
             for r in i.ref_buckets.collect()}
        s = {(r["id_ref"], tuple(sorted(r["hs_r"])),
              tuple(r["sig_r"]), tuple(sorted(r["__sb"])))
             for r in i.ref_sets.collect()}
        return b, s
    assert snap(deep) == snap(reb)
    # compaction policy: ~20x the base mass appended -> overdue at
    # the default 1.0, quiet under a deliberately huge threshold
    frac = deep.appended_fraction()
    assert frac == pytest.approx(n_app / n_base)
    assert deep.needs_compaction()
    assert not deep.needs_compaction(max_appended_fraction=frac + 1)
    assert not first.needs_compaction()
    # accounting round-trips through save/load
    import tempfile
    d = tempfile.mkdtemp()
    deep.save(d)
    loaded = dedup.load_reference_index(spark, d)
    assert (loaded.n_base, loaded.n_appended) == (n_base, n_app)
    assert loaded.needs_compaction()
    for i in (first, deep, reb, loaded):
        i.release()


def test_ivf_compaction_due(spark, emb, tmp_path):
    """ivf_compaction_due (r11): appended-mass accounting in the
    centroid sidecar trips the rebuild trigger at the policy
    threshold and survives multiple appends."""
    from pandas_alchemy_spark.ext.similarity import (
        append_to_ivf_index, build_ivf_index, ivf_compaction_due)
    path = str(tmp_path / "ivf")
    base = emb.filter("vec_id % 4 <> 3")
    dim = len(emb.take(1)[0]["embedding"])
    build_ivf_index(base, path, dim=dim, nlist=8)
    st = ivf_compaction_due(path)
    assert st["n_base"] == base.count()
    assert st["appended_fraction"] == 0.0 and not st["due"]
    wave = emb.filter("vec_id % 8 = 3")
    n1 = append_to_ivf_index(wave, path)
    st = ivf_compaction_due(path)
    assert st["n_appended"] == n1
    assert not st["due"]  # ~1/8 of base < 0.25
    n2 = append_to_ivf_index(emb.filter("vec_id % 8 = 7"), path)
    st = ivf_compaction_due(path)
    assert st["n_appended"] == n1 + n2
    # ~2/7 of base clears the default 0.25
    assert st["due"]
    assert not ivf_compaction_due(
        path, max_appended_fraction=0.9)["due"]


def test_reference_index_compact_equals_rebuild(spark, docs):
    """compact() (r11): rebuild the index from its own stored
    signatures — value-equal to a fresh build on the union corpus
    (no tombstones), tombstone-preserving when saturation bound, and
    it resets the appended-mass accounting."""
    def snap(i):
        b = {(r.band, r.bh, tuple(r.ids))
             for r in i.ref_buckets.collect()}
        s = {(r["id_ref"], tuple(sorted(r["hs_r"])),
              tuple(r["sig_r"]), tuple(sorted(r["__sb"])))
             for r in i.ref_sets.collect()}
        o = {(r.band, r.bh) for r in i.ref_over.collect()}
        return b, s, o

    base = docs.filter("doc_id % 3 = 0").select("doc_id", "text")
    rest = docs.filter("doc_id % 3 <> 0").select("doc_id", "text")
    idx = dedup.build_reference_index(base, num_hashes=16, bands=4)
    grown = idx.append(rest)
    assert grown.needs_compaction(0.5)
    comp = grown.compact()
    reb = dedup.build_reference_index(
        base.unionAll(rest), num_hashes=16, bands=4)
    assert snap(comp) == snap(reb)
    assert comp.n_appended == 0
    assert comp.n_base == comp.ref_sets.count()
    assert not comp.needs_compaction(0.5)
    # with tombstones: planted boilerplate saturates at cap=3; the
    # compacted index must keep the key dropped (its fully-dropped
    # members are unrecoverable from ref_sets), same as an append
    boiler = docs.limit(1).select(F.col("text").alias("btext"))
    planted = (spark.range(10).crossJoin(boiler)
               .select((F.col("id") + 800000).alias("doc_id"),
                       F.col("btext").alias("text")))
    i2 = dedup.build_reference_index(base.unionAll(planted),
                                     num_hashes=16, bands=4,
                                     bucket_cap=3)
    assert i2.ref_over.count() > 0
    c2 = i2.compact()
    assert snap(c2) == snap(i2)  # fixed point: nothing resurrects
    # and the gate sees identical pairs through compacted vs grown
    q = docs.filter("doc_id % 7 = 3").select("doc_id", "text")
    p_a = {(r.id_new, r.id_ref) for r in dedup.cross_dedup_pairs(
        q, index=grown, threshold=0.4).collect()}
    p_b = {(r.id_new, r.id_ref) for r in dedup.cross_dedup_pairs(
        q, index=comp, threshold=0.4).collect()}
    assert p_a == p_b and p_a
    for i in (idx, grown, comp, reb, i2, c2):
        i.release()


def test_compact_ivf_index(spark, emb, tmp_path):
    """compact_ivf_index (r11): rebuilds the table from itself —
    same id set, fresh centroids, per-append file waves collapsed,
    counters and the compaction trigger reset, search still sane."""
    import glob as _glob

    from pandas_alchemy_spark.ext.similarity import (
        append_to_ivf_index, build_ivf_index, compact_ivf_index,
        ivf_compaction_due, search_ivf_index)
    path = str(tmp_path / "ivf")
    base = emb.filter("vec_id % 3 = 0")
    dim = len(emb.take(1)[0]["embedding"])
    build_ivf_index(base, path, dim=dim, nlist=8)
    append_to_ivf_index(emb.filter("vec_id % 3 = 1"), path)
    append_to_ivf_index(emb.filter("vec_id % 3 = 2"), path)
    st = ivf_compaction_due(path)
    assert st["due"]
    ids_before = {r[0] for r in
                  spark.read.parquet(path).select("vec_id").collect()}
    files_before = len(_glob.glob(f"{path}/cell=*/*.parquet"))
    compact_ivf_index(spark, path, nlist=8)
    st2 = ivf_compaction_due(path)
    assert not st2["due"] and st2["n_appended"] == 0
    assert st2["n_base"] == len(ids_before)
    ids_after = {r[0] for r in
                 spark.read.parquet(path).select("vec_id").collect()}
    assert ids_after == ids_before
    files_after = len(_glob.glob(f"{path}/cell=*/*.parquet"))
    assert files_after < files_before
    qs = (emb.limit(8).select(F.col("vec_id").alias("vec_id"),
                              "embedding"))
    got = search_ivf_index(spark, path, qs, k=3, nprobe=8)
    assert got.count() == 8 * 3


def test_reference_index_release_frees_checkpoint_blocks(spark, docs):
    """release() (r12; ADVICE r11): appended/compacted indexes are
    backed by localCheckpoint, whose blocks are NOT registered in the
    CacheManager — DataFrame.unpersist() is a no-op on them.
    release() must unpersist the checkpointed RDD itself so a long
    ingest chain reclaims each superseded index deterministically."""
    base = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    wave = docs.filter("doc_id % 2 = 1").select("doc_id", "text")

    def cached_ids():
        return {info.id() for info in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    before = cached_ids()
    idx = dedup.build_reference_index(base, num_hashes=16, bands=4)
    idx2 = idx.append(wave)  # eager localCheckpoints materialize now
    assert cached_ids() - before  # the new index really holds blocks
    idx2.release()
    idx.release()
    leaked = cached_ids() - before
    assert not leaked, f"index blocks survived release(): {leaked}"


def test_reference_index_lazy_append_disables_policy(spark, docs):
    """materialize=False appends skip the accounting count, so the
    counters would silently undercount; appended_fraction() must
    return None (policy disabled) from then on — including through a
    later materialized append — instead of needs_compaction() never
    tripping (r12; ADVICE r11)."""
    base = docs.filter("doc_id % 3 = 0").select("doc_id", "text")
    w1 = docs.filter("doc_id % 3 = 1").select("doc_id", "text")
    w2 = docs.filter("doc_id % 3 = 2").select("doc_id", "text")
    idx = dedup.build_reference_index(base, num_hashes=16, bands=4)
    assert idx.appended_fraction() == 0.0
    lazy = idx.append(w1, materialize=False)
    assert lazy.appended_fraction() is None
    assert not lazy.needs_compaction(max_appended_fraction=0.0)
    later = lazy.append(w2)  # materialized, but history is stale
    assert later.appended_fraction() is None
    # compact(materialize=False) likewise opts out (n_base unknown)
    lc = idx.compact(materialize=False)
    assert lc.appended_fraction() is None
    for i in (idx, lazy, later, lc):
        i.release()


def test_build_ivf_index_append_mode_merges_accounting(
        spark, emb, tmp_path):
    """build_ivf_index(mode='append') (r12; ADVICE r11): against an
    existing index it must behave as an append — reuse the sidecar's
    centroids (retraining on just the new batch would leave old rows
    assigned under a different geometry) and count the new batch as
    APPENDED mass, not absorb history into the base."""
    from pandas_alchemy_spark.ext.similarity import (
        build_ivf_index, ivf_compaction_due, search_ivf_index)
    path = str(tmp_path / "ivf")
    base = emb.filter("vec_id % 4 <> 3")
    wave = emb.filter("vec_id % 4 = 3")
    dim = len(emb.take(1)[0]["embedding"])
    cents = build_ivf_index(base, path, dim=dim, nlist=8)
    c2 = build_ivf_index(wave, path, dim=dim, nlist=8, mode="append")
    assert c2 == cents  # geometry reused, not retrained on the wave
    st = ivf_compaction_due(path)
    assert st["n_base"] == base.count()
    assert st["n_appended"] == wave.count()
    # the wave really landed in the table, and the grown index is
    # searchable end to end under the shared geometry
    assert (spark.read.parquet(path).count()
            == base.count() + wave.count())
    qs = base.limit(4).select("vec_id", "embedding")
    got = search_ivf_index(spark, path, qs, k=3, nprobe=8).collect()
    assert {r["query_id"] for r in got} == {
        r["vec_id"] for r in qs.collect()}


def test_semdedup_auto_decision_telemetry(spark, emb):
    """kernel='auto' records its decision tuple (inputs AND pick) in
    similarity.LAST_AUTO_DECISION so benches persist it into their
    artifacts (r12; VERDICT r11 #3 — the r11 emit-density existed
    only in run logs and the citation audit could not match it)."""
    similarity.LAST_AUTO_DECISION = None
    lab = similarity.semantic_dedup(
        emb, dim=len(emb.take(1)[0]["embedding"]), nlist=8,
        threshold=0.3, kernel="auto")
    lab.count()
    d = similarity.LAST_AUTO_DECISION
    assert d is not None
    assert set(d) == {"n_cells", "mean_cell_sq_work", "emit_density",
                      "work_floor", "picked"}
    assert d["picked"] in ("sql", "numpy")
    from pandas_alchemy_spark.ext.similarity import (
        _auto_semdedup_kernel)
    assert d["picked"] == _auto_semdedup_kernel(
        d["n_cells"], d["mean_cell_sq_work"] * d["n_cells"],
        d["emit_density"])


def test_reference_index_tombstone_append_compact_append(spark, docs):
    """Tombstone LIFECYCLE (r12; VERDICT r11 #6): a key saturated at
    build must stay dead through append -> compact -> append — never
    resurrect under-cap with only its surviving members — and the
    gate's hit set must equal a from-scratch rebuild on the union
    (which re-drops the same key) at every step."""
    boiler = docs.limit(1).select(F.col("text").alias("btext"))

    def planted(n, off):
        return (spark.range(n).crossJoin(boiler)
                .select((F.col("id") + off).alias("doc_id"),
                        F.col("btext").alias("text")))

    base = (docs.filter("doc_id % 3 = 0").select("doc_id", "text")
            .unionAll(planted(6, 800000)))
    w1 = (docs.filter("doc_id % 3 = 1").select("doc_id", "text")
          .unionAll(planted(2, 900000)))
    w2 = (docs.filter("doc_id % 3 = 2").select("doc_id", "text")
          .unionAll(planted(2, 950000)))
    # held-out query includes one boilerplate copy: a resurrected
    # bucket would hand it every planted id as a hit
    q = (docs.filter("doc_id % 7 = 1").select("doc_id", "text")
         .unionAll(planted(1, 990000)))

    def pairs(idx):
        return {(r.id_new, r.id_ref): round(r.jaccard, 9)
                for r in dedup.cross_dedup_pairs(
                    q, index=idx, threshold=0.3).collect()}

    i0 = dedup.build_reference_index(base, num_hashes=16, bands=4,
                                     bucket_cap=3)
    assert i0.ref_over.count() > 0  # saturation really bound
    i1 = i0.append(w1)
    ic = i1.compact()
    assert ic.ref_over.count() > 0  # tombstones survive compaction
    i2 = ic.append(w2)
    assert i2.ref_over.count() > 0
    reb = dedup.build_reference_index(
        base.unionAll(w1).unionAll(w2), num_hashes=16, bands=4,
        bucket_cap=3)
    p_chain, p_reb = pairs(i2), pairs(reb)
    assert p_chain == p_reb and p_chain
    # the boilerplate key is DEAD on both sides: the planted query
    # doc surfaces no planted reference id
    planted_hits = {(a, b) for (a, b) in p_chain
                    if a >= 990000 or b >= 800000}
    assert not planted_hits
    for i in (i0, i1, ic, i2, reb):
        i.release()


def test_maintain_reference_index(spark, docs):
    """maintain_reference_index (r12): append -> policy check ->
    compact-when-due in one call, superseded indexes released."""
    base = docs.filter("doc_id % 4 = 0").select("doc_id", "text")
    w1 = docs.filter("doc_id % 4 = 1").select("doc_id", "text")
    w2 = docs.filter("doc_id % 4 = 2").select("doc_id", "text")
    idx = dedup.build_reference_index(base, num_hashes=16, bands=4)
    idx, info1 = dedup.maintain_reference_index(
        idx, w1, max_appended_fraction=5.0)
    assert not info1["compacted"] and info1["append_s"] > 0
    assert 0 < info1["appended_fraction"] < 5.0
    # second wave crosses a tiny threshold -> compaction runs and
    # the accounting resets
    idx, info2 = dedup.maintain_reference_index(
        idx, w2, max_appended_fraction=0.5)
    assert info2["compacted"] and info2["compact_s"] > 0
    assert info2["appended_fraction"] == 0.0
    # the maintained index answers queries over ALL ingested docs
    q = docs.filter("doc_id % 4 = 3").select("doc_id", "text")
    reb = dedup.build_reference_index(
        base.unionAll(w1).unionAll(w2), num_hashes=16, bands=4)
    hits_m = {(r.id_new, r.id_ref) for r in dedup.cross_dedup_pairs(
        q, index=idx, threshold=0.3).collect()}
    hits_r = {(r.id_new, r.id_ref) for r in dedup.cross_dedup_pairs(
        q, index=reb, threshold=0.3).collect()}
    assert hits_m == hits_r and hits_m
    idx.release()
    reb.release()


def test_maintain_ivf_index(spark, emb, tmp_path):
    """maintain_ivf_index (r12): the ANN twin — append under frozen
    centroids, compact with fresh centroids when the appended
    fraction clears the policy, counters reset."""
    from pandas_alchemy_spark.ext.similarity import (
        build_ivf_index, maintain_ivf_index, search_ivf_index)
    path = str(tmp_path / "ivf")
    base = emb.filter("vec_id % 3 = 0")
    dim = len(emb.take(1)[0]["embedding"])
    build_ivf_index(base, path, dim=dim, nlist=8)
    info1 = maintain_ivf_index(
        spark, emb.filter("vec_id % 6 = 1"), path,
        max_appended_fraction=5.0)
    assert not info1["compacted"]
    assert info1["n_appended_now"] > 0
    assert info1["state"]["appended_fraction"] < 5.0
    info2 = maintain_ivf_index(
        spark, emb.filter("vec_id % 6 = 4"), path,
        max_appended_fraction=0.25)
    assert info2["compacted"] and info2["compact_s"] > 0
    assert info2["state"]["appended_fraction"] == 0.0
    # post-maintenance index holds every ingested row and searches
    n_all = (base.count()
             + emb.filter("vec_id % 6 = 1").count()
             + emb.filter("vec_id % 6 = 4").count())
    assert spark.read.parquet(path).count() == n_all
    qs = base.limit(4).select("vec_id", "embedding")
    assert search_ivf_index(spark, path, qs, k=3,
                            nprobe=4).count() == 12


def test_semantic_dedup_against_lifecycle(spark, emb, tmp_path):
    """semantic_dedup_against (r13; VERDICT r12 #6): new-batch vs
    persisted-IVF-reference near-dup pairs must be VALUE-EQUAL
    whether the reference index was built at once or grown through
    append_to_ivf_index — assignment is a pure function of
    (vector, centroids) and the geometry is frozen at build.  Also:
    pairs are strictly cross-corpus (no ref-ref, no new-new)."""
    from pandas_alchemy_spark.ext.similarity import (
        append_to_ivf_index, build_ivf_index, semantic_dedup_against)
    ref_a = emb.filter("vec_id % 3 = 0")
    ref_b = emb.filter("vec_id % 3 = 1")
    new = emb.filter("vec_id % 3 = 2")
    dim = len(emb.take(1)[0]["embedding"])
    grown = str(tmp_path / "grown")
    cents = build_ivf_index(ref_a, grown, dim=dim, nlist=8)
    append_to_ivf_index(ref_b, grown)
    scratch = str(tmp_path / "scratch")
    build_ivf_index(ref_a.unionAll(ref_b), scratch, dim=dim,
                    nlist=8, centroids=cents)

    def pairs(path):
        return {(r.id_new, r.id_ref, round(r.cosine, 9))
                for r in semantic_dedup_against(
                    spark, path, new, threshold=0.25).collect()}

    pg, ps = pairs(grown), pairs(scratch)
    assert pg == ps and pg
    new_ids = {r.vec_id for r in new.select("vec_id").collect()}
    ref_ids = {r.vec_id for r in
               ref_a.unionAll(ref_b).select("vec_id").collect()}
    assert {a for a, _, _ in pg} <= new_ids
    assert {b for _, b, _ in pg} <= ref_ids
    # nprobe=1 finds a subset of nprobe=2 (boundary pairs need the
    # wider probe), never a superset
    p1 = {(r.id_new, r.id_ref) for r in semantic_dedup_against(
        spark, grown, new, threshold=0.25, nprobe=1).collect()}
    assert p1 <= {(a, b) for a, b, _ in pg}


def test_semantic_dedup_against_recall_vs_brute(spark, emb, tmp_path):
    """Planted-near-dup recall for the cross-corpus embedding path:
    copies of reference vectors (tiny perturbation) in the new batch
    must be found against the persisted index."""
    from pandas_alchemy_spark.ext.similarity import (
        build_ivf_index, semantic_dedup_against)
    dim = len(emb.take(1)[0]["embedding"])
    ref = emb.filter("vec_id % 2 = 0")
    path = str(tmp_path / "ivf")
    build_ivf_index(ref, path, dim=dim, nlist=8)
    # plant: new ids 10^6 + k carry (almost) the reference vector
    planted = ref.limit(20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(1.000001 AS FLOAT))")
        .alias("embedding"))
    got = semantic_dedup_against(spark, path, planted,
                                 threshold=0.99)
    found = {(r.id_new - 1000000 == r.id_ref)
             for r in got.collect()
             if r.id_new - 1000000 == r.id_ref}
    n_hit = got.filter(
        F.col("id_new") - 1000000 == F.col("id_ref")).count()
    assert found == {True} or n_hit == 20
    assert n_hit >= 18  # >=90% planted recall at nprobe=2


def test_build_ivf_index_append_guards(spark, emb, tmp_path):
    """r13 (ADVICE r12): append mode must fail loudly instead of
    (a) degrading to a fresh build when no sidecar exists at the
    path — the exact r11 retrain-on-the-batch failure a typo'd path
    would silently reintroduce — and (b) assigning the batch under
    explicitly passed centroids while the sidecar keeps the prior
    geometry (later searches would probe the wrong cells)."""
    import pytest

    from pandas_alchemy_spark.ext.similarity import build_ivf_index
    dim = len(emb.take(1)[0]["embedding"])
    with pytest.raises(ValueError, match="no _ivf_centroids"):
        build_ivf_index(emb, str(tmp_path / "nonexistent"), dim=dim,
                        nlist=8, mode="append")
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(emb.filter("vec_id % 2 = 0"), path,
                            dim=dim, nlist=8)
    with pytest.raises(ValueError, match="frozen at build"):
        build_ivf_index(emb.filter("vec_id % 2 = 1"), path, dim=dim,
                        nlist=8, mode="append", centroids=cents)


def test_maintain_reference_index_release_old(spark, docs):
    """r13 (ADVICE r12): release() is destructive for checkpoint-
    backed indexes, so a caller still holding the passed-in index
    (a live stream's gate) needs release_old=False to keep its
    handle usable across the maintenance call."""
    base = docs.filter("doc_id % 4 = 0").select("doc_id", "text")
    w1 = docs.filter("doc_id % 4 = 1").select("doc_id", "text")
    q = docs.filter("doc_id % 4 = 3").limit(50).select(
        "doc_id", "text")
    idx = dedup.build_reference_index(base, num_hashes=16, bands=4)
    before = {(r.id_new, r.id_ref) for r in dedup.cross_dedup_pairs(
        q, index=idx, threshold=0.3).collect()}
    grown, info = dedup.maintain_reference_index(
        idx, w1, max_appended_fraction=5.0, release_old=False)
    # the OLD handle still answers identically after maintenance
    after_old = {(r.id_new, r.id_ref) for r in dedup.cross_dedup_pairs(
        q, index=idx, threshold=0.3).collect()}
    assert after_old == before
    # and the grown index covers the appended wave too
    grown_hits = {(r.id_new, r.id_ref) for r in dedup.cross_dedup_pairs(
        q, index=grown, threshold=0.3).collect()}
    assert grown_hits >= before
    idx.release()
    grown.release()
