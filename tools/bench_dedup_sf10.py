"""Run the LLM-pipeline dedup/ANN block at document scale (~500k docs,
~200k embeddings; tools/make_scaled_docs.py = 100 structure-preserving
replicas of sf0.1) with the TPC-H sf10 treatment: event-log task-time
skew audit per stage, CC converged-in-N captured, bucket-cap drop
counts surfaced — VERDICT r5 item 2.

Prints one JSON line -> BENCH_r06_dedup_sf10.json.

Usage: python tools/bench_dedup_sf10.py [docs_dir]
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stderr

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/root/repo/.scratch/eventlog_dedup"


def main():
    docs_dir = (sys.argv[1] if len(sys.argv) > 1
                else "/root/repo/.scratch/docs10")
    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master("local[32]")
             .appName("dedup_sf10")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled",
                     "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.dir", EVDIR)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from pandas_alchemy_spark.ext import dedup, similarity, text

    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    emb = spark.read.parquet(f"{docs_dir}/embeddings.parquet")
    n_docs, n_vecs = docs.count(), emb.count()  # warms footers too
    dim = len(emb.select("embedding").head(1)[0][0])

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    times, extra = {}, {}

    def run(name, fn):
        t0 = time.time()
        buf = io.StringIO()
        try:
            with redirect_stderr(buf):
                fn()
            times[name] = round(time.time() - t0, 2)
        except Exception as ex:
            times[name] = -1.0
            extra[name + "_error"] = str(ex)[:200]
        err = buf.getvalue()
        sys.stderr.write(err)
        m = re.search(r"converged in (\d+)/(\d+) round", err)
        if m:
            extra["cc_converged_in"] = int(m.group(1))
            extra["cc_max_iters"] = int(m.group(2))
        for what, n in re.findall(
                r"(\w+): dropped (\d+) oversized LSH bucket", err):
            extra[f"{name}_capped_{what}"] = int(n)
        print(f"{name}: {times[name]}s", file=sys.stderr)

    run("dedup_exact",
        lambda: noop(dedup.exact_dedup(docs)))
    run("dedup_minhash",
        lambda: noop(dedup.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, threshold=0.4)))
    run("dedup_simhash",
        lambda: noop(dedup.simhash_pairs(docs, max_hamming=8)))
    run("dedup_cluster",
        lambda: noop(dedup.cluster_near_dups(
            docs, threshold=0.4, num_hashes=16, bands=4)))
    q5 = emb.filter(F.col("vec_id") < 5)
    run("lsh_ann",
        lambda: noop(similarity.lsh_topk(emb, q5, k=5, dim=dim)))
    run("ivf_ann",
        lambda: noop(similarity.ivf_topk(emb, q5, k=5, dim=dim,
                                         nlist=16, nprobe=6)))
    # planes="auto" sizes buckets to the corpus (fixed planes=10 at
    # 200k vectors measured 149x the 2k-vector time: 1024 buckets x
    # ~195 members is quadratic pair generation)
    run("emb_near_dup",
        lambda: noop(similarity.embedding_near_dup_pairs(
            emb, dim=dim, planes="auto", threshold=0.45)))
    run("seq_pack",
        lambda: noop(text.pack_sequences(
            docs, capacity=2048, n_shards=64)))

    total = round(sum(t for t in times.values() if t >= 0), 2)
    load = [round(x, 2) for x in os.getloadavg()]
    spark.stop()  # flush the event log

    # --- skew: per-stage max/median task duration from the event log
    import statistics
    stages: dict[int, list[int]] = {}
    files = []
    for p in os.listdir(EVDIR):
        full = os.path.join(EVDIR, p)
        if app_id in p:
            if os.path.isdir(full):
                files += [os.path.join(full, f)
                          for f in sorted(os.listdir(full))
                          if f.startswith("events")]
            else:
                files.append(full)
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    dur = (ti.get("Finish Time", 0)
                           - ti.get("Launch Time", 0))
                    stages.setdefault(ev.get("Stage ID"),
                                      []).append(dur)
    skew = []
    for sid, durs in stages.items():
        if len(durs) < 8:
            continue
        med = statistics.median(durs)
        if med <= 100:  # sub-100ms stages are scheduling noise
            continue
        skew.append({"stage": sid, "n_tasks": len(durs),
                     "med_ms": int(med), "max_ms": max(durs),
                     "ratio": round(max(durs) / med, 1)})
    skew.sort(key=lambda s: -s["ratio"])

    print(json.dumps({
        "metric": "dedup_docscale_total", "value": total, "unit": "sec",
        "queries": times, "n_docs": n_docs, "n_vecs": n_vecs,
        "dim": dim, "loadavg": load, **extra,
        "skew_top": skew[:8],
        "worst_ratio": skew[0]["ratio"] if skew else None,
    }))


if __name__ == "__main__":
    main()
