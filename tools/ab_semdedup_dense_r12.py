"""Dense-regime SemDeDup kernel A/B (r12; VERDICT r11 #4).

The exact-copy sf10 fixture (200k vecs, threshold 0.3 — pair-dense:
emit density ~0.6) has measured BOTH orderings across rounds on
different boxes: r10 sql 158.8 / numpy 183.2, r11 sql 311.5 /
numpy 244.2.  kernel="auto" currently keeps the DuckDB-replayable SQL
path there (density > 0.05 ceiling).  This tool settles the ordering
with the only measurement that controls the box lottery: N
INTERLEAVED runs of each kernel back-to-back in ONE process, min-of-N
per kernel.

Decision rule the verdict set: numpy reproducibly >= 1.2x faster =>
lower the density ceiling / add a second tier; within jitter => pin
the current rule and quote the measured band.

Usage: python tools/ab_semdedup_dense_r12.py [sf_dir] [n_rounds=3]
Prints ONE JSON line (copy to AB_SEMDEDUP_DENSE_r12.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_semdedup_dense")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from pandas_alchemy_spark.ext import similarity
    import bench
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").head(1)[0][0])
    nlist = max(8, emb.count() // 256)
    legs: dict[str, list] = {"sql": [], "numpy": []}
    labels: dict[str, int] = {}

    def one(kernel: str) -> float:
        t0 = time.time()
        lab = similarity.semantic_dedup(emb, dim=dim, nlist=nlist,
                                        threshold=0.3, kernel=kernel)
        n = lab.count()
        labels[kernel] = n
        return round(time.time() - t0, 2)

    loads = []
    for r in range(n_rounds):
        for k in ("sql", "numpy"):
            loads.append(round(os.getloadavg()[0], 2))
            s = one(k)
            legs[k].append(s)
            print(f"# round {r + 1} {k}: {s}s", file=sys.stderr)
    # value contract: both kernels label the same rows
    same_rows = len(set(labels.values())) == 1
    # geometry the auto rule sees on this fixture (one extra decision
    # pass; cheap relative to the legs)
    similarity.LAST_AUTO_DECISION = None
    t0 = time.time()
    lab = similarity.semantic_dedup(emb, dim=dim, nlist=nlist,
                                    threshold=0.3, kernel="auto")
    lab.count()
    auto_s = round(time.time() - t0, 2)
    min_sql, min_np = min(legs["sql"]), min(legs["numpy"])
    out = {"metric": "ab_semdedup_dense", "sf_dir": sf_dir,
           "n_rounds": n_rounds, "nlist": nlist, "threshold": 0.3,
           "sql_s": legs["sql"], "numpy_s": legs["numpy"],
           "min_sql_s": min_sql, "min_numpy_s": min_np,
           "ratio_sql_over_numpy": round(min_sql / min_np, 3),
           "rows_equal": same_rows,
           "auto_s": auto_s,
           "auto_decision": similarity.LAST_AUTO_DECISION,
           "loadavg1": loads,
           "cpu_mark": bench._cpu_mark()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
