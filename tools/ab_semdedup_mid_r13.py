"""Moderate-band SemDeDup kernel A/B (r13; VERDICT r12 #4 of "Next
round").

The auto rule's density veto now applies ONLY in the moderate work
band (mean cell^2 work in [4096, 65536)) — SURVEY §19.2 admits no
controlled measurement exists there: the r10 "numpy 1.15x slower at
density ~1" point that motivated the veto was never tied to a pinned
geometry, and the r12 dense A/B (work 91,658 — DOMINANT band) showed
numpy 1.78x faster even at density 0.6, which retired the veto above
65,536.  This tool forges a fixture whose geometry LANDS mid-band at
veto-triggering density and settles the remaining question with the
same interleaved min-of-N, one-process harness as
AB_SEMDEDUP_DENSE_r12.

Fixture: 3,072 distinct seeded vectors x 20 exact copies (61,440
rows, dim 64), nlist 512 => cells of ~120 rows (mean cell^2 work
~14k, mid-band) with ~0.15 of candidate pairs passing threshold 0.3
(copies are cosine-1 with each other).  The harness ASSERTS the
measured geometry lands in the band it claims to test and records the
full decision tuple in the artifact.

Decision rule (same as r12): numpy reproducibly >= 1.2x faster =>
retire the moderate-band density veto; sql >= 1.2x faster => keep it
and quote the band; within jitter => keep sql (the DuckDB-replayable
conservative choice) and quote the band.

Usage: python tools/ab_semdedup_mid_r13.py [n_rounds=3]
Prints ONE JSON line (copy to AB_SEMDEDUP_MID_r13.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_DISTINCT = 3072
N_COPIES = 20
DIM = 64
NLIST = 512
THRESHOLD = 0.3
TAG = "lo"  # density ~0.15; the "hi" variant (614 x 100) lands ~1.0


def _fixture_path() -> str:
    return os.path.join(".scratch", f"ab_mid_r13_{TAG}",
                        "embeddings.parquet")


def make_fixture(spark) -> str:
    """Deterministic mid-band fixture written once under .scratch."""
    import numpy as np
    path = _fixture_path()
    if os.path.isdir(path):
        return path
    rng = np.random.default_rng(1301)
    base = rng.standard_normal((N_DISTINCT, DIM)).astype(np.float32)
    rows = [(int(b * N_COPIES + c), base[b].tolist())
            for b in range(N_DISTINCT) for c in range(N_COPIES)]
    (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
     .repartition(32).write.mode("overwrite").parquet(path))
    return path


def main():
    global N_DISTINCT, N_COPIES, TAG
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if len(sys.argv) > 3:
        # the high-density variant: same mid-band work, emit density
        # near 1.0 (one ~100-copy flood per cell) — the exact regime
        # the r10 single-sample "numpy 1.15x slower at density ~1"
        # point claimed
        N_DISTINCT, N_COPIES = int(sys.argv[2]), int(sys.argv[3])
        TAG = sys.argv[4] if len(sys.argv) > 4 else "hi"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_semdedup_mid")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from pandas_alchemy_spark.ext import similarity
    import bench
    emb = spark.read.parquet(make_fixture(spark))

    legs: dict[str, list] = {"sql": [], "numpy": []}
    labels: dict[str, int] = {}

    def one(kernel: str) -> float:
        t0 = time.time()
        lab = similarity.semantic_dedup(
            emb, dim=DIM, nlist=NLIST, threshold=THRESHOLD,
            kernel=kernel)
        labels[kernel] = lab.count()
        return round(time.time() - t0, 2)

    loads = []
    for r in range(n_rounds):
        for k in ("sql", "numpy"):
            loads.append(round(os.getloadavg()[0], 2))
            s = one(k)
            legs[k].append(s)
            print(f"# round {r + 1} {k}: {s}s", file=sys.stderr)
    same_rows = len(set(labels.values())) == 1
    # the geometry the auto rule sees — and the band assertion that
    # makes this artifact ABOUT the moderate band
    similarity.LAST_AUTO_DECISION = None
    t0 = time.time()
    similarity.semantic_dedup(emb, dim=DIM, nlist=NLIST,
                              threshold=THRESHOLD,
                              kernel="auto").count()
    auto_s = round(time.time() - t0, 2)
    dec = similarity.LAST_AUTO_DECISION
    work = dec["mean_cell_sq_work"]
    # band bounds as LITERALS: this tool's measurements RETIRED the
    # moderate-band tiering, so the constants it tested no longer
    # exist in the rule — the artifact stays reproducible against
    # the regime it claimed (work in [4096, 65536), density > 0.05)
    in_band = 4096 <= work < 65536
    dense_enough = dec["emit_density"] > 0.05
    min_sql, min_np = min(legs["sql"]), min(legs["numpy"])
    out = {"metric": f"ab_semdedup_mid_{TAG}",
           "fixture": {"n_distinct": N_DISTINCT, "n_copies": N_COPIES,
                       "dim": DIM, "nlist": NLIST,
                       "threshold": THRESHOLD},
           "n_rounds": n_rounds,
           "sql_s": legs["sql"], "numpy_s": legs["numpy"],
           "min_sql_s": min_sql, "min_numpy_s": min_np,
           "ratio_sql_over_numpy": round(min_sql / min_np, 3),
           "rows_equal": same_rows,
           "auto_s": auto_s,
           "auto_decision": dec,
           "geometry_in_moderate_band": bool(in_band),
           "density_above_ceiling": bool(dense_enough),
           "loadavg1": loads,
           "cpu_mark": bench._cpu_mark()}
    print(json.dumps(out))
    if not (in_band and dense_enough):
        print("WARNING: fixture geometry missed the target regime - "
              "retune N_COPIES/NLIST before citing this artifact",
              file=sys.stderr)


if __name__ == "__main__":
    main()
