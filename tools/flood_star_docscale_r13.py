"""Doc-scale star-pair cluster twin on the sf10 exact-copy fixture
(r13; the VERDICT r12 "Next round" #2 done-criterion): with the
bucket cap forced BELOW the fixture's 100-copies-per-doc group size,
every identical-signature group emits a representative star instead
of its clique — and the derived CLUSTER SET must equal the uncapped
(full-clique) run's.  The uncapped leg is the brute-force truth: the
fixture's true clusters are its exact-copy groups (plus any genuine
cross-doc near-dups), and the star formulation must reproduce them
with O(B) pair rows per flood instead of O(B²).

A 1-in-20-originals slice keeps every kept original's FULL 100-copy
flood (ids are orig + r*10M) while bounding the uncapped clique leg
at ~12M pairs — the check is about per-flood structure, which the
slice preserves exactly.

Usage: python tools/flood_star_docscale_r13.py [sf10_dir]
Prints ONE JSON line (copy to AB_FLOOD_STAR_r13.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CAP = 50  # < 100 copies/group -> the star path binds on EVERY flood


def main():
    sf10 = (sys.argv[1] if len(sys.argv) > 1
            else "/root/repo/.scratch/sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("flood_star_docscale")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from pandas_alchemy_spark.ext import dedup

    docs = (spark.read.parquet(f"{sf10}/documents.parquet")
            .filter("(doc_id % 10000000) % 20 = 0"))
    n_docs = docs.count()

    def cluster(cap):
        t0 = time.time()
        pairs = dedup.simhash_pairs(docs, max_hamming=3,
                                    bucket_cap=cap, fast_hash=True)
        n_pairs = pairs.count()
        cc = dedup.connected_components(pairs).localCheckpoint()
        n_comp = cc.select("component").distinct().count()
        return cc, n_pairs, n_comp, round(time.time() - t0, 2)

    cc_star, np_star, nc_star, s_star = cluster(CAP)
    cc_full, np_full, nc_full, s_full = cluster(None)
    # label-set equality: min-label components are canonical, so the
    # two runs must assign every id the SAME component
    from pyspark.sql import functions as F
    n_diff = (cc_star.alias("a").join(
        cc_full.alias("b"), "id", "full")
        .filter(~F.col("a.component").eqNullSafe(F.col("b.component")))
        .count())
    out = {"metric": "flood_star_docscale", "sf_dir": sf10,
           "n_docs": n_docs, "bucket_cap": CAP,
           "star_pairs": np_star, "clique_pairs": np_full,
           "pair_reduction_x": round(np_full / max(np_star, 1), 1),
           "star_components": nc_star, "full_components": nc_full,
           "labels_differ": n_diff,
           "clusters_equal": n_diff == 0 and nc_star == nc_full,
           "star_sec": s_star, "clique_sec": s_full,
           "cpu_mark": bench._cpu_mark(),
           "loadavg1": round(os.getloadavg()[0], 2)}
    print(json.dumps(out))
    if n_diff:
        sys.exit(1)


if __name__ == "__main__":
    main()
