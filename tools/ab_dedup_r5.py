"""Warm-isolated interleaved timing for the round-4 bench regressions
(dedup_simhash 1.97x, ivf_ann 1.29x, plus dedup_minhash for context).

ext/dedup.py and ext/similarity.py are UNCHANGED since rounds 2/3 for
these code paths (git log), so there is no code A/B to run — the
question is whether the round-4 inflation was box tenancy.  Method:
same session config as bench.py, one warm-up pass, then N interleaved
timed runs per query on a QUIET box (record loadavg), medians against
the r3 (quiet) and r4 (contended) bench numbers.

Usage: python tools/ab_dedup_r5.py [n_rounds]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_dedup_r5")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled",
                     "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    queries = {
        "dedup_simhash": E.q_dedup_simhash,
        "dedup_minhash": E.q_dedup_minhash,
        "ivf_ann": E.q_ivf_ann,
    }

    def run(fn):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return time.time() - t0

    # warm-up (JIT, parquet footers, code paths)
    for name, fn in queries.items():
        run(fn)

    times: dict[str, list[float]] = {k: [] for k in queries}
    loads = []
    for i in range(n_rounds):
        loads.append(os.getloadavg()[0])
        for name, fn in queries.items():   # interleaved
            times[name].append(run(fn))

    out = {
        "loadavg_during": [round(x, 2) for x in loads],
        "n_rounds": n_rounds,
        "medians": {k: round(statistics.median(v), 3)
                    for k, v in times.items()},
        "all": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
