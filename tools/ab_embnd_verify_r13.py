"""Interleaved A/B (r13): embedding_near_dup_pairs verify_kernel
"numpy" (bucket-local applyInPandas verify, candidates never
materialize as rows) vs "sql" (pre-r13 pair explode -> dedup exchange
-> two vector joins -> Catalyst fold).  Both legs run in ONE process,
alternating, min-of-3 each, noop sink; value contract asserted on the
spot (pair sets equal, cosines bit-equal).

Geometries = the two committed bench legs:
  - doc scale (202k x 64d, .scratch/docs10): planes/tables auto,
    threshold 0.93 (tools/bench_dedup_sf10.py)
  - sf0.1 (20k vectors): planes auto, tables=4, target_recall=None,
    threshold 0.45 (bench.py emb_near_dup_lsh)

Usage: python tools/ab_embnd_verify_r13.py [out.json]
"""
from __future__ import annotations

import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_mark  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "AB_EMBND_VERIFY_r13.json"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .appName("ab_embnd_verify")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from pandas_alchemy_spark.ext import similarity as S

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    legs = {}
    docsrc = "/root/repo/.scratch/docs10/embeddings.parquet"
    for name, src, cut, kwargs in [
        ("docscale_t093", docsrc, None,
         dict(planes="auto", tables="auto", threshold=0.93)),
        ("doc50k_t093", docsrc, 50000,
         dict(planes="auto", tables="auto", threshold=0.93)),
        ("doc20k_t093", docsrc, 20000,
         dict(planes="auto", tables="auto", threshold=0.93)),
        ("doc5k_t093", docsrc, 5000,
         dict(planes="auto", tables="auto", threshold=0.93)),
        ("sf01_t045",
         "/root/testdata/sf0.1/embeddings.parquet", None,
         dict(planes="auto", tables=4, target_recall=None,
              threshold=0.45)),
    ]:
        emb = spark.read.parquet(src)
        if cut is not None:
            from pyspark.sql import functions as F
            emb = emb.filter(F.col("vec_id") < cut)
        dim = len(emb.select("embedding").head(1)[0][0])
        emb.count()  # warm footers

        def run(kern):
            t0 = time.time()
            noop(S.embedding_near_dup_pairs(
                emb, dim=dim, verify_kernel=kern, **kwargs))
            return round(time.time() - t0, 3)

        times = {"numpy": [], "sql": []}
        for _ in range(3):
            for k in ("numpy", "sql"):
                times[k].append(run(k))
        # value contract: identical pair sets, bit-identical cosines
        def grab(kern):
            return {(r["id_a"], r["id_b"]): struct.pack("<d", r["cosine"])
                    for r in S.embedding_near_dup_pairs(
                        emb, dim=dim, verify_kernel=kern,
                        **kwargs).collect()}
        a, b = grab("numpy"), grab("sql")
        spark.catalog.clearCache()
        legs[name] = {
            "numpy_runs": times["numpy"], "sql_runs": times["sql"],
            "numpy_min": min(times["numpy"]), "sql_min": min(times["sql"]),
            "speedup": round(min(times["sql"]) / min(times["numpy"]), 3),
            "n_pairs": len(a),
            "pairs_equal": set(a) == set(b),
            "bits_equal": set(a) == set(b) and all(
                a[k] == b[k] for k in a),
        }
        print(f"{name}: numpy {legs[name]['numpy_min']}s sql "
              f"{legs[name]['sql_min']}s speedup "
              f"{legs[name]['speedup']}x pairs {legs[name]['n_pairs']} "
              f"bits_equal {legs[name]['bits_equal']}", file=sys.stderr)
        assert legs[name]["pairs_equal"] and legs[name]["bits_equal"]

    art = {"metric": "ab_embnd_verify_kernel", "legs": legs,
           "cpu_mark": _cpu_mark(), "loadavg": list(os.getloadavg())}
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))


if __name__ == "__main__":
    main()
