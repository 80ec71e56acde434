"""A/B: Arrow mapInPandas MinHash signature kernel vs the SQL
explode+K-min-aggregate `_minhash_base` (VERDICT r13 next-round item
2; guide §4.1/§4.2).  Interleaved min-of-N in ONE process; every leg
asserts (id, signature, hs-set) equality before its time counts.

The kernel computes tokenize → shingle → md5-60bit → K affine minima
+ distinct hash set per document in one Python pass over Arrow
batches — no explode, no exchange (a doc's shingles never leave its
row), md5 via hashlib (bit-identical to Spark's md5()).

Usage: python tools/ab_minhash_kernel_r14.py [--n 3] [--docs PATH]
           [--num-hashes 16] [--shingle-n 3] [--repartition {auto,never,always}]
Prints one JSON line with per-leg times and equality verdicts.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kernel_frame(spark, df, text_col, id_col, num_hashes, shingle_n):
    """The SHIPPED md5 Arrow transport (ext.dedup._minhash_base
    dispatches to it for fast_hash=False)."""
    from pandas_alchemy_spark.ext import dedup
    return dedup._minhash_base(df, text_col, id_col, num_hashes,
                               shingle_n, False)


def sql_frame(df, text_col, id_col, num_hashes, shingle_n):
    """The codegen explode + K-MIN-aggregate formulation (the r13
    shape for md5, still shipped as the fast_hash transport)."""
    from pandas_alchemy_spark.ext import dedup
    return dedup._minhash_base_sql(df, text_col, id_col, num_hashes,
                                   shingle_n, False)


def canon(rows, id_col):
    return sorted((r[id_col], tuple(r["signature"]),
                   tuple(sorted(r["hs"]))) for r in rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--docs",
                    default="/root/testdata/sf0.1/documents.parquet")
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--shingle-n", type=int, default=3)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_minhash_kernel_r14")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.optimizer.excludedRules",
                     "org.apache.spark.sql.catalyst.optimizer."
                     "InferFiltersFromGenerate")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.docs)
    n_docs = docs.count()
    # warm the python worker pool once (the bench session is warm too)
    import pyspark.sql.functions as F
    noop_udf = F.pandas_udf(lambda s: s, "long")
    (spark.range(10000).repartition(int(cpus))
     .select(noop_udf("id").alias("x")).write.format("noop")
     .mode("overwrite").save())

    # one equality pass up front (collected, canonicalized)
    sql_rows = sql_frame(docs, "text", "doc_id", args.num_hashes,
                         args.shingle_n).collect()
    ker_rows = kernel_frame(spark, docs, "text", "doc_id",
                            args.num_hashes, args.shingle_n).collect()
    eq = canon(sql_rows, "doc_id") == canon(ker_rows, "doc_id")
    if not eq:
        a, b = canon(sql_rows, "doc_id"), canon(ker_rows, "doc_id")
        diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        print(f"MISMATCH rows={len(a)} vs {len(b)} first_diff_idx={diff}",
              file=sys.stderr)
        for i in diff[:1]:
            print("sql:", a[i], file=sys.stderr)
            print("ker:", b[i], file=sys.stderr)

    def time_leg(make):
        t0 = time.time()
        make().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    sql_t, ker_t = [], []
    for _ in range(args.n):
        spark.sparkContext.setJobDescription("ab:sql")
        sql_t.append(time_leg(lambda: sql_frame(
            docs, "text", "doc_id", args.num_hashes, args.shingle_n)))
        spark.sparkContext.setJobDescription("ab:kernel")
        ker_t.append(time_leg(lambda: kernel_frame(
            spark, docs, "text", "doc_id", args.num_hashes,
            args.shingle_n)))
        spark.sparkContext.setJobDescription(None)

    out = {"metric": "ab_minhash_kernel", "docs": args.docs,
           "n_docs": n_docs, "num_hashes": args.num_hashes,
           "shingle_n": args.shingle_n,
           "outputs_equal": eq,
           "sql_runs": sql_t, "kernel_runs": ker_t,
           "sql_min": min(sql_t), "kernel_min": min(ker_t),
           "speedup": round(min(sql_t) / min(ker_t), 3),
           "loadavg1": round(os.getloadavg()[0], 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
