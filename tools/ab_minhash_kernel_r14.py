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


def build_kernel(text_col, id_col, num_hashes, shingle_n):
    """The candidate kernel — same math as ext.dedup._minhash_base's
    SQL pipeline, per-batch in Python (hashlib.md5 == Spark md5())."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    P31 = 2147483647
    ks = np.arange(num_hashes, dtype=np.int64)
    mult = (2 * ks + 1)[:, None]
    addc = (12345 + ks * 7919)[:, None]
    pat = re.compile("[^a-zA-Z0-9]+")
    md5 = hashlib.md5

    def fn(batches):
        for pdf in batches:
            ids, counts, all_h, hss = [], [], [], []
            for did, txt in zip(pdf[id_col].tolist(),
                                pdf[text_col].tolist()):
                if txt is None:
                    continue
                toks = [t for t in
                        pat.sub(" ", txt).lower().split(" ") if t]
                if not toks:
                    continue
                m = len(toks) - shingle_n
                if m < 0:
                    m = 0
                hs = [int(md5(" ".join(toks[i:i + shingle_n])
                              .encode()).hexdigest()[:15], 16)
                      for i in range(m + 1)]
                ids.append(did)
                counts.append(len(hs))
                all_h.append(hs)
                hss.append(sorted(set(hs)))
            if not ids:
                continue
            flat = np.fromiter(
                (h for doc in all_h for h in doc), dtype=np.int64,
                count=sum(counts))
            flat %= P31
            vals = (mult * flat[None, :]) % P31
            vals += addc
            vals %= P31
            offsets = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=offsets[1:])
            sig = np.minimum.reduceat(vals, offsets, axis=1)
            yield pd.DataFrame({id_col: ids,
                                "signature": list(sig.T),
                                "hs": hss})

    return fn


def kernel_frame(spark, df, text_col, id_col, num_hashes, shingle_n,
                 repartition):
    from pyspark.sql import types as T
    sel = df.select(id_col, text_col)
    par = spark.sparkContext.defaultParallelism
    if repartition == "always" or (
            repartition == "auto"
            and sel.rdd.getNumPartitions() < par):
        sel = sel.repartition(par)
    id_field = [f for f in df.schema.fields if f.name == id_col][0]
    schema = T.StructType([
        id_field,
        T.StructField("signature", T.ArrayType(T.LongType())),
        T.StructField("hs", T.ArrayType(T.LongType()))])
    return sel.mapInPandas(
        build_kernel(text_col, id_col, num_hashes, shingle_n), schema)


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
    ap.add_argument("--repartition", default="auto",
                    choices=["auto", "never", "always"])
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

    from pandas_alchemy_spark.ext import dedup

    docs = spark.read.parquet(args.docs)
    n_docs = docs.count()
    # warm the python worker pool once (the bench session is warm too)
    import pyspark.sql.functions as F
    noop_udf = F.pandas_udf(lambda s: s, "long")
    (spark.range(10000).repartition(int(cpus))
     .select(noop_udf("id").alias("x")).write.format("noop")
     .mode("overwrite").save())

    # one equality pass up front (collected, canonicalized)
    sql_rows = dedup._minhash_base(
        docs, "text", "doc_id", args.num_hashes, args.shingle_n,
        False).collect()
    ker_rows = kernel_frame(
        spark, docs, "text", "doc_id", args.num_hashes,
        args.shingle_n, args.repartition).collect()
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
        sql_t.append(time_leg(lambda: dedup._minhash_base(
            docs, "text", "doc_id", args.num_hashes, args.shingle_n,
            False)))
        spark.sparkContext.setJobDescription("ab:kernel")
        ker_t.append(time_leg(lambda: kernel_frame(
            spark, docs, "text", "doc_id", args.num_hashes,
            args.shingle_n, args.repartition)))
        spark.sparkContext.setJobDescription(None)

    out = {"metric": "ab_minhash_kernel", "docs": args.docs,
           "n_docs": n_docs, "num_hashes": args.num_hashes,
           "shingle_n": args.shingle_n,
           "repartition": args.repartition,
           "outputs_equal": eq,
           "sql_runs": sql_t, "kernel_runs": ker_t,
           "sql_min": min(sql_t), "kernel_min": min(ker_t),
           "speedup": round(min(sql_t) / min(ker_t), 3),
           "loadavg1": round(os.getloadavg()[0], 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
