"""A/B: Arrow mapInPandas SimHash signature kernel (shipped
`simhash_signature` md5 path) vs the codegen explode + SUM(CASE)
SQL formulation (`_simhash_signature_sql`) it replaced on that path.
Interleaved min-of-N in ONE process; (id, sh) asserted bit-equal
before any time counts.

Usage: python tools/ab_simhash_kernel_r14.py [--n 3] [--docs PATH]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--docs",
                    default="/root/testdata/sf0.1/documents.parquet")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_simhash_kernel_r14")
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
    import pyspark.sql.functions as F
    noop_udf = F.pandas_udf(lambda s: s, "long")
    (spark.range(10000).repartition(int(cpus))
     .select(noop_udf("id").alias("x")).write.format("noop")
     .mode("overwrite").save())

    sql_rows = dedup._simhash_signature_sql(
        docs, "text", "doc_id", 60, False).collect()
    ker_rows = dedup.simhash_signature(docs).collect()
    a = sorted((r["doc_id"], r["sh"]) for r in sql_rows)
    b = sorted((r["doc_id"], r["sh"]) for r in ker_rows)
    eq = a == b
    if not eq:
        diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        print(f"MISMATCH rows={len(a)} vs {len(b)} idx={diff}",
              file=sys.stderr)
        for i in diff[:1]:
            print("sql:", a[i], "ker:", b[i], file=sys.stderr)

    def time_leg(make):
        t0 = time.time()
        make().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    sql_t, ker_t = [], []
    for _ in range(args.n):
        spark.sparkContext.setJobDescription("ab:sql")
        sql_t.append(time_leg(lambda: dedup._simhash_signature_sql(
            docs, "text", "doc_id", 60, False)))
        spark.sparkContext.setJobDescription("ab:kernel")
        ker_t.append(time_leg(lambda: dedup.simhash_signature(docs)))
        spark.sparkContext.setJobDescription(None)

    out = {"metric": "ab_simhash_kernel", "docs": args.docs,
           "n_docs": n_docs, "outputs_equal": eq,
           "sql_runs": sql_t, "kernel_runs": ker_t,
           "sql_min": min(sql_t), "kernel_min": min(ker_t),
           "speedup": round(min(sql_t) / min(ker_t), 3),
           "loadavg1": round(os.getloadavg()[0], 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
