"""Same-box interleaved A/B for the r12 simhash_pairs rewrite
(signature-level pairing): old per-doc formulation (inlined below,
verbatim from the pre-rewrite module) vs the shipped one, on both
doc-scale fixtures.  Usage: python tools/ab_simhash_r12.py
Prints ONE JSON line (copy to AB_SIMHASH_r12.json)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_simhash")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from pandas_alchemy_spark.ext import dedup
    import bench

    def old_simhash_pairs(df, max_hamming=3, bucket_cap=2000):
        # the pre-r12 per-doc formulation, kept verbatim for the A/B
        sig = dedup.simhash_signature(df)
        chunked = sig.select(
            "doc_id", "sh",
            F.explode(F.expr(
                "transform(sequence(0, 3), c -> struct(c as chunk, "
                "(shiftright(sh, c * 15) & 32767) as ch))"
            )).alias("cc")).select("doc_id", "sh", "cc.chunk", "cc.ch")
        buckets = (chunked.groupBy("chunk", "ch")
                   .agg(F.array_sort(F.collect_list(F.struct(
                       F.col("doc_id").alias("id"),
                       F.col("sh")))).alias("ms"))
                   .filter(F.size("ms") > 1))
        buckets = dedup._cap_buckets(buckets, "ms", bucket_cap,
                                     "old_simhash")
        pairs = (buckets.select(F.explode(F.expr(
            "flatten(transform(ms, (x, i) -> "
            "transform(slice(ms, i + 2, size(ms)), y -> "
            "struct(x.id as id_a, y.id as id_b, "
            "x.sh as sh_a, y.sh as sh_b))))")).alias("p"))
            .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
            .dropDuplicates(["id_a", "id_b"]))
        ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        return (pairs.select("id_a", "id_b", ham.alias("hamming"))
                .filter(F.col("hamming") <= max_hamming))

    out = {"metric": "ab_simhash", "max_hamming": 8,
           "cpu_mark": bench._cpu_mark(), "fixtures": {}}
    for tag, path in (("docs10", ".scratch/docs10"),
                      ("sf10", ".scratch/sf10")):
        docs = spark.read.parquet(f"{path}/documents.parquet")
        row = {}
        for name, fn in (("old", old_simhash_pairs),
                         ("new", dedup.simhash_pairs)):
            t0 = time.time()
            (fn(docs, max_hamming=8)
             .write.format("noop").mode("overwrite").save())
            row[f"{name}_s"] = round(time.time() - t0, 2)
            print(f"# {tag} {name}: {row[f'{name}_s']}s",
                  file=sys.stderr)
        # value contract: identical pair sets (hash-free quick form:
        # counts + hamming sum; the oracle hash pins full equality)
        agg = [("n", F.count(F.lit(1))), ("hsum", F.sum("hamming"))]
        for name, fn in (("old", old_simhash_pairs),
                         ("new", dedup.simhash_pairs)):
            r = (fn(docs, max_hamming=8)
                 .agg(*[e.alias(a) for a, e in agg]).collect()[0])
            row[f"{name}_pairs"] = r["n"]
            row[f"{name}_hamming_sum"] = int(r["hsum"] or 0)
        row["ratio_old_over_new"] = round(
            row["old_s"] / row["new_s"], 3)
        row["values_equal"] = (
            row["old_pairs"] == row["new_pairs"]
            and row["old_hamming_sum"] == row["new_hamming_sum"])
        out["fixtures"][tag] = row
    out["load1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
