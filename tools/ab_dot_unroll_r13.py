"""A/B: the interpreted `aggregate(zip_with(...))` dot-product fold vs
a statically unrolled left-associative codegen sum (dim known at plan
time).  Also checks VALUE equality bit-for-bit on the bench fixture.

Guide §1 (measure first) + §4.1 (built-ins/codegen beat interpreted
higher-order lambdas).  Interleaved min-of-N in ONE process, same
methodology as AB_SEMDEDUP_*.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_dot_unroll_r13")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").head(1)[0][0])
    n = emb.count()

    # the semdedup-shaped workload: cell self-join + per-candidate
    # cosine.  Reuse the real assignment machinery so the candidate
    # volume matches the bench's semdedup leg.
    from pandas_alchemy_spark.ext.similarity import (
        _assign_cells_udf, norm_expr, train_ivf_centroids)
    nlist = max(8, n // 256)
    cents = train_ivf_centroids(emb, dim=dim, nlist=nlist)
    cells = _assign_cells_udf(cents, nprobe=1)
    assigned = (emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
        norm_expr("embedding").alias("nrm"),
        F.explode(cells(F.col("embedding"))).alias("cell"))
        .persist())
    assigned.count()

    a = assigned.select("cell", F.col("id").alias("id_a"),
                        F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = assigned.select("cell", F.col("id").alias("id_b"),
                        F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cand = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))

    fold = ("aggregate(zip_with(va, vb, (x, y) -> x * y), "
            "cast(0.0 as double), (s, v) -> s + v)")
    unrolled = "cast(0.0 as double) + " + " + ".join(
        f"va[{i}] * vb[{i}]" for i in range(dim))

    def leg(dot):
        cos = F.expr(f"({dot}) / nullif(na * nb, 0.0)")
        out = (cand.select("id_a", "id_b", cos.alias("cosine"))
               .filter(F.col("cosine") >= 0.3))
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    times = {"fold": [], "unrolled": []}
    for _ in range(rounds):
        times["fold"].append(round(leg(fold), 3))
        times["unrolled"].append(round(leg(unrolled), 3))

    # value equality, bit for bit: f32 product then left-fold f64 sum
    # must be IDENTICAL between formulations
    cf = F.expr(f"({fold}) / nullif(na * nb, 0.0)")
    cu = F.expr(f"({unrolled}) / nullif(na * nb, 0.0)")
    diff = (cand.select(cf.alias("c1"), cu.alias("c2"))
            .filter("c1 is distinct from c2").count())

    art = {
        "fixture": {"sf_dir": sf_dir, "n": n, "dim": dim,
                    "nlist": nlist, "threshold": 0.3},
        "rounds": rounds,
        "fold_sec": times["fold"],
        "unrolled_sec": times["unrolled"],
        "fold_min": min(times["fold"]),
        "unrolled_min": min(times["unrolled"]),
        "speedup": round(min(times["fold"]) / min(times["unrolled"]), 3),
        "values_differ": diff,
    }
    print(json.dumps(art, indent=1))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_DOT_UNROLL_r13.json")
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1)


if __name__ == "__main__":
    main()
