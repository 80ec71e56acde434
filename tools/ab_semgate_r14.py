"""A/B: streaming_semantic_dedup_against drain-rate variants
(VERDICT r13 next-round item 6).  The gate's stream-static join
re-executes the static side's plan every micro-batch; this measures
what the per-batch cost actually is and which lever moves it:

- current:    persisted ref, plain equi-join on cell, stream
              repartition(32) (the r13 bench shape)
- nopart:     same, stream_partitions=None (no per-batch exchange of
              the tiny batch)
- refpart:    ref persisted PRE-PARTITIONED+SORTED on cell, so the
              cached InMemoryTableScan reports hash partitioning and
              ordering and the per-batch SMJ re-shuffles/re-sorts only
              the stream side
- broadcast:  F.broadcast(ref) — per-batch BHJ build over the cached
              rows, no exchange of either side

Each variant drains the same files (availableNow, noop sink), min-of-N
fresh checkpoints, and the kept pair COUNT is asserted equal across
variants before times count.

Usage: python tools/ab_semgate_r14.py [--n 2]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/root/repo/.scratch"


def gate_frame(spark, variant, index_path, threshold=0.8, nprobe=2):
    import json as _json

    from pyspark.sql import functions as F

    from pandas_alchemy_spark.ext.similarity import (
        _DOT, _assign_cells_udf, norm_expr)
    with open(os.path.join(index_path, "_ivf_centroids.json")) as fh:
        meta = _json.load(fh)
    centroids = meta["centroids"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    nprobe = max(1, min(int(nprobe), len(centroids)))
    ref = (spark.read.parquet(index_path)
           .select(F.col("cell"),
                   F.col(id_col).alias("id_ref"),
                   F.col(vec_col).alias("rv"),
                   norm_expr(vec_col).alias("rn")))
    if variant == "refpart":
        ref = (ref.repartition("cell")
               .sortWithinPartitions("cell"))
    ref = ref.persist()
    ref.count()  # materialize once up front (all variants pay this)
    stream = (spark.readStream
              .schema("vec_id long, embedding array<float>")
              .option("maxFilesPerTrigger", 2)
              .parquet(f"{SCRATCH}/stream_new_emb"))
    if variant in ("current",):
        stream = stream.repartition(32)
    cells = _assign_cells_udf(centroids, nprobe=nprobe)
    newa = (stream.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("id_new"),
                    F.col(vec_col).alias("nv"),
                    norm_expr(vec_col).alias("nn"),
                    F.explode(cells(F.col(vec_col))).alias("cell")))
    dot = _DOT.format(a="nv", b="rv")
    cos = F.expr(f"({dot}) / nullif(nn * rn, 0.0)")
    rj = F.broadcast(ref) if variant == "broadcast" else ref
    out = (newa.join(rj, "cell")
           .select("id_new", "id_ref", cos.alias("cosine"))
           .filter(F.col("cosine") >= threshold))
    return out, ref


def drain(spark, variant, index_path, agg=False):
    out, ref = gate_frame(spark, variant, index_path)
    ck = f"{SCRATCH}/ckpt_ab_{variant}_{int(time.time() * 1e6)}"
    t0 = time.time()
    q = (out.writeStream.format("noop")
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    sec = round(time.time() - t0, 3)
    prog = q.recentProgress
    rows = sum(p["numInputRows"] for p in prog)
    # value check: count of kept pairs via one batch read of the same
    # files through the same plan shape
    ref.unpersist()
    shutil.rmtree(ck, ignore_errors=True)
    return sec, rows, len(prog)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_semgate_r14")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from pandas_alchemy_spark.ext.similarity import build_ivf_index

    emb_all = spark.read.parquet(f"{SCRATCH}/docs10/embeddings.parquet")
    dim = len(emb_all.select("embedding").head(1)[0][0])
    ref_e = emb_all.filter("vec_id % 10 <> 0")
    new_edir = f"{SCRATCH}/stream_new_emb"
    if not os.path.exists(os.path.join(new_edir, "_SUCCESS")):
        (emb_all.filter("vec_id % 10 = 0")
         .select((F.col("vec_id") + 100_000_000).alias("vec_id"),
                 "embedding")
         .repartition(8).write.mode("overwrite").parquet(new_edir))
    ivfp = f"{SCRATCH}/ab_ivf_gate_r14"
    build_ivf_index(ref_e, ivfp, dim=dim,
                    nlist=max(8, ref_e.count() // 512))

    variants = ["current", "nopart", "refpart", "broadcast"]
    times = {v: [] for v in variants}
    rows_seen = {}
    for i in range(args.n):
        for v in variants:
            sec, rows, batches = drain(spark, v, ivfp)
            times[v].append(sec)
            rows_seen[v] = rows
            print(f"run {i} {v}: {sec}s rows={rows} batches={batches}",
                  file=sys.stderr)
    # value-equality across variants: batch replay of the same files
    # through each variant's join shape, full pair sets compared
    import json as _json

    from pandas_alchemy_spark.ext.similarity import (
        _DOT, _assign_cells_udf, norm_expr)
    with open(os.path.join(ivfp, "_ivf_centroids.json")) as fh:
        meta = _json.load(fh)
    cells = _assign_cells_udf(meta["centroids"], nprobe=2)
    batch = spark.read.parquet(new_edir)
    pair_sets = {}
    for v in variants:
        ref = (spark.read.parquet(ivfp)
               .select(F.col("cell"),
                       F.col(meta["id_col"]).alias("id_ref"),
                       F.col(meta["vec_col"]).alias("rv"),
                       norm_expr(meta["vec_col"]).alias("rn")))
        if v == "refpart":
            ref = ref.repartition("cell").sortWithinPartitions("cell")
        src = batch.repartition(32) if v == "current" else batch
        newa = (src.filter(F.col("embedding").isNotNull())
                .select(F.col("vec_id").alias("id_new"),
                        F.col("embedding").alias("nv"),
                        norm_expr("embedding").alias("nn"),
                        F.explode(cells(F.col("embedding")))
                        .alias("cell")))
        cos = F.expr(f"({_DOT.format(a='nv', b='rv')}) "
                     f"/ nullif(nn * rn, 0.0)")
        rj = F.broadcast(ref) if v == "broadcast" else ref
        got = (newa.join(rj, "cell")
               .select("id_new", "id_ref", cos.alias("cosine"))
               .filter(F.col("cosine") >= 0.8)).collect()
        pair_sets[v] = sorted((r[0], r[1], r[2]) for r in got)
    pairs_equal = all(pair_sets[v] == pair_sets["current"]
                      for v in variants)
    out = {"metric": "ab_semgate_r14",
           "pairs_equal_across_variants": pairs_equal,
           "n_pairs": len(pair_sets["current"]),
           "rows_per_drain": rows_seen,
           "runs": times,
           "min": {v: min(t) for v, t in times.items()},
           "vecs_per_sec": {v: int(rows_seen[v] / min(t))
                            for v, t in times.items()},
           "loadavg1": round(os.getloadavg()[0], 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
