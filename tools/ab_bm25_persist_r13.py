"""Interleaved A/B (r13 follow-up): settle the recorded
scale-dependent open item on bm25_search's second corpus tokenize
pass.  The shipped plan tokenizes the corpus twice — once for the
(N, dl_sum) stats aggregate, once for the explode+join — because at
sf0.1 the persist variant measured SLOWER (parallel-stage
absorption).  This harness re-asks the question at document scale
(~500k docs), where a tokenize pass is tens of seconds.

Leg A = ext.text.bm25_search as shipped (two tokenize passes).
Leg B = the identical formula with ONE tokenize pass: `toked`
persisted before the stats aggregate and unpersisted after the
action (the variant rejected at sf0.1, re-built inline here so no
product code changes for the measurement).

Both legs run interleaved in ONE process, min-of-N, noop sink; the
full top-k result sets are asserted EXACTLY equal (rank ties are
deterministic: score desc, id asc).

Usage: python tools/ab_bm25_persist_r13.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_mark  # noqa: E402


def _variant_persist(df, queries, k=10, text_col="text",
                     id_col="doc_id", k1=1.2, b=0.75):
    """bm25_search with `toked` persisted — single corpus tokenize.
    Mirrors ext/text.py::bm25_search line for line otherwise (same
    fold, same sort, same types) so output equality is meaningful.
    Returns (result_df, persisted_handle)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from pandas_alchemy_spark.ext.text import _tok

    toked = df.withColumn("__pas_toks", F.expr(_tok(text_col))).persist()
    stats = (toked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.size("__pas_toks")).alias("__dl_sum")).coalesce(1))
    qterms = (queries
              .withColumn("__qt", F.expr(_tok("query")))
              .select("query_id", F.explode("__qt").alias("term"))
              .distinct())
    ex = (toked.select(F.col(id_col), F.size("__pas_toks").alias("dl"),
                       F.explode("__pas_toks").alias("term")))
    tf = (ex.join(F.broadcast(qterms.select("term").distinct()), "term")
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    tf = tf.persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    per_term = (tf.join(F.broadcast(dfreq), "term")
                .join(F.broadcast(qterms), "term"))
    pairs = (per_term.groupBy("query_id", id_col)
             .agg(F.sort_array(F.collect_list(
                      F.struct("term", "tf", "df", "dl"))).alias("__ts")))
    fold = F.expr(
        f"aggregate(__ts, cast(0.0 as double), (s, x) -> s + "
        f"ln((__n - x.df + 0.5) / (x.df + 0.5) + 1.0) * x.tf / "
        f"(x.tf + {k1!r} * (1.0 - {b!r} + {b!r} * x.dl "
        f" / (__dl_sum / cast(__n as double)))))")
    scored = (pairs.crossJoin(F.broadcast(stats))
              .select("query_id", id_col, fold.alias("score")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", id_col,
                   F.col("rank").cast("long").alias("rank"), "score"))
    return out, [toked, tf]


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "AB_BM25_PERSIST_r13.json")
    docs_dir = "/root/repo/.scratch/docs10/documents.parquet"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .appName("ab_bm25_persist")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from pandas_alchemy_spark.ext import text

    docs = spark.read.parquet(docs_dir)
    n_docs = docs.count()
    qs = spark.createDataFrame(
        [(f"q{i}", q) for i, q in enumerate(
            ["hash join filter", "vector stream window",
             "customer order line", "slow scan batch",
             "merge small table", "group agg value",
             "spark column row", "key data part"])],
        "query_id string, query string")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    times = {"shipped": [], "persist": []}
    for i in range(3):
        # shipped leg
        t0 = time.time()
        noop(text.bm25_search(docs, qs, k=10))
        times["shipped"].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        # persist leg
        t0 = time.time()
        out, handles = _variant_persist(docs, qs, k=10)
        noop(out)
        times["persist"].append(round(time.time() - t0, 3))
        for h in handles:
            h.unpersist()
        spark.catalog.clearCache()

    # exact output equality (score bits included)
    a = {tuple(r) for r in text.bm25_search(docs, qs, k=10).collect()}
    spark.catalog.clearCache()
    out, handles = _variant_persist(docs, qs, k=10)
    bset = {tuple(r) for r in out.collect()}
    for h in handles:
        h.unpersist()
    assert a == bset, f"output mismatch: {len(a ^ bset)} rows differ"

    art = {
        "metric": "ab_bm25_single_tokenize_persist",
        "n_docs": n_docs,
        "n_queries": 8,
        "shipped_runs": times["shipped"],
        "persist_runs": times["persist"],
        "shipped_min": min(times["shipped"]),
        "persist_min": min(times["persist"]),
        "speedup_persist_over_shipped": round(
            min(times["shipped"]) / max(min(times["persist"]), 1e-9), 3),
        "outputs_equal": True,
        "cpu_mark": _cpu_mark(),
        "loadavg1": os.getloadavg()[0],
    }
    with open(out_path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(art))


if __name__ == "__main__":
    main()
