"""Same-box A/B for the r11 featurize-once-then-fit trainer fix:
times train_quality_classifier (+ the full quality_gate leg) and
train_langid_classifier on the given docs table.  Run it twice
back-to-back on the SAME box — once with the pre-fix pipeline.py
checked out, once at HEAD — and compare.

Usage: python tools/ab_trainers_r11.py [docs_dir] [tag]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tag = sys.argv[2] if len(sys.argv) > 2 else "untagged"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab_trainers")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from pandas_alchemy_spark.ext import pipeline
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    docs.count()  # warm footers/JVM
    out = {"tag": tag, "docs_dir": docs_dir,
           "n_docs": docs.count()}

    t0 = time.time()
    model = pipeline.train_quality_classifier(
        docs.filter("lang = 'en'"), docs.filter("lang <> 'en'"),
        max_iter=15, max_train_docs=20_000)
    out["quality_train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    (pipeline.quality_classifier_filter(docs, model, seed="bench")
     .select("doc_id", "q_prob")
     .write.format("noop").mode("overwrite").save())
    out["quality_score_gate_s"] = round(time.time() - t0, 2)
    # coefficient fingerprint: the fix must not change the model
    lr = model.stages[-1]
    arr = lr.coefficientMatrix.toArray()
    out["quality_coef_sum"] = float(arr.sum())
    out["quality_coef_nnz"] = int((arr != 0).sum())

    t0 = time.time()
    lm = pipeline.train_langid_classifier(
        docs, max_iter=25, max_train_docs_per_lang=5_000)
    out["langid_train_s"] = round(time.time() - t0, 2)
    lrm = lm.stages[-2]
    arr = lrm.coefficientMatrix.toArray()
    out["langid_coef_sum"] = float(arr.sum())
    out["langid_coef_nnz"] = int((arr != 0).sum())

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    out["cpu_mark"] = bench._cpu_mark()
    out["load1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
