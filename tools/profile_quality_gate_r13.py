"""Stage breakdown of the quality_gate bench leg (r13; VERDICT r12
"Next round" #8): the top-2 quiet query (7.21 s at sf0.1) — where
does the time go?

The leg = train_quality_classifier (20k-doc hash-bounded sample,
max_iter 15) + quality_classifier_filter over the corpus.  The train
path already featurizes ONCE into a persisted (features, label)
frame (r11) and strips the VectorAssembler metadata (the r11 17x
fix), so the open question is the split between:

  a. side counts + sampling-plan overhead   (train_total - b - c)
  b. featurization materialize (tokenize -> NGram -> 2x HashingTF ->
     assemble -> persist)                    [timed via a count()
     forced on the LR input before the fit]
  c. the L-BFGS iterations themselves        [orig fit on cached
     features]
  d. the corpus scoring pass (model.transform + Pareto gate)

If (b) dominated, a featurized-frame cache shared across train/
score/eval legs would pay; if (c) dominates, the leg is
LR-iteration-bound and stays as is (the adjudication the verdict
asked to record either way).  NB train featurizes a 20k SAMPLE while
scoring featurizes the CORPUS — there is no shared frame between
them by construction, so the only cacheable overlap would be inside
multi-leg harnesses that score the same corpus repeatedly.

Usage: python tools/profile_quality_gate_r13.py [sf_dir] [n_rounds=3]
Prints ONE JSON line (copy to PROFILE_QUALITY_GATE_r13.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("profile_quality_gate")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from pandas_alchemy_spark.ext import pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    from pyspark.ml.classification import LogisticRegression
    orig_fit = LogisticRegression.fit
    stage: dict = {}

    def timed_fit(self, dataset, params=None):
        # the LR input is the persisted featurized frame; a count()
        # here materializes featurization separately from the fit
        t0 = time.time()
        dataset.count()
        stage["featurize_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        m = (orig_fit(self, dataset) if params is None
             else orig_fit(self, dataset, params))
        stage["lr_fit_s"] = round(time.time() - t0, 2)
        return m

    rounds = []
    for r in range(n_rounds):
        LogisticRegression.fit = timed_fit
        stage.clear()
        t0 = time.time()
        try:
            model = pipeline.train_quality_classifier(
                docs.filter("lang = 'en'"),
                docs.filter("lang <> 'en'"),
                max_iter=15, max_train_docs=20_000)
        finally:
            LogisticRegression.fit = orig_fit
        train_total = round(time.time() - t0, 2)
        t0 = time.time()
        kept = pipeline.quality_classifier_filter(
            docs, model, seed="bench").select("doc_id", "q_prob")
        kept.write.format("noop").mode("overwrite").save()
        score_s = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rec = {"train_total_s": train_total,
               "featurize_s": stage.get("featurize_s"),
               "lr_fit_s": stage.get("lr_fit_s"),
               "sampling_plan_s": round(
                   train_total - (stage.get("featurize_s") or 0)
                   - (stage.get("lr_fit_s") or 0), 2),
               "score_s": score_s,
               "total_s": round(train_total + score_s, 2)}
        rounds.append(rec)
        print(f"# round {r + 1}: {rec}", file=sys.stderr)

    best = min(rounds, key=lambda r: r["total_s"])
    out = {"metric": "profile_quality_gate", "sf_dir": sf_dir,
           "n_docs": n_docs, "max_iter": 15,
           "max_train_docs": 20000,
           "rounds": rounds, "best": best,
           "dominant": max(
               ("sampling_plan_s", "featurize_s", "lr_fit_s",
                "score_s"), key=lambda k: best[k] or 0),
           "loadavg1": round(os.getloadavg()[0], 2),
           "cpu_mark": bench._cpu_mark()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
