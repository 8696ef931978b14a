#!/usr/bin/env python
"""ML example: fit every reference algorithm on the events table, persist the
models, and score the data — the full lifecycle the reference ran as chained
Hadoop jobs.

    python examples/train_models.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_machine_learning_spark import ml_iterative as mli  # noqa: E402
from mapreduce_machine_learning_spark.io import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("train-models")
    ev = load_table(spark, sf_dir, "events")

    pts = ev.select("value", F.hour("ts").cast("double").alias("hr"))
    w_ols = mli.linreg_normal(pts, ["hr"], "value")
    print(f"OLS value~hour: intercept={w_ols[0]:.4f} slope={w_ols[1]:.4f}")

    lab = ev.select(
        (F.col("value") / 100.0).alias("x"),
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
    )
    w_lr = mli.logreg_gd(lab, ["x"], "y", lr=0.5, iters=10)
    acc = mli.accuracy(mli.logreg_predict(lab, w_lr, ["x"]), "y", "pred")
    print(f"LogReg weights={w_lr.round(4).tolist()} accuracy={acc:.4f}")

    cents, sizes = mli.kmeans_fit(
        pts, ["value", "hr"], [(50.0, 6.0), (100.0, 12.0), (150.0, 18.0)], iters=5
    )
    print(f"KMeans centroids={[tuple(round(x,2) for x in c) for c in cents]} sizes={sizes}")

    gmm = mli.gmm_em_1d(ev, "value", mli.Gmm1D((0.5, 0.5), (50.0, 150.0), (25.0, 25.0)), 5)
    print(f"GMM pi={tuple(round(p,3) for p in gmm.pi)} mu={tuple(round(m,2) for m in gmm.mu)}")

    nb = mli.gaussian_nb_fit(ev, "event_type", "value")
    path = os.path.join(tempfile.mkdtemp(), "nb.json")
    mli.save_model(nb, path)
    nb2 = mli.load_model(path)
    print(f"Gaussian NB: {len(nb2)} classes persisted to {path}")

    merges = mli.bpe_train(load_table(spark, sf_dir, "documents"), n_merges=3)
    print(f"BPE merges: {['+'.join(m) for m in merges]}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
