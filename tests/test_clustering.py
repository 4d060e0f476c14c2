"""Distributed Lloyd's k-means goldens (round 8).

Blob recovery, Lloyd-improvement property, determinism across
partition layouts, and the parameter guards. The chained-CTE oracle
parity lives in __spark_entry__ (`e2_kmeans`, round-9 pool) and is
hash-checked by tests/test_oracle_parity.py.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from drugbankner_spark.operators.clustering import kmeans_lloyd


def _blobs(spark, n_per=20, noise=0.05, seed=5):
    rng = random.Random(seed)
    centers = [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]
    rows = [
        (i, [x + rng.uniform(-noise, noise) for x in centers[i % 3]])
        for i in range(3 * n_per)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows


def test_kmeans_recovers_separated_blobs(spark):
    emb, _ = _blobs(spark)
    out = kmeans_lloyd(emb, k=3, n_iters=4).collect()
    assert len(out) == 60
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"] % 3)
    # three clusters, each pure (one ground-truth blob per cluster)
    assert len(by_cluster) == 3
    assert all(len(v) == 1 for v in by_cluster.values())


def test_kmeans_iterations_do_not_increase_total_distortion(spark):
    # Lloyd monotonicity (up to the documented grid rounding): total
    # assigned distortion after more iterations is <= after one.
    emb, _ = _blobs(spark, noise=0.3, seed=11)

    def total(n_iters):
        return (
            kmeans_lloyd(emb, k=3, n_iters=n_iters)
            .agg(F.sum("sq_dist")).collect()[0][0]
        )

    assert total(4) <= total(1)


def test_kmeans_partition_layout_invariance(spark):
    emb, rows = _blobs(spark, seed=23)
    a = {(r["vec_id"], r["cluster_id"], r["sq_dist"])
         for r in kmeans_lloyd(emb, k=3, n_iters=3).collect()}
    b = {(r["vec_id"], r["cluster_id"], r["sq_dist"])
         for r in kmeans_lloyd(
             emb.repartition(7), k=3, n_iters=3
         ).collect()}
    assert a == b


def test_kmeans_param_guards(spark):
    emb, _ = _blobs(spark)
    with pytest.raises(ValueError):
        kmeans_lloyd(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(emb, k=3, n_iters=0)
