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


def test_cluster_balanced_sample_caps_and_balances(spark):
    from drugbankner_spark.operators.clustering import (
        cluster_balanced_sample,
    )

    # imbalanced blobs: 40 of blob 0, 8 of blob 1
    rng = random.Random(7)
    rows = [(i, [1 + rng.uniform(-0.05, 0.05), 0.0, 0.0, 0.0])
            for i in range(40)]
    rows += [(100 + i, [0.0, 1 + rng.uniform(-0.05, 0.05), 0.0, 0.0])
             for i in range(8)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cluster_balanced_sample(emb, k=2, per_cluster=5).collect()
    by = {}
    for r in out:
        by.setdefault(r["cluster_id"], []).append(r)
    # the head cluster is capped at 5; the rare cluster keeps all <= 5
    assert all(len(v) <= 5 for v in by.values())
    assert sum(len(v) for v in by.values()) == 10
    assert all(1 <= r["draw_rank"] <= 5 for r in out)


def test_semdedup_clustered_prunes_planted_near_dups(spark):
    from drugbankner_spark.operators.clustering import semdedup_clustered

    rng = random.Random(13)
    rows = []
    for i in range(12):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        # a near-identical clone (tiny perturbation, cosine ~1)
        rows.append((1000 + i, [x * 1.001 for x in base]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in semdedup_clustered(
        emb, k=3, threshold=0.99, n_iters=3
    ).collect()}
    assert len(out) == 24
    for i in range(12):
        a, b = out[i], out[1000 + i]
        # scaled clone always lands in the same k-means cell as its
        # base? Not guaranteed at cell boundaries — but when it does,
        # the pair must collapse into one dup cluster with one survivor
        if a["kmeans_cluster"] == b["kmeans_cluster"]:
            assert a["cluster_id"] == b["cluster_id"]
            assert a["is_survivor"] and not b["is_survivor"]
            assert a["cluster_size"] >= 2
    # at least most clones share their base's cell (sanity: the test
    # would silently check nothing if clustering scattered every pair)
    same_cell = sum(
        out[i]["kmeans_cluster"] == out[1000 + i]["kmeans_cluster"]
        for i in range(12)
    )
    assert same_cell >= 10
