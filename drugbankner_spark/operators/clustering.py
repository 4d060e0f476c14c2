"""Distributed Lloyd's k-means over embedding columns (round 8).

Embedding clustering is a first-class LLM-data operation: SemDeDup
(Abbas et al. 2023) clusters before intra-cluster pruning, cluster-
balanced sampling needs cluster ids, and topic-sharded training mixes
are built from them. The engine so far fits k-means on a driver SAMPLE
(`similarity.ivf_topk_kmeans`, pyspark.ml) — correct for IVF cell
layout, but the fit itself is not distributed and not hash-oracle-able.
This module is full-corpus Lloyd iteration as pure relational algebra:

- **assign**: points ⋈ centroids on the DIM key (the centroid table is
  k×dim rows, always broadcast) → per-point argmin over the k squared
  distances — the corpus is never replicated ×k as arrays and never
  collected;
- **update**: one (cluster, dim) hash aggregation (map-side combinable
  sum + count) rebuilds the centroid table.

Two shuffles per iteration, both on bounded keys.

Cross-engine determinism (the float-parity law, ARCHITECTURE §7h):
Lloyd's update averages member vectors — an UNORDERED float sum whose
~1-ULP engine drift can flip a boundary assignment next iteration and
cascade. So the geometry lives on an integer grid: input values
quantize once to fixed-point units (``floor(x·10⁴ + 0.5)``, exact in
both engines), and each centroid update rounds the per-dim mean BACK
to the grid — ``floor(sum/cnt + 0.5)`` where ``sum/cnt`` is one IEEE
division of exact integers (correctly rounded, bit-identical in both
engines; no unordered float reduction anywhere). Distances are then
pure integer ``Σ_d (v_d − c_d)²`` (bounded by dim·(2·scale·‖x‖∞)² —
~10¹⁰ for unit-ish 64-dim vectors, nowhere near 2⁶³), argmin ties
break toward the smaller cluster id, and the whole fixpoint replays
bit-for-bit as chained CTEs in DuckDB. Grid rounding perturbs true
Lloyd by ≤ 0.5·10⁻⁴ per dim per iteration — noise at clustering
granularity, and the price of a hash-checkable distributed fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantized_points(
    vecs: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """(id, dim, v): one row per vector element, fixed-point BIGINT."""
    return vecs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.expr(
                f"transform({vec_col}, x -> CAST(floor(CAST(x AS "
                f"DOUBLE) * {scale} + 0.5) AS BIGINT))"
            )
        ).alias("dim", "v"),
    )


def kmeans_lloyd(
    vecs: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means.

    Seeds are the ``k`` vectors with the smallest md5-derived 32-bit
    id hash (ties by id) — the engine's hash-rank draw, so both
    engines pick identical seeds with no RNG; ``cluster_id`` is the
    seed's ordinal (0..k-1). Each iteration assigns every point to its
    nearest centroid (grid-integer squared distance, ties to the
    smaller id) and recomputes grid-rounded centroid means; the final
    assignment is returned as (id, cluster_id, sq_dist) with
    ``sq_dist`` the integer distance used by that assignment.

    The seed-rank window sorts only the one-column id dim; swap in
    global_dense_rank (suffixarray.py) for web-scale id sets.
    """
    from drugbankner_spark.caching import (
        cache_mark,
        release_since,
        shared_persist,
    )
    from drugbankner_spark.operators.dedup import content_hash32

    if k < 1 or n_iters < 1:
        raise ValueError("kmeans_lloyd: k and n_iters must be >= 1")
    mark = cache_mark()
    pts = shared_persist(_quantized_points(vecs, id_col, vec_col, scale))
    w = Window.orderBy(
        content_hash32(F.col(id_col).cast("string")), F.col(id_col)
    )
    seed_ids = (
        vecs.select(id_col)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            F.col(id_col).alias("_id"),
            (F.col("_r") - 1).alias("cluster_id"),
        )
    )
    centroids = pts.join(F.broadcast(seed_ids), "_id").select(
        "cluster_id", "dim", F.col("v").alias("c")
    )
    assigned = None
    for it in range(n_iters):
        scored = (
            pts.join(F.broadcast(centroids), "dim")
            .groupBy("_id", "cluster_id")
            .agg(
                F.sum(
                    (F.col("v") - F.col("c"))
                    * (F.col("v") - F.col("c"))
                ).alias("_d")
            )
        )
        assigned = (
            scored.groupBy("_id")
            .agg(F.min(F.struct("_d", "cluster_id")).alias("_best"))
            .select(
                "_id",
                F.col("_best.cluster_id").alias("cluster_id"),
                F.col("_best._d").alias("sq_dist"),
            )
        ).localCheckpoint(eager=True)
        if it == n_iters - 1:
            break  # the last update would never be read
        # grid-rounded integer mean: ONE IEEE division of exact
        # integers + floor — bit-identical across engines, no
        # unordered float reduction
        centroids = (
            pts.join(assigned.select("_id", "cluster_id"), "_id")
            .groupBy("cluster_id", "dim")
            .agg(
                F.floor(
                    F.sum("v") / F.count(F.lit(1)) + F.lit(0.5)
                ).cast("long").alias("c")
            )
        ).localCheckpoint(eager=True)
    release_since(mark)
    return assigned.select(
        F.col("_id").alias(id_col), "cluster_id", "sq_dist"
    )
