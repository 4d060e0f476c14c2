"""Deterministic hash-based sampling and dataset splitting.

``df.sample`` is seeded per-partition, so its output changes whenever
the partitioning does — useless for reproducible corpus curation. The
primitive large pipelines actually use is HASH-mod sampling: a row's
fate is a pure function of its key, so the sample is stable across
runs, engines, partitionings, and incremental reloads (a re-ingested
row lands in the same split it was in last month). Same mechanism
backs train/valid/test splits that must never leak across reruns.

Both ops are single-projection column expressions (no shuffle, no RNG
state); the bucket hash is the engine-portable md5-derived 32-bit key
from dedup.content_hash32 (``kernel="xxhash64"`` swaps in the cheap
production hash once cross-engine reproducibility is no longer needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from drugbankner_spark.operators.dedup import content_hash32

#: Bucket space for fraction arithmetic: fractions resolve to an exact
#: integer threshold so Spark and any oracle agree bit-for-bit.
N_BUCKETS = 10_000


def hash_bucket(key: Column, seed: str = "", kernel: str = "md5") -> Column:
    """Stable bucket in [0, N_BUCKETS) from the STRING form of a key.
    ``seed`` is concatenated into the hashed value, so different seeds
    give independent samples over the same keys."""
    return F.pmod(
        content_hash32(F.concat(key.cast("string"), F.lit(seed)), kernel),
        F.lit(N_BUCKETS),
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "",
    kernel: str = "md5",
) -> DataFrame:
    """Keep rows whose key-bucket falls below ``fraction`` — a
    deterministic, partitioning-independent sample. Sampling by a
    GROUPING key (user_id, doc_id) keeps entities intact: every row of
    a sampled user survives together, which per-row RNG sampling can't
    guarantee."""
    threshold = int(fraction * N_BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), seed, kernel) < threshold)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: str = "",
    kernel: str = "md5",
) -> DataFrame:
    """Assign every row a split label ("train"/"valid"/"test"/...) by
    consecutive bucket ranges in weight order. Total weight must be 1.
    Deterministic in the key: reruns, engine swaps, and incremental
    ingests can never move a key across splits (no train/test leakage).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), seed, kernel)
    expr = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name]
        cond = bucket < int(upper * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    fraction: float,
    seed: str = "",
    kernel: str = "md5",
) -> DataFrame:
    """EXACT-fraction-per-stratum sample: within each stratum, rows are
    ranked by their deterministic key hash and the top
    ``ceil(n * fraction)`` survive. Unlike ``hash_sample`` (whose
    per-stratum yield fluctuates binomially — fatal for small or skewed
    strata), every stratum contributes exactly its share, so class
    balance survives the sample. Still fully deterministic in
    (keys, seed): reruns and repartitions produce the identical sample.

    Cost: one window over (strata → hash order) — a single shuffle on
    the strata columns; rank ties are impossible (hash of distinct keys,
    ties broken by key string). At 100 TB this is the corpus-curation
    form of stratified draws: strata = (lang, source), key = doc_id.
    """
    from pyspark.sql import Window

    h = content_hash32(
        F.concat(F.col(key_col).cast("string"), F.lit(seed)), kernel
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), F.col(key_col).cast("string").asc()
    )
    wc = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * fraction))
        .drop("_rn", "_n")
    )
