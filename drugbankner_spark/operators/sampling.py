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


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "",
    kernel: str = "md5",
) -> DataFrame:
    """Train/valid/test split that can NEVER leak near-duplicates
    across splits: split by duplicate-CLUSTER, not by document.
    ``hash_split`` on doc_id is leak-proof against reruns but blind to
    near-dups — two 95%-similar documents hash independently and land
    in train AND test, the classic benchmark-contamination bug.

    Composition: near-dup ``pairs`` (minhash_band_pairs output) →
    connected components (graph.near_dup_clusters, O(log n) rounds) →
    ``hash_split`` on the CLUSTER id. A whole clique of near-dups
    therefore moves as one unit into a single split; singleton docs are
    their own cluster. Output: docs + ``split`` label.

    Scale: the CC runs on the PAIR graph (edges ≪ corpus), the final
    assignment is one left join + projection; same determinism contract
    as hash_split (stable across reruns/partitionings/ingests)."""
    from drugbankner_spark.operators.graph import near_dup_clusters

    clusters = near_dup_clusters(docs, pairs, id_col)
    labeled = docs.join(
        clusters.select(id_col, F.col("cluster_id").alias("_unit")),
        id_col,
    )
    return hash_split(labeled, "_unit", weights, seed, kernel).drop("_unit")


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    target_rows: dict[str, int],
    seed: str = "",
    kernel: str = "md5",
) -> DataFrame:
    """Domain-mixture draw: exactly ``target_rows[s]`` rows from each
    stratum value ``s`` (e.g. {"web": 5_000_000, "code": 3_000_000}) —
    the curated-corpus mixing step (a Pile/Dolma-style recipe executes
    as one of these per epoch). Deterministic hash-rank order within
    each stratum, so reruns draw the identical subset and raising a
    target later EXTENDS the previous draw (the first n rows of the
    hash order never change — incremental-friendly). Strata absent from
    ``target_rows`` are dropped; a target larger than the stratum keeps
    the whole stratum. One window shuffle on the stratum column, same
    cost shape as stratified_sample."""
    from pyspark.sql import Window

    mapping = F.create_map(*[
        x for k, v in target_rows.items() for x in (F.lit(k), F.lit(v))
    ])
    h = content_hash32(
        F.concat(F.col(key_col).cast("string"), F.lit(seed)), kernel
    )
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(key_col).cast("string").asc()
    )
    return (
        df.withColumn("_target", mapping[F.col(stratum_col)])
        .filter(F.col("_target").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_target"))
        .drop("_rn", "_target")
    )


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
