"""End-to-end corpus cleaning: the composition a training-data pipeline
actually runs — near-dup clustering, canonical selection, then quality
filtering — expressed entirely in the engine's own operators so the
whole thing is ONE lazy plan (no materialization between stages except
the component fixpoint's checkpoints).

Order matters and is pinned: dedup FIRST (clusters computed on the full
corpus so a low-quality copy still collapses into its cluster), then
quality rules on the per-cluster canonical survivor. Filtering first
would let a dropped bridge document split a duplicate cluster in two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drugbankner_spark.operators.graph import near_dup_clusters
from drugbankner_spark.operators.textanalysis import gopher_quality_filter


def clean_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **filter_kwargs,
) -> DataFrame:
    """documents + candidate near-dup pairs → the cleaned corpus:
    one row per KEPT canonical document with its cluster size and
    quality features. Canonical = min doc id per duplicate cluster
    (deterministic, partition-independent).

    Plan shape: component labels (iterative, bounded — see graph.py),
    one (cluster) agg, one self-join of docs on the canonical ids
    (broadcast-able when the survivor set is small), one scan-side
    quality projection. Everything after the fixpoint is a straight-line
    Catalyst plan."""
    clusters = near_dup_clusters(docs, pairs, id_col)
    canon = clusters.groupBy("cluster_id").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    canon_docs = docs.join(canon, id_col)
    quality = gopher_quality_filter(
        canon_docs, text_col=text_col, id_col=id_col, **filter_kwargs
    )
    return (
        canon_docs.select(id_col, "cluster_id", "cluster_size")
        .join(quality, id_col)
        .filter(F.col("keep"))
        .select(
            id_col, "cluster_id", "cluster_size", "n_tokens",
        )
    )
