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


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping token windows — the
    training-data shaping step before context-window packing. Output:
    (id, chunk_index, chunk_text, n_chunk_tokens), chunk i starting at
    token i*(chunk_tokens-overlap).

    Pure per-row array expressions (split → sequence of starts → slice)
    + ONE posexplode: no shuffle, no UDF, whole-stage codegen'd — a 100
    TB corpus chunks at scan speed. The last window may be short; empty
    docs yield one empty chunk (deterministic lower bound, mirroring
    shingle_array's convention)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    toks = F.split(F.col(text_col), " ")
    step = chunk_tokens - overlap
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s + 1, chunk_tokens), " ")
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_index", "chunk_text"),
    ).withColumn("n_chunk_tokens", F.size(F.split(F.col("chunk_text"), " ")))


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination — the test-set-leakage guard every LLM
    data pipeline needs: flag training documents sharing any n-token
    shingle with a benchmark/eval set. Output: one row per train doc
    with ``n_overlapping`` (distinct shared shingles) and
    ``contaminated``.

    Plan shape: both sides reduce to DISTINCT (id, shingle) pairs; the
    benchmark side is tiny relative to the corpus (eval sets are
    thousands of docs) so its distinct shingle dim broadcasts — the
    train side never shuffles. The shuffle-free count-per-doc then joins
    back to ids only. n=8 follows the common n-gram-overlap
    decontamination practice (e.g. GPT-3 appendix C uses 13-grams,
    Gopher 8-grams); tune per tokenizer."""
    from drugbankner_spark.operators.dedup import token_shingles

    t = token_shingles(train, text_col, id_col, n)
    b = token_shingles(benchmark, text_col, id_col, n).select(
        "shingle"
    ).distinct()
    hits = (
        t.join(F.broadcast(b), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlapping", F.lit(0)).alias("n_overlapping"),
            (F.coalesce("n_overlapping", F.lit(0)) > 0).alias("contaminated"),
        )
    )
