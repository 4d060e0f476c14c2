"""Connected components over candidate-pair edges → dedup CLUSTER ids.

A training-data pipeline doesn't stop at near-dup PAIRS (dedup.py): it
needs each document assigned to a duplicate CLUSTER so one canonical doc
per cluster survives. Pairs → clusters is connected components; the
reference has no graph ops, so this is an engine extension in the E1
family (SURVEY.md §2.12).

Algorithm: iterative min-label propagation expressed as DataFrame joins
— each round, every node takes the min label among itself and its
neighbors. Converges in graph-diameter rounds; near-dup graphs are
dense small cliques (diameter ~2-3), so 3-5 rounds in practice.
Per round: one shuffle-join (edges ⋈ labels) + one hash agg — the same
shape GraphX/GraphFrames uses, with ``localCheckpoint`` truncating the
lineage so the plan doesn't grow per iteration. For adversarial
long-chain graphs the large-star/small-star alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond") drops rounds to
O(log n); near-dup clustering never needs it, so we keep the simpler
plan and document the switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the MIN
    vertex id reachable from it. Output: (id, component), one row per
    distinct vertex appearing in any edge. Deterministic — the label is
    a graph property, independent of partitioning and iteration order.

    Each iteration is one join + one min-agg (two shuffles) and one
    convergence check (a count action on changed labels). Lineage is cut
    per round with ``localCheckpoint`` so iteration N doesn't replan
    rounds 1..N-1.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        via_neighbor = sym.join(
            labels.select(F.col("id").alias("b"), "component"), "b"
        ).select(F.col("a").alias("id"), "component")
        new_labels = (
            labels.union(via_neighbor)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "_old"), "id")
            .filter(F.col("component") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster id per document: connected component of the candidate-pair
    graph for paired docs, the doc's own id for singletons. Output:
    (id_col, cluster_id, is_singleton). Canonical-doc selection is then
    ``exact_dedup(..., key_cols=["cluster_id"])`` or min-id-per-cluster.
    """
    comp = connected_components(pairs, src, dst)
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
            F.col("component").isNull().alias("is_singleton"),
        )
    )
