"""Mergeable sketch aggregations (E5 engine extension) — the incremental
pattern for corpus-wide statistics at 100 TB.

Exact global distinct counts / quantiles need a full rescan whenever data
arrives. The mergeable-sketch pattern materializes a small sketch per
partition-group once (HLL for distincts, KLL for quantiles — Apache
DataSketches, built into Spark), and every later question is answered by
UNIONING sketches — O(groups × sketch size), never a rescan. This is how
daily distinct-user counts, corpus token-frequency quantiles, and
dedup-rate dashboards stay cheap under continuous ingest.

All functions are JVM-side built-ins (`hll_sketch_agg`, `hll_union_agg`,
`kll_sketch_agg_double`, ...) — no Python in the path; sketches are
binary columns, storable in Parquet next to the data they summarize.

Estimates are approximate by design (±~1.6% at lgK=12 for HLL), so these
operators carry tolerance-based pytest checks rather than hash oracles —
the one operator family where bitwise cross-engine equality is the wrong
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_sketches(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One mergeable HLL sketch per group: (group_cols..., hll_sketch).
    Materialize this per ingest batch/day; global or rolled-up distinct
    counts then come from ``hll_rollup`` without touching the data."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll_sketch")
    )


def hll_rollup(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union stored sketches up to ``group_cols`` granularity (None =
    one global row): (group_cols..., approx_distinct). The union is
    register-wise max — associative, so any rollup tree gives the same
    state."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("hll_sketch"))
    ).alias("approx_distinct")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def kll_quantile_profile(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    group_cols: list[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """Approximate quantiles from a mergeable KLL sketch: one row per
    group with ``q_<pct>`` columns. Unlike ``percentile_approx`` the
    sketch itself can be stored and merged across ingest batches."""
    sketch = F.kll_sketch_agg_double(F.col(value_col), F.lit(k))
    cols = [
        F.kll_sketch_get_quantile_double(
            F.col("_kll"), F.lit(float(q))
        ).alias(f"q_{int(q * 100)}")
        for q in quantiles
    ]
    if group_cols:
        base = df.groupBy(*group_cols).agg(sketch.alias("_kll"))
        return base.select(*group_cols, *cols)
    return df.agg(sketch.alias("_kll")).select(*cols)


def theta_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Theta-sketch distinct estimate per group — the sketch family to
    reach for when set INTERSECTION/DIFFERENCE estimates will be needed
    downstream (HLL only unions)."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_estimate(
            F.theta_sketch_agg(F.col(value_col))
        ).alias("approx_distinct")
    )
