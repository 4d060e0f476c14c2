"""Relational operator surface (SURVEY.md §2.3-§2.7, E5).

The reference executes every lookup as a per-row SQLite point query inside a
Python loop (e.g. a fresh connection per drug, ``utils.py:209``;
5,000-key ``IN``-list batches, ``node_synonymizer.py:400-411``). The engine
replaces all of that with declarative joins/aggregations so Catalyst picks
broadcast vs shuffle strategies and AQE handles skew at scale.

Every function takes DataFrames and returns a DataFrame — no I/O, no
collect — so the same operator runs identically at sf0.001 and at 100 TB.

Scale notes (100 TB thinking):
- Dimension sides (region/nation/supplier, synonymizer nodes/clusters) are
  hinted with ``broadcast()`` — a broadcast hash join avoids shuffling the
  fact side entirely.
- Aggregations use built-in functions only → map-side partial aggregation
  (Tungsten hash agg) before the shuffle.
- Top-k uses sort-based ``limit`` which Spark executes as a per-partition
  local top-k + single-reduce (TakeOrderedAndProject), not a global sort.
- Mode-vote / argmax patterns use ``max_by`` with an explicit struct
  tie-break: the reference's Python ``max`` over dict iteration order is
  nondeterministic (``node_synonymizer.py:371-379``) — we pin determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Aggregation-pipeline wrappers (A-family) over the TPC-H-ish fact tables.
# ---------------------------------------------------------------------------

def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1 shape: projection (P1) + filter (P2-style) + grouped
    aggregation with partial/final split. Aggregate outputs are rounded so
    results are bitwise-stable across engines/plans.
    """
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join chain → agg → top-k.

    The customer filter is applied *before* the join (Catalyst pushes it
    into the scan) and the orders⋈lineitem join shuffles on o_orderkey only
    once. Top-k is deterministic: ties broken by orderkey.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select(
        F.col("c_custkey").alias("o_custkey")
    )
    ords = orders.filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    items = lineitem.filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: star join with broadcast dims.

    region→nation are broadcast (5/25 rows at any SF); the only shuffles
    are lineitem⋈orders (on orderkey) and the customer join. The
    c_nationkey = s_nationkey condition reproduces Q5's "local supplier"
    semantics.
    """
    nat = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == region_name)
        .select("n_nationkey", "n_name")
    )
    sup = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = customer.select("c_custkey", "c_nationkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# J-family join patterns (reference: node_synonymizer equi-lookups).
# ---------------------------------------------------------------------------

def dim_lookup_join(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, how: str = "inner"
) -> DataFrame:
    """J1 shape (``node_synonymizer.py:67-86``): equi join against a small
    dimension, broadcast-hinted. The reference runs this as per-key SQLite
    point SELECTs; here it is a single broadcast hash join with zero
    shuffle of the fact side.
    """
    return fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], how)


def mode_vote(df: DataFrame, group_col: str, vote_col: str) -> DataFrame:
    """A1/J2 shape (``node_synonymizer.py:371-379``): per group, pick the
    modal value of ``vote_col``; ties broken by the smallest value.

    The reference's Python ``max(count.items())`` is iteration-order
    dependent — we pin (count desc, value asc) determinism via a struct
    argmax. Two-level aggregation keeps both steps map-side-combinable.
    """
    counted = df.groupBy(group_col, vote_col).agg(F.count(F.lit(1)).alias("cnt"))
    # min over (-cnt, value) == (count desc, value asc): deterministic argmax.
    return counted.groupBy(group_col).agg(
        F.min_by(
            vote_col, F.struct((-F.col("cnt")).alias("neg_cnt"), F.col(vote_col))
        ).alias("modal_value"),
        F.max("cnt").alias("modal_count"),
    )


def coalesce_fallback_join(
    left: DataFrame,
    primary: DataFrame,
    fallback: DataFrame,
    left_key: str,
    primary_key: str,
    fallback_key: str,
    primary_col: str,
    fallback_col: str,
    out_col: str,
) -> DataFrame:
    """J4 shape (``node_synonymizer.py:229-234``): curie-first,
    name-fallback lookup — two left joins + ``coalesce``. Misses in both
    stay NULL (the reference's explicit None-for-miss contract, U3)."""
    a = left.join(F.broadcast(primary), left[left_key] == primary[primary_key], "left")
    b = a.join(F.broadcast(fallback), left[left_key] == fallback[fallback_key], "left")
    return b.withColumn(out_col, F.coalesce(F.col(primary_col), F.col(fallback_col)))


def prefix_expansion_join(
    suffixes: DataFrame,
    suffix_col: str,
    prefixes: list[str],
    dim: DataFrame,
    dim_key: str,
) -> DataFrame:
    """J5 shape (``node_synonymizer.py:43-56``): a bare suffix is expanded
    against all known prefixes (bounded cross join, |prefixes| wide), then
    the inner join against the dim filters to real hits.

    At scale this is an explode of a literal array (no shuffle) followed by
    a broadcast join — the cross product never materializes beyond the
    projection.
    """
    expanded = suffixes.withColumn("_pfx", F.explode(F.array(*[F.lit(p) for p in prefixes])))
    expanded = expanded.withColumn(
        "candidate", F.concat_ws(":", F.col("_pfx"), F.col(suffix_col))
    ).drop("_pfx")
    return expanded.join(F.broadcast(dim), expanded.candidate == dim[dim_key])


def semi_join(left: DataFrame, right: DataFrame, left_key: str, right_key: str) -> DataFrame:
    """J9 shape (``node_synonymizer.py:320-329``): keep left rows with a
    match on the right — no right columns, no duplication."""
    return left.join(right, left[left_key] == right[right_key], "left_semi")


def anti_join(left: DataFrame, right: DataFrame, left_key: str, right_key: str) -> DataFrame:
    """U3 shape (``node_synonymizer.py:144-146, 208-212``): inputs with no
    match → the reference records explicit None; relationally this is the
    anti join."""
    return left.join(right, left[left_key] == right[right_key], "left_anti")


# ---------------------------------------------------------------------------
# A-family aggregations.
# ---------------------------------------------------------------------------

def longest_value_argmax(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """A2 shape (``perform_NER.py:39-53``): per group keep the *longest*
    value seen. Reference ties are first-seen (nondeterministic across dict
    orders); we pin (length desc, value asc)."""
    return df.groupBy(group_col).agg(
        F.min_by(
            value_col,
            F.struct((-F.length(value_col)).alias("neg_len"), F.col(value_col)),
        ).alias("longest_value"),
        F.max(F.length(value_col)).alias("longest_len"),
    )


def category_histogram(df: DataFrame, key_col: str, cat_col: str) -> DataFrame:
    """A4 shape (``node_synonymizer.py:132-141``): count members per
    (cluster, category)."""
    return df.groupBy(key_col, cat_col).agg(F.count(F.lit(1)).alias("cnt"))


def distinct_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """A5 shape (``utils.py:102-111``): ``list(set(...))`` → relational
    distinct (order lost in the reference; deterministic here via sort at
    the consumer)."""
    return df.select(*cols).distinct()


def first_writer_wins(
    df: DataFrame, key_cols: list[str], order_cols: list[str],
    via: str = "window",
) -> DataFrame:
    """A6 shape (``look_for_identifiers.py:86-89, 102-105``): insert only
    if key absent — i.e. per key keep the first row by writer priority.

    ``via="window"`` (default, the oracle-replicable form): expressed
    as row_number()=1 over an explicit deterministic order — one
    window partition per key, fine when per-key row counts are
    bounded. ``via="agg"`` (round 12, the hot-key scale form): one
    ``min_by(full_row, order_struct)`` hash aggregate — MAP-SIDE
    COMBINABLE, so a key appearing 10⁸ times reduces on every
    executor before one exchange, where the window form funnels the
    whole hot key through a single task (AQE cannot split skewed
    windows). Identical output whenever ``order_cols`` is a total
    order per key (struct comparison is the same lexicographic
    ascending order the window uses; equality pinned in tests) —
    exactly the precondition the window form already needs for
    deterministic results."""
    if via == "agg":
        ord_struct = F.struct(*[F.col(c) for c in order_cols])
        row_struct = F.struct(*[F.col(c) for c in df.columns])
        return (
            df.groupBy(*key_cols)
            .agg(F.min_by(row_struct, ord_struct).alias("_row"))
            .select("_row.*")
        )
    if via != "window":
        raise ValueError(f"first_writer_wins: unknown via={via!r}")
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """O1 shape (``NER.py:81``): global top-k. Spark executes
    sort+limit as TakeOrderedAndProject (per-partition heap + driver merge),
    never a full global sort — the right plan at any scale."""
    return df.orderBy(*order_cols).limit(k)


def union_merge(branches: list[DataFrame], dedup_cols: list[str] | None = None) -> DataFrame:
    """U1 shape (``perform_NER.py:30-53``): merge N branch results; the
    reference folds dicts first-wins — relationally: union + dedup."""
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    if dedup_cols:
        out = out.dropDuplicates(dedup_cols)
    return out


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block_prefix: int = 1,
) -> DataFrame:
    """Blocked edit-distance join (entity-resolution workhorse; engine
    extension to the J-family — typo-tolerant name lookups the
    reference's exact-simplified matching can't serve). Output: left
    columns + ``matched_<right_col>`` + ``distance`` for every pair
    within ``max_distance`` edits.

    Never a cross join: candidates must share the first
    ``block_prefix`` chars AND a length bucket of width
    ``max_distance+1`` (the right side explodes into its three adjacent
    buckets, so any pair with |len diff| ≤ max_distance co-blocks) —
    both equi-join keys, then the exact ``levenshtein`` filter. The
    standard blocking trade-off applies and is explicit: an edit inside
    the prefix escapes the block (recall, not correctness).
    """
    width = max_distance + 1
    lb = F.floor(F.length(F.col(left_col)) / width)
    l_ = left.withColumn(
        "_blk",
        F.concat_ws(
            "|", F.substring(F.col(left_col), 1, block_prefix), lb.cast("string")
        ),
    )
    rb = F.floor(F.length(F.col(right_col)) / width)
    r_ = (
        right.select(
            F.col(right_col).alias(f"matched_{right_col}"),
            F.explode(
                F.array(rb - 1, rb, rb + 1)
            ).alias("_rbkt"),
        )
        .withColumn(
            "_blk",
            F.concat_ws(
                "|",
                F.substring(F.col(f"matched_{right_col}"), 1, block_prefix),
                F.col("_rbkt").cast("string"),
            ),
        )
        .drop("_rbkt")
        .distinct()
    )
    return (
        l_.join(r_, "_blk")
        .withColumn(
            "distance",
            F.levenshtein(F.col(left_col), F.col(f"matched_{right_col}")),
        )
        .filter(F.col("distance") <= max_distance)
        .drop("_blk")
    )


def percentile_normalize(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Robust per-group score normalization (round 6): adds
    ``pct_rank`` (exact percent_rank of ``value_col`` within the group)
    and ``winsorized`` (the value clipped to the group's exact
    interpolated [lo, hi] quantiles — the standard outlier guard before
    quality thresholds or mixture weights are derived from a score).
    Both engines interpolate quantiles identically (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``); outputs round to 6dp.

    Plan: one map-side-combinable quantile agg per group + one join
    back (broadcast-able group dim) + one rank window — the window
    shuffle reuses the same group key. NULL values pass through with
    NULL rank/winsorized."""
    from drugbankner_spark.operators.scale import sharded_row_number

    keys = key_cols or []
    q = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_qlo"),
        F.expr(f"percentile({value_col}, {hi})").alias("_qhi"),
        F.count(F.lit(1)).alias("_ngrp"),
    )
    j = df.join(F.broadcast(q), keys) if keys else df.crossJoin(
        F.broadcast(q)
    )
    # percent_rank = (rank - 1) / (n - 1), computed from the TWO-PHASE
    # rank (round 12): the ungrouped form was a single-partition window
    # over the whole input (partitionBy(lit(1))), and a grouped call
    # can still put most rows under one key. method='rank' keeps
    # percent_rank's tie semantics (equal values share a rank); NULLs
    # sort last (asc_nulls_last pins the NULL position cross-engine —
    # Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST), count toward
    # n, and are masked back to NULL below — exactly the built-in's
    # behavior. n == 1 pins 0.0, the built-in's convention.
    granked = sharded_row_number(
        j, keys, [F.col(value_col).asc_nulls_last()],
        out_col="_grk", method="rank",
    )
    ranked = granked.withColumn(
        "pct_rank",
        F.when(
            F.col(value_col).isNotNull(),
            F.round(
                F.when(F.col("_ngrp") > 1,
                       (F.col("_grk") - 1)
                       / (F.col("_ngrp") - 1).cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ),
        ),
    ).drop("_grk", "_ngrp")
    # explicit NULL guard: Spark's greatest() IGNORES NULL arguments
    # (returns the non-null side), so a bare clip would winsorize NULL
    # values to the lower quantile
    return ranked.withColumn(
        "winsorized",
        F.when(
            F.col(value_col).isNotNull(),
            F.round(
                F.least(F.greatest(F.col(value_col), F.col("_qlo")),
                        F.col("_qhi")),
                6,
            ),
        ),
    ).drop("_qlo", "_qhi")


def group_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: list[str],
    ndigits: int = 4,
) -> DataFrame:
    """Per-group simple linear regression (closed-form OLS): one
    aggregation computing Σx, Σy, Σxy, Σx², Σy², then

    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)``, ``intercept = (Σy −
    slope·Σx)/n``, ``r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² −
    (Σy)²))`` — the trend-per-entity query ("is this source's quality
    drifting?", "which nation's revenue is growing?") as ONE map-side-
    combinable agg, no window, no second pass. NULL x or y rows are
    excluded (SQL aggregate semantics). Groups with n < 2 or zero x
    variance emit NULL slope/intercept/r²; zero y variance emits NULL
    r² (division by zero → NULL in both engines). Rounded at
    ``ndigits`` (4 by default — coarser than the usual 6: the sums are
    float and partition-order dependent, and the ratio amplifies; the
    repo's documented float-rounding trade)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = F.when(x.isNotNull() & y.isNotNull(), F.lit(1))
    agg = df.groupBy(*keys).agg(
        F.count(both).cast("double").alias("_n"),
        F.sum(F.when(both.isNotNull(), x)).alias("_sx"),
        F.sum(F.when(both.isNotNull(), y)).alias("_sy"),
        F.sum(F.when(both.isNotNull(), x * y)).alias("_sxy"),
        F.sum(F.when(both.isNotNull(), x * x)).alias("_sxx"),
        F.sum(F.when(both.isNotNull(), y * y)).alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxy, sxx, syy = F.col("_sxy"), F.col("_sxx"), F.col("_syy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = F.when(var_x != 0, cov_n / var_x)
    return agg.select(
        *keys,
        n.cast("long").alias("n"),
        F.round(slope, ndigits).alias("slope"),
        F.round(
            F.when(slope.isNotNull(), (sy - slope * sx) / n), ndigits
        ).alias("intercept"),
        F.round(
            F.when((var_x != 0) & (var_y != 0),
                   cov_n * cov_n / (var_x * var_y)),
            ndigits,
        ).alias("r2"),
    )
