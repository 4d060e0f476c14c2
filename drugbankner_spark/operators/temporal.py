"""Temporal joins the engine extension set needs at event scale: as-of
join and range join (SURVEY.md §2.12 E5/engine extras).

The reference has no temporal operators (its pipeline is per-drug batch
— ``drug_processing.py`` loops records with no time axis), but any
event/feature pipeline built on this engine needs "latest value at or
before t" (as-of) and "rows inside an interval" (range). Open-source
Spark has neither as a primitive; both are implemented here as
compositions of built-in operators so they distribute and codegen:

- **as-of join**: union the two sides, sort per key by (ts, side) inside
  one hash partitioning, and carry the most recent right-side payload
  forward with ``last(..., ignorenulls=True)``. Cost shape == a
  sort-merge join (one shuffle per side, one sort) — NO range explosion,
  NO per-key collect. At 100 TB the shuffle is keyed by the join key
  exactly like any equi join; per-key skew behaves like SMJ skew (AQE
  handles it).
- **range join**: the naive plan is a cross-ish join with an inequality
  filter (BroadcastNestedLoopJoin — quadratic). Binning turns it into an
  EQUI join on (key, time-bin): each interval explodes to the bins it
  overlaps, points join their single bin, and the exact predicate
  re-filters. Bin width trades dup factor vs selectivity — set it near
  the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward, inclusive as-of LEFT join: for each left row, attach the
    right-side payload with the greatest ``right_ts`` <= ``left_ts`` for
    the same key (ties at equal timestamps match, like DuckDB's
    ``ASOF JOIN``). Left rows with no earlier right row keep NULLs.

    ``right`` must be unique per (on, right_ts) — pre-aggregate if not
    (which survivor "the" value at time t is is otherwise undefined; the
    same ambiguity exists in DuckDB/pandas ``merge_asof``).

    ``tolerance_seconds``: a match older than this is discarded (NULLs),
    mirroring pandas ``merge_asof(tolerance=...)``.

    Plan: one union, one shuffle on the key, one per-key sort — the
    sort-merge-join cost shape. ``last(..., ignorenulls=True)`` over
    ``rowsBetween(unboundedPreceding, currentRow)`` is a running carry,
    not a re-scan per row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    payload = (
        list(right_cols)
        if right_cols is not None
        else [c for c in right.columns if c not in {*keys, rts}]
    )
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload collides with left columns: {sorted(clash)}")

    # One tagged union: right rows sort BEFORE left rows at equal ts
    # (side 0 < 1) so an equal-timestamp right row is visible to the left
    # row — the inclusive backward contract.
    lpart = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(F.col(rts).alias("_rts"), *payload).alias("s"))
            .schema["s"].dataType
        ).alias("_rrow"),
    )
    rpart = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(F.col(rts).alias("_rts"), *payload).alias("_rrow"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lpart.unionByName(rpart)
        .withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        # cast-to-double keeps sub-second precision (unix_timestamp
        # truncates to whole seconds).
        in_tol = (
            F.col("_ts").cast("double") - F.col("_match._rts").cast("double")
        ) <= F.lit(tolerance_seconds)
        carried = carried.withColumn(
            "_match", F.when(in_tol, F.col("_match"))
        )
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        F.col("_match._rts").alias("matched_ts"),
        *[F.col(f"_match.{c}").alias(c) for c in payload],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of point rows to every interval row of the same key
    with ``start <= point_ts < end`` (half-open), as an EQUI join.

    Each interval explodes to the time bins it overlaps; each point maps
    to its single bin; the equi join on (key, bin) prunes to near-matches
    and the exact range predicate finishes. Dup factor per interval =
    ceil(span / bin_seconds) — pick ``bin_seconds`` near the median span.
    An interval row duplicated across bins can meet the same point only
    in the point's single bin, so no post-join distinct is needed.

    This replaces the BroadcastNestedLoopJoin Spark would otherwise plan
    for an inequality-only condition — the difference between O(P·I) and
    O(P + I·dup) at 100 TB.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # Epochs via cast-to-double (sub-second precise — unix_timestamp
    # truncates to seconds, which would silently drop matches for
    # intervals ending mid-second).
    p_bin = F.floor(F.col(point_ts).cast("double") / bin_seconds).cast("long")
    i_lo = F.floor(F.col(start_col).cast("double") / bin_seconds).cast("long")
    # end is exclusive: a bin-aligned end never reaches the next bin.
    i_hi = F.floor(
        (F.col(end_col).cast("double") - F.lit(1e-6)) / bin_seconds
    ).cast("long")
    pts = points.withColumn("_bin", p_bin)
    ivs = intervals.withColumn(
        "_bin", F.explode(F.sequence(i_lo, F.greatest(i_hi, i_lo)))
    )
    joined = pts.join(ivs, [*keys, "_bin"]).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bin")


def scd2_from_changes(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a changelog: one VERSION row
    per (key, distinct attribute state), with ``valid_from`` /
    ``valid_to`` interval columns and ``is_current`` — the standard
    warehouse shape for as-of dimension joins (pair with ``asof_join``
    to enrich facts with the version in force at event time).

    ``collapse_unchanged`` drops changelog rows whose attributes equal
    the key's previous state (no-op updates never open a version). The
    comparison is NULL-SAFE per attribute (``IS DISTINCT FROM``
    semantics): NULL equals NULL, and a transition to/from a NULL
    attribute value DOES open a version — oracle SQL must therefore use
    ``IS DISTINCT FROM``, not ``<>`` (ADVICE r04).
    Deterministic: ordering is (ts, *tiebreak_cols); two windows, both
    partitioned by key — per-key history scales with key cardinality,
    exactly like session windows."""
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(key_col).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    d = changes.select(key_col, ts_col, *(tiebreak_cols or []), *attr_cols)
    if collapse_unchanged:
        # eqNullSafe on structs: false when _prev is NULL (first row —
        # kept), field-wise null-safe otherwise.
        d = (
            d.withColumn("_prev", F.lag(state).over(w))
            .filter(~F.col("_prev").eqNullSafe(state))
            .drop("_prev")
        )
    return (
        d.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .select(
            key_col, *attr_cols, "valid_from", "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def funnel_analysis(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conversion_window_seconds: float | None = None,
) -> DataFrame:
    """Ordered-funnel analysis (round 6): per entity, how far through
    the ``steps`` sequence did it progress, requiring each step to
    occur STRICTLY AFTER the previous one. Output one row per entity
    seen in ANY step: (id, n_steps_completed, completed,
    step1_ts..stepN_ts — NULL past the progress point).

    ``conversion_window_seconds`` bounds the WHOLE funnel relative to
    the entity's step-1 entry (the Amplitude-style conversion window):
    every later step must land within that window of step1_ts. The
    window is deliberately anchored at ENTRY, not at the previous
    step — with an entry-anchored deadline the greedy earliest-match
    is provably optimal (an earlier step-k can only leave MORE of the
    fixed window for step k+1), whereas per-step gaps would make
    greedy matching miss convertible entities.

    Plan shape: one filtered min-agg per step, each joined back on the
    entity id — k steps = k co-partitioned shuffles on the SAME key
    (AQE coalesces; no window over a corpus-wide key, no per-entity
    event array, so a 100 TB event log funnels without collecting any
    entity's history). The per-step agg takes the EARLIEST qualifying
    occurrence, which is the standard (and optimal) greedy choice:
    matching a later occurrence can only shrink the remaining
    window."""
    if not steps:
        raise ValueError("funnel_analysis: steps must be non-empty")
    base = events.select(
        F.col(id_col), F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    # step 1: earliest occurrence per entity
    cur = (
        base.filter(F.col("_tp") == steps[0])
        .groupBy(id_col)
        .agg(F.min("_ts").alias("step1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        probe = (
            base.filter(F.col("_tp") == step)
            .select(F.col(id_col), F.col("_ts").alias("_nts"))
            .join(
                cur.select(
                    id_col,
                    F.col(f"step{i - 1}_ts").alias("_prev"),
                    F.col("step1_ts").alias("_entry"),
                ),
                id_col,
            )
            .filter(F.col("_nts") > F.col("_prev"))
        )
        if conversion_window_seconds is not None:
            probe = probe.filter(
                F.col("_nts").cast("double")
                <= F.col("_entry").cast("double")
                + F.lit(float(conversion_window_seconds))
            )
        nxt = probe.groupBy(id_col).agg(
            F.min("_nts").alias(f"step{i}_ts")
        )
        cur = cur.join(nxt, id_col, "left")
    # entities that started anywhere in the funnel but missed step 1
    # still report (0 completed) — union the full entity set
    seen = base.filter(
        F.col("_tp").isin(list(steps))
    ).select(id_col).distinct()
    out = seen.join(cur, id_col, "left")
    n_done = None
    for i in range(1, len(steps) + 1):
        flag = F.when(F.col(f"step{i}_ts").isNotNull(), 1).otherwise(0)
        n_done = flag if n_done is None else n_done + flag
    return out.select(
        F.col(id_col),
        n_done.alias("n_steps_completed"),
        (n_done == len(steps)).alias("completed"),
        *[F.col(f"step{i}_ts") for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix (round 6): entities grouped by their
    FIRST-activity period; for each (cohort_period, periods_since)
    cell, the count of cohort members active in that later period.
    Output: (cohort_period, periods_since, n_active) — the classic
    retention triangle in long form.

    Plan shape: one min-agg for the cohort assignment (broadcast-sized
    per-entity dim at any realistic cardinality — but joined on the
    entity key co-partitioned, not broadcast-hinted, since user dims
    can be huge), one distinct over (entity, period), one count agg.
    Every shuffle keys on the entity id or the small (cohort, offset)
    pair."""
    p = F.date_trunc(period, F.col(ts_col))
    firsts = events.groupBy(id_col).agg(
        F.min(p).alias("_cohort")
    )
    active = events.select(
        F.col(id_col), p.alias("_period")
    ).distinct()
    diff_expr = {
        "week": (F.datediff(F.col("_period"), F.col("_cohort")) / 7)
        .cast("long"),
        "day": F.datediff(F.col("_period"), F.col("_cohort")).cast("long"),
        "month": (
            (F.year("_period") - F.year("_cohort")) * 12
            + (F.month("_period") - F.month("_cohort"))
        ).cast("long"),
    }
    if period not in diff_expr:
        raise ValueError(f"cohort_retention: unsupported period {period!r}")
    return (
        active.join(firsts, id_col)
        .select(
            F.col("_cohort").alias("cohort_period"),
            diff_expr[period].alias("periods_since"),
            F.col(id_col),
        )
        .groupBy("cohort_period", "periods_since")
        .agg(F.count_distinct(F.col(id_col)).alias("n_active"))
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str] | str,
    ts_col: str = "ts",
    op_col: str = "op",
    tiebreak_cols: list[str] | None = None,
    keep_tombstones: bool = False,
) -> DataFrame:
    """Apply a CDC changelog to a snapshot (round 6): Debezium-style
    compaction — per key, the LATEST record wins (ordered by ts, then
    changes-over-snapshot, then ``tiebreak_cols``); a winning delete
    (``op_col`` = 'D') removes the key from the result. A ``snapshot``
    without an op column is implicit upserts (sorting before any
    change at the same timestamp); a snapshot WITH one is prior
    tombstone-retaining state and its ops are honored.

    ``keep_tombstones=True`` returns the latest record per key
    INCLUDING winning deletes, with the op column appended — the form
    INCREMENTAL maintenance must persist: without tombstones, a later
    micro-batch carrying an OLDER update for a deleted key would
    wrongly resurrect it (the filtered state has forgotten the
    delete's timestamp). Compact latest-with-tombstones per batch,
    filter ``op != 'D'`` only at read time; the per-key max is
    associative, so any batch split order converges to the one-shot
    answer (streaming composition test).

    Plan shape: one unionByName + one window keyed on the CDC key —
    the single shuffle any correct merge needs; per-key state is
    bounded by that key's change volume, and AQE handles hot keys like
    any SMJ skew. This is the batch twin of upsert_partitions
    (scale.py): that one swaps whole partitions, this one merges at
    row granularity."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ties = tiebreak_cols or []
    data_cols = [c for c in snapshot.columns if c != op_col]
    if op_col in snapshot.columns:
        snap = snapshot.select(*data_cols, op_col)
    else:
        snap = snapshot.withColumn(op_col, F.lit("U"))
    snap = snap.withColumn("_src", F.lit(0))
    chg = changes.select(*data_cols, op_col).withColumn("_src", F.lit(1))
    u = snap.unionByName(chg)
    w = Window.partitionBy(*keys).orderBy(
        F.desc(ts_col), F.desc("_src"), *[F.desc(c) for c in ties]
    )
    latest = u.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    if keep_tombstones:
        return latest.select(*data_cols, op_col)
    return latest.filter(F.col(op_col) != "D").select(*data_cols)


def transition_matrix(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences (round 6): order each entity's events by (ts, tiebreak),
    pair consecutive states with ``lag``, count, and row-normalize.
    Output: (prev_state, next_state, n, prob) with prob = n / Σ_row n,
    rounded 6dp — the "what happens after X" view behind funnel design
    and synthetic-sequence generation.

    Scale shape: ONE shuffle on the entity key for the lag window
    (sequences stay co-located however long), one map-side-combinable
    pair agg, and the normalization window runs over the matrix itself
    — at most |states|² rows, nothing like data volume."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(entity_col),
            F.col(state_col).alias("next_state"),
            F.lag(state_col).over(w).alias("prev_state"),
        )
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = Window.partitionBy("prev_state")
    return pairs.select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_tot), 6).alias("prob"),
    )


def top_paths(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    max_len: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k entity journey prefixes (round 6): each entity's first
    ``max_len`` states joined with '>' form its path; paths rank by
    frequency (deterministic ties: count desc, path asc). The
    "how do users actually move" companion to funnel_analysis, which
    tests ONE hypothesized order — this discovers the orders.

    One entity-keyed window (row_number + filter ≤ max_len bounds every
    sequence), one per-entity agg whose array is ≤ max_len elements,
    one path count agg, and a TakeOrderedAndProject top-k — no global
    sort."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    prefix = events.select(
        F.col(entity_col),
        F.col(state_col).alias("_s"),
        F.row_number().over(w).alias("_rn"),
    ).filter(F.col("_rn") <= max_len)
    paths = prefix.groupBy(entity_col).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rn", "_s"))),
                lambda x: x["_s"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .orderBy(F.desc("n_entities"), F.asc("path"))
        .limit(k)
    )


def cooccurrence_lift(
    events: DataFrame,
    entity_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 1,
) -> DataFrame:
    """Market-basket co-occurrence (the Apriori level-2 statistics,
    order-free — the complement of :func:`transition_matrix`'s ordered
    pairs): for every unordered item pair appearing in at least
    ``min_support`` entities' baskets, the support counts plus

    - ``confidence_a_to_b`` = n_ab / n_a
    - ``lift`` = (n_ab · N) / (n_a · n_b)   (N = total baskets)

    Basket = the DISTINCT item set per entity. Canonicalized a < b so
    each pair appears once. Exact integer counts; ratios rounded 6dp.

    Shape: distinct (entity, item) → self-join per entity (the
    quadratic stays inside a basket — baskets are item-vocabulary
    bounded, not event-volume bounded) → pair counts ⋈ broadcast item
    counts ⋈ 1-row total. At 100 TB everything keys on the entity then
    the pair; no skew beyond genuinely popular pairs."""
    base = events.select(
        F.col(entity_col).alias("ent"), F.col(item_col).alias("item")
    ).distinct()
    n_total = base.select("ent").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    item_n = base.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = base.select("ent", F.col("item").alias("item_a"))
    b = base.select("ent", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "ent")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    na = item_n.select(F.col("item").alias("item_a"),
                       F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("item").alias("item_b"),
                       F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "item_a", "item_b", "n_ab", "n_a", "n_b",
            F.round(F.col("n_ab") / F.col("n_a"), 6)
            .alias("confidence_a_to_b"),
            F.round(
                F.col("n_ab") * F.col("n_baskets")
                / (F.col("n_a") * F.col("n_b")), 6,
            ).alias("lift"),
        )
    )


def transition_power(tm: DataFrame, k: int = 2) -> DataFrame:
    """k-step transition probabilities: the matrix power M^k of a
    :func:`transition_matrix` result ("where is the user k events from
    now") computed as k−1 relational matrix multiplies — join on the
    intermediate state, sum of products per (start, end). Operates on
    the matrix's published 6dp ``prob`` column (the composable
    contract; the oracle replays the same rounded input), re-rounding
    at 6dp on output. The matrix is ≤|states|² rows, so every join is
    broadcast-sized regardless of corpus scale."""
    if k < 1:
        raise ValueError("transition_power: k must be >= 1")
    base = tm.select(
        F.col("prev_state").alias("a"),
        F.col("next_state").alias("b"),
        F.col("prob").alias("p"),
    )
    out = base
    for _ in range(k - 1):
        rhs = base.select(
            F.col("a").alias("_m"),
            F.col("b").alias("_end"),
            F.col("p").alias("_q"),
        )
        out = (
            out.join(F.broadcast(rhs), out["b"] == rhs["_m"])
            .groupBy(
                F.col("a"), F.col("_end").alias("b2")
            )
            .agg(F.sum(F.col("p") * F.col("_q")).alias("p"))
            .select("a", F.col("b2").alias("b"), "p")
        )
    return out.select(
        F.col("a").alias("prev_state"),
        F.col("b").alias("next_state"),
        F.round("p", 6).alias("prob"),
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    lookback_events: int = 5,
) -> DataFrame:
    """Multi-touch attribution (the marketing-analytics staple): for
    every CONVERSION event, credit the touches that preceded it since
    the previous conversion (the window resets per conversion), capped
    at the most recent ``lookback_events``. Emits all three standard
    models at once — ``first_credit``/``last_credit`` (1 for the
    oldest/newest kept touch) and ``linear_credit`` = 1/k (6dp) — plus
    position-from-oldest and k, so any weighted model derives
    downstream. Deterministic: ordering pinned by (ts, tiebreak).

    Shape: one entity-keyed window pass assigns each row its running
    conversion count (a touch with count s belongs to conversion
    s + 1), one equi join (entity, segment) attaches touches to their
    conversion, and two windows inside the (conversion) group cap and
    position them. Everything keys on the entity then the conversion —
    clickstream-scale safe, no range join."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    is_conv = (F.col(type_col) == conversion_type).cast("int")
    seq = events.select(
        F.col(entity_col).alias("ent"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("eid"),
        F.col(type_col).alias("etype"),
        F.sum(is_conv).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("seq"),
    )
    convs = seq.filter(F.col("etype") == conversion_type).select(
        F.col("ent").alias("c_ent"),
        F.col("eid").alias("conversion_id"),
        F.col("seq").alias("c_idx"),
    )
    touches = seq.filter(F.col("etype") != conversion_type).select(
        "ent", "ts", "eid", "etype", (F.col("seq") + 1).alias("t_idx")
    )
    joined = touches.join(
        convs,
        (F.col("ent") == F.col("c_ent"))
        & (F.col("t_idx") == F.col("c_idx")),
    )
    wg = Window.partitionBy("ent", "conversion_id")
    recency = F.row_number().over(
        wg.orderBy(F.desc("ts"), F.desc("eid"))
    )
    kept = joined.withColumn("_r", recency).filter(
        F.col("_r") <= lookback_events
    )
    k = F.count(F.lit(1)).over(wg)
    return kept.select(
        F.col("ent").alias(entity_col),
        "conversion_id",
        F.col("eid").alias("touch_id"),
        F.col("etype").alias("touch_type"),
        (k - F.col("_r") + 1).alias("position"),
        k.alias("n_touches"),
        (F.col("_r") == k).cast("int").alias("first_credit"),
        (F.col("_r") == 1).cast("int").alias("last_credit"),
        F.round(F.lit(1.0) / k, 6).alias("linear_credit"),
    )
