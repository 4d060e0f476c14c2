"""Time-series resampling family (E5/E6 engine extension, round 6).

Event analytics (temporal.funnel_analysis, cohort_retention, the E6
streaming windows) operate on the events as they arrived; feature
pipelines and monitoring additionally need the REGULARIZED view — a
fixed-step grid per series with the gaps made explicit and filled
(forward-fill / linear interpolation) plus smoothed rollups (EWMA).
TimescaleDB calls this time_bucket_gapfill/locf/interpolate; pandas
calls it resample/ffill/interpolate/ewm. Re-expressed Spark-first:

- The grid is `explode(sequence(min_bucket, max_bucket))` PER KEY — its
  size is bounded by the series' time span over the step, never by the
  event count, and it never leaves the executors.
- Fills are `last/first(..., ignorenulls=True)` over per-key ordered
  windows — one shuffle on the series key, which the grid join already
  paid; Catalyst collapses the three fill windows into one Window node
  per frame direction.
- EWMA uses the FINITE-window form (the last `span` buckets): each
  observed bucket EMITS its weighted contributions to the ≤`span`
  target buckets ahead of it (one bounded explode), and one hash agg
  divides Σwx/Σw per target. That turns the classic recursive EWMA
  into an equi-join-shaped plan — no per-row recursion, no window
  re-scan of history, 100 TB-safe by construction.

Buckets are emitted as epoch-second BIGINTs (`bucket_start`) — the
cross-engine-stable key; callers wanting timestamps cast once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucketed(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """(keys…, bucket_start, n_obs, value_avg): one row per observed
    per-key bucket. One map-side-combinable agg; sum/count kept exact,
    the avg derived after the shuffle.

    NULL handling (ADVICE r06): ``value_avg`` averages only NON-NULL
    values (sum skips NULLs, so the denominator must too — the round-6
    sum/count(*) form biased the avg low whenever a bucket held NULL
    observations). ``n_obs`` stays count(*) — it counts observations,
    not values; an all-NULL bucket therefore has n_obs > 0 and
    value_avg NULL, which downstream fills treat as a gap."""
    b = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
        * step_seconds
    ).cast("long")
    return (
        events.groupBy(*key_cols, b.alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(value_col).alias("_sum"),
            F.count(value_col).alias("_nval"),
        )
        .withColumn("value_avg", F.col("_sum") / F.col("_nval"))
        .drop("_sum", "_nval")
    )


def resample_gapfill(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
) -> DataFrame:
    """Fixed-step resample with explicit gaps and both classic fills:
    per key, every bucket from the key's first to last observed bucket,
    with ``n_obs``/``value_avg`` (NULL in gaps), ``locf`` (last
    observation carried forward) and ``interp`` (linear interpolation
    between the surrounding observed buckets; the edges fall back to
    the nearest observed value). Values rounded to 6dp — the accepted
    cross-engine float pattern.

    Plan: one agg (bucketing), one tiny per-key span agg, one grid
    explode bounded by span/step, one left join back, one window pass
    per fill direction. The grid join keys on (key, bucket) — equi,
    AQE-coalesced."""
    obs = _bucketed(events, key_cols, ts_col, value_col, step_seconds)
    span = obs.groupBy(*key_cols).agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_seconds))
        ).alias("bucket_start"),
    )
    g = grid.join(obs, [*key_cols, "bucket_start"], "left")

    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("value_avg", ignorenulls=True).over(fwd)
    prev_b = F.last(
        F.when(F.col("value_avg").isNotNull(), F.col("bucket_start")),
        ignorenulls=True,
    ).over(fwd)
    next_v = F.first("value_avg", ignorenulls=True).over(bwd)
    next_b = F.first(
        F.when(F.col("value_avg").isNotNull(), F.col("bucket_start")),
        ignorenulls=True,
    ).over(bwd)
    interp = (
        F.when(F.col("value_avg").isNotNull(), F.col("value_avg"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v
            + (next_v - prev_v)
            * (F.col("bucket_start") - prev_b)
            / (next_b - prev_b)
        )
    )
    return g.select(
        *key_cols,
        "bucket_start",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.round("value_avg", 6).alias("value_avg"),
        F.round(prev_v, 6).alias("locf"),
        F.round(interp, 6).alias("interp"),
    )


def ewma_grid(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
    alpha: float = 0.5,
    span: int = 8,
) -> DataFrame:
    """Finite-window EWMA of the bucketed per-key average:
    ewma(t) = Σ_{i=0..span-1} (1-α)^i · x(t-i) / Σ (1-α)^i over the
    OBSERVED buckets in the window (missing buckets contribute neither
    numerator nor denominator — the pandas ``ewm(ignore_na=True)``
    convention). Emitted for every bucket within ``span`` of an
    observed bucket, clipped to the key's observed range — a gap longer
    than ``span`` yields no row (nothing to smooth from).

    Scale shape: each observed bucket explodes into ≤``span`` (target,
    weight) contributions — a bounded fan-out — followed by ONE hash
    agg on (key, target) and a range clip against the per-key span dim.
    No recursion, no unbounded window frames."""
    obs = _bucketed(events, key_cols, ts_col, value_col, step_seconds)
    # An all-NULL bucket has value_avg NULL: it must contribute neither
    # numerator nor denominator (pandas ewm(ignore_na=True)); without
    # the filter its weight lands in _sw with nothing in _swx (ADVICE
    # r06).
    obs = obs.filter(F.col("value_avg").isNotNull())
    decay = 1.0 - alpha
    contrib = obs.select(
        *key_cols,
        F.explode(F.sequence(F.lit(0), F.lit(span - 1))).alias("_i"),
        "bucket_start",
        "value_avg",
    ).select(
        *key_cols,
        (
            F.col("bucket_start") + F.col("_i") * step_seconds
        ).alias("bucket_start"),
        F.pow(F.lit(decay), F.col("_i")).alias("_w"),
        (
            F.pow(F.lit(decay), F.col("_i")) * F.col("value_avg")
        ).alias("_wx"),
    )
    tot = contrib.groupBy(*key_cols, "bucket_start").agg(
        F.sum("_wx").alias("_swx"), F.sum("_w").alias("_sw")
    )
    keyspan = obs.groupBy(*key_cols).agg(
        F.max("bucket_start").alias("_hi")
    )
    return (
        tot.join(keyspan, key_cols)
        .filter(F.col("bucket_start") <= F.col("_hi"))
        .select(
            *key_cols,
            "bucket_start",
            F.round(F.col("_swx") / F.col("_sw"), 6).alias("ewma"),
        )
    )


def detect_anomalies(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
    lookback: int = 8,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing z-score anomaly flags on the bucketed series: each
    bucket's ``value_avg`` scored against the mean/stddev of the
    preceding ``lookback`` OBSERVED buckets (the bucket itself
    excluded, so a spike cannot mask itself). Buckets with fewer than 2
    trailing points or zero variance score NULL. Output: (keys…,
    bucket_start, value_avg, zscore, is_anomaly).

    One bounded window frame over the per-key bucket series — the agg
    shuffle is the same one the bucketing already paid."""
    obs = _bucketed(events, key_cols, ts_col, value_col, step_seconds)
    return anomaly_scores(obs, key_cols, lookback, z_threshold)


def anomaly_scores(
    obs: DataFrame,
    key_cols: list[str],
    lookback: int = 8,
    z_threshold: float = 3.0,
) -> DataFrame:
    """The scoring stage of :func:`detect_anomalies`, split out so the
    streaming face (bucket partials maintained incrementally, scored at
    read) shares it with the batch path. ``obs`` must carry
    (keys…, bucket_start, value_avg)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_start")
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg("value_avg").over(w)
    sd = F.stddev_samp("value_avg").over(w)
    n = F.count("value_avg").over(w)
    z = F.when(
        (n >= 2) & (sd > 0), (F.col("value_avg") - mu) / sd
    )
    return obs.select(
        *key_cols,
        "bucket_start",
        F.round("value_avg", 6).alias("value_avg"),
        F.round(z, 6).alias("zscore"),
        F.coalesce(
            F.abs(z) > z_threshold, F.lit(False)
        ).alias("is_anomaly"),
    )


def cusum_changepoints(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
    slack_micro: int = 0,
    threshold_permille: int = 3000,
) -> DataFrame:
    """Two-sided CUSUM change detection (Page 1954) per key over the
    bucketed series — the distribution-shift monitor for ingest
    pipelines (a feed whose mean level drifts should flag long before
    a per-bucket z-score fires, because CUSUM accumulates small
    persistent deviations that detect_anomalies' trailing window
    ignores).

    The textbook recursion C_i = max(0, C_{i-1} + d_i) is not a window
    function — but its closed form IS:
    ``C_i = cum_i − min(0, min_{j≤i} cum_j)`` where ``cum`` is the
    running sum of deviations. Two ordered-window passes (running sum
    + running min), no recursion, no per-row iteration — the plan is
    one bucket agg shuffle + one window over the per-key series,
    scale-safe by construction.

    CROSS-ENGINE DETERMINISM: the whole chain is BIGINT arithmetic —
    values convert once to micro-units via floor(x·1e6 + 0.5)
    (the seasonal_decompose convention); per-bucket sums are exact;
    deviations are scaled by the per-key bucket count n so the mean
    needs no division: d_i = (s_i·n − S) ∓ slack_micro·n. Both cusum
    columns are therefore exact integers at (micro-units × n) scale.

    The change flag is SCALE-FREE so one setting works across data
    volumes: flag where the accumulated mean-deviation exceeds
    ``threshold_permille``/1000 × the per-key AVERAGE bucket sum —
    as integers, cusum·1000 > threshold_permille·|S| (cusum/n vs
    thr·|S|/n with both sides multiplied by 1000·n). Overflow bound:
    needs 1000·n²·mean_bucket_sum_micro < 2⁶³ — at 6-hour buckets
    that holds for decades of series at 10⁹ micro-units per bucket.

    Output: (keys…, bucket_start, s_micro, n_obs, cusum_pos,
    cusum_neg, is_change) — cusum columns at micro×n scale,
    ``is_change`` true where either side exceeds the threshold."""
    v_int = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)).cast("long")
    b = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
        * step_seconds
    ).cast("long")
    obs = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, b.alias("bucket_start"))
        .agg(
            F.sum(v_int).alias("s_micro"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    wk = Window.partitionBy(*key_cols)
    n = F.count(F.lit(1)).over(wk)
    total = F.sum("s_micro").over(wk)
    dev = F.col("s_micro") * n - total
    slack = F.lit(int(slack_micro)) * n
    scored = obs.select(
        *key_cols,
        "bucket_start",
        "s_micro",
        "n_obs",
        (dev - slack).alias("_d_pos"),
        (-dev - slack).alias("_d_neg"),
        n.alias("_n"),
        total.alias("_total"),
    )
    wo = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = scored.select(
        *key_cols,
        "bucket_start",
        "s_micro",
        "n_obs",
        "_n",
        "_total",
        F.sum("_d_pos").over(wo).alias("_cum_p"),
        F.sum("_d_neg").over(wo).alias("_cum_n"),
    )
    zero = F.lit(0).cast("long")
    c_pos = F.col("_cum_p") - F.least(zero, F.min("_cum_p").over(wo))
    c_neg = F.col("_cum_n") - F.least(zero, F.min("_cum_n").over(wo))
    thr = F.lit(int(threshold_permille)) * F.abs(F.col("_total"))
    return cum.select(
        *key_cols,
        "bucket_start",
        "s_micro",
        "n_obs",
        c_pos.alias("cusum_pos"),
        c_neg.alias("cusum_neg"),
        ((c_pos * F.lit(1000) > thr)
         | (c_neg * F.lit(1000) > thr)).alias("is_change"),
    )


def stream_bucket_partials(
    events_stream: DataFrame,
    state_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
) -> None:
    """Streaming maintenance of the bucketed series (round 6): per
    micro-batch, land the MERGEABLE partials (keys…, bucket_start,
    n_obs, _sum, _nval) in an epoch-keyed partition (dynamic partition
    overwrite → replayed epochs idempotent — the sketches
    stream_corpus_stats pattern). ``_nval`` (non-NULL value count)
    rides along since ADVICE r06 made value_avg = sum/_nval — partials
    reconstructed from value_avg × n_obs would diverge from batch on
    NULL-valued observations. Ingest cost stays O(batch); the z-score
    window — not incrementally maintainable — runs at read over the
    merged buckets (:func:`read_anomalies`), whose row count is
    bounded by keys × span/step, not by event volume."""
    from drugbankner_spark.operators.scale import upsert_partitions
    from drugbankner_spark.streaming.streams import run_foreach_batch

    def admit(batch_df: DataFrame, epoch_id: int) -> None:
        b = (
            F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
            * step_seconds
        ).cast("long")
        part = (
            batch_df.groupBy(*key_cols, b.alias("bucket_start"))
            .agg(
                F.count(F.lit(1)).alias("n_obs"),
                F.sum(value_col).alias("_sum"),
                F.count(value_col).alias("_nval"),
            )
            .withColumn("_epoch", F.lit(int(epoch_id)))
        )
        upsert_partitions(part, state_dir, ["_epoch"])

    run_foreach_batch(events_stream, admit, output_mode="append",
                      max_files_per_trigger=1)


def compact_bucket_state(spark, state_dir: str, key_cols: list[str],
                         up_to_epoch: int) -> int:
    """Fold old epochs of a :func:`stream_bucket_partials` state dir
    into one base generation: the (n_obs, _sum, _nval) partials merge
    by per-(key, bucket) SUM, routed through the sum-family
    :func:`sketches.compact_epoch_state` protocol (manifest-committed,
    object-store safe, read-anytime — round 15 closes the family
    uniformly). Read cost after: ≤ keys × span/step base rows + the
    un-folded tail epochs instead of that times every epoch ever
    ingested."""
    from drugbankner_spark.operators.sketches import compact_epoch_state

    def fold(old: DataFrame) -> DataFrame:
        return old.groupBy(*key_cols, "bucket_start").agg(
            F.sum("n_obs").alias("n_obs"),
            F.sum("_sum").alias("_sum"),
            F.sum("_nval").alias("_nval"),
        )

    return compact_epoch_state(spark, state_dir, up_to_epoch, fold)


def read_anomalies(
    spark,
    state_dir: str,
    key_cols: list[str],
    lookback: int = 8,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Merge-on-read of a :func:`stream_bucket_partials` state dir:
    partials sum per (key, bucket), then the shared scoring stage —
    equals the batch :func:`detect_anomalies` over the same events
    (stream==batch test in tests/test_timeseries.py). Live rows
    resolve through the compaction manifest with the list/manifest
    consistency retry (:func:`sketches._live_rows`), so reads stay
    exactly-once at any point of a concurrent
    :func:`compact_bucket_state`."""
    from drugbankner_spark.operators.sketches import _live_rows

    obs = (
        _live_rows(spark, state_dir)
        .groupBy(*key_cols, "bucket_start")
        .agg(
            F.sum("n_obs").alias("n_obs"),
            F.sum("_sum").alias("_s"),
            F.sum("_nval").alias("_nv"),
        )
        .withColumn("value_avg", F.col("_s") / F.col("_nv"))
        .drop("_s", "_nv")
    )
    return anomaly_scores(obs, key_cols, lookback, z_threshold)


def seasonal_decompose(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
    period: int = 4,
) -> DataFrame:
    """Classical additive seasonal decomposition (the statsmodels
    ``seasonal_decompose`` convention) per key over the
    interpolation-filled bucket grid:

    - ``trend``: centered moving average over one period — even
      periods use the standard 2×MA half-weights (0.5 on the two
      window endpoints), odd periods the plain centered mean; NULL on
      the ``period//2`` edge buckets where the window is incomplete
      (statsmodels' NaN edges);
    - ``seasonal``: per-phase mean of the detrended series, re-centered
      so the period's offsets sum to 0 per key;
    - ``resid``: value − trend − seasonal (NULL where trend is).

    CROSS-ENGINE DETERMINISM (the hard-won part): a float chain here
    hits BOTH failure modes at once — unordered aggregation sums drift
    by an ULP, and sums-of-decimal-data divided by the period land
    EXACTLY on rounding boundaries, where Spark's round() (BigDecimal
    HALF_UP on the decimal repr) and DuckDB's (binary-value rounding)
    disagree. So the pipeline is integer-exact: bucket values convert
    ONCE to BIGINT micro-units via floor(x·1e6 + 0.5) (deterministic —
    an ULP of drift can't cross the half boundary for ≤6dp data);
    interpolation and the trend window stay in integers (trend carried
    at 8× scale so the half-weights are exact); phase means become
    (integer sum, count) pairs; and the final doubles are computed
    with IDENTICAL expression order in both engines and rounded with
    floor(x·1e4 + 0.5)/1e4 — pure binary arithmetic, no decimal-repr
    convention anywhere.

    Decomposing on the interp-filled grid keeps windows aligned across
    gaps (a missing bucket would silently shift every ROWS window).
    Plan: the resample grid, lag/lead window passes, one (key, phase)
    agg + a fixed-width phase pivot per key — all dim-sized."""
    obs = _bucketed(events, key_cols, ts_col, value_col, step_seconds)
    span = obs.groupBy(*key_cols).agg(
        F.min("bucket_start").alias("_lo"),
        F.max("bucket_start").alias("_hi"),
    )
    grid = span.select(
        *key_cols, "_lo",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_seconds))
        ).alias("bucket_start"),
    )
    micro = F.floor(F.col("value_avg") * 1e6 + 0.5).cast("long")
    g = grid.join(
        obs.select(*key_cols, "bucket_start", micro.alias("_vm")),
        [*key_cols, "bucket_start"], "left",
    )
    fwd = (
        Window.partitionBy(*key_cols).orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(*key_cols).orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("_vm", ignorenulls=True).over(fwd)
    prev_b = F.last(
        F.when(F.col("_vm").isNotNull(), F.col("bucket_start")),
        ignorenulls=True,
    ).over(fwd)
    next_v = F.first("_vm", ignorenulls=True).over(bwd)
    next_b = F.first(
        F.when(F.col("_vm").isNotNull(), F.col("bucket_start")),
        ignorenulls=True,
    ).over(bwd)
    # integer interpolation: micro-unit delta × elapsed over gap, with
    # floor(x + 0.5) on the one unavoidable division (identical binary
    # doubles in both engines since the operands are exact integers)
    interp = (
        F.when(F.col("_vm").isNotNull(), F.col("_vm"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v
            + F.floor(
                ((next_v - prev_v) * (F.col("bucket_start") - prev_b))
                / (next_b - prev_b)
                + 0.5
            ).cast("long")
        )
    )
    filled = g.select(
        *key_cols, "_lo", "bucket_start", interp.alias("_v")
    )
    w = Window.partitionBy(*key_cols).orderBy("bucket_start")
    half = period // 2
    # trend in EXACT integers at 8× micro scale (even period: the 2×MA
    # half-weights become whole numbers; odd period: plain ×8)
    lo_end = F.lag("_v", half).over(w)
    hi_end = F.lead("_v", half).over(w)
    if period % 2 == 0:
        terms = [lo_end]
        for i in range(half - 1, 0, -1):
            terms.append(2 * F.lag("_v", i).over(w))
        terms.append(2 * F.col("_v"))
        for i in range(1, half):
            terms.append(2 * F.lead("_v", i).over(w))
        terms.append(hi_end)
        denom8 = 2 * period
    else:
        terms = [8 * F.lag("_v", i).over(w)
                 for i in range(half, 0, -1)]
        terms.append(8 * F.col("_v"))
        terms += [8 * F.lead("_v", i).over(w)
                  for i in range(1, half + 1)]
        denom8 = 8 * period
    trend8 = terms[0]
    for term in terms[1:]:
        trend8 = trend8 + term
    trend8 = F.when(
        lo_end.isNotNull() & hi_end.isNotNull(), trend8
    )
    phase = (
        F.pmod(
            F.col("bucket_start") - F.col("_lo"),
            F.lit(step_seconds * period),
        )
        / F.lit(step_seconds)
    ).cast("int")
    t = filled.select(
        *key_cols, "bucket_start", "_v",
        trend8.alias("_t8"), phase.alias("phase"),
    ).withColumn("_d8", F.lit(denom8) * F.col("_v") - F.col("_t8"))
    # per-phase detrended mean as an EXACT (sum, count) pair
    pa = t.groupBy(*key_cols, "phase").agg(
        F.sum("_d8").alias("_ds"), F.count("_d8").alias("_dc")
    )
    # re-center: mean of the per-phase means, summed in FIXED phase
    # order via a pivot (an avg over the group would reintroduce
    # engine-internal summation order)
    pivots = [
        F.max(F.when(F.col("phase") == i,
                     F.col("_ds") / F.col("_dc"))).alias(f"_s{i}")
        for i in range(period)
    ]
    rc = pa.groupBy(*key_cols).agg(*pivots)
    pmean = F.col("_s0")
    for i in range(1, period):
        pmean = pmean + F.col(f"_s{i}")
    rc = rc.select(*key_cols, (pmean / period).alias("_pmean"))
    seas = pa.join(rc, key_cols).select(
        *key_cols, "phase",
        (F.col("_ds") / F.col("_dc") - F.col("_pmean"))
        .alias("_seas8"),
    )

    def out4(col):
        # floor-based 4dp rounding: identical binary arithmetic in
        # both engines, no decimal-repr convention
        return F.floor(col * 1e4 + 0.5) / 1e4

    scale = float(denom8) * 1e6
    return (
        t.join(seas, [*key_cols, "phase"])
        .select(
            *key_cols, "bucket_start", "phase",
            (F.col("_v") / 1e6).alias("value"),
            out4(F.col("_t8") / F.lit(scale)).alias("trend"),
            out4(F.col("_seas8") / F.lit(scale)).alias("seasonal"),
            out4(
                F.col("_d8") / F.lit(scale)
                - F.col("_seas8") / F.lit(scale)
            ).alias("resid"),
        )
    )


def holt_linear(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
    alpha: float = 0.5,
    beta: float = 0.2,
    horizons: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per key over
    the bucketed series, to the FINAL (level, trend) state plus h-step
    forecasts — the level+slope companion to the stateless EWMA
    (``ewma_grid``) and the seasonal decomposition: the classic
    short-horizon forecaster for capacity/monitoring series.

    Standard init (l₁ = x₁, b₁ = x₂ − x₁, 0 for singletons), then
    l_t = α·x_t + (1−α)(l+b), b_t = β(l_t − l_prev) + (1−β)b — an
    inherently SEQUENTIAL recursion (the coupled states have no
    shuffle-friendly closed form like CUSUM's prefix-min), so it runs
    as ONE in-executor fold per key over the sorted bucket array
    (``F.aggregate``): no per-row Python, no window re-scans. The
    per-key array is bounded by time-span/step_seconds (the calendar,
    not the row count — the same state bound every smoother carries),
    NOT by data volume: document ~10⁴ buckets as the comfort zone.

    CROSS-ENGINE DETERMINISM: bucket values enter as s_micro/10⁶ (one
    IEEE division of the exact integer sum — never the order-sensitive
    float avg); the fold's multiply/add sequence is replayed verbatim
    by a recursive-CTE oracle, and IEEE ops on identical doubles in
    identical order are bit-identical, so the output needs NO rounding
    convention. Output: (keys…, n_buckets, level, trend,
    forecast_{h}…)."""
    v_int = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)).cast("long")
    b = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
        * step_seconds
    ).cast("long")
    obs = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, b.alias("bucket_start"))
        .agg(F.sum(v_int).alias("s_micro"))
    )
    ser = obs.groupBy(*key_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket_start",
                                                 "s_micro"))),
            lambda s: s["s_micro"] / F.lit(1_000_000.0),
        ).alias("_vals")
    )
    a, bt = float(alpha), float(beta)
    # fold from the 3rd element; init from the first two. The lambda
    # computes l_new ONCE via a nested named struct so the oracle can
    # replay the exact same two-step arithmetic.
    fold = (
        f"aggregate(slice(_vals, 3, size(_vals)), "
        f"named_struct("
        f"  'l', _vals[0], "
        f"  'b', CASE WHEN size(_vals) >= 2 "
        f"            THEN _vals[1] - _vals[0] ELSE CAST(0.0 AS DOUBLE) "
        f"       END), "
        f"(acc, x) -> named_struct("
        f"  'l', {a} * x + {1.0 - a} * (acc.l + acc.b), "
        f"  'b', {bt} * (({a} * x + {1.0 - a} * (acc.l + acc.b)) "
        f"       - acc.l) + {1.0 - bt} * acc.b))"
    )
    st = ser.filter(F.size("_vals") >= 1).select(
        *key_cols,
        F.size("_vals").alias("n_buckets"),
        F.expr(fold).alias("_st"),
    )
    return st.select(
        *key_cols,
        "n_buckets",
        F.col("_st.l").alias("level"),
        F.col("_st.b").alias("trend"),
        *[
            (F.col("_st.l") + F.lit(float(h)) * F.col("_st.b"))
            .alias(f"forecast_{h}")
            for h in horizons
        ],
    )


#: (applicationId, bucketed-series semantic plan hash) pairs whose
#: overflow check already PASSED this session — the memo that keeps
#: repeat autocorrelation calls from paying a driver job each
#: (VERDICT r11 next #7; same discipline as linker._ALIAS_META_CACHE).
#: Failures are never cached: a violating call raises every time.
_ACF_CHECK_MEMO: set[tuple[str, str, str]] = set()


def autocorrelation(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 21600,
    max_lag: int = 6,
    check_overflow: bool | str = True,
) -> DataFrame:
    """Sample autocorrelation function per key over the bucketed
    series, lags 1..``max_lag`` — the seasonality/persistence probe
    that tells a pipeline WHICH period to hand ``seasonal_decompose``
    and whether ``ewma_grid`` smoothing is even warranted (white-noise
    series: all lags ≈ 0; strong daily cycle at 6 h buckets: a spike
    at lag 4).

    Estimator (the standard biased form, constant denominator):

        r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²

    CROSS-ENGINE DETERMINISM: expanding the products clears x̄ = S/n —
    multiply through by n²:

        num_k = n²·P_k − n·S·(A_k + B_k) + (n−k)·S²
        den   = n²·Q   − n·S²

    with P_k = Σ x_t·x_{t+k}, A_k/B_k the first/last n−k partial sums,
    Q = Σ x_t² — ALL exact BIGINTs; r_k is ONE IEEE division. The
    series value is the bucket MEAN in centi-units via exact integer
    floor-division (floor(Σ floor(x·100 + 0.5) / count)) — bounded by
    the data's value range, NOT by volume, so the squared sums cannot
    outgrow BIGINT as the corpus scales. Overflow bound: every BIGINT
    term above is ≤ 4·n³·max|x|² in magnitude (n²·P_k and (n−k)·S² are
    each ≤ n³·max|x|²; n·S·(A_k+B_k) ≤ 2·n³·max|x|²), so the math is
    exact iff 4·n³·max|x|² < 2⁶³ at centi-scale — e.g. ≤ ~600 buckets
    with values to 10³. The bound is ENFORCED, not just documented
    (VERDICT r10 next #2): ``check_overflow=True`` (the default) runs
    one bounded eager agg over the bucketed series — per key, n and
    max|x| — and raises ``ValueError`` naming the violating keys
    BEFORE any BIGINT term is built (the ``require_converged``
    posture from ``coreness_hindex``). When the check passes, every
    intermediate sum/product in num/den is bounded by 4·n³·max|x|²
    and therefore exact; and since the bundled session builder PINS
    ``spark.sql.ansi.enabled=true`` (session.py — pinned, not
    inherited from the Spark default; ADVICE r11), even a
    ``check_overflow=False`` bypass fails loudly with Spark's
    ARITHMETIC_OVERFLOW rather than wrapping. Remedies the error
    names: coarser ``step_seconds`` (fewer buckets) or pre-scaling
    the value column.

    The check is an EAGER driver action (one bounded agg + a
    ``limit(5)`` collect) at call time — the one deliberately non-lazy
    step in this module — and it is MEMOIZED per (session, bucketed
    series plan) the way the linker's ``_ALIAS_META_CACHE`` memoizes
    index metadata (VERDICT r11 next #7): a serving driver calling
    ``autocorrelation`` per batch over the same source pays ONE
    check job, not one per call. The memo key folds in the SOURCE
    FILE SNAPSHOT (round 13, VERDICT r12 next #3), so a parquet dir
    that gained/lost/replaced files between calls re-triggers the
    check automatically; ``check_overflow="always"`` remains the
    belt-and-braces opt-in for sources whose listing the snapshot
    cannot see (e.g. in-place mutation behind an unchanged file
    name). The
    checked series rides a ``caching.shared_persist`` so the main
    plan reuses the bucket agg instead of re-scanning events; callers
    batching many series should ``release_shared_caches()`` (or
    ``cache_mark()``/``release_since()``) after their action, same
    contract as the linker serving path (ADVICE r11).

    Plan: one bucket-agg shuffle, one window shuffle on the series
    key (``lead`` per lag over the ordered buckets — max_lag lead
    columns in a single Window node), one final per-key hash agg.
    Output: (keys…, lag, n_buckets, acf_num, acf_den, acf)."""
    v_int = F.floor(F.col(value_col) * F.lit(100) + F.lit(0.5)).cast("long")
    b = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
        * step_seconds
    ).cast("long")
    obs = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, b.alias("bucket_start"))
        .agg(
            F.floor(F.sum(v_int) / F.count(F.lit(1)))
            .cast("long").alias("x")
        )
    )
    if check_overflow:
        from drugbankner_spark.caching import shared_persist

        obs = shared_persist(obs)
        try:
            plan_key = str(
                obs._jdf.queryExecution().analyzed().semanticHash()
            )
        except Exception:  # pragma: no cover — plan-hash API drift
            plan_key = obs._jdf.queryExecution().analyzed().toString()
        # VERDICT r12 next #3: the semantic hash of a file-backed scan
        # does NOT change when files are appended to the directory, so
        # the memo could re-use a pass verdict the data had outgrown
        # (failing later as the ANSI ARITHMETIC_OVERFLOW instead of
        # this actionable error). Fold the source-file snapshot into
        # the key — the listing is driver-side catalog metadata the
        # relation's FileIndex already holds, and part-file names are
        # unique per write, so an append/compaction/overwrite changes
        # the snapshot and re-triggers the check. Non-file sources
        # (memory, streams) list empty and keep the plan-only key.
        try:
            files = events.inputFiles()
            src_key = f"{len(files)}:{hash(tuple(sorted(files)))}"
        except Exception:  # pragma: no cover — source without listing
            src_key = ""
        memo_key = (
            events.sparkSession.sparkContext.applicationId, plan_key,
            src_key,
        )
        if check_overflow == "always" or memo_key not in _ACF_CHECK_MEMO:
            bad = (
                obs.groupBy(*key_cols)
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.max(F.abs(F.col("x"))).alias("_xmax"),
                )
                .filter(
                    F.lit(4.0)
                    * F.pow(F.col("_n").cast("double"), F.lit(3.0))
                    * F.pow(F.col("_xmax").cast("double"), F.lit(2.0))
                    >= F.lit(9.223372036854775808e18)
                )
                .limit(5)
                .collect()
            )
            if bad:
                keys = [
                    {c: r[c] for c in key_cols} | {
                        "n_buckets": r["_n"],
                        "max_abs_x_centi": r["_xmax"],
                    }
                    for r in bad
                ]
                raise ValueError(
                    "autocorrelation: BIGINT overflow bound exceeded "
                    "(4*n_buckets^3*max|x|^2 >= 2^63 at centi-scale) "
                    f"for key(s) {keys}; increase step_seconds (fewer "
                    "buckets) or rescale the value column"
                )
            _ACF_CHECK_MEMO.add(memo_key)
    wo = Window.partitionBy(*key_cols).orderBy("bucket_start")
    led = obs.select(
        *key_cols, "x",
        *[F.lead("x", k).over(wo).alias(f"_x{k}")
          for k in range(1, max_lag + 1)],
    )
    agg = led.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("x").alias("_s"),
        F.sum(F.col("x") * F.col("x")).alias("_q"),
        *[
            c
            for k in range(1, max_lag + 1)
            for c in (
                F.sum(F.col("x") * F.col(f"_x{k}")).alias(f"_p{k}"),
                F.sum(F.when(F.col(f"_x{k}").isNotNull(), F.col("x")))
                .alias(f"_a{k}"),
                F.sum(f"_x{k}").alias(f"_b{k}"),
            )
        ],
    )
    lag_rows = []
    for k in range(1, max_lag + 1):
        num = (
            F.col("_n") * F.col("_n") * F.col(f"_p{k}")
            - F.col("_n") * F.col("_s")
            * (F.col(f"_a{k}") + F.col(f"_b{k}"))
            + (F.col("_n") - F.lit(k)) * F.col("_s") * F.col("_s")
        )
        den = (
            F.col("_n") * F.col("_n") * F.col("_q")
            - F.col("_n") * F.col("_s") * F.col("_s")
        )
        lag_rows.append(
            agg.filter(F.col("_n") > k).select(
                *key_cols,
                F.lit(k).alias("lag"),
                F.col("_n").alias("n_buckets"),
                num.alias("acf_num"),
                den.alias("acf_den"),
                F.when(den == 0, F.lit(0.0))
                .otherwise(num / den).alias("acf"),
            )
        )
    out = lag_rows[0]
    for r in lag_rows[1:]:
        out = out.unionByName(r)
    return out
