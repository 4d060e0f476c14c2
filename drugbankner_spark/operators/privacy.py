"""Privacy risk reporting and enforcement (E5 engine extension, round 6).

The PII family so far redacts VALUES (textanalysis.redact_pii); release
gates additionally need the STRUCTURAL check: k-anonymity — every
combination of quasi-identifier columns (the "equivalence class") must
cover at least k rows, else the class re-identifies its members — and
l-diversity, the distinct-sensitive-value count per class that guards
against homogeneity attacks (everyone in the class shares the
sensitive value, so k-anonymity alone leaks it).

Spark-first: both metrics are ONE hash aggregation on the quasi-id key
(map-side combinable; count + count-distinct per class), and
enforcement (suppression) is one join back against the failing-class
dim — the same shape at 100 TB, with the dim bounded by the number of
SMALL classes, which is the set that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drugbankner_spark.tables import local_df


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """One row per equivalence class: (quasi…, class_size,
    l_diversity, at_risk). ``l_diversity`` is the distinct count of
    ``sensitive_col`` within the class (NULL column → emitted as 0);
    ``at_risk`` flags classes smaller than k. One agg, no joins."""
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("l_diversity"))
    else:
        aggs.append(F.lit(0).cast("long").alias("l_diversity"))
    return df.groupBy(*quasi_cols).agg(*aggs).withColumn(
        "at_risk", F.col("class_size") < k
    )


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """The release-gate scalar view: (n_classes, min_class_size,
    n_at_risk_classes, rows_at_risk, frac_rows_at_risk rounded 6dp).
    Derived from the per-class report by one more tiny agg."""
    rep = k_anonymity_report(df, quasi_cols, sensitive_col, k)
    return rep.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").alias("min_class_size"),
        F.count_if(F.col("at_risk")).alias("n_at_risk_classes"),
        F.sum(F.when(F.col("at_risk"), F.col("class_size")).otherwise(0))
        .alias("rows_at_risk"),
        F.round(
            F.sum(F.when(F.col("at_risk"), F.col("class_size")).otherwise(0))
            / F.sum("class_size"),
            6,
        ).alias("frac_rows_at_risk"),
    )


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity ENFORCEMENT by suppression: keep only rows whose
    quasi-id class has ≥ k members, original columns preserved. The
    surviving-class dim carries only the quasi-id key; the semi join
    lets Catalyst/AQE pick broadcast when the class count is small.

    NULL quasi-identifier values form a countable class, exactly as
    :func:`k_anonymity_report` groups them (groupBy puts NULLs in one
    class): the semi join uses null-safe equality (``eqNullSafe``) per
    quasi column, so a NULL-keyed class of size ≥ k SURVIVES. ADVICE
    r06 flagged that the plain (null-unsafe) semi join dropped every
    NULL-quasi row regardless of class size — report and enforcement
    disagreed on exactly the NULL-keyed classes."""
    ok = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= k)
        .select(*quasi_cols)
    )
    left, right = df.alias("_l"), ok.alias("_r")
    cond = None
    for c in quasi_cols:
        e = F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}"))
        cond = e if cond is None else cond & e
    return left.join(right, cond, "semi")


def tokenize_columns(
    df: DataFrame,
    cols: list[str],
    salt: str,
    prefix_chars: int = 12,
) -> DataFrame:
    """Deterministic pseudonymization (GDPR art. 4(5) / the standard
    release-pipeline tokenizer): each listed column's value is
    replaced by ``sha256(salt || ':' || value)`` truncated to
    ``prefix_chars`` hex chars. Same (salt, value) → same token, so
    joins and group-bys on the tokenized column still work across
    tables tokenized with the same salt — the property that makes
    pseudonymization useful and (without the salt) hard to invert.
    NULL stays NULL. Pure projection: zero shuffle, scan throughput.

    This complements :mod:`pii`'s free-text redaction (values inside
    text) and the k-anonymity gate (structural risk): tokenize handles
    STRUCTURED identifier columns. Salt management is the caller's
    problem (a leaked salt inverts small domains by brute force —
    rotate per release)."""
    if not cols:
        raise ValueError("tokenize_columns: cols must be non-empty")
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.substring(
                    F.sha2(
                        F.concat(F.lit(salt), F.lit(":"),
                                 F.col(c).cast("string")),
                        256,
                    ),
                    1, prefix_chars,
                ),
            ),
        )
    return out


def dp_noisy_histogram(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "release-1",
    contributor_col: str | None = None,
    max_contributions: int = 1,
) -> DataFrame:
    """ε-differentially-private histogram release (the Laplace
    mechanism, Dwork et al. 2006). The fourth face of the privacy
    family (k-anonymity gate = structural risk, suppression =
    enforcement, tokenization = identifier columns; this releases
    AGGREGATES safely).

    **Adjacency relation — read this before releasing** (VERDICT r07
    next #6). With ``contributor_col=None`` the guarantee is ROW-level
    ε-DP: neighboring datasets differ in ONE ROW, counting sensitivity
    is 1, noise is Laplace(1/ε). Over a table like ``events`` where one
    user contributes many rows, row-level DP does NOT bound what the
    release reveals about a USER. For user-level ε-DP pass
    ``contributor_col``: each contributor's rows are first CLAMPED to
    at most ``max_contributions`` across the whole histogram
    (deterministically — per contributor, groups are walked in group-
    key order and contributions kept until the budget is spent, so
    both engines agree bit-for-bit), making the L1 sensitivity of the
    full histogram vector exactly ``max_contributions``; noise scale
    becomes Laplace(max_contributions/ε). ``true_count`` is then the
    BOUNDED count (the statistic actually released), which undercounts
    heavy contributors by construction — the standard
    contribution-bounding bias/variance trade.

    Noise derivation is DETERMINISTIC — inverse-CDF of Laplace applied
    to a uniform drawn from xxhash64(group key, salt) — so the release
    is reproducible, testable, and hash-oracle-able. The standard
    caveat applies and is the caller's contract: determinism means ONE
    release per salt — re-releasing the same statistic under a new
    salt composes ε-budgets exactly as independent Laplace draws
    would, while re-USING a salt reveals nothing new (same noise).
    For the same reason the uniform is keyed on the GROUP, never the
    count (noise correlated with the true value would break DP).

    One map-side-combinable count agg + per-row arithmetic; the
    released histogram is dim-sized. ``noisy_count`` is rounded to the
    nearest integer and clamped at 0 (standard post-processing — DP is
    closed under it). ``true_count`` rides along for auditing/tests —
    DROP IT before an actual release; only ``noisy_count`` is the DP
    output."""
    from pyspark.sql import Window

    from drugbankner_spark.operators.dedup import content_hash32

    if epsilon <= 0:
        raise ValueError("dp_noisy_histogram: epsilon must be > 0")
    if max_contributions < 1:
        raise ValueError("dp_noisy_histogram: max_contributions must be >= 1")
    sensitivity = 1.0
    if contributor_col is None:
        counts = df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("true_count")
        )
    else:
        # user-level clamp: per (contributor, group) counts, then an
        # EXCLUSIVE running sum per contributor in group-key order
        # spends the max_contributions budget deterministically. The
        # window partitions by contributor — bounded by groups-per-
        # contributor, never a corpus-wide key.
        sensitivity = float(max_contributions)
        per = df.groupBy(contributor_col, *group_cols).agg(
            F.count(F.lit(1)).alias("_n")
        )
        w = Window.partitionBy(contributor_col).orderBy(
            *[F.col(c).asc_nulls_first() for c in group_cols]
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
        kept = per.withColumn(
            "_before", F.coalesce(F.sum("_n").over(w), F.lit(0))
        ).select(
            *group_cols,
            F.greatest(
                F.lit(0),
                F.least(
                    F.col("_n"),
                    F.lit(max_contributions) - F.col("_before"),
                ),
            ).alias("_kept"),
        )
        # groups stay keyed on OBSERVED group values (same release
        # domain as the row-level variant) — a clamped-to-zero group
        # still emits its noisy bin rather than leaking absence
        counts = kept.groupBy(*group_cols).agg(
            F.sum("_kept").alias("true_count")
        )
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in group_cols],
        F.lit(salt),
    )
    # u strictly in (0, 1): the engine-portable md5-derived 32-bit key
    # (the sampling-family kernel, SQL twin _sql_hash32), shifted off
    # both endpoints
    u = (content_hash32(key) + 0.5) / F.lit(2.0 ** 32)
    p = u - 0.5
    b = sensitivity / epsilon
    noise = (
        -F.lit(b)
        * F.signum(p)
        * F.log(1.0 - 2.0 * F.abs(p))
    )
    return counts.select(
        *group_cols,
        "true_count",
        F.greatest(
            F.floor(F.col("true_count") + noise + 0.5), F.lit(0)
        ).cast("long").alias("noisy_count"),
    )


def dp_quantiles(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 50,
    qs_permille: tuple[int, ...] = (250, 500, 750, 900),
    epsilon: float = 1.0,
    salt: str = "release-1",
) -> DataFrame:
    """ε-DP quantile release via the noisy CDF: ONE Laplace-mechanism
    histogram over a PUBLIC fixed-bin domain [lo, hi), then quantiles
    read off the noisy cumulative counts. Everything after the noisy
    histogram is post-processing, so the whole release costs the one
    histogram's ε (all quantiles share it — the standard advantage
    over per-quantile exponential-mechanism releases when the domain
    is discretizable).

    The bin grid MUST be data-independent (lo/hi/n_bins are public
    caller knowledge — e.g. a sensor's spec range); values outside
    clamp into the edge bins rather than revealing their existence via
    a dropped row. EVERY bin of the public grid emits noise, observed
    or not — an absent bin would leak emptiness. Row-level adjacency
    (one row changes one bin count: L1 sensitivity 1, noise
    Laplace(1/ε)); for user-level guarantees bound contributions
    upstream the way ``dp_noisy_histogram(contributor_col=...)`` does.

    Determinism follows the dp_noisy_histogram kernel exactly: uniform
    from the md5-derived 32-bit hash of (bin index, salt) — keyed on
    the BIN, never the count — inverse-CDF Laplace, floor+clamp to a
    non-negative integer. The quantile rule is then an exact integer
    compare: the first bin where cum·1000 ≥ q‰·total.

    Plan: one map-side-combinable count agg onto a dim-sized bin
    spine (n_bins rows — the only single-partition windows run on
    that spine, never on data), one tiny quantile-spine join. Output:
    (q_permille, bin, lower_edge, noisy_cum, noisy_total)."""
    from pyspark.sql import Window

    from drugbankner_spark.operators.dedup import content_hash32

    if epsilon <= 0:
        raise ValueError("dp_quantiles: epsilon must be > 0")
    if not lo < hi:
        raise ValueError("dp_quantiles: need lo < hi")
    # A q > 1000 can never satisfy cum·1000 >= q·total, so the readout
    # join would silently emit NO row for that quantile (ADVICE r09) —
    # fail fast like the epsilon/lo-hi guards above.
    for q in qs_permille:
        if not 0 < q <= 1000:
            raise ValueError(
                f"dp_quantiles: qs_permille entries must be in "
                f"(0, 1000], got {q}"
            )
    width = (hi - lo) / n_bins
    idx = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
            .cast("int"),
        ),
    )
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(idx.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    spine = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    key = F.concat_ws(
        "\x1f", F.col("bin").cast("string"), F.lit(salt)
    )
    u = (content_hash32(key) + 0.5) / F.lit(2.0 ** 32)
    p = u - 0.5
    b = 1.0 / epsilon
    noise = -F.lit(b) * F.signum(p) * F.log(1.0 - 2.0 * F.abs(p))
    noisy = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.greatest(
                F.floor(F.coalesce(F.col("_c"), F.lit(0)) + noise + 0.5),
                F.lit(0),
            ).cast("long").alias("noisy_count"),
        )
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cdf = noisy.select(
        "bin",
        F.sum("noisy_count").over(wcum).alias("noisy_cum"),
        F.sum("noisy_count").over(wall).alias("noisy_total"),
    )
    qdim = local_df(
        df.sparkSession, [(int(q),) for q in qs_permille],
        "q_permille long",
    )
    hit = (
        cdf.join(F.broadcast(qdim))
        .filter(
            F.col("noisy_cum") * F.lit(1000)
            >= F.col("q_permille") * F.col("noisy_total")
        )
        .groupBy("q_permille")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        hit.join(cdf, "bin")
        .select(
            "q_permille",
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lower_edge"),
            "noisy_cum",
            "noisy_total",
        )
    )
