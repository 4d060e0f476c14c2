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
