"""Data-quality constraint checking (E5 engine extension): declarative
expectations over a table — null-free columns, unique keys, accepted
value domains, referential integrity — reported as ONE long-format
result (check, target, n_violations, passed), so a pipeline gate is a
single ``.filter(~passed).count() == 0``.

Every check is a plain aggregation (conditional counts, one distinct agg
per unique-key set, one broadcast/shuffle anti-join per foreign key) —
no collects, no UDFs; the report over a 100 TB table costs one scan plus
one small agg per declared check. All checks are SQL-expressible, so the
report itself is DuckDB-oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    accepted_values: dict[str, list] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """One row per declared constraint: (check, target, n_violations,
    passed). ``references`` entries are (fk_col, dim_df, dim_col) —
    violations are rows whose non-null fk has no match (SQL
    NOT-IN-with-NULL semantics deliberately avoided)."""
    reports = []
    for c in not_null or []:
        reports.append(df.agg(
            F.lit("not_null").alias("check"),
            F.lit(c).alias("target"),
            F.count_if(F.col(c).isNull()).alias("n_violations"),
        ))
    for cols in unique or []:
        # NULL-containing keys are EXCLUDED from the unique check (pair
        # with not_null to forbid them) — ADVICE r04: a bare
        # countDistinct(struct(...)) counts NULL keys as distinct values
        # while SQL count(DISTINCT ...) skips them, so restrict both the
        # row count and the distinct count to fully-non-null keys.
        nonnull = F.lit(True)
        for c in cols:
            nonnull = nonnull & F.col(c).isNotNull()
        key = F.when(nonnull, F.struct(*[F.col(c) for c in cols]))
        reports.append(df.agg(
            F.lit("unique").alias("check"),
            F.lit(",".join(cols)).alias("target"),
            (F.count_if(nonnull) - F.countDistinct(key)).alias("n_violations"),
        ))
    for c, allowed in (accepted_values or {}).items():
        reports.append(df.agg(
            F.lit("accepted_values").alias("check"),
            F.lit(c).alias("target"),
            F.count_if(
                F.col(c).isNotNull() & ~F.col(c).isin(*allowed)
            ).alias("n_violations"),
        ))
    for fk, dim, dim_col in references or []:
        missing = (
            df.select(F.col(fk)).filter(F.col(fk).isNotNull())
            .join(
                dim.select(F.col(dim_col).alias(fk)).distinct(),
                fk, "left_anti",
            )
            .agg(
                F.lit("references").alias("check"),
                F.lit(fk).alias("target"),
                F.count(F.lit(1)).alias("n_violations"),
            )
        )
        reports.append(missing)
    if not reports:
        raise ValueError("constraint_report: no checks declared")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Deequ-style column profile: one row per column — (column, n,
    n_null, n_distinct, min_value, max_value, top_value, top_count).
    Values are profiled through their canonical STRING form (so one
    melt covers heterogeneous types; min/max are therefore
    lexicographic on that form — document when profiling numerics).
    n_distinct and min/max exclude NULLs (SQL aggregate semantics);
    top_value is the exact mode with the (count desc, value asc)
    deterministic tiebreak. A column with NO non-NULL values produces
    no row (there is nothing to profile; pair with
    :func:`constraint_report`'s not_null check to forbid it).

    Shape: ONE melt (array-of-structs explode) + one (column, value)
    count agg + one per-column window — a single value-keyed shuffle
    for the whole profile, not one pass per column, and the scan reads
    only the profiled columns."""
    from pyspark.sql import Window

    if not cols:
        raise ValueError("profile_columns: cols must be non-empty")
    melt = df.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("value"),
            )
            for c in cols
        ])).alias("_m")
    ).select("_m.column", "_m.value")
    counts = melt.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("column")
    w_top = Window.partitionBy("column").orderBy(
        F.desc("c"), F.asc("value")
    )
    per_col = (
        counts.withColumn(
            "n", F.sum("c").over(w)
        )
        .withColumn(
            "n_null",
            F.sum(F.when(F.col("value").isNull(), F.col("c"))
                  .otherwise(F.lit(0))).over(w),
        )
        .withColumn(
            "n_distinct",
            F.count(F.when(F.col("value").isNotNull(), F.lit(1)))
            .over(w),
        )
        .withColumn("min_value", F.min("value").over(w))
        .withColumn("max_value", F.max("value").over(w))
        .filter(F.col("value").isNotNull())
        .withColumn("_rk", F.row_number().over(w_top))
        .filter(F.col("_rk") == 1)
    )
    return per_col.select(
        "column", "n", "n_null", "n_distinct", "min_value", "max_value",
        F.col("value").alias("top_value"), F.col("c").alias("top_count"),
    )
