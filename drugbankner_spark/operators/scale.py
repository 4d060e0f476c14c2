"""Scale utilities (SURVEY.md §4, ARCHITECTURE.md §2-3): explicit skew
salting and bucketed co-located joins.

AQE's skew-join covers the common case automatically; these are the
manual levers for when the planner needs help — extreme Zipfian keys
(entity names like "protein" in J2), or repeated join workloads where
bucketing amortizes the shuffle to zero.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fact_salt_expr(salt_buckets: int):
    """The fact-side salt: ROW-varying (id-derived), never key-derived.
    Exposed so tests can assert that a hot key's rows actually spread
    across salt buckets (the round-1 key-derived salt could not)."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join: the fact side gets a ROW-unique salt (derived
    from ``monotonically_increasing_id`` — NOT from the join key, which
    would give every row of a hot key the same salt and defeat the whole
    point), the dim side is EXPLODED across all salt values, and the join
    key becomes (key, salt). A hot key's rows now spread across
    ``salt_buckets`` reducers instead of one.

    Cost model: dim side is replicated ×salt_buckets (fine for dims; do
    NOT salt fact-fact joins this way — use AQE skew handling there).
    Which salt a given row receives is partition-layout dependent; join
    RESULTS are unaffected because the dim side carries every salt value.
    """
    fact_s = fact.withColumn("_salt", fact_salt_expr(salt_buckets))
    dim_s = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) table: subsequent equi
    joins/aggregations on ``key`` between tables bucketed the same way
    run with ZERO shuffle (bucket-to-bucket locality). The amortization
    play for repeated 100 TB join workloads."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale managed-table location survives metastore resets (fresh
    # session + persistent warehouse dir) — clear it so overwrite works
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
        table_name.lower(),
    )
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst
    recognizes the co-partitioning and plans SortMergeJoin with no
    Exchange on either side (verified in tests/test_scale.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
