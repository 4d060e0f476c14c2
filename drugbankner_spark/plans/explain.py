"""Physical-plan assertions.

``.explain`` output is the contract with Catalyst: these helpers turn
"did Catalyst pick the plan we designed for?" into testable properties.
Used by tests/test_plans.py to keep every headline query honest — a
regression that drops a pushdown or broadcasts the wrong side fails CI,
not the 1000-executor run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The same string ``df.explain(mode)`` prints."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = plan_string(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    plan = plan_string(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the final plan."""
    plan = plan_string(df, "simple")
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", plan))


def count_broadcast_joins(df: DataFrame) -> int:
    plan = plan_string(df, "simple")
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in plan_string(df, "simple")


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Distinct whole-stage-codegen regions. AQE hides codegen ids until
    the plan is final, so (by default) execute the query first and read
    the final adaptive plan."""
    if execute:
        df.collect()
    plan = plan_string(df, "formatted")
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    return len(ids)
