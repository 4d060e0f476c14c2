"""Partitioned-layout tests: hive-partitioned writes + partition pruning
verified in the physical plan (the 100 TB table-layout story: a filtered
read touches only matching partition directories)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drugbankner_spark.plans import explain as X  # noqa: E402
from drugbankner_spark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_dir(spark):
    d = tempfile.mkdtemp(prefix="events_part_")
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partition_pruning_in_plan(spark, part_dir):
    df = spark.read.parquet(part_dir).filter(
        F.col("event_date") == "2024-01-02"
    )
    plan = X.plan_string(df, "formatted")
    assert "PartitionFilters" in plan
    # the partition predicate must appear as a partition filter, i.e.
    # pruned at planning, not scanned-then-filtered
    seg = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "event_date" in seg, seg


def test_partitioned_read_correctness(spark, part_dir):
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    want = ev.filter(F.col("event_date") == "2024-01-02").count()
    got = spark.read.parquet(part_dir).filter(
        F.col("event_date") == "2024-01-02"
    ).count()
    assert got == want and got > 0
