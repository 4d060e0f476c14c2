"""Windowed event aggregations — batch kernels (E6).

Each function is a plain DataFrame transformation usable identically in
batch and streaming (pass a streaming DF + watermark and Spark runs the
same logical plan incrementally). Window starts are epoch-aligned, so
results are reproducible against any engine's time_bucket.

Scale notes: tumbling/sliding aggs are hash aggregations keyed by
(window, keys) — map-side partial agg applies; session windows require a
per-key sort (Spark plans session_window as a sort-based aggregation),
so at 100 TB key cardinality (user count) is the lever, not event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Per (event_type, tumbling window): count + value sum."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Per sliding window: count + value sum (each event lands in
    width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events", "sum_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows: a session closes after ``gap`` of
    inactivity; end = last event + gap (Spark session_window semantics)."""
    return (
        events.groupBy(
            F.col("user_id"), F.session_window("ts", gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )


def parse_props(events: DataFrame) -> DataFrame:
    """EXT scalar-JSON path (SURVEY.md §2.8 note): ``props`` is a JSON
    string → typed column via get_json_object/from_json."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("props_k"),
    )
