"""Golden tests for the temporal joins (operators/temporal.py):
as-of semantics (backward inclusive, ties, misses, tolerance) and
binned range join vs a brute-force inequality join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from drugbankner_spark.operators.temporal import asof_join, range_join_binned


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, "u1", _ts(10), 100.0),   # matches r@10 (equal ts, inclusive)
            (2, "u1", _ts(20), 200.0),   # matches r@15
            (3, "u1", _ts(5), 300.0),    # before any right row -> NULLs
            (4, "u2", _ts(30), 400.0),   # other key, matches its own r@25
            (5, "u3", _ts(30), 500.0),   # key with no right rows at all
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts(10), 11.0),
            ("u1", _ts(15), 12.0),
            ("u2", _ts(25), 21.0),
        ],
        "user_id string, ts timestamp, quote double",
    )


def test_asof_backward_inclusive(spark):
    out = asof_join(_left(spark), _right(spark), on="user_id", left_ts="ts")
    got = {r["event_id"]: (r["matched_ts"], r["quote"]) for r in out.collect()}
    assert got[1] == (_ts(10), 11.0)      # equal timestamp matches
    assert got[2] == (_ts(15), 12.0)      # latest at-or-before
    assert got[3] == (None, None)         # nothing earlier
    assert got[4] == (_ts(25), 21.0)      # per-key isolation
    assert got[5] == (None, None)         # key absent from right
    assert out.count() == 5               # left join: every left row kept


def test_asof_tolerance(spark):
    out = asof_join(
        _left(spark), _right(spark), on="user_id", left_ts="ts",
        tolerance_seconds=120,
    )
    got = {r["event_id"]: r["quote"] for r in out.collect()}
    assert got[1] == 11.0                 # 0s old: inside tolerance
    assert got[2] is None                 # 300s old: outside 120s tolerance
    assert got[4] is None                 # 300s old: outside 120s tolerance
    assert out.count() == 5


def test_asof_column_clash_raises(spark):
    left = _left(spark).withColumnRenamed("value", "quote")
    try:
        asof_join(left, _right(spark), on="user_id", left_ts="ts")
        raise AssertionError("expected ValueError on payload clash")
    except ValueError:
        pass


def test_range_join_matches_bruteforce(spark):
    events = spark.range(200).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("id") * 137 + (F.col("id") % 3) * 0.25
        ).alias("ts"),
    )
    intervals = spark.range(40).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 623).alias(
            "start_ts"
        ),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("id") * 623 + 900 + (F.col("id") % 2) * 0.5
        ).alias("end_ts"),
        F.col("id").alias("interval_id"),
    )
    binned = range_join_binned(
        events, intervals, "user_id", "ts", "start_ts", "end_ts",
        bin_seconds=300,
    )
    brute = events.join(
        intervals,
        (events.user_id == intervals.user_id)
        & (events.ts >= intervals.start_ts)
        & (events.ts < intervals.end_ts),
    )
    got = {(r["event_id"], r["interval_id"]) for r in binned.collect()}
    want = {(r["event_id"], r["interval_id"]) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_range_join_no_duplicate_pairs(spark):
    # an interval spanning many bins must still emit each (point,
    # interval) pair once
    events = spark.createDataFrame(
        [(1, "k", _ts(30), 1.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    intervals = spark.createDataFrame(
        [("k", _ts(0), _ts(59, 59), 7)],
        "user_id string, start_ts timestamp, end_ts timestamp, interval_id long",
    )
    out = range_join_binned(
        events, intervals, "user_id", "ts", "start_ts", "end_ts",
        bin_seconds=60,
    )
    assert out.count() == 1


def test_scd2_versions_collapse_and_intervals(spark):
    from drugbankner_spark.operators.temporal import scd2_from_changes

    changes = spark.createDataFrame(
        [(1, 10, 100, "A"), (1, 20, 101, "A"),   # no-op repeat collapses
         (1, 30, 102, "B"), (1, 40, 103, "A"),   # back to A = NEW version
         (2, 15, 104, "X")],
        "k long, ts long, seq long, state string",
    )
    rows = sorted(
        map(tuple, scd2_from_changes(
            changes, "k", "ts", ["state"], tiebreak_cols=["seq"]
        ).collect())
    )
    assert rows == [
        (1, "A", 10, 30, False),
        (1, "A", 40, None, True),
        (1, "B", 30, 40, False),
        (2, "X", 15, None, True),
    ]
    # collapse_unchanged=False keeps the no-op row as its own version
    full = scd2_from_changes(
        changes, "k", "ts", ["state"], tiebreak_cols=["seq"],
        collapse_unchanged=False,
    )
    assert full.count() == 5


def test_scd2_null_attribute_transitions_are_null_safe(spark):
    # ADVICE r04: the collapse is IS DISTINCT FROM per attribute — a
    # transition to/from NULL opens a version, NULL→NULL collapses.
    from drugbankner_spark.operators.temporal import scd2_from_changes

    changes = spark.createDataFrame(
        [(1, 10, 100, "A"),
         (1, 20, 101, None),   # A → NULL: NEW version
         (1, 30, 102, None),   # NULL → NULL: collapses
         (1, 40, 103, "A")],   # NULL → A: NEW version
        "k long, ts long, seq long, state string",
    )
    rows = sorted(
        map(tuple, scd2_from_changes(
            changes, "k", "ts", ["state"], tiebreak_cols=["seq"]
        ).collect()),
        key=lambda r: r[2],
    )
    assert rows == [
        (1, "A", 10, 20, False),
        (1, None, 20, 40, False),
        (1, "A", 40, None, True),
    ]
