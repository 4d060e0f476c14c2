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


def test_funnel_ordering_semantics(spark):
    # round 6: steps must occur STRICTLY after the previous step —
    # out-of-order and same-timestamp events do not advance the funnel.
    from drugbankner_spark.operators.temporal import funnel_analysis

    ev = spark.createDataFrame(
        [
            # u1 completes in order
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:05:00", "click"),
            (1, "2024-01-01 10:10:00", "purchase"),
            # u2: purchase BEFORE click → stops at click
            (2, "2024-01-01 09:00:00", "view"),
            (2, "2024-01-01 09:01:00", "purchase"),
            (2, "2024-01-01 09:02:00", "click"),
            # u3: click exactly AT the view timestamp → not after
            (3, "2024-01-01 08:00:00", "view"),
            (3, "2024-01-01 08:00:00", "click"),
            # u4: only enters mid-funnel (click without view) → 0 steps
            (4, "2024-01-01 07:00:00", "click"),
        ],
        "user_id long, ts_s string, event_type string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    rows = {r["user_id"]: r for r in funnel_analysis(
        ev, ["view", "click", "purchase"]).collect()}
    assert rows[1]["n_steps_completed"] == 3 and rows[1]["completed"]
    assert rows[2]["n_steps_completed"] == 2 and not rows[2]["completed"]
    assert rows[3]["n_steps_completed"] == 1
    assert rows[4]["n_steps_completed"] == 0
    # a later qualifying purchase DOES count for u2? No event after
    # click — step3_ts stays NULL
    assert rows[2]["step3_ts"] is None


def test_funnel_greedy_earliest_match(spark):
    # the earliest qualifying occurrence is taken per step: a second
    # view after the click must not reset progress
    from drugbankner_spark.operators.temporal import funnel_analysis

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "view"),
         (1, "2024-01-01 11:00:00", "click"),
         (1, "2024-01-01 12:00:00", "view"),
         (1, "2024-01-01 13:00:00", "purchase")],
        "user_id long, ts_s string, event_type string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    r = funnel_analysis(ev, ["view", "click", "purchase"]).collect()[0]
    assert r["completed"]
    assert str(r["step1_ts"]).startswith("2024-01-01 10")


def test_cohort_retention_triangle(spark):
    from drugbankner_spark.operators.temporal import cohort_retention

    ev = spark.createDataFrame(
        [
            # u1 first week 0, active weeks 0 and 1
            (1, "2024-01-01 10:00:00"), (1, "2024-01-08 10:00:00"),
            # u2 first week 0, active week 0 only
            (2, "2024-01-03 10:00:00"),
            # u3 first week 1, active weeks 1 and 3
            (3, "2024-01-10 10:00:00"), (3, "2024-01-22 10:00:00"),
        ],
        "user_id long, ts_s string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    got = {(str(r["cohort_period"])[:10], r["periods_since"]): r["n_active"]
           for r in cohort_retention(ev).collect()}
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-08", 0)] == 1
    assert got[("2024-01-08", 2)] == 1
    assert len(got) == 4


def test_apply_cdc_semantics(spark):
    # round 6: latest-wins merge, deletes drop the key, snapshot loses
    # same-timestamp ties to changes, resurrect-after-delete works.
    from drugbankner_spark.operators.temporal import apply_cdc

    snap = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"),
         (2, "2024-01-01 10:00:00", "b"),
         (3, "2024-01-01 10:00:00", "c"),
         (4, "2024-01-01 10:00:00", "d")],
        "k long, ts_s string, v string",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    chg = spark.createDataFrame(
        [
            (1, "2024-01-01 11:00:00", "a2", "U"),   # update wins
            (2, "2024-01-01 11:00:00", "x", "D"),    # delete drops key
            (3, "2024-01-01 10:00:00", "c2", "U"),   # tie → change wins
            # k5: delete then later re-insert → resurrected
            (5, "2024-01-01 09:00:00", "e", "D"),
            (5, "2024-01-01 12:00:00", "e2", "U"),
            # k6: update then later delete → gone
            (6, "2024-01-01 09:00:00", "f", "U"),
            (6, "2024-01-01 12:00:00", "f", "D"),
        ],
        "k long, ts_s string, v string, op string",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts", "v", "op")
    got = {r["k"]: r["v"]
           for r in apply_cdc(snap, chg, "k").collect()}
    assert got == {1: "a2", 3: "c2", 4: "d", 5: "e2"}


def test_apply_cdc_randomized_vs_bruteforce(spark):
    # seeded random changelog vs a Python brute-force reference — the
    # property: per key take the max (ts, src, tiebreak) record, drop
    # the key when that record is a delete.
    import random

    rng = random.Random(42)
    snap_rows, chg_rows = [], []
    for k in range(40):
        if rng.random() < 0.7:
            snap_rows.append((k, rng.randint(0, 50), f"s{k}"))
        for _ in range(rng.randint(0, 4)):
            chg_rows.append((
                k, rng.randint(0, 50), f"c{rng.randint(0, 999)}",
                "D" if rng.random() < 0.3 else "U",
            ))
    from drugbankner_spark.operators.temporal import apply_cdc

    snap = spark.createDataFrame(snap_rows, "k long, ts long, v string")
    chg = spark.createDataFrame(
        chg_rows, "k long, ts long, v string, op string"
    )
    got = {r["k"]: (r["ts"], r["v"])
           for r in apply_cdc(snap, chg, "k", ts_col="ts",
                              tiebreak_cols=["v"]).collect()}
    # brute force
    best: dict = {}
    for k, ts, v in snap_rows:
        best[k] = max(best.get(k, ()), (ts, 0, v, "U"))
    for k, ts, v, op in chg_rows:
        best[k] = max(best.get(k, ()), (ts, 1, v, op))
    want = {k: (ts, v) for k, (ts, _, v, op) in best.items() if op != "D"}
    assert got == want


def test_funnel_conversion_window(spark):
    # entry-anchored conversion window: steps beyond step1 + W don't
    # count, and a LATER in-window occurrence still converts
    from drugbankner_spark.operators.temporal import funnel_analysis

    ev = spark.createDataFrame(
        [
            # u1: click at +30s in window, purchase at +2h out of window
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:00:30", "click"),
            (1, "2024-01-01 12:00:00", "purchase"),
            # u2: everything inside 1 hour
            (2, "2024-01-01 10:00:00", "view"),
            (2, "2024-01-01 10:20:00", "click"),
            (2, "2024-01-01 10:40:00", "purchase"),
        ],
        "user_id long, ts_s string, event_type string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    rows = {r["user_id"]: r for r in funnel_analysis(
        ev, ["view", "click", "purchase"],
        conversion_window_seconds=3600).collect()}
    assert rows[1]["n_steps_completed"] == 2
    assert rows[2]["n_steps_completed"] == 3 and rows[2]["completed"]
    # without a window u1 completes too
    rows_nw = {r["user_id"]: r for r in funnel_analysis(
        ev, ["view", "click", "purchase"]).collect()}
    assert rows_nw[1]["completed"]


def test_funnel_randomized_vs_bruteforce(spark):
    # seeded random event streams vs a Python greedy reference (the
    # same earliest-match semantics), with and without the
    # entry-anchored conversion window
    import random

    from drugbankner_spark.operators.temporal import funnel_analysis

    rng = random.Random(99)
    steps = ["a", "b", "c"]
    rows = []
    for u in range(60):
        for _ in range(rng.randint(0, 12)):
            rows.append((u, rng.randint(0, 1000),
                         rng.choice(["a", "b", "c", "x"])))
    ev = spark.createDataFrame(
        rows, "user_id long, tsec long, event_type string"
    ).selectExpr(
        "user_id",
        "CAST(timestamp '2024-01-01 00:00:00' + tsec * INTERVAL 1 second"
        " AS TIMESTAMP) AS ts",
        "event_type",
    )

    def brute(window=None):
        per_user: dict = {}
        for u, tsec, tp in rows:
            per_user.setdefault(u, []).append((tsec, tp))
        out = {}
        for u, evs in per_user.items():
            if not any(tp in steps for _, tp in evs):
                continue
            evs.sort()
            got: list = []
            for tsec, tp in evs:
                if len(got) >= len(steps):
                    break
                if tp != steps[len(got)]:
                    continue
                if got and tsec <= got[-1]:
                    continue
                if window is not None and got and tsec > got[0] + window:
                    continue
                got.append(tsec)
            out[u] = len(got)
        return out

    for window in (None, 100):
        got = {r["user_id"]: r["n_steps_completed"]
               for r in funnel_analysis(
                   ev, steps, conversion_window_seconds=window).collect()}
        assert got == brute(window), f"window={window}"


def test_transition_matrix_counts_and_row_normalization(spark):
    # round 6: u1 a->b->a, u2 a->b->b; matrix rows normalize to 1.
    import datetime as dt

    from drugbankner_spark.operators.temporal import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"), (1, t0.replace(hour=1), 2, "b"),
        (1, t0.replace(hour=2), 3, "a"),
        (2, t0, 4, "a"), (2, t0.replace(hour=1), 5, "b"),
        (2, t0.replace(hour=2), 6, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    m = {(r["prev_state"], r["next_state"]): r
         for r in transition_matrix(ev).collect()}
    assert m[("a", "b")]["n"] == 2 and m[("a", "b")]["prob"] == 1.0
    assert m[("b", "a")]["n"] == 1 and m[("b", "a")]["prob"] == 0.5
    assert m[("b", "b")]["n"] == 1 and m[("b", "b")]["prob"] == 0.5
    assert len(m) == 3


def test_top_paths_prefix_cap_and_deterministic_ties(spark):
    import datetime as dt

    from drugbankner_spark.operators.temporal import top_paths

    t0 = dt.datetime(2024, 1, 1)

    def seq(uid, states):
        return [(uid, t0.replace(hour=i), uid * 100 + i, s)
                for i, s in enumerate(states)]

    ev = spark.createDataFrame(
        seq(1, ["a", "b", "c"]) + seq(2, ["a", "b", "c"]) +
        seq(3, ["x", "y"]) +
        seq(4, ["a", "b", "c", "d", "e", "LATE"]),   # 6th event ignored
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    rows = top_paths(ev, max_len=5, k=10).collect()
    assert [tuple(r) for r in rows] == [
        ("a>b>c", 2), ("a>b>c>d>e", 1), ("x>y", 1),
    ]


def test_cooccurrence_lift_hand_golden(spark):
    # round 6 late: baskets {1:ab, 2:ab, 3:ac, 4:b} -> pair stats.
    from drugbankner_spark.operators.temporal import cooccurrence_lift

    rows = [(1, "a"), (1, "b"), (1, "b"),   # dup collapses: basket {a,b}
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b")]
    ev = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = {(r["item_a"], r["item_b"]): r
           for r in cooccurrence_lift(ev).collect()}
    ab = out[("a", "b")]
    # n_a=3, n_b=3, n_ab=2, N=4
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["confidence_a_to_b"] == round(2 / 3, 6)
    assert ab["lift"] == round(2 * 4 / 9, 6)
    ac = out[("a", "c")]
    assert (ac["n_ab"], ac["n_a"], ac["n_b"]) == (1, 3, 1)
    assert ac["lift"] == round(4 / 3, 6)
    assert set(out) == {("a", "b"), ("a", "c")}  # b,c never co-occur
    # min_support filters
    assert set(
        (r["item_a"], r["item_b"])
        for r in cooccurrence_lift(ev, min_support=2).collect()
    ) == {("a", "b")}


def test_transition_power_matches_numpy(spark):
    # round 6 late: M^2 and M^3 via relational multiply == numpy on
    # the same 6dp-rounded matrix.
    import numpy as np

    from drugbankner_spark.operators.temporal import (
        transition_matrix,
        transition_power,
    )

    rows, uid, eid = [], 0, 0
    import random
    rng = random.Random(101)
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    for uid in range(30):
        for step in range(rng.randint(2, 8)):
            eid += 1
            rows.append((uid, t0 + dt.timedelta(minutes=step), eid,
                         rng.choice(["a", "b", "c"])))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    tm = transition_matrix(ev)
    states = sorted({r["prev_state"] for r in tm.collect()}
                    | {r["next_state"] for r in tm.collect()})
    idx = {s: i for i, s in enumerate(states)}
    M = np.zeros((len(states), len(states)))
    for r in tm.collect():
        M[idx[r["prev_state"]], idx[r["next_state"]]] = r["prob"]
    for k in (2, 3):
        Mk = np.linalg.matrix_power(M, k)
        got = {(r["prev_state"], r["next_state"]): r["prob"]
               for r in transition_power(tm, k).collect()}
        for (a, b), p in got.items():
            assert abs(p - Mk[idx[a], idx[b]]) < 1e-5, (k, a, b)


def test_attribution_hand_golden(spark):
    # round 6 late: touches reset per conversion; lookback caps to the
    # most recent; first/last/linear credits.
    import datetime as dt

    from drugbankner_spark.operators.temporal import attribution

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, minute, eid, tp):
        return (uid, t0 + dt.timedelta(minutes=minute), eid, tp)

    rows = [
        ev(1, 0, 1, "ad"), ev(1, 1, 2, "email"), ev(1, 2, 3, "buy"),
        ev(1, 3, 4, "ad"), ev(1, 4, 5, "buy"),       # second window
        ev(2, 0, 6, "a"), ev(2, 1, 7, "b"), ev(2, 2, 8, "c"),
        ev(2, 3, 9, "d"), ev(2, 4, 10, "buy"),       # 4 touches
        ev(3, 0, 11, "buy"),                          # no touches
    ]
    out = attribution(
        spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, event_type string",
        ),
        "buy", lookback_events=3,
    ).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conversion_id"], []).append(r)
    c3 = {r["touch_id"]: r for r in by_conv[3]}
    assert set(c3) == {1, 2} and c3[1]["position"] == 1
    assert c3[1]["first_credit"] == 1 and c3[1]["last_credit"] == 0
    assert c3[2]["last_credit"] == 1 and c3[2]["linear_credit"] == 0.5
    c5 = {r["touch_id"]: r for r in by_conv[5]}
    assert set(c5) == {4}   # window reset: only the post-buy 'ad'
    assert c5[4]["first_credit"] == c5[4]["last_credit"] == 1
    assert c5[4]["linear_credit"] == 1.0
    c10 = {r["touch_id"]: r for r in by_conv[10]}
    assert set(c10) == {7, 8, 9}  # lookback 3 drops the oldest touch
    assert c10[7]["position"] == 1 and c10[7]["first_credit"] == 1
    assert c10[9]["last_credit"] == 1
    assert c10[8]["linear_credit"] == round(1 / 3, 6)
    assert 11 not in by_conv  # conversion with no touches: no rows
