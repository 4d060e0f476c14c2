"""E6 streaming: the Structured Streaming wrappers must produce exactly
the batch kernels' results over the same input (batch-stream
unification), and streaming dedup must drop within-watermark dupes."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark.streaming import streams as S  # noqa: E402
from drugbankner_spark.streaming.windows import (  # noqa: E402
    session_windows,
    sliding_counts,
    tumbling_counts,
)
from drugbankner_spark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark):
    # Stream source: the fixture events re-written as parquet micro-batch
    # files (two files → two logical arrival chunks).
    d = tempfile.mkdtemp(prefix="events_stream_")
    ev = load_table(spark, SF, "events")
    ev.repartition(2).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sorted_rows(df, cols):
    return [tuple(r[c] for c in cols) for r in df.orderBy(*cols).collect()]


def test_tumbling_stream_equals_batch(spark, event_dir):
    ev = load_table(spark, SF, "events")
    batch = tumbling_counts(ev)
    stream = S.run_to_memory(
        S.tumbling_stream(S.read_event_stream(spark, event_dir)),
        "t_tumbling", output_mode="complete",
    )
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _sorted_rows(stream, cols) == _sorted_rows(batch, cols)


def test_session_stream_equals_batch(spark, event_dir):
    ev = load_table(spark, SF, "events")
    batch = session_windows(ev)
    stream = S.run_to_memory(
        S.session_stream(S.read_event_stream(spark, event_dir)),
        "t_session", output_mode="complete",
    )
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _sorted_rows(stream, cols) == _sorted_rows(batch, cols)


def test_closed_sessions_append_equals_batch_closed_subset(spark, event_dir):
    # The production sessionization face (VERDICT r04 next #3): append
    # mode + watermark emits EXACTLY the batch kernel restricted to
    # sessions closed below the final watermark W = max(ts) - delay;
    # the one still-open head session is withheld, its state live.
    import datetime

    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events")
    got = S.run_to_memory(
        S.closed_sessions_stream(
            S.read_event_stream(spark, event_dir, watermark="10 minutes")
        ),
        "t_closed_sessions", output_mode="append",
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    wm = mx - datetime.timedelta(minutes=10)
    want = session_windows(ev).filter(F.col("session_end") <= F.lit(wm))
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # append emitted strictly fewer rows than the full table — the open
    # tail is withheld, i.e. state really is bounded by the watermark
    assert got.count() < session_windows(ev).count()


def test_sliding_stream_equals_batch(spark, event_dir):
    ev = load_table(spark, SF, "events")
    batch = sliding_counts(ev)
    stream = S.run_to_memory(
        S.sliding_stream(S.read_event_stream(spark, event_dir)),
        "t_sliding", output_mode="complete",
    )
    cols = ["window_start", "window_end", "n_events", "sum_value"]
    assert _sorted_rows(stream, cols) == _sorted_rows(batch, cols)


def test_stateful_user_totals(spark, event_dir):
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(S.EVENTS_STREAM_SCHEMA).parquet(event_dir)
    out = S.run_to_memory(
        S.stateful_user_totals(stream), "t_totals", output_mode="update"
    )
    # latest emitted row per user == the batch cumulative totals
    latest = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"),
             F.max("sum_value").alias("sum_value"))
    )
    ev = load_table(spark, SF, "events")
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"])
           for r in latest.collect()}
    want = {r["user_id"]: (r["n_events"], r["sum_value"])
            for r in batch.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-4


def _write_event_file(path, rows, mtime):
    """One parquet file = one micro-batch (maxFilesPerTrigger=1 processes
    oldest-mtime first). Timestamps coerced to micros so the stream's
    TimestampType schema reads them directly."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), path
    )
    os.utime(path, (mtime, mtime))


def test_watermark_drops_late_rows(spark):
    # The watermark contract (E6): once a window is FINALIZED and its
    # state evicted (watermark passed window_end), a straggler for it is
    # dropped — never aggregated, never re-emitted. (A late row arriving
    # while the window's state is still live MAY still merge — Spark's
    # watermark is an eviction bound, not an input filter — so the
    # straggler is sequenced to arrive one batch AFTER eviction.)
    # Four sequenced micro-batches (maxFilesPerTrigger=1, mtime order):
    #   1. three rows in window A = [00:00, 00:05)
    #   2. a row at 00:30 → next batch's watermark becomes 00:20 > A end
    #   3. a row at 00:35 → batch runs with wm 00:20: A emits and evicts
    #   4. a LATE row at 00:02:30 for the evicted A → must be dropped
    # Output must contain exactly ONE row for window A: (3, 3.0).
    d = tempfile.mkdtemp(prefix="late_events_")
    try:
        t0 = "2024-01-01 00:"
        _write_event_file(os.path.join(d, "b1.parquet"), [
            (1, t0 + "01:00", 1, "x", 1.0, "{}"),
            (2, t0 + "02:00", 1, "x", 1.0, "{}"),
            (3, t0 + "03:00", 2, "x", 1.0, "{}"),
        ], mtime=1_700_000_000)
        _write_event_file(os.path.join(d, "b2.parquet"), [
            (4, t0 + "30:00", 1, "x", 1.0, "{}"),
        ], mtime=1_700_000_100)
        _write_event_file(os.path.join(d, "b3.parquet"), [
            (5, t0 + "35:00", 2, "x", 1.0, "{}"),
        ], mtime=1_700_000_200)
        _write_event_file(os.path.join(d, "b4.parquet"), [
            (6, t0 + "02:30", 2, "x", 99.0, "{}"),   # straggler for evicted A
        ], mtime=1_700_000_300)
        stream = (
            spark.readStream.schema(S.EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "10 minutes")
        )
        out = S.run_to_memory(
            S.tumbling_stream(stream), "t_late", output_mode="append"
        )
        a_rows = [
            (r["n_events"], r["sum_value"])
            for r in out.collect()
            if "00:00:00" in str(r["window_start"])
        ]
        # exactly one finalized emission, without the 99.0 straggler
        assert a_rows == [(3, 3.0)], a_rows
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_foreach_batch_parquet_sink(spark, event_dir):
    # foreachBatch escape-hatch sink: complete-mode agg overwritten per
    # epoch → final parquet equals the batch kernel's answer.
    out_dir = tempfile.mkdtemp(prefix="fb_sink_")
    try:
        stream = S.tumbling_stream(S.read_event_stream(spark, event_dir))
        S.run_foreach_batch(
            stream, S.parquet_overwrite_sink(out_dir), output_mode="complete"
        )
        got = spark.read.parquet(out_dir)
        batch = tumbling_counts(load_table(spark, SF, "events"))
        cols = ["window_start", "event_type", "n_events", "sum_value"]
        assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_streaming_dedup_drops_duplicates(spark, event_dir):
    stream = S.read_event_stream(spark, event_dir, watermark="1 hour")
    deduped = S.run_to_memory(
        S.dedup_stream(stream), "t_dedup", output_mode="append"
    )
    ev = load_table(spark, SF, "events")
    # fixture has unique event_ids → dedup is the identity here; the
    # property under test is that the stateful operator runs and keeps
    # exactly one row per key.
    assert deduped.count() == ev.select("event_id").distinct().count()


def test_stream_interval_join_equals_batch(spark, event_dir):
    from pyspark.sql import functions as F

    # Long watermark so no row is treated as late: this test pins JOIN
    # semantics (stream == batch); the eviction contract has its own test.
    def sides(df):
        left = df.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        right = df.filter(F.col("event_type") == "click")
        return left, right

    ev = load_table(spark, SF, "events")
    b_left, b_right = sides(ev)
    batch = S.stream_interval_join(b_left, b_right)

    st = S.read_event_stream(spark, event_dir, watermark="400 days")
    s_left, s_right = sides(st)
    stream = S.run_to_memory(
        S.stream_interval_join(s_left, s_right), "t_ivjoin",
        output_mode="append",
    )
    cols = ["event_id", "r_ts", "r_value"]
    assert stream.count() > 0
    assert _sorted_rows(stream, cols) == _sorted_rows(batch, cols)


def test_stream_interval_join_outer_emits_unmatched(spark):
    # LEFT OUTER stream-stream join contract: a left row with no match
    # is emitted null-padded ONCE the watermark proves no matching right
    # row can still arrive — not dropped (the inner join's behavior),
    # not duplicated. Sequenced micro-batches (mtime order):
    #   1. purchase@00:01 user 1 + click@00:00:30 user 1 (matched pair),
    #      purchase@00:02 user 2 with no click (unmatched)
    #   2. click@01:00 user 9 → wm advances to 00:55 at batch end
    #   3. click@01:05 user 9 → batch runs under wm 00:55 > 00:02:
    #      user 2's row flushes from state null-padded
    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="outer_join_")
    try:
        t0 = "2024-01-01 "
        _write_event_file(os.path.join(d, "b1.parquet"), [
            (1, t0 + "00:00:30", 1, "click", 7.0, "{}"),
            (2, t0 + "00:01:00", 1, "purchase", 10.0, "{}"),
            (3, t0 + "00:02:00", 2, "purchase", 20.0, "{}"),
        ], mtime=1_700_000_000)
        _write_event_file(os.path.join(d, "b2.parquet"), [
            (4, t0 + "01:00:00", 9, "click", 1.0, "{}"),
        ], mtime=1_700_000_100)
        _write_event_file(os.path.join(d, "b3.parquet"), [
            (5, t0 + "01:05:00", 9, "click", 1.0, "{}"),
        ], mtime=1_700_000_200)

        def sides(df):
            left = df.filter(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "ts", "value"
            )
            right = df.filter(F.col("event_type") == "click")
            return left, right

        stream = (
            spark.readStream.schema(S.EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "5 minutes")
        )
        s_left, s_right = sides(stream)
        out = S.run_to_memory(
            S.stream_interval_join_outer(s_left, s_right), "t_ivjoin_outer",
            output_mode="append",
        )
        got = {
            r["event_id"]: (r["r_ts"], r["r_value"]) for r in out.collect()
        }
        # matched pair carries the click; unmatched flushed null-padded
        assert got[2] == (
            __import__("datetime").datetime(2024, 1, 1, 0, 0, 30), 7.0
        ), got
        assert got[3] == (None, None), got
        # and the streaming answer equals the batch plan on closed rows
        ev = spark.read.parquet(d)
        b_left, b_right = sides(ev)
        batch = S.stream_interval_join_outer(b_left, b_right)
        closed = {
            r["event_id"]: (r["r_ts"], r["r_value"])
            for r in batch.collect() if r["event_id"] in got
        }
        assert got == closed, (got, closed)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rocksdb_state_store_runs_stateful_query(spark):
    # the large-state conf surface is a flag flip: the same session-
    # window aggregation runs green under RocksDB state store (per-query
    # conf so the shared test session is untouched).
    from drugbankner_spark.session import rocksdb_state_conf

    conf = rocksdb_state_conf()
    assert conf[
        "spark.sql.streaming.stateStore.providerClass"
    ].endswith("RocksDBStateStoreProvider")
    assert conf[
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] == "512"

    d = tempfile.mkdtemp(prefix="rocksdb_events_")
    try:
        ev = load_table(spark, SF, "events")
        ev.repartition(2).write.mode("overwrite").parquet(d)
        saved = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            got = S.run_to_memory(
                S.tumbling_stream(S.read_event_stream(spark, d)),
                "t_rocksdb", output_mode="complete",
            )
            batch = tumbling_counts(ev)
            cols = ["window_start", "event_type", "n_events", "sum_value"]
            assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_enrich_stream_static_join_equals_batch(spark, event_dir):
    # stream-static enrichment must equal the same batch join
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [(u, f"tier{u % 3}") for u in range(200)],
        "user_id long, tier string",
    )
    got = S.run_to_memory(
        S.enrich_stream(
            S.read_event_stream(spark, event_dir), dim, "user_id"
        ).select("event_id", "user_id", "tier"),
        "t_enrich", output_mode="append",
    )
    ev = load_table(spark, SF, "events")
    want = ev.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", "tier"
    )
    cols = ["event_id", "user_id", "tier"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_streaming_cdc_apply_foreachbatch_equals_batch(spark, event_dir):
    # round 6 composition: a CDC changelog arriving as a STREAM is
    # applied per micro-batch (foreachBatch → apply_cdc against the
    # persisted state, atomically swapped) — after the stream drains,
    # the maintained state equals applying the whole changelog in one
    # batch. The production continuous-merge shape.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from drugbankner_spark.operators.temporal import apply_cdc

    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    op = F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
        F.lit("U")
    )
    state_dir = tempfile.mkdtemp(prefix="cdc_state_")
    state_path = state_dir + "/state"
    empty = ev.limit(0)
    # state persists WITH tombstones (see apply_cdc docstring: filtered
    # state would let an older update in a later batch resurrect a
    # deleted key); reads filter op != 'D'
    empty.withColumn("op", F.lit("U")).limit(0).write.mode(
        "overwrite"
    ).parquet(state_path)

    def upsert(batch_df, batch_id):
        snap = batch_df.sparkSession.read.parquet(state_path)
        merged = apply_cdc(
            snap, batch_df.withColumn("op", op), "user_id",
            tiebreak_cols=["event_id"], keep_tombstones=True,
        ).localCheckpoint()  # cut lineage before overwriting the input
        merged.write.mode("overwrite").parquet(state_path)

    stream = S.read_event_stream(spark, event_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    q = stream.writeStream.foreachBatch(upsert).trigger(
        availableNow=True
    ).option(
        "checkpointLocation", state_dir + "/ckpt"
    ).start()
    q.awaitTermination(120)

    got = spark.read.parquet(state_path).filter("op <> 'D'").drop("op")
    want = apply_cdc(
        empty, ev.withColumn("op", op), "user_id",
        tiebreak_cols=["event_id"],
    )
    cols = ["user_id", "ts", "event_id"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    shutil.rmtree(state_dir, ignore_errors=True)


def test_incremental_cdc_tombstones_block_stale_resurrection(spark):
    # adversarial batch order: batch 1 deletes key 1 at ts 10; batch 2
    # carries an OLDER (ts 5) update for key 1. With tombstone-retained
    # state the key stays deleted (matching one-shot application);
    # key 2's normal update flows through.
    from drugbankner_spark.operators.temporal import apply_cdc

    state = spark.createDataFrame(
        [], "k long, ts long, v string, op string"
    )
    b1 = spark.createDataFrame(
        [(1, 10, "x", "D"), (2, 1, "a", "U")],
        "k long, ts long, v string, op string",
    )
    b2 = spark.createDataFrame(
        [(1, 5, "stale", "U"), (2, 2, "b", "U")],
        "k long, ts long, v string, op string",
    )
    s1 = apply_cdc(state, b1, "k", ts_col="ts", keep_tombstones=True)
    s2 = apply_cdc(s1, b2, "k", ts_col="ts", keep_tombstones=True)
    live = {r["k"]: r["v"] for r in s2.filter("op <> 'D'").collect()}
    assert live == {2: "b"}
    # and the tombstone itself is still present in state
    assert {r["k"]: r["op"] for r in s2.collect()} == {1: "D", 2: "U"}


def test_funnel_stream_matches_batch_on_ordered_arrival(spark, event_dir):
    # round 6: the stateful streaming funnel converges to the batch
    # funnel's progress counts over the same (per-entity time-ordered)
    # event set.
    from drugbankner_spark.operators.temporal import funnel_analysis

    steps = ["view", "click", "purchase"]
    ev = load_table(spark, SF, "events")
    batch = {r["user_id"]: r["n_steps_completed"]
             for r in funnel_analysis(ev, steps).collect()}
    stream = S.run_to_memory(
        S.funnel_stream(S.read_event_stream(spark, event_dir), steps),
        "t_funnel", output_mode="update",
    )
    got = {r["user_id"]: r["n_steps_completed"] for r in stream.collect()}
    # streaming emits every user seen; batch emits users seen in a
    # funnel step — compare on the batch's key set
    assert all(got[k] == v for k, v in batch.items()), (got, batch)


def test_streaming_ann_index_maintenance_foreachbatch(spark):
    # round 6 composition: embeddings arriving as a stream maintain the
    # bucket-partitioned LSH index via foreachBatch append — after the
    # stream drains, probing the maintained index equals probing a
    # fresh full build (append touches only the new vectors' buckets).
    import tempfile

    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, SF, "embeddings")
    d = tempfile.mkdtemp(prefix="ann_stream_")
    src = d + "/src"
    emb.repartition(3).write.mode("overwrite").parquet(src)
    inc = d + "/inc"
    first = emb.filter("vec_id < 0")  # empty seed build
    SIM.build_lsh_index(first, inc, num_planes=8, dim=64)

    def append(batch_df, batch_id):
        SIM.append_to_lsh_index(batch_df, inc, num_planes=8, dim=64)

    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(append).trigger(
        availableNow=True
    ).option("checkpointLocation", d + "/ckpt").start()
    q.awaitTermination(180)

    full = d + "/full"
    SIM.build_lsh_index(emb, full, num_planes=8, dim=64)
    probes = emb.filter("vec_id < 5")
    cols = ["query_id", "neighbor_id", "cos_sim", "rank"]
    got = _sorted_rows(
        SIM.probe_lsh_index(spark, inc, probes, k=5, num_planes=8, dim=64),
        cols)
    want = _sorted_rows(
        SIM.probe_lsh_index(spark, full, probes, k=5, num_planes=8, dim=64),
        cols)
    assert got == want and len(got) > 0
    shutil.rmtree(d, ignore_errors=True)


def test_transition_stream_equals_batch_across_batch_boundary(spark, tmp_path):
    # round 6 late: the stored last-state must stitch the pair that
    # spans two micro-batches; counting the emitted pairs equals the
    # batch transition_matrix.
    import datetime as dt

    from pyspark.sql import functions as F

    from drugbankner_spark.operators.temporal import transition_matrix
    from drugbankner_spark.streaming.streams import (
        run_to_memory,
        transition_stream,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"), (1, t0.replace(hour=1), 2, "b"),
        (1, t0.replace(hour=2), 3, "a"),
        (2, t0, 4, "a"), (2, t0.replace(hour=1), 5, "b"),
        (2, t0.replace(hour=2), 6, "b"),
    ]
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    ev = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "ev_src")
    # file 1 = first half, file 2 = rest: user 1's (b -> a) pair and
    # user 2's (b -> b) pair both SPAN the boundary
    spark.createDataFrame(rows[:2] + rows[3:5], schema) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows[2:3] + rows[5:], schema) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src) \
        .withWatermark("ts", "10 minutes")
    pairs = run_to_memory(
        transition_stream(stream), "trans_pairs", "append"
    )
    got = sorted(map(tuple,
        pairs.groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).alias("n")).collect()))
    want = sorted(map(tuple,
        transition_matrix(ev).select("prev_state", "next_state", "n")
        .collect()))
    assert got == want and len(got) == 3


def test_stateless_rule_filters_compose_with_streams(spark, tmp_path):
    # round 6 late: c4_filter and pii_scrub are pure projections, so
    # the SAME operator code runs unchanged on a readStream source —
    # stream output == batch output row-for-row.
    from drugbankner_spark.operators.corpus import c4_filter
    from drugbankner_spark.operators.pii import pii_scrub
    from drugbankner_spark.streaming.streams import run_to_memory

    rows = [
        (1, "good line here.\nmail a@b.io now.\nshort."),
        (2, "server 10.0.3.7 is fine today."),
        (3, "no structure"),
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    batch = spark.createDataFrame(rows, schema)

    got_c4 = run_to_memory(c4_filter(stream), "c4_stream")
    assert sorted(map(tuple, got_c4.collect())) \
        == sorted(map(tuple, c4_filter(batch).collect()))
    got_pii = run_to_memory(pii_scrub(stream), "pii_stream")
    assert sorted(map(tuple, got_pii.collect())) \
        == sorted(map(tuple, pii_scrub(batch).collect()))


def test_transition_stream_idle_gap_evicts_state(spark, tmp_path):
    # round 6 late: with idle_gap_ms set, an entity idle past the
    # watermark gap is evicted — the cross-gap pair is NOT stitched
    # (the entity restarts), while a fresh entity's pairs still are.
    import datetime as dt

    from drugbankner_spark.streaming.streams import (
        run_to_memory,
        transition_stream,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    src = str(tmp_path / "ev_gap_src")
    # batch 1: user 1 emits 'a' at t0; user 2 advances the watermark
    spark.createDataFrame(
        [(1, t0, 1, "a"), (2, t0, 2, "x")], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2: user 2 jumps far ahead -> watermark advances hours past
    # user 1's last event; user 1's state times out
    spark.createDataFrame(
        [(2, t0.replace(hour=10), 3, "y")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 3: user 1 returns -> would be (a -> b) without eviction
    spark.createDataFrame(
        [(1, t0.replace(hour=11), 4, "b"),
         (1, t0.replace(hour=11, minute=5), 5, "c")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src) \
        .withWatermark("ts", "10 minutes")
    pairs = run_to_memory(
        transition_stream(stream, idle_gap_ms=30 * 60 * 1000),
        "trans_gap_pairs", "append",
    )
    got = sorted(map(tuple, pairs.select(
        "user_id", "prev_state", "next_state").collect()))
    # user 2: (x -> y) stitched (arrived before its state timed out);
    # user 1: (a -> b) dropped by eviction, (b -> c) kept
    assert got == [(1, "b", "c"), (2, "x", "y")]


def test_transition_stream_soak_state_stays_bounded(spark, tmp_path):
    # VERDICT r06 next #9 (soak): 50 micro-batches, each introducing a
    # NEW entity and idling the old ones — with idle_gap_ms set, the
    # state-store row count must stay FLAT across epochs (the whole
    # point of the eviction bound: a growing entity universe must not
    # grow executor state). Without eviction the store would end at 50.
    import datetime as dt
    import json as _json

    from drugbankner_spark.streaming.streams import transition_stream

    t0 = dt.datetime(2024, 1, 1)
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    src = str(tmp_path / "soak_src")
    n_batches = 50
    for i in range(n_batches):
        rows = [(i, t0 + dt.timedelta(hours=i), 2 * i, "a"),
                (i, t0 + dt.timedelta(hours=i, minutes=1), 2 * i + 1, "b")]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)

    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src) \
        .withWatermark("ts", "1 minute")
    q = (
        transition_stream(stream, idle_gap_ms=30 * 60 * 1000)
        .writeStream.format("memory").queryName("soak_pairs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    per_batch = []
    for p in q.recentProgress:
        d = _json.loads(p.json) if hasattr(p, "json") else p
        ops = d.get("stateOperators") or []
        if ops and d.get("numInputRows", 0) > 0:
            per_batch.append(ops[0]["numRowsTotal"])
    assert len(per_batch) >= n_batches
    # steady state: at most the current entity + one not-yet-evicted
    # predecessor lives in the store, regardless of universe size
    assert max(per_batch[5:]) <= 3, per_batch
    # and the operator still did its job: one (a -> b) pair per entity
    pairs = spark.table("soak_pairs")
    assert pairs.count() == n_batches
    assert pairs.select("user_id").distinct().count() == n_batches


def test_sibling_stateful_ops_idle_gap_evicts_state(spark, tmp_path):
    # round 7 (ADVICE r06): funnel_stream / cooccurrence_stream /
    # stateful_user_totals get the same idle_gap_ms bound
    # transition_stream carries — an entity idle past the gap is
    # evicted and restarts fresh, bounding total state on an unbounded
    # entity universe.
    import datetime as dt

    from pyspark.sql import functions as F

    from drugbankner_spark.streaming.streams import (
        cooccurrence_stream,
        funnel_stream,
        run_to_memory,
        stateful_user_totals,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    src = str(tmp_path / "ev_sibling_gap")
    # batch 1: user 1 starts (funnel step 'a', basket item 'a');
    # user 2 keeps the watermark moving
    spark.createDataFrame(
        [(1, t0, 1, "a"), (2, t0, 2, "x")], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2: watermark jumps hours past user 1's last event
    spark.createDataFrame(
        [(2, t0.replace(hour=10), 3, "y")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 3: user 1 returns with 'b' — without eviction the funnel
    # would advance a->b and the basket would pair (a, b)
    spark.createDataFrame(
        [(1, t0.replace(hour=11), 4, "b")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return spark.readStream.schema(schema) \
            .option("maxFilesPerTrigger", 1).parquet(src) \
            .withWatermark("ts", "10 minutes")

    gap = 30 * 60 * 1000
    fun = run_to_memory(
        funnel_stream(stream(), ["a", "b"], idle_gap_ms=gap),
        "funnel_gap", "update",
    )
    # memory sink retains every trigger's update rows: batch 1 emits
    # depth 1 ('a' matched); the restarted batch-3 funnel sees only
    # 'b' (step-0 mismatch) and emits 0. Without eviction batch 3
    # would stitch a->b and emit depth 2 / completed — assert it never
    # does.
    u1 = fun.filter("user_id = 1").collect()
    assert {r["n_steps_completed"] for r in u1} == {0, 1}
    assert not any(r["completed"] for r in u1)

    cooc = run_to_memory(
        cooccurrence_stream(stream(), idle_gap_ms=gap),
        "cooc_gap", "append",
    )
    assert cooc.filter("user_id = 1").count() == 0   # no (a, b) pair

    tot = run_to_memory(
        stateful_user_totals(
            stream().withColumn("value", F.lit(1.0)), idle_gap_ms=gap
        ),
        "totals_gap", "update",
    )
    # user 1's totals restart at 1 event after eviction — without it
    # the batch-3 update would read cumulative 2
    final = {r["user_id"]: r["n_events"]
             for r in tot.groupBy("user_id")
             .agg(F.max("n_events").alias("n_events")).collect()}
    assert final[1] == 1


def test_cooccurrence_stream_equals_batch(spark, tmp_path):
    # round 6 late: cross-batch basket growth — pair counts from the
    # stateful stream equal cooccurrence_lift's n_ab.
    import datetime as dt

    from pyspark.sql import functions as F

    from drugbankner_spark.operators.temporal import cooccurrence_lift
    from drugbankner_spark.streaming.streams import (
        cooccurrence_stream,
        run_to_memory,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    rows1 = [(1, t0, 1, "a"), (1, t0, 2, "b"), (2, t0, 3, "a")]
    rows2 = [(1, t0, 4, "c"), (1, t0, 5, "a"),   # 'a' repeat: no re-emit
             (2, t0, 6, "b")]                     # (a,b) spans batches
    src = str(tmp_path / "cooc_src")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    pairs = run_to_memory(cooccurrence_stream(stream), "cooc_pairs",
                          "append")
    got = sorted(map(tuple,
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab")).collect()))
    ev = spark.createDataFrame(rows1 + rows2, schema)
    want = sorted(map(tuple,
        cooccurrence_lift(ev).select("item_a", "item_b", "n_ab")
        .collect()))
    assert got == want and ("a", "b") in {(a, b) for a, b, _ in got}


def test_stream_calibration_partials_match_batch(spark, tmp_path):
    # round 6 late: per-bin (n, sum_conf, sum_correct) partials merge
    # across micro-batches into the exact batch calibration report.
    import shutil

    from drugbankner_spark.operators.evals import (
        calibration_report,
        read_calibration,
        stream_calibration_partials,
    )

    rows1 = [(0.12, 0), (0.18, 1), (0.95, 1)]
    rows2 = [(0.11, 0), (0.93, 1), (1.0, 0), (0.55, 1)]
    schema = "confidence double, correct int"
    src = str(tmp_path / "preds_src")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    state = str(tmp_path / "cal_state")
    stream = spark.readStream.schema(schema).parquet(src)
    stream_calibration_partials(stream, state)
    got = sorted(map(tuple, read_calibration(spark, state).collect()))
    want = sorted(map(tuple, calibration_report(
        spark.createDataFrame(rows1 + rows2, schema)).collect()))
    assert got == want and len(got) >= 3
    # round 15: calibration partials joined the sum-family compaction
    # protocol — fold all epochs to a generation base, the report is
    # unchanged across the boundary, same-boundary re-fire is a no-op
    from drugbankner_spark.operators.evals import (
        compact_calibration_state,
    )
    from drugbankner_spark.operators.sketches import _epoch_manifest

    epochs = sorted(r["_epoch"] for r in spark.read.parquet(state)
                    .select("_epoch").distinct().collect())
    assert compact_calibration_state(spark, state, epochs[-1]) \
        == len(epochs)
    spark.catalog.refreshByPath(state)
    after = sorted(map(tuple, read_calibration(spark, state).collect()))
    assert after == want
    assert _epoch_manifest(spark, state) == (1, epochs[-1])
    assert compact_calibration_state(spark, state, epochs[-1]) == 0
    shutil.rmtree(state, ignore_errors=True)


def test_cluster_assign_stream_equals_batch_assignment(spark, tmp_path):
    # round 8: the streaming routing face must reproduce the batch
    # k-means assignment bit-for-bit — same grid-integer arithmetic,
    # stateless append mode, availableNow over two arrival chunks.
    import random

    from drugbankner_spark.operators.clustering import kmeans_fit
    from drugbankner_spark.streaming.streams import (
        cluster_assign_stream,
        run_to_memory,
    )

    rng = random.Random(31)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, centroids = kmeans_fit(emb, k=4, n_iters=3)
    want = _sorted_rows(assigned, ["vec_id", "cluster_id", "sq_dist"])

    src = str(tmp_path / "vec_src")
    emb.repartition(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    got_df = run_to_memory(
        cluster_assign_stream(stream, centroids), "r8_assign_stream"
    )
    got = _sorted_rows(got_df, ["vec_id", "cluster_id", "sq_dist"])
    assert got == want and len(got) == 40

    import pytest

    with pytest.raises(ValueError):
        cluster_assign_stream(stream, centroids.filter("cluster_id < 0"))
