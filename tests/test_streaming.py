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


def test_sliding_stream_equals_batch(spark, event_dir):
    ev = load_table(spark, SF, "events")
    batch = sliding_counts(ev)
    stream = S.run_to_memory(
        S.sliding_stream(S.read_event_stream(spark, event_dir)),
        "t_sliding", output_mode="complete",
    )
    cols = ["window_start", "window_end", "n_events", "sum_value"]
    assert _sorted_rows(stream, cols) == _sorted_rows(batch, cols)


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
