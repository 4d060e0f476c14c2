"""Relational operator faces beyond the oracle-parity suite
(round 12): scale-form equivalences.
"""

def test_first_writer_wins_agg_face_equals_window(spark):
    # Round 12: the map-side-combinable min_by face must return the
    # SAME rows as the window face on a hot key (one key = 80% of
    # rows) under a total per-key order — and its plan has no Window.
    from pyspark.sql import functions as F

    from drugbankner_spark.operators.relational import first_writer_wins

    rows = [("hot", i, f"v{i}") for i in range(4000)]
    rows += [(f"k{i}", i, f"v{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, prio int, payload string")
    w = first_writer_wins(df, ["key"], ["prio"]).orderBy("key")
    a = first_writer_wins(df, ["key"], ["prio"], via="agg").orderBy("key")
    assert [tuple(r) for r in w.collect()] == \
        [tuple(r) for r in a.collect()]
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # partial (map-side) aggregation is present before the exchange
    assert "partial_min_by" in plan.lower() or "partial" in plan.lower()
    import pytest
    with pytest.raises(ValueError, match="unknown via"):
        first_writer_wins(df, ["key"], ["prio"], via="nope")
