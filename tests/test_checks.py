"""Golden tests for the declarative constraint report
(operators/checks.py) on planted violations."""

from __future__ import annotations

import pytest

from drugbankner_spark.operators.checks import constraint_report


def test_constraint_report_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10, "O"), (2, None, "F"), (2, 30, "Z"), (4, 99, "P")],
        "id long, fk long, status string",
    )
    dim = spark.createDataFrame([(10,), (30,)], "dim_id long")
    out = {(r["check"], r["target"]): (r["n_violations"], r["passed"])
           for r in constraint_report(
               df,
               not_null=["fk"],
               unique=[["id"]],
               accepted_values={"status": ["O", "F", "P"]},
               references=[("fk", dim, "dim_id")],
           ).collect()}
    assert out[("not_null", "fk")] == (1, False)       # row 2
    assert out[("unique", "id")] == (1, False)         # id 2 twice
    assert out[("accepted_values", "status")] == (1, False)  # 'Z'
    assert out[("references", "fk")] == (1, False)     # 99 missing
    # a clean table passes everything
    clean = constraint_report(
        df.filter("id = 1"), not_null=["fk"], unique=[["id"]],
        accepted_values={"status": ["O"]},
        references=[("fk", dim, "dim_id")],
    )
    assert all(r["passed"] for r in clean.collect())
    with pytest.raises(ValueError, match="no checks"):
        constraint_report(df)


def test_fuzzy_join_planted_typos(spark):
    from drugbankner_spark.operators.relational import fuzzy_join
    from drugbankner_spark.plans import explain as X

    names = spark.createDataFrame(
        [("aspirin",), ("warfarin",), ("heparin",)], "name string"
    )
    probes = spark.createDataFrame(
        [("aspirinn",),   # 1 insert → matches aspirin
         ("warfarim",),   # 1 substitution at end → warfarin
         ("hepximn",),    # 3+ edits → no match
         ("zzzzz",)],     # nothing close
        "probe string",
    )
    out = {(r["probe"], r["matched_name"], r["distance"])
           for r in fuzzy_join(probes, names, "probe", "name").collect()}
    assert ("aspirinn", "aspirin", 1) in out
    assert ("warfarim", "warfarin", 1) in out
    assert not any(p in ("hepximn", "zzzzz") for p, _, _ in out)
    # blocked, never a cross product
    assert not X.has_cartesian(fuzzy_join(probes, names, "probe", "name"))
