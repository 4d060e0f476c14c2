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


def test_unique_check_ignores_null_keys(spark):
    # ADVICE r04: NULL-containing keys are excluded from the unique
    # check on both engines (SQL count(DISTINCT ...) skips NULLs); two
    # NULL keys are NOT a duplicate, and a real duplicate is still one.
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c"), (1, "d"), (2, "e")],
        "k long, x string",
    )
    out = {(r["check"], r["target"]): (r["n_violations"], r["passed"])
           for r in constraint_report(df, unique=[["k"]]).collect()}
    assert out[("unique", "k")] == (1, False)  # only the real dup (k=1)
    # composite key: NULL in EITHER column excludes the row
    df2 = spark.createDataFrame(
        [(1, None), (1, None), (1, "a"), (1, "a")], "k long, x string"
    )
    out2 = {(r["check"],): r["n_violations"]
            for r in constraint_report(df2, unique=[["k", "x"]]).collect()}
    assert out2[("unique",)] == 1  # the (1,'a') pair; NULL rows ignored


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


def test_shared_persist_registry_releases(spark):
    # ADVICE r04: every shared-subtree persist is registered and
    # releasable — a long-lived session can drop accumulated caches.
    from drugbankner_spark.caching import release_shared_caches
    from drugbankner_spark.operators.dedup import minhash_band_pairs_rowwise

    release_shared_caches()  # start clean
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "zz yy xx ww vv uu")],
        "doc_id long, text string",
    )
    pairs = minhash_band_pairs_rowwise(docs, "text", "doc_id")
    assert pairs.count() >= 1  # action populates the cache
    assert release_shared_caches() >= 1
    assert release_shared_caches() == 0  # registry drained


def test_profile_columns_goldens(spark):
    # round 6 late: Deequ-style profile — exact counts, lexicographic
    # min/max on the string form, deterministic mode tiebreak.
    from drugbankner_spark.operators.checks import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, None), (10, "b")],
        ["k", "v"],
    )
    out = {r["column"]: r for r in profile_columns(df, ["k", "v"]).collect()}
    k = out["k"]
    assert (k["n"], k["n_null"], k["n_distinct"]) == (5, 0, 5)
    assert (k["min_value"], k["max_value"]) == ("1", "4")  # lexicographic
    assert k["top_count"] == 1 and k["top_value"] == "1"   # tie -> min
    v = out["v"]
    assert (v["n"], v["n_null"], v["n_distinct"]) == (5, 1, 2)
    assert (v["min_value"], v["max_value"]) == ("a", "b")
    assert (v["top_value"], v["top_count"]) == ("a", 2)    # tie -> 'a'

    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])
    # all-NULL column: no row
    allnull = spark.createDataFrame([(1, None), (2, None)],
                                    "k long, z string")
    assert {r["column"] for r in
            profile_columns(allnull, ["z"]).collect()} == set()
