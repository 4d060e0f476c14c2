"""Normalization-kernel parity tests: each Spark column function is checked
against a tiny executable spec that mirrors the reference semantics
(SURVEY.md §5.3). The corpus covers every quirk branch: empty strings,
multi-colon curies, unclosed brackets, long tokens, punctuation-only names.
"""

from __future__ import annotations

import os
import re
import string
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drugbankner_spark.functions import identifiers as I  # noqa: E402
from drugbankner_spark.functions import normalize as N  # noqa: E402


# --- executable specs (reference semantics, cited in module docstrings) ---

def spec_simplify(s: str) -> str:
    return s.lower().translate(
        {ord(c): None for c in string.punctuation + string.whitespace}
    )


def spec_cap_prefix(s: str) -> str:
    chunks = s.split(":")
    chunks[0] = chunks[0].upper()
    return ":".join(chunks)


def spec_remove_brackets(s: str) -> str:
    return re.sub(r"\[.*?\]", "", s)


def spec_delete_long_tokens(s: str, n: int = 100) -> str:
    return " ".join(t for t in s.split(" ") if len(t) < n)


def spec_strip_marks(s: str) -> str:
    return s.translate(str.maketrans("", "", ".,;:?!"))


CORPUS = [
    "",
    "aspirin",
    "Aspirin  [see note 1] and [2] caffeine",
    "[unclosed bracket",
    "nested [a [b] c] end",
    "CHEBI:12345",
    "chebi:12345:extra:colons",
    "no-colon-here",
    ":leading",
    "trailing:",
    "Beta-Blocker (oral); 2nd gen!",
    "  spaces   and\ttabs\nnewlines  ",
    "UPPER lower MiXeD",
    "tok " + "x" * 120 + " short",
    "a.b.c. sentence one. and two.",
    "punct-only !!! ??? ...",
    "DB00945 and CAS 50-78-2 or C12345",
    "P:1234 Q9H0H5 AB123456 0363-0160-01",
]


@pytest.fixture(scope="module")
def kernel_results(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CORPUS)], ["i", "s"])
    c = F.col("s")
    out = df.select(
        "i", "s",
        N.remove_brackets(c).alias("f1"),
        N.strip_sentence_marks(c).alias("f2"),
        N.simplify_name(c).alias("f3"),
        N.capitalize_curie_prefix(c).alias("f4"),
        N.curie_prefix(c).alias("f10"),
        N.delete_long_tokens(c, 100).alias("p4"),
        N.split_sentences(c).alias("f5"),
        N.sentence_length_ok(c).alias("p3"),
    ).collect()
    return {r["i"]: r for r in out}


@pytest.mark.parametrize("idx", range(len(CORPUS)))
def test_kernels_match_spec(kernel_results, idx):
    s = CORPUS[idx]
    r = kernel_results[idx]
    assert r["f1"] == spec_remove_brackets(s)
    assert r["f2"] == spec_strip_marks(s)
    assert r["f3"] == spec_simplify(s)
    assert r["f4"] == spec_cap_prefix(s)
    assert r["f10"] == s.split(":")[0]
    assert r["p4"] == spec_delete_long_tokens(s)
    assert r["f5"] == s.split(".")
    assert r["p3"] == (15 <= len(s) <= 1000)


def test_concat_text_fields(spark):
    rows = [
        ("a", None, "c"),
        (None, None, None),
        ("", "x", ""),
        ("one", "two", "three"),
    ]
    df = spark.createDataFrame(rows, ["f1", "f2", "f3"])
    out = df.select(
        N.concat_text_fields([F.col("f1"), F.col("f2"), F.col("f3")]).alias("t")
    ).collect()
    # reference (perform_NER.py:127-131): only truthy fields, '\n '
    # appended AFTER each (text += field + '\n ')
    expect = ["".join(x + "\n " for x in row if x) for row in rows]
    assert [r["t"] for r in out] == expect


def test_identifier_candidates_match_spec(spark):
    texts = [
        "DB00945",
        "50-78-2",
        "abc def",           # HET \w{3} hits twice
        "1234567",           # PubChem x2 dbs, ChEBI, DPD, GenBank? no
        "P:42",
        "Q9H0H5",
        "already:curie",     # still scanned by extract (routing is separate)
        "",
        "0363-0160-01",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = (
        I.extract_identifier_candidates(df, "t", ["i"])
        .groupBy("i", "database", "candidate_curie")
        .count()
        .collect()
    )
    got_set = {(r["i"], r["database"], r["candidate_curie"], r["count"]) for r in got}

    expect = {}
    for i, t in enumerate(texts):
        for db, prefix, pattern in I.IDENTIFIER_PATTERNS:
            n = len(re.findall(pattern, t))
            if n:
                key = (i, db, f"{prefix}:{t}")
                expect[key] = expect.get(key, 0) + n
    expect_set = {(*k, v) for k, v in expect.items()}
    assert got_set == expect_set


def test_is_curie_routing(spark):
    df = spark.createDataFrame([("a:b",), ("plain",), ("",)], ["t"])
    out = df.select(I.is_curie(F.col("t")).alias("c")).collect()
    assert [r["c"] for r in out] == [True, False, False]


def test_jaro_winkler_kernel_matches_duckdb_exactly():
    # round 6: the scalar kernel is pinned char-exact to DuckDB's
    # jaro_winkler_similarity (the registry oracle) — including the
    # rapidfuzz truncated half-transposition and the 0.7 boost gate.
    import random

    import duckdb

    from drugbankner_spark.functions.stringsim import jaro_winkler_py

    con = duckdb.connect()
    rng = random.Random(7)
    for _ in range(500):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler_py(a, b) - want) < 1e-12, (a, b)
    con.close()
    # the textbook goldens
    assert abs(jaro_winkler_py("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(jaro_winkler_py("dixon", "dicksonx") - 0.8133333333333332) < 1e-12
    assert jaro_winkler_py("", "abc") == 0.0
    assert jaro_winkler_py("same", "same") == 1.0
    # no boost at jaro <= 0.7 despite a common prefix
    assert abs(jaro_winkler_py("axxxxx", "ayyyyy") - 4 / 9) < 1e-12


def test_jw_blocked_match_scores_and_blocks(spark):
    from drugbankner_spark.functions.stringsim import jw_blocked_match

    left = spark.createDataFrame(
        [(1, "martha"), (2, "dixon"), (3, "zebra")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [("marhta",), ("dicksonx",), ("Zebra!",), ("qqqq",)],
        "cand string",
    )
    got = {(r["id"], r["matched_cand"]): r["jw_sim"]
           for r in jw_blocked_match(
               left, right, "name", "cand", threshold=0.8
           ).collect()}
    assert got[(1, "marhta")] == 0.961111
    assert got[(2, "dicksonx")] == 0.813333
    # 'zebra' vs 'Zebra!' co-blocks via lowercased prefix and scores
    assert (3, "Zebra!") in got
    assert all(v >= 0.8 for v in got.values())


def test_er_cluster_golden(spark):
    # round 6 late: composed ER (block -> JW -> threshold -> CC ->
    # canonical rep). 'robert smith'/'robert smiht' cluster (tail
    # transposition, same block 'r'); 'bob jones' stays a singleton;
    # the canonical name is the MIN-id member's.
    from drugbankner_spark.functions.stringsim import er_cluster

    recs = spark.createDataFrame(
        [(1, "robert smith"), (2, "robert smiht"), (3, "bob jones"),
         (4, "rachel adams")],
        ["rid", "rname"],
    )
    out = {r["id"]: r for r in
           er_cluster(recs, "rname", "rid", threshold=0.95).collect()}
    assert out[1]["cluster"] == out[2]["cluster"] == 1
    assert out[1]["canonical_name"] == "robert smith"
    assert out[2]["canonical_name"] == "robert smith"
    assert out[3]["cluster"] == 3 and out[3]["canonical_name"] == "bob jones"
    # same block 'r' as the roberts, but JW far below 0.95: singleton
    assert out[4]["cluster"] == 4


def test_er_cluster_matches_union_find_reference(spark):
    # randomized: Spark ER clusters == a scalar-kernel + union-find
    # reference over the same blocked pairs.
    import random

    from drugbankner_spark.functions.stringsim import (
        er_cluster,
        jaro_winkler_py,
    )

    rng = random.Random(41)
    base = ["alpha corp", "alpha corq", "beta llc", "betta llc",
            "gamma inc", "gamma  inc", "delta gmbh", "epsilon sa"]
    recs = [(i, rng.choice(base) + rng.choice(["", "", " x"]))
            for i in range(40)]
    thr, bp = 0.94, 1
    parent = {i: i for i, _ in recs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, na in recs:
        for j, nb in recs:
            if i < j and na[:bp].lower() == nb[:bp].lower() \
                    and round(jaro_winkler_py(na, nb), 6) >= thr:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i, _ in recs}
    got = {r["id"]: r["cluster"] for r in er_cluster(
        spark.createDataFrame(recs, ["rid", "rname"]),
        "rname", "rid", threshold=thr, block_prefix=bp,
    ).collect()}
    assert got == want
