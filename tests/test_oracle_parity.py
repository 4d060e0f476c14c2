"""Run every queries() entry against its oracle_sql() via DuckDB at
sf0.001 — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import compare_frames, duck_con  # noqa: E402

QUERIES = entrymod.all_queries()  # driver registry + pre-consolidation forms
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, sf_dir, con, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): must run, stable schema.
        assert sdf is not None
        return
    odf = con.execute(ORACLES[name]).df()
    compare_frames(sdf, odf, name)


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_window_is_exactly_50():
    # The driver records correctness for only the FIRST 50 registry
    # entries (round-1 lesson: 12 of 62 got no row). Rotation must
    # CONSOLIDATE to make room, never silently exceed the window.
    assert len(QUERIES_DRIVER := entrymod.queries()) == 50, \
        sorted(QUERIES_DRIVER)


def test_rotation_candidates_stay_oracle_ready():
    # Every pytest-only entry intended for next-round rotation keeps a
    # DuckDB oracle so the driver can hash-check it the day it rotates.
    for name in ["e3_charlm", "e5_mixture_sample", "e1_intradoc_dedup",
                 "e5_cluster_safe_split", "q_tpch_suite", "e5_pivot",
                 "e5_unpivot", "e1_crossdoc_dedup",
                 "e1_bloom_decontaminate", "e5_countmin_topk",
                 "e1_semantic_dedup", "e3_shuffle_shards",
                 "e5_weighted_upsample", "e3_length_buckets",
                 "e2_int8_quantize", "e3_ngram_topk", "e3_dict_tag",
                 "e5_eval_scores", "e5_chat_render", "e5_needle_inject",
                 "e4_bmp_decode", "s_warc_probe", "s_tar_probe",
                 "e4_container_probe", "e5_datacard", "e3_bm25_topk",
                 "e3_ppl_buckets", "e3_unicode_normalize",
                 "e3_url_canonicalize", "e4_gif_decode", "e3_wordlm"]:
        assert name in QUERIES and name in ORACLES, name
