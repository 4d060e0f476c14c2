"""bench.py contract guards (round 8) — no SparkSession needed.

BENCH_r06 was lost to a stdout-line contract violation; these guards
catch the cheaper failure modes at test time instead of round-grading
time: every benched name must resolve through ALIAS into the query
registry, the frozen v1 list must stay frozen, and the calibrated
headline must be derivable from the pinned reference constant.
"""

from __future__ import annotations

import bench
import __spark_entry__ as entrymod


def test_every_bench_name_resolves_in_registry():
    qs = entrymod.all_queries()
    for name in [*bench.HEADLINE, *bench.SF1_QUERIES,
                 *bench.SF3_QUERIES, *bench.HEADLINE_V1]:
        resolved = bench.ALIAS.get(name, name)
        assert resolved in qs, (
            f"bench entry {name!r} (-> {resolved!r}) missing from "
            f"all_queries — its timing would silently vanish from "
            f"BENCH_r{{N}}"
        )


def test_headline_v1_is_frozen():
    # VERDICT r05 next #6: the round-1 12-query set is the only
    # round-over-round-comparable total. Do not edit.
    assert bench.HEADLINE_V1 == [
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_regional_revenue", "j2_mode_vote", "a6_first_writer_wins",
        "w1_running_sum", "e1_minhash_near_dup", "e2_cosine_topk",
        "e2_lsh_topk", "e3_text_quality", "e6_sessionize",
        "f7_identifier_extract",
    ]


def test_v1_entries_all_in_headline():
    assert set(bench.HEADLINE_V1) <= set(bench.HEADLINE)


def test_calibration_reference_pinned():
    # VERDICT r07 next #5: the calibrated headline normalizes to the
    # r05 clean-load environment; re-pinning would silently re-base
    # every round-over-round comparison.
    assert bench.REF_CALIBRATION == 0.084


def test_drift_section_gating():
    # Round 15 (VERDICT r14 next #4): the drift adjudicator fires only
    # when the latency probe exceeds 2x the healthy band, and even
    # then only names queries that actually drifted >=25% vs the last
    # driver-recorded round. Neither path below reaches Spark or git.
    quiet = bench._drift_section(
        None, {}, "/root/testdata/sf0.1", {"q1_pricing_summary": 9.9},
        bench.HEALTHY_JOB_LATENCY_MS,
    )
    assert quiet["triggered"] is False and quiet["queries"] == {}
    # elevated latency, but every timing at/below its recorded value
    fast = bench._drift_section(
        None, {}, "/root/testdata/sf0.1", {"q1_pricing_summary": 0.01},
        10 * bench.HEALTHY_JOB_LATENCY_MS,
    )
    assert fast["triggered"] is True and fast["queries"] == {}
    assert "drifted" in fast.get("note", "")


def test_prev_round_bench_reads_latest_artifact():
    # The adjudicator compares against the HIGHEST-numbered
    # driver-recorded BENCH_r{N}.json next to bench.py.
    prev = bench._prev_round_bench()
    assert prev is not None
    n, qs = prev
    assert n >= 14 and isinstance(qs, dict) and qs
