"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}.

Each query is fully materialized (collect) — results are small aggregates;
wall time measures scan + shuffle + agg, not driver transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Queries whose BENCH_r03 numbers drifted with ambient load (VERDICT r03
#: next #2): min-of-5 instead of min-of-3 — more chances to land between
#: noise spikes on the shared VM.
NOISY = {"e1_minhash_near_dup", "e1_minhash_near_dup_xxh",
         "f7_identifier_extract"}

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "j2_mode_vote",
    "a6_first_writer_wins",
    "w1_running_sum",
    # EXT headliners: dedup, similarity (exact + LSH), text, streaming,
    # and the 15-regex identifier sweep.
    "e1_minhash_near_dup",
    "e1_minhash_near_dup_xxh",  # xxhash64 production kernel (r02)
    "e2_cosine_topk",
    "e2_lsh_topk",
    "e3_text_quality",
    "e6_sessionize",
    "f7_identifier_extract",
    # round 3: the realistic end-to-end corpus-cleaning cost (MinHash
    # candidate pairs → component fixpoint → canonical → Gopher filters)
    "pipeline_clean_corpus",
    # round 4: the Structured-Streaming face of sessionize (readStream →
    # availableNow → memory sink), timed as its own entry
    "e6_sessionize_stream",
]

#: Name→registry aliases. "e6_sessionize" has ALWAYS benched the batch
#: session_window kernel; in round 4 the registry entry of that name
#: became the readStream face (driver correctness), so the bench keeps
#: comparability by timing the batch twin under the historical name and
#: the streaming face under the new explicit name above.
ALIAS = {
    "e6_sessionize": "e6_sessionize_batch",
    "e6_sessionize_stream": "e6_sessionize",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from drugbankner_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="drugbankner-bench")
    # all_queries: the round-1 headline list is timed unchanged even
    # though some entries left the driver registry in the round-2
    # consolidation (BENCH_r{N} stays comparable round-over-round).
    qs = entrymod.all_queries()
    # Warm the JVM/parquet footers with a trivial action (not counted).
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def q(name):
        return qs.get(ALIAS.get(name, name))

    # Warmup pass: JIT/codegen + OS page cache; not measured.
    for name in HEADLINE:
        if q(name) is not None:
            q(name)(spark, sf_dir).toPandas()

    # Load guard (VERDICT r03 next #2): record ambient machine load and a
    # fixed-cost CALIBRATION measurement so round-over-round comparisons
    # can tell engine regressions from shared-VM noise — BENCH_r03's
    # uniform +25-30% drift vs r02 had no such evidence in the JSON.
    load_before = os.getloadavg()
    calib = _calibration(spark, sf_dir)

    # min-of-N measured runs per query (N=5 for the noise-prone entries,
    # 3 otherwise): the environment (shared VM, JIT re-compilation
    # stalls) shows order-of-magnitude noise spikes; the minimum is the
    # honest estimate of the query's cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = q(name)
        if fn is None:
            continue
        best, n = None, 0
        for _ in range(5 if name in NOISY else 3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = len(df.toPandas())  # Arrow-batched materialization
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "loadavg_1m": round(load_before[0], 2),
        "loadavg_after_1m": round(os.getloadavg()[0], 2),
        "calibration_sec": calib,
    }))


def _calibration(spark, sf_dir: str) -> float:
    """Fixed-cost reference measurement (min of 3): a full scan + hash
    agg of the lineitem table. Engine changes never touch this path, so
    round-over-round calibration drift measures ENVIRONMENT drift — if
    BENCH_r{N} calibration is 1.3x BENCH_r{N-1}, a uniform 1.3x on the
    query timings is noise, not regression."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        li.agg(
            F.count(F.lit(1)), F.sum("l_quantity"), F.avg("l_extendedprice")
        ).collect()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return round(best, 3)


if __name__ == "__main__":
    main()
