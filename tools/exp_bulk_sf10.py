"""Round-14 decomposition: the sf10 bulk champion probe regressed
23.7 s (r13: factor 1.0, rerank pinned full by alias gate) → 42.1 s
(r14 rehearsal: factor 0.9, rerank pin estimate-gated). Isolate the
two changes: same factor-0.9 index probed with the pin forced full vs
auto (records the rerank estimate), then a factor-1.0 index probed
both ways.

Usage: python tools/exp_bulk_sf10.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from drugbankner_spark.session import get_spark

    spark = get_spark(app_name="exp-bulk-sf10")
    import __spark_entry__ as em
    import bench
    from drugbankner_spark import caching
    from drugbankner_spark.operators import linker as L
    from tools.rehearsal_sf10 import ensure_sf10

    sf1 = bench._ensure_sf1(spark, "/root/testdata/sf0.1")
    sf10 = ensure_sf10(spark, sf1)
    mentions, aliases = em._linker_corpus_mentions(spark, sf10)
    out: dict = {}

    def probe(idx, mode) -> dict:
        os.environ[L.LINKER_PIN_ENV] = mode
        L.LAST_PIN_DECISION.clear()
        best = None
        for i in range(2):
            t0 = time.perf_counter()
            n = len(L.link_with_alias_index(
                spark, idx, mentions, "mention", threshold=0.6, k=1,
                prune_buckets=False,
            ).toPandas())
            best = min(best or 9e9, time.perf_counter() - t0)
            caching.release_shared_caches()
        os.environ.pop(L.LINKER_PIN_ENV, None)
        return {"sec": round(best, 3), "rows": n,
                "pin": dict(L.LAST_PIN_DECISION),
                "loadavg": round(os.getloadavg()[0], 2)}

    # factor-0.9 index = the session one (_ensure_alias_index)
    idx09 = em._ensure_alias_index(spark, sf10)
    for mode in ("auto", "full"):
        out[f"f09_{mode}"] = probe(idx09, mode)
        print(f"# f09 {mode}: {out[f'f09_{mode}']}", flush=True)

    # factor-1.0 index (the r13 shipped policy) — w_cut = 1.0/sqrt(q)
    from pyspark.sql import functions as F

    alias_map = aliases.select("alias", "alias_id").filter(
        F.col("alias").isNotNull()).distinct()
    postings, _ = L.build_alias_vectors(alias_map, "alias", 3,
                                        max_df_ratio=0.1)
    w10 = L._auto_champion_w_cut(postings, rms_factor=1.0)
    caching.release_shared_caches()
    idx10 = tempfile.mkdtemp(prefix="idx_f10_") + "/idx"
    t0 = time.perf_counter()
    L.save_alias_index(aliases, "alias", "alias_id", idx10,
                       max_df_ratio=0.1, champion_w_cut=w10)
    out["f10_fit_sec"] = round(time.perf_counter() - t0, 3)
    out["f10_w_cut"] = round(w10, 4)
    for mode in ("auto", "full"):
        out[f"f10_{mode}"] = probe(idx10, mode)
        print(f"# f10 {mode}: {out[f'f10_{mode}']}", flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
