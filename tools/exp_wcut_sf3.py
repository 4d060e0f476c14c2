"""Round-14 boundary measurement: the two-regime w_cut factor switches
at 100k aliases, interpolated between the measured sf1 (35.6k) and
sf10 (357k) points. The sf3 corpus's alias dim (~3x sf1) sits right at
the boundary — fit it under BOTH factors and record certified fraction
+ serving seconds, so the regime switch is bracketed by data on both
sides.

Usage: python tools/exp_wcut_sf3.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from drugbankner_spark.session import get_spark

    spark = get_spark(app_name="exp-wcut-sf3")
    import __spark_entry__ as em
    import bench
    from drugbankner_spark import caching
    from drugbankner_spark.operators import linker as L

    sf1 = bench._ensure_sf1(spark, "/root/testdata/sf0.1")
    sf3 = bench._ensure_sf3(spark, sf1)
    _m, aliases = em._linker_corpus_mentions(spark, sf3)
    serving = em._serving_batch_mentions(spark, sf3)
    alias_map = aliases.select("alias", "alias_id").filter(
        F.col("alias").isNotNull()).distinct()
    n_aliases = alias_map.count()
    out: dict = {"sf3_dir": sf3, "n_aliases": n_aliases}
    postings, _idf = L.build_alias_vectors(alias_map, "alias", 3,
                                           max_df_ratio=0.1)
    q = (postings.groupBy("alias").agg(F.count(F.lit(1)).alias("_g"))
         .agg(F.percentile_approx("_g", 0.95).alias("_q"))
         .collect()[0]["_q"])
    out["p95_alias_grams"] = q
    caching.release_shared_caches()

    for f in (1.0, 0.9):
        w = max(L.ALIAS_WCUT_MIN, min(L.ALIAS_WCUT_MAX,
                                      f / float(q) ** 0.5))
        path = tempfile.mkdtemp(prefix=f"wcut3_{f}_") + "/idx"
        t0 = time.perf_counter()
        L.save_alias_index(aliases, "alias", "alias_id", path,
                           max_df_ratio=0.1, champion_w_cut=w)
        fit = round(time.perf_counter() - t0, 3)
        stats: dict = {}
        L.link_with_alias_index(spark, path, serving, "mention",
                                threshold=0.6, k=1,
                                probe_stats=stats).toPandas()
        caching.release_shared_caches()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(L.link_with_alias_index(
                spark, path, serving, "mention", threshold=0.6, k=1,
            ).toPandas())
            best = min(best or 9e9, time.perf_counter() - t0)
            caching.release_shared_caches()
        out[f"factor_{f}"] = {"w_cut": round(w, 4), "fit_sec": fit,
                              "sec": round(best, 3), "rows": n, **stats}
        print(f"# factor {f}: {out[f'factor_{f}']}", flush=True)

    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
