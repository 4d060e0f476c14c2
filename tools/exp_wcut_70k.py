"""Round-15 boundary tightening (VERDICT r14 next #7, "only if
free"): the two-regime w_cut factor switch is measured at 35.6k
(needs 0.9) and 107k (1.0 correct); the gap in between runs 0.9,
which errs toward certification. One extra point near ~70k says
which way the true switch leans: subsample the sf3 corpus's alias
dim to ~65% (deterministic hash cut, ~70k aliases), fit under BOTH
factors, record certified fraction + serving seconds.

Usage: python tools/exp_wcut_70k.py
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

    spark = get_spark(app_name="exp-wcut-70k")
    import __spark_entry__ as em
    import bench
    from drugbankner_spark import caching
    from drugbankner_spark.operators import linker as L

    sf1 = bench._ensure_sf1(spark, "/root/testdata/sf0.1")
    sf3 = bench._ensure_sf3(spark, sf1)
    _m, aliases = em._linker_corpus_mentions(spark, sf3)
    serving = em._serving_batch_mentions(spark, sf3)
    # deterministic ~65% cut of the alias dim: 107k -> ~70k, squarely
    # inside the unmeasured (35.6k, 107k) gap
    aliases = aliases.filter(F.pmod(F.xxhash64("alias"), 100) < 65)
    alias_map = aliases.select("alias", "alias_id").filter(
        F.col("alias").isNotNull()).distinct()
    n_aliases = alias_map.select("alias").distinct().count()
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
        path = tempfile.mkdtemp(prefix=f"wcut70k_{f}_") + "/idx"
        t0 = time.perf_counter()
        L.save_alias_index(aliases, "alias", "alias_id", path,
                           max_df_ratio=0.1, champion_w_cut=w)
        fit = round(time.perf_counter() - t0, 3)
        stats: dict = {}
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            L.link_with_alias_index(spark, path, serving, "mention",
                                    threshold=0.6, k=1,
                                    probe_stats=stats).toPandas()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            caching.release_shared_caches()
        out[f"factor_{f}"] = {
            "w_cut": round(w, 4), "fit_sec": fit,
            "serve_sec": round(best, 3),
            "certified": stats.get("certified_fraction"),
            "n_risky": stats.get("n_risky"),
        }
        print(f"# factor {f}: {out[f'factor_{f}']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
