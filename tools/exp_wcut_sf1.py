"""Round-14 experiment (VERDICT r13 next #2): sweep the champion
weight-cut RMS factor at sf1 (35.6k aliases — the mid-scale ontology
where r13's sf10-tuned factor 1.0 left 11/202 mentions uncertified)
and compare against the legacy rank policy C=512 (r12's certified-1.0
config at this scale). Records certified fraction + served seconds
per config.

Usage: python tools/exp_wcut_sf1.py [sf01_dir]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from drugbankner_spark.session import get_spark

    spark = get_spark(app_name="exp-wcut-sf1")
    import __spark_entry__ as entrymod
    from bench import _ensure_sf1
    from drugbankner_spark import caching
    from drugbankner_spark.operators import linker as L

    sf1 = _ensure_sf1(spark, sf01)
    _mentions, aliases = entrymod._linker_corpus_mentions(spark, sf1)
    serving = entrymod._serving_batch_mentions(spark, sf1)

    # the fit's own q (p95 per-alias gram count) so each factor maps to
    # an explicit champion_w_cut
    alias_map = aliases.select("alias", "alias_id").filter(
        F.col("alias").isNotNull()).distinct()
    postings, _idf = L.build_alias_vectors(
        alias_map, "alias", 3, max_df_ratio=0.1)
    q = (postings.groupBy("alias").agg(F.count(F.lit(1)).alias("_g"))
         .agg(F.percentile_approx("_g", 0.95).alias("_q"))
         .collect()[0]["_q"])
    caching.release_shared_caches()
    out: dict = {"sf1_dir": sf1, "p95_alias_grams": q,
                 "n_aliases": alias_map.count()}

    def probe(path) -> dict:
        stats: dict = {}
        # warm + min-of-2
        L.link_with_alias_index(spark, path, serving, "mention",
                                threshold=0.6, k=1).toPandas()
        caching.release_shared_caches()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(L.link_with_alias_index(
                spark, path, serving, "mention", threshold=0.6, k=1,
            ).toPandas())
            best = min(best or 9e9, time.perf_counter() - t0)
            caching.release_shared_caches()
        L.link_with_alias_index(
            spark, path, serving, "mention", threshold=0.6, k=1,
            probe_stats=stats,
        ).toPandas()
        caching.release_shared_caches()
        return {"sec": round(best, 3), "rows": n, **stats}

    for f in (1.0, 0.9, 0.8, 0.7, 0.6):
        w = max(L.ALIAS_WCUT_MIN, min(L.ALIAS_WCUT_MAX,
                                      f / float(q) ** 0.5))
        path = tempfile.mkdtemp(prefix=f"wcut_{f}_") + "/idx"
        t0 = time.perf_counter()
        L.save_alias_index(aliases, "alias", "alias_id", path,
                           max_df_ratio=0.1, champion_w_cut=w)
        fit = round(time.perf_counter() - t0, 3)
        out[f"factor_{f}"] = {"w_cut": round(w, 4), "fit_sec": fit,
                              **probe(path)}
        print(f"# factor {f}: {out[f'factor_{f}']}", file=sys.stderr)

    # legacy rank policy C=512 (the r12 mid-scale champion config)
    path = tempfile.mkdtemp(prefix="c512_") + "/idx"
    t0 = time.perf_counter()
    L.save_alias_index(aliases, "alias", "alias_id", path,
                       max_df_ratio=0.1, champion_c=512)
    out["legacy_c512"] = {
        "fit_sec": round(time.perf_counter() - t0, 3), **probe(path)}
    print(f"# legacy_c512: {out['legacy_c512']}", file=sys.stderr)

    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
