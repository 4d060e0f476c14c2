"""Round-14 experiment (VERDICT r13 next #1): measure the linker pin
gate AT THE SCALE IT TAXES — x1_linker_corpus_maxdf and the serving
probe at sf1 (10× the bench SF) under pin modes off / auto / full,
plus the auto gate's product-row estimate, so the gate constants are
placed from measurements on both sides of the crossover.

Usage: python tools/exp_pin_sf1.py [sf01_dir]
Writes one JSON blob to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from drugbankner_spark.session import get_spark

    spark = get_spark(app_name="exp-pin-sf1")
    import __spark_entry__ as entrymod
    from bench import _ensure_sf1
    from drugbankner_spark import caching
    from drugbankner_spark.operators import linker as L

    sf1 = _ensure_sf1(spark, sf01)
    qs = entrymod.all_queries()
    out: dict = {"sf1_dir": sf1}

    def timed(fn, runs=2):
        n = len(fn().toPandas())  # warm
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            n = len(fn().toPandas())
            best = min(best or 9e9, time.perf_counter() - t0)
        caching.release_shared_caches()
        return round(best, 3), n

    corpus = qs["x1_linker_corpus_maxdf"]
    for mode in ("off", "auto", "full"):
        os.environ[L.LINKER_PIN_ENV] = mode
        L.LAST_PIN_DECISION.clear()
        sec, n = timed(lambda: corpus(spark, sf1))
        out[f"corpus_maxdf_{mode}"] = {"sec": sec, "rows": n,
                                       "pin": dict(L.LAST_PIN_DECISION)}
        print(f"# corpus_maxdf {mode}: {out[f'corpus_maxdf_{mode}']}",
              file=sys.stderr)

    # serving probe (202 mentions, champion path + risky tail)
    idx = entrymod._ensure_alias_index(spark, sf1)
    mentions = entrymod._serving_batch_mentions(spark, sf1)
    for mode in ("off", "auto", "full"):
        os.environ[L.LINKER_PIN_ENV] = mode
        stats: dict = {}
        L.LAST_PIN_DECISION.clear()
        sec, n = timed(lambda: L.link_with_alias_index(
            spark, idx, mentions, "mention", threshold=0.6, k=1,
            probe_stats=stats,
        ))
        out[f"served_{mode}"] = {"sec": sec, "rows": n, "stats": stats,
                                 "pin": dict(L.LAST_PIN_DECISION)}
        print(f"# served {mode}: {out[f'served_{mode}']}", file=sys.stderr)

    # bulk indexed probe (champion path at 10x aliases)
    indexed = qs["x1_linker_indexed"]
    for mode in ("off", "auto", "full"):
        os.environ[L.LINKER_PIN_ENV] = mode
        L.LAST_PIN_DECISION.clear()
        sec, n = timed(lambda: indexed(spark, sf1))
        out[f"indexed_{mode}"] = {"sec": sec, "rows": n,
                                  "pin": dict(L.LAST_PIN_DECISION)}
        print(f"# indexed {mode}: {out[f'indexed_{mode}']}", file=sys.stderr)

    os.environ.pop(L.LINKER_PIN_ENV, None)
    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
