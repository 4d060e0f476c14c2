"""Full driver simulation: every queries() entry vs its DuckDB oracle
at sf0.01 — what the driver's CORRECTNESS_r{N} does. ~20 min.

Usage: python tools/full_driver_sim.py
"""
from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as E
    from drugbankner_spark.session import get_spark
    from tests.oracle_utils import duck_con, normalize

    spark = get_spark(app_name="full-driver-sim")
    print("entry:", len(E.entry(spark).collect()), "rows", flush=True)
    sf = "/root/testdata/sf0.01"
    con = duck_con(sf)
    qs, osql = E.queries(), E.oracle_sql()
    bad = []
    for name in sorted(qs):
        try:
            sdf = normalize(qs[name](spark, sf).toPandas())
            if name not in osql:
                print(name, "rows-only:", len(sdf), flush=True)
                continue
            odf = normalize(con.execute(osql[name]).df())
            same = (sdf.astype(str).equals(odf.astype(str))
                    and list(sdf.columns) == list(odf.columns))
            print(name, "MATCH" if same else "MISMATCH", len(sdf),
                  flush=True)
            if not same:
                bad.append(name)
        except Exception as exc:
            print(name, "ERROR", f"{type(exc).__name__}: {exc}",
                  flush=True)
            bad.append(name)
    print("SUMMARY:", len(qs), "entries,", len(bad), "bad:", bad,
          flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
