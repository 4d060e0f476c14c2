"""Driver-sim a SUBSET of queries against the DuckDB oracle at sf0.01
(and optionally another SF via SPARK_GRAFT_ORACLE_SF).

Usage: python tools/oracle_subset.py <query> [<query> ...]

Same normalization + comparison as the verify skill's driver loop;
prints MATCH/MISMATCH per query. For registered-but-windowless names
this still works — all_queries() + oracle twins are checked when one
exists, rows-only otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

    import __spark_entry__ as E
    from drugbankner_spark.session import get_spark
    from tests.oracle_utils import duck_con, normalize

    spark = get_spark(app_name="oracle-subset")
    con = duck_con(sf)
    qs, osql = E.all_queries(), E.oracle_sql()
    bad = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        sdf = normalize(qs[name](spark, sf).toPandas())
        if name not in osql:
            print(f"{name} rows-only: {len(sdf)}")
            continue
        odf = normalize(con.execute(osql[name]).df())
        same = (
            sdf.astype(str).equals(odf.astype(str))
            and list(sdf.columns) == list(odf.columns)
        )
        print(name, "MATCH" if same else "MISMATCH", len(sdf))
        bad += 0 if same else 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
