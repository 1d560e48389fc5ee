"""Split per-query wall time into CONSTRUCTION (the Python call
``fn(spark, sf_dir)`` — plan building plus any driver-side actions the
entry performs while assembling its result) vs EXECUTION (the
``.collect()``), steady-state median of 3 after one warm-up — the
diagnosis pass of guide §1: bench.py times construction+execution
together, so a slow entry can be slow in either half and the fix
differs (driver-side work vs plan cost).

Usage: python tools/profile_queries.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from apde_etl_spark.operators.cache import release_scope
    from apde_etl_spark.session import get_spark

    spark = get_spark("apde-etl-profile-queries")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn(spark, sf_dir).collect()  # warm-up, untimed
        cons, ex = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            cons.append(round(t1 - t0, 3))
            ex.append(round(t2 - t1, 3))
        release_scope(None)
        out[name] = {"construct": sorted(cons)[1], "execute": sorted(ex)[1],
                     "construct_runs": cons, "execute_runs": ex}
        print(f"# {name}: construct={sorted(cons)[1]}s "
              f"execute={sorted(ex)[1]}s {cons} {ex}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
