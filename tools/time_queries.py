"""Isolated per-query timing: run named queries() entries with the
noop sink (guide §1.4 — computes every column, discards the result) and
report cold + median-of-3 steady times, one Spark session, job-labeled.

Usage: python tools/time_queries.py [--sf DIR] [--sink noop|collect] name...

``--sink collect`` matches bench.py's timed action (the driver contract
times ``.collect()``); noop isolates computation from the
result-transfer path. Both are reported to stderr; the last stdout line
is a JSON map {name: {"cold": s, "steady": s, "runs": [...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sink = "collect"
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--sink":
            sink = next(it)
        else:
            names.append(a)

    import __spark_entry__ as entrymod
    from apde_etl_spark.operators.cache import release_scope
    from apde_etl_spark.session import get_spark

    spark = get_spark("apde-etl-time-queries")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def run(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        return round(time.perf_counter() - t0, 3)

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        cold = run(fn)
        samples = [run(fn) for _ in range(3)]
        spark.sparkContext.setJobDescription(None)
        release_scope(None)
        out[name] = {"cold": cold, "steady": sorted(samples)[1],
                     "runs": samples}
        print(f"# {name}: steady={out[name]['steady']}s cold={cold}s "
              f"runs={samples} sink={sink}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "sink": sink,
                      "loadavg": round(os.getloadavg()[0], 2),
                      "queries": out}))


if __name__ == "__main__":
    main()
