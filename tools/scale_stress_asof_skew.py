"""Hot-key stress for asof_join vs asof_join_salted: 10^7 probe events
on ONE key (the pathological case temporal.py documents — a per-key
window serializes the whole key into a single task) plus build rows
every ~100 s. Measures wall time for both formulations AND the actual
task spread (max rows any single window partition processed, via a
count over the salted slice key), proving the salted path distributes
what the plain path serializes — with identical results (the equality
is also checked here on a 1% sample digest).

Usage: python tools/scale_stress_asof_skew.py [n_probe] [n_slices]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.temporal import asof_join, asof_join_salted
    from apde_etl_spark.session import get_spark

    n_probe = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("scale-stress-asof-skew")

    horizon = 30 * 24 * 3600
    probe = (
        spark.range(n_probe)
        .withColumn("h", F.abs(F.xxhash64("id")))
        .select(
            F.col("id").alias("event_id"),
            F.lit(1).alias("user_id"),  # ONE key: worst-case skew
            F.timestamp_seconds(F.lit(1704067200) + F.col("h") % horizon)
            .alias("ts"),
        )
    )
    build = (
        spark.range(horizon // 100)
        .select(
            F.lit(1).alias("user_id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 100)
            .alias("err_ts"),
            (F.col("id") % 1000).cast("double").alias("err_value"),
        )
    )
    probe.write.mode("overwrite").parquet("/tmp/stress_asof_skew_probe")
    build.write.mode("overwrite").parquet("/tmp/stress_asof_skew_build")
    probe = spark.read.parquet("/tmp/stress_asof_skew_probe")
    build = spark.read.parquet("/tmp/stress_asof_skew_build")

    t: dict[str, float] = {}

    t0 = time.perf_counter()
    n_plain = asof_join(
        probe, build, on=["user_id"], probe_ts="ts", build_ts="err_ts",
        build_cols=["err_value"],
    ).filter(F.col("err_value").isNotNull()).count()
    t["plain_one_key"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_salted = asof_join_salted(
        probe, build, on=["user_id"], probe_ts="ts", build_ts="err_ts",
        build_cols=["err_value"], n_slices=n_slices,
    ).filter(F.col("err_value").isNotNull()).count()
    t["salted_one_key"] = round(time.perf_counter() - t0, 2)

    # spread evidence: the salted window key is (user, slice) — count the
    # rows per slice the way the operator buckets them
    bounds = probe.agg(F.min(F.col("ts").cast("double")).alias("lo"),
                       F.max(F.col("ts").cast("double")).alias("hi")).first()
    width = (bounds["hi"] - bounds["lo"]) / n_slices
    per_slice = (
        probe.groupBy(
            F.least(F.floor((F.col("ts").cast("double") - bounds["lo"]) / width),
                    F.lit(n_slices - 1)).alias("slice")
        ).count().agg(F.max("count").alias("mx"), F.count("*").alias("n")).first()
    )

    # result equality on a deterministic 1% sample digest
    def digest(df):
        return (
            df.filter(F.abs(F.xxhash64("event_id")) % 100 == 0)
            .agg(F.sum(F.hash("event_id", "err_ts", "err_value")).alias("d"))
            .first()["d"]
        )

    d_plain = digest(asof_join(
        probe, build, on=["user_id"], probe_ts="ts", build_ts="err_ts",
        build_cols=["err_value"]))
    d_salted = digest(asof_join_salted(
        probe, build, on=["user_id"], probe_ts="ts", build_ts="err_ts",
        build_cols=["err_value"], n_slices=n_slices))

    print(json.dumps({
        "n_probe": n_probe,
        "n_build": horizon // 100,
        "n_slices": n_slices,
        "n_matched_plain": n_plain,
        "n_matched_salted": n_salted,
        "max_rows_one_salted_partition": per_slice["mx"],
        "occupied_slices": per_slice["n"],
        "digest_equal": bool(d_plain == d_salted),
        "seconds": t,
    }))


if __name__ == "__main__":
    main()
