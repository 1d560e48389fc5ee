"""Scale stress for the round-4 temporal-join operators: synthesize an
event stream orders of magnitude past the testdata (default 20M events,
2000x sf0.01) and time the three temporal shapes whose scale posture the
operators claim:

- asof backward   (union + single-window; ONE shuffle on user_id)
- asof forward    (mirrored scan order)
- range left join (binned equi-join + zero-fill; no nested loop)

The event stream is generated IN PLACE with Spark expressions (no driver
row loop): deterministic per-row hashes drive user assignment (Zipf-ish
via power-law bucketing — hot users exist, as in real streams), type
mix, and timestamps over a 30-day horizon. Build side ~10% of rows.

Usage: python tools/scale_stress_temporal.py [n_events]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.temporal import asof_join, range_join_binned
    from apde_etl_spark.session import get_spark

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("scale-stress-temporal")
    t: dict[str, float] = {}

    # deterministic synthetic stream: ~n/1000 users with a power-law-ish
    # spread (id^2 folding concentrates mass on low ids), 30-day horizon
    n_users = max(1000, n_events // 1000)
    base = (
        spark.range(n_events)
        .withColumn("h", F.abs(F.xxhash64(F.col("id"))))
        # user id from an INDEPENDENT hash (h also drives event_type; a
        # shared hash correlates user sets across types — first version
        # of this tool produced disjoint click/error user sets and 0
        # as-of matches), quadratic fold for a hot-user skew
        .withColumn("h2", F.abs(F.xxhash64(F.col("id"), F.lit(7))))
        .withColumn("user_id", (F.col("h2") % n_users) * (F.col("h2") % n_users)
                    % n_users)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("h") % (30 * 24 * 3600))
            ),
        )
        .withColumn(
            "event_type",
            F.when(F.col("h") % 10 == 0, F.lit("error")).otherwise(F.lit("click")),
        )
        .withColumn("value", (F.col("h") % 10000) / F.lit(100.0))
        .select(F.col("id").alias("event_id"), "user_id", "ts",
                "event_type", "value")
    )
    base.write.mode("overwrite").parquet("/tmp/stress_temporal_events")
    ev = spark.read.parquet("/tmp/stress_temporal_events")
    n_total = ev.count()
    probe = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    build = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts").alias("err_ts"))
        .agg(F.max("value").alias("err_value"))
    )

    t0 = time.perf_counter()
    n_back = asof_join(
        probe, build, on=["user_id"], probe_ts="ts", build_ts="err_ts",
        build_cols=["err_value"],
    ).filter(F.col("err_value").isNotNull()).count()
    t["asof_backward"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_fwd = asof_join(
        probe, build, on=["user_id"], probe_ts="ts", build_ts="err_ts",
        build_cols=["err_value"], direction="forward", allow_exact=False,
    ).filter(F.col("err_value").isNotNull()).count()
    t["asof_forward"] = round(time.perf_counter() - t0, 2)

    # range: 30-minute window after each error on ONE hot day (keyless —
    # the hard case), left-joined so empty windows survive
    day = F.to_date(F.col("ts")) == F.lit("2024-01-05")
    iv = (
        ev.filter((F.col("event_type") == "error") & day)
        .select(F.col("event_id").alias("err_id"),
                F.col("ts").alias("w_start"),
                (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"))
    )
    pt = ev.filter((F.col("event_type") == "click") & day).select(
        F.col("event_id").alias("click_id"), "ts", "value")
    t0 = time.perf_counter()
    agg = (
        range_join_binned(iv, pt, "w_start", "w_end", "ts",
                          bin_width=1800, how="left")
        .groupBy("err_id").agg(F.count("click_id").alias("n_clicks"))
    )
    n_windows = agg.count()
    n_intervals = iv.count()
    t["range_left_30min_1day"] = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "n_events": n_total,
        "n_users": n_users,
        "n_asof_backward_matched": n_back,
        "n_asof_forward_matched": n_fwd,
        "n_range_intervals": n_intervals,
        "n_range_windows_out": n_windows,
        "seconds": t,
    }))


if __name__ == "__main__":
    main()
