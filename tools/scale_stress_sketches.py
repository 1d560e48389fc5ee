"""Scale stress for the mergeable-sketch stores (HLL, Count-Min, KMV):
synthesize an event stream orders of magnitude past the testdata
(default 20M events / ~200k distinct users over 30 days), build each
per-day sketch store, persist it, and answer the store-merge questions
— proving the 100 TB claim that sketch STATE stays bounded (days*m /
days*depth*width / days*k integer rows) while accuracy holds:

- HLL:  per-day registers -> merged 30-day distinct estimate
- CMS:  per-day registers -> merged heavy-hitter point estimates
- KMV:  per-day k-min sketches -> merged union AND even/odd-day
        cohort intersection estimates

The stream is generated IN PLACE with Spark expressions (no driver row
loop); per-row hashes drive user assignment with a quadratic fold so
hot users exist. Exact ground truths are computed once for the error
columns.

Usage: python tools/scale_stress_sketches.py [n_events]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators import sketch as S
    from apde_etl_spark.operators.profile import hll_estimate, hll_registers
    from apde_etl_spark.session import get_spark

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("scale-stress-sketches")
    # day assignment below uses to_date(timestamp_seconds(...)) and
    # dayofmonth — pin the session TZ so the recorded stress numbers
    # reproduce on any host (getOrCreate may reuse a session whose TZ
    # differs from get_spark's UTC default)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t: dict[str, float] = {}

    n_users = max(1000, n_events // 100)
    # 30% of traffic on 8 hot users (the CMS probe set), the rest
    # uniform over ~n_users ids — realistic cardinality for the
    # distinct sketches AND a heavy-hitter head for the frequency one
    # the active user universe GROWS by week (h2 % (base*(week+1))):
    # later weeks draw from a strictly larger id range, so the KMV
    # difference arm below has real weekly new-user cohorts to estimate
    # (a static universe would make every post-week-1 answer trivially 0)
    base = (
        spark.range(n_events)
        .withColumn("h2", F.abs(F.xxhash64(F.col("id"), F.lit(7))))
        .withColumn("day", F.to_date(F.timestamp_seconds(
            F.lit(1704067200)
            + (F.abs(F.xxhash64(F.col("id"))) % (30 * 24 * 3600)))))
        .withColumn("__wk", F.datediff(
            F.col("day"), F.lit("2024-01-01").cast("date")) / 7)
        .withColumn("user_id",
                    F.when(F.col("h2") % 10 < 3, F.col("h2") % 8)
                    .otherwise(F.col("h2") % (
                        (F.floor("__wk") + 1) * (n_users // 5))))
        .select("day", "user_id")
    )

    t0 = time.monotonic()
    exact_distinct = base.select("user_id").distinct().count()
    t["exact_distinct_scan_s"] = round(time.monotonic() - t0, 1)

    root = tempfile.mkdtemp(prefix="apde_stress_sk_")
    try:
        # ------------------------------------------------ HLL store
        t0 = time.monotonic()
        hll_registers(base, "user_id", ["day"]).write.mode(
            "overwrite").partitionBy("day").parquet(f"{root}/hll")
        t["hll_build_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        regs = spark.read.parquet(f"{root}/hll")
        hll_rows = regs.count()
        merged = regs.groupBy("reg").agg(
            F.max("max_rho").alias("max_rho"))
        est = hll_estimate(merged).collect()[0]["est_distinct"]
        t["hll_merge_query_s"] = round(time.monotonic() - t0, 1)
        t["hll_state_rows"] = hll_rows
        t["hll_rel_err"] = round(abs(est - exact_distinct)
                                 / exact_distinct, 4)

        # ------------------------------------------------ CMS store
        t0 = time.monotonic()
        S.cms_registers(base, "user_id", ["day"]).write.mode(
            "overwrite").partitionBy("day").parquet(f"{root}/cms")
        t["cms_build_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        regs = spark.read.parquet(f"{root}/cms")
        cms_rows = regs.count()
        merged = regs.groupBy("row_id", "bucket").agg(
            F.sum("cnt").cast("long").alias("cnt"))
        # probe the 8 hottest users (exact top by construction: low ids)
        probes = spark.range(8).select(F.col("id").alias("user_id"))
        ests = {r["user_id"]: r["est_cnt"] for r in
                S.cms_estimate(merged, probes, "user_id").collect()}
        exact = {r["user_id"]: r["n"] for r in
                 base.filter(F.col("user_id") < 8)
                 .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        overs = [ests[u] - exact.get(u, 0) for u in ests]
        t["cms_merge_query_s"] = round(time.monotonic() - t0, 1)
        t["cms_state_rows"] = cms_rows
        t["cms_one_sided_ok"] = all(o >= 0 for o in overs)
        t["cms_max_overcount"] = max(overs)

        # ------------------------------------------------ KMV store
        t0 = time.monotonic()
        S.kmv_sketch(base, "user_id", ["day"]).write.mode(
            "overwrite").partitionBy("day").parquet(f"{root}/kmv")
        t["kmv_build_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        sk = spark.read.parquet(f"{root}/kmv")
        kmv_rows = sk.count()
        est_u = S.kmv_estimate(S.kmv_merge(sk)).collect()[0]["est_distinct"]
        t["kmv_merge_query_s"] = round(time.monotonic() - t0, 1)
        t["kmv_state_rows"] = kmv_rows
        t["kmv_rel_err"] = round(abs(est_u - exact_distinct)
                                 / exact_distinct, 4)

        t0 = time.monotonic()
        par = sk.withColumn("par", (F.dayofmonth("day") % 2).cast("int"))
        ska = S.kmv_merge(par.filter(F.col("par") == 0)).select("hval")
        skb = S.kmv_merge(par.filter(F.col("par") == 1)).select("hval")
        u = S.kmv_merge(ska.unionAll(skb))
        est_union = S.kmv_estimate(u).collect()[0]["est_distinct"]
        a_set = {r["hval"] for r in ska.collect()}
        b_set = {r["hval"] for r in skb.collect()}
        u_rows = u.collect()
        matches = sum(1 for r in u_rows
                      if r["hval"] in a_set and r["hval"] in b_set)
        # divide by |union sketch|, not k: matches the gated entry
        # (catalog_r7c kmv_cohort_intersection) and stays correct when
        # the union sketch is unsaturated (len < k)
        est_inter = matches * est_union // len(u_rows)
        ev = base.withColumn("par", (F.dayofmonth("day") % 2))
        exact_inter = (
            ev.filter("par = 0").select("user_id").distinct()
            .intersect(ev.filter("par = 1").select("user_id").distinct())
            .count()
        )
        t["kmv_intersection_query_s"] = round(time.monotonic() - t0, 1)
        t["kmv_inter_est"] = est_inter
        t["kmv_inter_exact"] = exact_inter
        t["kmv_inter_rel_err"] = round(
            abs(est_inter - exact_inter) / max(1, exact_inter), 4)

        # -------------------------------------- KMV set DIFFERENCE
        # (round-8 kmv_cohort_difference): weekly new-users served from
        # the same per-day store — query cost is a function of state
        # (days*k rows), not of the event history
        t0 = time.monotonic()
        from apde_etl_spark.plans.catalog_r8 import _kmv_new_users_weekly

        sk_weekly = sk.select(
            F.date_trunc("week", F.col("day").cast("date")).cast("date")
            .alias("wk"), "hval")
        ev_day = base.select("user_id", F.col("day"))
        diff_rows = _kmv_new_users_weekly(spark, sk_weekly, ev_day).collect()
        t["kmv_difference_query_s"] = round(time.monotonic() - t0, 1)
        errs = [abs(r["est_new_users"] - r["exact_new_users"])
                / max(1, r["exact_new_users"]) for r in diff_rows]
        t["kmv_diff_weeks"] = len(diff_rows)
        t["kmv_diff_max_rel_err"] = round(max(errs), 4) if errs else 0.0

        # ----------------------------------- KMV difference k-SWEEP
        # (round-9): pin the k ~ 16/(p*err^2) sizing rule with measured
        # points — per k, rebuild the per-day store at that k and
        # re-answer the weekly new-users question; the error should
        # fall ~ 1/sqrt(matches_new) as k grows. BASELINE.md table.
        for k_s in (64, 256, 1024):
            t0 = time.monotonic()
            skk_path = f"{root}/kmv_k{k_s}"
            S.kmv_sketch(base, "user_id", ["day"], k=k_s).write.mode(
                "overwrite").partitionBy("day").parquet(skk_path)
            skk = spark.read.parquet(skk_path)
            sk_wk = skk.select(
                F.date_trunc("week", F.col("day").cast("date"))
                .cast("date").alias("wk"), "hval")
            rows_k = _kmv_new_users_weekly(
                spark, sk_wk, ev_day, k=k_s).collect()
            errs_k = [abs(r["est_new_users"] - r["exact_new_users"])
                      / max(1, r["exact_new_users"]) for r in rows_k]
            t[f"kmv_diff_k{k_s}_max_rel_err"] = (
                round(max(errs_k), 4) if errs_k else 0.0)
            t[f"kmv_diff_k{k_s}_mean_rel_err"] = (
                round(sum(errs_k) / len(errs_k), 4) if errs_k else 0.0)
            t[f"kmv_diff_k{k_s}_min_matches_new"] = (
                min(r["matches_new"] for r in rows_k) if rows_k else 0)
            t[f"kmv_diff_k{k_s}_wall_s"] = round(time.monotonic() - t0, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out = {"n_events": n_events, "n_users_nominal": n_users,
           "exact_distinct": exact_distinct, **t}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
