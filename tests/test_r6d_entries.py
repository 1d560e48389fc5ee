"""Unit tests for the round-6d families: exact-moment correlation,
decayed engagement, session paths, GDPR cascade, CDC apply."""

from __future__ import annotations

from pyspark.sql import functions as F

from apde_etl_spark.plans import catalog_r6d as C


def test_corr_diagonal_is_one_and_bounded(spark, sf_dir):
    out = {(r.col_a, r.col_b): r.corr
           for r in C.corr_matrix_lineitem(spark, sf_dir).collect()}
    assert len(out) == 10  # 4 choose 2 + 4 diagonal
    for c in C._CORR_COLS:
        assert abs(out[(c, c)] - 1.0) < 1e-9
    for v in out.values():
        assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9


def test_corr_matches_spark_builtin(spark, sf_dir):
    # the exact-decimal formulation must agree with F.corr to float
    # tolerance (F.corr itself is partial-order-dependent in the low
    # bits, which is exactly why the entry doesn't use it)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    builtin = li.agg(
        F.corr("l_quantity", "l_extendedprice")).first()[0]
    ours = {(r.col_a, r.col_b): r.corr
            for r in C.corr_matrix_lineitem(spark, sf_dir).collect()}
    assert abs(ours[("l_quantity", "l_extendedprice")] - builtin) < 1e-4


def test_decayed_score_weights_and_decay(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 1, 31, 12, 0, 0)
    rows = [
        # user 1: purchase on the max date -> weight 5, decay 1
        (1, 1, base, "purchase", 0.0, None),
        # user 2: view 30 days earlier -> weight 1, decay e^-1
        (2, 2, base - dt.timedelta(days=30), "view", 0.0, None),
        # user 2: error (weight 0) contributes count but no score
        (3, 2, base, "error", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp,"
              " event_type string, value double, props string")
    d = str(tmp_path / "sf")
    ev.write.parquet(f"{d}/events.parquet")
    out = {r.user_id: r for r in
           C.decayed_engagement_score(spark, d).collect()}
    import math
    assert out[1].n_events == 1
    assert abs(out[1].engagement - 5.0) < 1e-6
    assert out[2].n_events == 2
    assert abs(out[2].engagement - round(1.0 * math.exp(-1.0), 6)) < 1e-6


def test_gdpr_cascade_audit_invariants(spark, sf_dir):
    out = {r.table_name: r for r in
           C.gdpr_cascade_delete(spark, sf_dir).collect()}
    assert set(out) == {"customer", "orders", "lineitem"}
    for r in out.values():
        assert r.rows_after == r.rows_before - r.rows_removed
        assert r.rows_removed >= 0
    # orders removed must belong to removed customers: re-derive
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = orders.filter(
        F.col("o_custkey") % C._GDPR_MOD == C._GDPR_REM).count()
    assert out["orders"].rows_removed == expected


def test_cdc_tombstone_removes_key(spark, tmp_path):
    import datetime as dt
    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, t, "signup", 1.0, None),
        (2, 10, t + dt.timedelta(hours=1), "click", 2.5, None),
        (3, 11, t, "signup", 1.0, None),
        (4, 11, t + dt.timedelta(hours=1), "error", 0.0, None),  # tombstone
        (5, 12, t, "error", 0.0, None),
        (6, 12, t + dt.timedelta(hours=1), "view", 7.0, None),  # revived
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp,"
              " event_type string, value double, props string")
    d = str(tmp_path / "sf")
    ev.write.parquet(f"{d}/events.parquet")
    out = {r.user_id: r for r in
           C.cdc_apply_tombstones(spark, d).collect()}
    assert 11 not in out              # last op is a delete -> gone
    assert out[10].last_op == "U" and abs(out[10].last_value - 2.5) < 1e-9
    assert out[12].last_op == "U" and out[12].n_ops == 2


def test_session_path_ranks_are_dense_and_ordered(spark, sf_dir):
    rows = C.session_path_topk(spark, sf_dir).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_benford_terms_partition_probability(spark, sf_dir):
    rows = C.benford_totalprice_digits(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    # expectations are the Benford distribution (sums to 1 over 1..9)
    import math
    for r in rows:
        assert abs(r.exp_p - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
    # observed proportions sum to 1 over the emitted digits
    assert abs(sum(r.obs_p for r in rows) - 1.0) < 1e-4


def test_benford_leading_digit_is_exact_for_powers_of_ten(spark, tmp_path):
    # 1000.00 must bin to digit 1 (the float-log10 edge case), 999.99
    # to 9, 0.01 to 1
    rows = [(1, 1, "O", 1000.00, None, "p"), (2, 1, "O", 999.99, None, "p"),
            (3, 1, "O", 0.01, None, "p")]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string,"
              " o_totalprice double, o_orderdate timestamp,"
              " o_orderpriority string")
    d = str(tmp_path / "sf")
    orders.write.parquet(f"{d}/orders.parquet")
    got = {r.digit: r.n for r in
           C.benford_totalprice_digits(spark, d).collect()}
    assert got == {1: 2, 9: 1}
