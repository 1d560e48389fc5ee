"""Semantics tests for the temporal join operators (operators/temporal.py)
and the round-4b catalog entries built on them."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.operators.temporal import asof_join, range_join_binned


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as entry

    return entry.queries()


@pytest.fixture()
def quotes(spark):
    # build side: per-key state changes
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:05:00"), 101.0),
            (1, _ts("2024-01-01 10:10:00"), 102.0),
            (2, _ts("2024-01-01 10:03:00"), 50.0),
        ],
        "k int, qts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    # probe side: observations, incl. exact-tie and before-any-build rows
    return spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01 10:04:59")),   # between 10:00 and 10:05
            (11, 1, _ts("2024-01-01 10:05:00")),   # exact tie with a quote
            (12, 1, _ts("2024-01-01 10:30:00")),   # after all quotes
            (13, 1, _ts("2024-01-01 09:59:00")),   # before any quote
            (14, 2, _ts("2024-01-01 10:03:00")),   # exact tie, key 2
            (15, 3, _ts("2024-01-01 10:00:00")),   # key with no quotes at all
        ],
        "tid int, k int, tts timestamp",
    )


def _rows(df):
    return {r["tid"]: (r["qts"], r["px"]) for r in df.collect()}


def test_asof_backward_exact(spark, quotes, trades):
    out = asof_join(trades, quotes, on=["k"], probe_ts="tts", build_ts="qts",
                    build_cols=["px"], direction="backward", allow_exact=True)
    m = _rows(out)
    assert len(m) == 6                      # left semantics: every probe row
    assert m[10] == (_ts("2024-01-01 10:00:00"), 100.0)
    assert m[11] == (_ts("2024-01-01 10:05:00"), 101.0)   # tie IS eligible
    assert m[12] == (_ts("2024-01-01 10:10:00"), 102.0)   # latest overall
    assert m[13] == (None, None)                          # nothing before
    assert m[14] == (_ts("2024-01-01 10:03:00"), 50.0)
    assert m[15] == (None, None)                          # key never quoted


def test_asof_backward_strict_excludes_tie(spark, quotes, trades):
    out = asof_join(trades, quotes, on=["k"], probe_ts="tts", build_ts="qts",
                    build_cols=["px"], direction="backward", allow_exact=False)
    m = _rows(out)
    assert m[11] == (_ts("2024-01-01 10:00:00"), 100.0)   # tie NOT eligible
    assert m[14] == (None, None)                          # only quote is the tie
    assert m[10] == (_ts("2024-01-01 10:00:00"), 100.0)   # unchanged


def test_asof_forward_strict_and_exact(spark, quotes, trades):
    strict = _rows(asof_join(
        trades, quotes, on=["k"], probe_ts="tts", build_ts="qts",
        build_cols=["px"], direction="forward", allow_exact=False))
    assert strict[11] == (_ts("2024-01-01 10:10:00"), 102.0)  # skips the tie
    assert strict[12] == (None, None)                          # nothing after
    assert strict[13] == (_ts("2024-01-01 10:00:00"), 100.0)
    exact = _rows(asof_join(
        trades, quotes, on=["k"], probe_ts="tts", build_ts="qts",
        build_cols=["px"], direction="forward", allow_exact=True))
    assert exact[11] == (_ts("2024-01-01 10:05:00"), 101.0)   # tie eligible


def test_asof_struct_payload_is_row_consistent(spark):
    """A NULL build column in the matched row must come through as NULL,
    not backfilled from an earlier build row (the struct-payload
    guarantee)."""
    build = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0, "a"),
         (1, _ts("2024-01-01 11:00:00"), None, "b")],
        "k int, bts timestamp, x double, y string",
    )
    probe = spark.createDataFrame(
        [(7, 1, _ts("2024-01-01 12:00:00"))], "pid int, k int, pts timestamp")
    out = asof_join(probe, build, on=["k"], probe_ts="pts", build_ts="bts",
                    build_cols=["x", "y"]).collect()[0]
    assert out["y"] == "b" and out["x"] is None


def test_asof_is_single_shuffle(spark, quotes, trades):
    out = asof_join(trades, quotes, on=["k"], probe_ts="tts", build_ts="qts",
                    build_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoop" not in plan


def test_range_join_binned_inner_and_left(spark):
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00")),
         (2, _ts("2024-01-01 12:00:00"), _ts("2024-01-01 12:30:00"))],
        "iid int, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00")),    # == start: in
         (101, _ts("2024-01-01 10:29:59")),    # just inside
         (102, _ts("2024-01-01 10:30:00")),    # == end: out (exclusive)
         (103, _ts("2024-01-01 11:00:00"))],   # no interval
        "pid int, ts timestamp",
    )
    inner = range_join_binned(iv, pt, "s", "e", "ts", bin_width=600)
    got = {(r["iid"], r["pid"]) for r in inner.collect()}
    assert got == {(1, 100), (1, 101)}
    left = range_join_binned(iv, pt, "s", "e", "ts", bin_width=600, how="left")
    rows = left.collect()
    assert {(r["iid"], r["pid"]) for r in rows} == {(1, 100), (1, 101), (2, None)}
    incl = range_join_binned(iv, pt, "s", "e", "ts", bin_width=600,
                             end_inclusive=True)
    assert (1, 102) in {(r["iid"], r["pid"]) for r in incl.collect()}


def test_range_join_binned_no_duplicates_across_bins(spark):
    """An interval spanning many bins must still match each point ONCE."""
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iid int, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame(
        [(i, _ts("2024-01-01 06:00:00") + dt.timedelta(hours=i))
         for i in range(10)],
        "pid int, ts timestamp",
    )
    out = range_join_binned(iv, pt, "s", "e", "ts", bin_width=3600)
    assert out.count() == 10
    assert out.select("pid").distinct().count() == 10


def test_range_join_is_equi_join_not_nested_loop(spark):
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"))],
        "iid int, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:10:00"))], "pid int, ts timestamp")
    out = range_join_binned(iv, pt, "s", "e", "ts", bin_width=600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan


def test_semantic_dedup_drops_lower_id_neighbors(spark):
    """Two near-identical vectors, one distant one: the higher id of the
    near pair is dropped, the rest kept — and kept ids cover every
    bucket that had members."""
    from apde_etl_spark.operators.similarity import semantic_dedup

    base = [1.0] * 8
    rows = [
        (1, base),
        (2, [x + 0.001 for x in base]),      # near-dup of 1 -> dropped
        (3, [(-1.0) ** i for i in range(8)]),  # orthogonal-ish -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(df, dim=8, threshold=0.9).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_bloom_filter_injects_when_gate_lowered(spark, sf_dir, qs):
    """bloom_pruned_supplier_revenue: with the application-side scan-size
    gate lowered to 0 (it defaults to 10GB — i.e. engaged exactly at
    scale), Catalyst must inject the might_contain runtime filter on the
    fact scan under a shuffle join."""
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    gate = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    prev_gate = spark.conf.get(gate)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(gate, "0")
        df = qs["bloom_pruned_supplier_revenue"](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(gate, prev_gate)


def test_deterministic_sample_is_stable_and_stratified(spark, sf_dir, qs):
    a = qs["deterministic_stratified_sample"](spark, sf_dir)
    b = qs["deterministic_stratified_sample"](spark, sf_dir)
    ra = sorted(r["o_orderkey"] for r in a.collect())
    rb = sorted(r["o_orderkey"] for r in b.collect())
    assert ra == rb and len(ra) > 0
    # rates land near the per-mille targets (md5 is uniform)
    from apde_etl_spark.plans.catalog import load
    totals = {r["o_orderstatus"]: r["n"] for r in
              load(spark, sf_dir, "orders").groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["o_orderstatus"]: r["n"] for r in
            a.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    for status, rate in [("O", 0.10), ("F", 0.05), ("P", 0.50)]:
        if totals.get(status, 0) >= 200:
            frac = kept.get(status, 0) / totals[status]
            assert abs(frac - rate) < rate * 0.5, (status, frac, rate)


def test_range_join_binned_date_intervals(spark):
    """DATE interval bounds against TIMESTAMP points: bins stay in
    seconds through the timestamp route (DATE has no direct long cast)."""
    iv = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), dt.date(2024, 1, 3))],
        "iid int, s date, e date",
    )
    pt = spark.createDataFrame(
        [(100, _ts("2024-01-02 12:00:00")),     # inside
         (101, _ts("2024-01-03 00:00:00")),     # == end midnight: out
         (102, _ts("2024-01-05 00:00:00"))],    # after
        "pid int, ts timestamp",
    )
    out = range_join_binned(iv, pt, "s", "e", "ts", bin_width=86400)
    assert {(r["iid"], r["pid"]) for r in out.collect()} == {(1, 100)}


def test_range_join_binned_with_equi_keys(spark):
    """`on` keys compose with the bin key: a point only matches
    intervals of ITS key, even when bins overlap across keys."""
    iv = spark.createDataFrame(
        [("a", 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
         ("b", 2, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "k string, iid int, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame(
        [("a", 100, _ts("2024-01-01 10:30:00")),
         ("b", 101, _ts("2024-01-01 10:30:00")),
         ("c", 102, _ts("2024-01-01 10:30:00"))],
        "k string, pid int, ts timestamp",
    )
    out = range_join_binned(iv, pt, "s", "e", "ts", bin_width=600, on=["k"])
    assert {(r["iid"], r["pid"]) for r in out.collect()} == {(1, 100), (2, 101)}
    left = range_join_binned(iv, pt, "s", "e", "ts", bin_width=600, on=["k"],
                             how="left")
    assert {(r["iid"], r["pid"]) for r in left.collect()} == {(1, 100), (2, 101)}


def test_asof_join_string_key_and_default_build_cols(spark):
    """The round-2 calling convention: a single string key and build
    columns defaulted to everything but key + ts."""
    probe = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))], "pid int, k string, ts timestamp")
    build = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), 7.0, "x")],
        "k string, ts timestamp, v double, tag string",
    )
    out = asof_join(probe, build, on="k").collect()[0]
    assert out["v"] == 7.0 and out["tag"] == "x"
    assert out["ts_matched"] == _ts("2024-01-01 09:00:00")


def test_asof_null_timestamps_never_match(spark):
    """NULL-ts build rows are dropped (no position on the time axis);
    NULL-ts probe rows get NULL matches in BOTH directions — matching
    DuckDB ASOF, where NULL never matches."""
    build = spark.createDataFrame(
        [(1, None, 999.0), (1, _ts("2024-01-01 10:00:00"), 1.0)],
        "k int, bts timestamp, px double",
    )
    probe = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01 09:00:00")),   # before any real build
         (11, 1, _ts("2024-01-01 11:00:00")),   # after the real build
         (12, 1, None)],                         # undefined position
        "pid int, k int, pts timestamp",
    )
    for direction in ("backward", "forward"):
        m = {r["pid"]: r["px"] for r in asof_join(
            probe, build, on=["k"], probe_ts="pts", build_ts="bts",
            build_cols=["px"], direction=direction).collect()}
        assert m[12] is None, direction          # NULL probe ts -> no match
        if direction == "backward":
            assert m[10] is None and m[11] == 1.0
        else:
            assert m[10] == 1.0 and m[11] is None


def test_asof_null_keys_never_match(spark):
    """NULL join keys never match (SQL equality: NULL = NULL is not
    true, and DuckDB ASOF agrees): NULL-key build rows are dropped, and
    a NULL-key probe row gets a NULL match instead of picking up a
    NULL-key build row via Window.partitionBy's NULL grouping."""
    build = spark.createDataFrame(
        [(None, _ts("2024-01-01 08:00:00"), 999.0),
         (1, _ts("2024-01-01 08:00:00"), 1.0)],
        "k int, bts timestamp, px double",
    )
    probe = spark.createDataFrame(
        [(10, None, _ts("2024-01-01 09:00:00")),  # NULL key
         (11, 1, _ts("2024-01-01 09:00:00"))],    # real key
        "pid int, k int, pts timestamp",
    )
    for direction in ("backward", "forward"):
        d = {"backward": probe, "forward": probe}[direction]
        m = {r["pid"]: r["px"] for r in asof_join(
            d, build, on=["k"], probe_ts="pts", build_ts="bts",
            build_cols=["px"], direction=direction).collect()}
        assert len(m) == 2, direction             # NULL-key probe row kept
        assert m[10] is None, direction           # ...but never matched
        expected_11 = 1.0 if direction == "backward" else None
        assert m[11] == expected_11 or (m[11] is None and expected_11 is None)


def test_range_join_rejects_nonpositive_bin_width(spark):
    iv = spark.createDataFrame(
        [(1.0, 2.0)], "lo double, hi double")
    pt = spark.createDataFrame([(1.5,)], "v double")
    for bad in (0, -1.0, float("nan")):
        with pytest.raises(ValueError, match="bin_width"):
            range_join_binned(iv, pt, "lo", "hi", "v", bin_width=bad)


def test_asof_output_name_collision_raises(spark):
    """A build column shadowing a probe column with suffix='' must fail
    loudly, not emit ambiguous duplicate output names."""
    probe = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"), 5.0)],
        "pid int, k int, ts timestamp, value double")
    build = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 7.0)],
        "k int, bts timestamp, value double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(probe, build, on=["k"], probe_ts="ts", build_ts="bts",
                  build_cols=["value"])
    out = asof_join(probe, build, on=["k"], probe_ts="ts", build_ts="bts",
                    build_cols=["value"], suffix="_b").collect()[0]
    assert out["value"] == 5.0 and out["value_b"] == 7.0


def test_asof_salted_matches_plain_all_modes(spark):
    """asof_join_salted == asof_join in every (direction, allow_exact)
    mode over randomized colliding inputs, across slice counts — the
    carry-in replication must be invisible in the results."""
    import random as _random

    from apde_etl_spark.operators.temporal import asof_join, asof_join_salted

    rng = _random.Random(41)
    left = [(i, rng.randint(0, 3), _ts(f"2024-01-01 0{rng.randint(0, 9)}:0"
                                       f"{rng.randint(0, 9)}:00"))
            for i in range(150)]
    right = [(rng.randint(0, 3), _ts(f"2024-01-01 0{rng.randint(0, 9)}:0"
                                     f"{rng.randint(0, 9)}:00"), 1000 + j)
             for j in range(90)]
    ldf = spark.createDataFrame(left, "event_id int, k int, ts timestamp")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, rid int")

    for direction in ("backward", "forward"):
        for allow_exact in (True, False):
            plain = {r["event_id"]: r["rid"] for r in asof_join(
                ldf, rdf, on="k", build_cols=["rid"], tiebreak_cols=["rid"],
                direction=direction, allow_exact=allow_exact).collect()}
            for n_slices in (1, 3, 8, 64):
                salted = {r["event_id"]: r["rid"] for r in asof_join_salted(
                    ldf, rdf, on="k", build_cols=["rid"],
                    tiebreak_cols=["rid"], direction=direction,
                    allow_exact=allow_exact, n_slices=n_slices).collect()}
                assert salted == plain, (direction, allow_exact, n_slices)


def test_asof_salted_null_semantics_match_plain(spark):
    """NULL probe timestamps and NULL keys keep NULL matches through the
    sliced path too (NULL slice / no eligible build rows)."""
    from apde_etl_spark.operators.temporal import asof_join_salted

    build = spark.createDataFrame(
        [(None, _ts("2024-01-01 08:00:00"), 999.0),
         (1, None, 888.0),
         (1, _ts("2024-01-01 10:00:00"), 1.0),
         (1, _ts("2024-01-01 12:00:00"), 2.0)],
        "k int, bts timestamp, px double",
    )
    probe = spark.createDataFrame(
        [(10, None, _ts("2024-01-01 11:00:00")),
         (11, 1, None),
         (12, 1, _ts("2024-01-01 11:00:00")),
         (13, 1, _ts("2024-01-01 13:00:00"))],
        "pid int, k int, pts timestamp",
    )
    m = {r["pid"]: r["px"] for r in asof_join_salted(
        probe, build, on=["k"], probe_ts="pts", build_ts="bts",
        build_cols=["px"], n_slices=4).collect()}
    assert m == {10: None, 11: None, 12: 1.0, 13: 2.0}


def test_asof_salted_spreads_hot_key(spark):
    """The point of the operator: ONE key's probe rows must occupy
    multiple window partitions (distinct slices), where the plain
    formulation puts them all in one."""
    import datetime

    from apde_etl_spark.operators.temporal import asof_join_salted

    base = datetime.datetime(2024, 1, 1)
    probe = spark.createDataFrame(
        [(i, 1, base + datetime.timedelta(seconds=i)) for i in range(2000)],
        "pid int, k int, ts timestamp",
    )
    build = spark.createDataFrame(
        [(1, base + datetime.timedelta(seconds=s), s) for s in range(0, 2000, 50)],
        "k int, bts timestamp, rid int",
    )
    out = asof_join_salted(probe, build, on=["k"], probe_ts="ts",
                           build_ts="bts", build_cols=["rid"], n_slices=16)
    rows = out.collect()
    assert len(rows) == 2000
    # every probe row matched the floor-to-50s build row
    for r in rows:
        assert r["rid"] == (r["pid"] // 50) * 50, r


def test_range_join_left_null_interval_attr_not_duplicated(spark):
    """A matched interval carrying a NULL attribute must NOT reappear as
    a spurious empty row (null-safe anti join)."""
    iv = spark.createDataFrame(
        [(None, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "label string, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:30:00"))], "pid int, ts timestamp")
    rows = range_join_binned(iv, pt, "s", "e", "ts", bin_width=600,
                             how="left").collect()
    assert len(rows) == 1 and rows[0]["pid"] == 100


def test_tracked_release_keeps_registry_truthful(spark):
    from apde_etl_spark.operators.cache import (
        release_scope,
        tracked_count,
        tracked_persist,
        tracked_release,
    )

    release_scope("t_test")
    df = tracked_persist(spark.range(5), scope="t_test")
    assert tracked_count("t_test") == 1
    assert tracked_release(df) is True
    assert tracked_count("t_test") == 0
    assert release_scope("t_test") == 0
    assert tracked_release(df) is False   # idempotent, already gone


def test_priority_sample_properties(spark, sf_dir):
    """Priority sampling: exact k per stratum, deterministic repeats,
    and weight dominance — the sampled mean weight must exceed the
    population mean (heavy rows are preferentially included)."""
    from apde_etl_spark.operators.sampling import priority_sample
    from apde_etl_spark.plans.catalog import load

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    a = priority_sample(o, "o_orderkey", "o_totalprice", k=32,
                        strata=["o_orderstatus"])
    per = {r["o_orderstatus"]: r["n"] for r in
           a.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["o_orderstatus"]: r["n"] for r in
              o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in per.items():
        assert n == min(32, totals[s]), (s, n)
    b = priority_sample(o, "o_orderkey", "o_totalprice", k=32,
                        strata=["o_orderstatus"])
    assert sorted(r["o_orderkey"] for r in a.collect()) == \
           sorted(r["o_orderkey"] for r in b.collect())
    pop_mean = o.agg(F.avg("o_totalprice")).first()[0]
    samp_mean = a.agg(F.avg("o_totalprice")).first()[0]
    assert samp_mean > pop_mean


def test_priority_sample_rejects_bad_k(spark):
    from apde_etl_spark.operators.sampling import priority_sample

    df = spark.range(3).select(F.col("id"), F.lit(1.0).alias("w"))
    with pytest.raises(ValueError, match="k must be"):
        priority_sample(df, "id", "w", k=0)


def test_cms_never_underestimates(spark, sf_dir, qs):
    """Count-min property: the estimate is >= the exact count for every
    key, and with 150 keys in 64-wide rows collisions force at least
    one strict overestimate."""
    rows = qs["cms_user_frequency"](spark, sf_dir).collect()
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
    # collisions in all 3 rows need enough keys; at the 15-user sf0.001
    # fixture every key is alone in some row and est == exact is correct
    if len(rows) >= 100:
        assert any(r["cms_est"] > r["exact_n"] for r in rows)


def test_semantic_dedup_incremental_consistency(spark, sf_dir, qs):
    """Incremental invariants: a batch vector that collides with the
    corpus is dropped even when it is the lowest id in its bucket;
    novel vectors are kept; in-batch lower-id pruning still applies."""
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.similarity import semantic_dedup_incremental

    base = [1.0] * 8
    corpus = spark.createDataFrame(
        [(100, base)], "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        [(1, [x + 0.001 for x in base]),          # near corpus -> dropped
         (2, [(-1.0) ** i for i in range(8)]),    # novel -> kept
         (3, [(-1.0) ** i + 0.001 for i in range(8)])],  # near 2 -> dropped
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup_incremental(
        batch, corpus, dim=8, threshold=0.9).collect()}
    assert out == {1: False, 2: True, 3: False}


def test_semantic_dedup_incremental_agrees_with_full_on_empty_corpus(spark, sf_dir):
    """Against an EMPTY corpus the incremental decision must equal the
    full semantic_dedup of the batch alone — the two operators share one
    lower-id rule, and this pins them together (also exercises the
    empty-build-side edge of the candidate join)."""
    from apde_etl_spark.operators.cache import release_scope
    from apde_etl_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_incremental,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    empty = emb.limit(0)
    full = {r["vec_id"]: (r["bucket"], r["kept"])
            for r in semantic_dedup(emb, dim=64, threshold=0.35).collect()}
    inc = {r["vec_id"]: (r["bucket"], r["kept"])
           for r in semantic_dedup_incremental(
               emb, empty, dim=64, threshold=0.35).collect()}
    assert inc == full
    release_scope(None)


@pytest.fixture(autouse=True, scope="module")
def _release_operator_caches():
    """Module teardown: free every tracked operator cache the entries in
    this file created (similarity/temporal scopes) so later test modules
    start with clean executor storage."""
    yield
    from apde_etl_spark.operators.cache import release_scope

    release_scope(None)


def test_priority_sample_global_topk_avoids_single_partition_window(spark):
    """The strata-less path must compile to TakeOrderedAndProject (per-
    partition top-k + k-row driver merge), never an empty-partition
    window that serializes the whole input on one reducer."""
    from apde_etl_spark.operators.sampling import priority_sample

    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 100 + 1).cast("double").alias("w"))
    out = priority_sample(df, "id", "w", k=25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    rows = out.collect()
    assert len(rows) == 25
    # determinism across repeats
    again = priority_sample(df, "id", "w", k=25).collect()
    assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in again)


def test_neardup_method_recall_matrix(spark, sf_dir, qs):
    """MinHash(16x4) must reach full recall of the Jaccard>=0.2 truth at
    this data (its verify step uses the same notion); banded SimHash
    detects the tighter hamming<=3 notion, so a partial-but-nonzero
    recall with zero false hits against its own notion."""
    out = {r["method"]: r for r in
           qs["neardup_method_recall"](spark, sf_dir).collect()}
    mh = out["minhash_lsh_16x4"]
    assert mh["n_hits"] == mh["n_truth"] == mh["n_found"]
    sh = out["simhash_64b_h3"]
    assert 0 < sh["n_hits"] <= sh["n_truth"]
    # hamming<=3 is strictly tighter than Jaccard>=0.2 at these knobs:
    # SimHash must find FEWER pairs than MinHash finds, and MinHash must
    # dominate SimHash's hit count
    assert sh["n_found"] < mh["n_found"]
    assert sh["n_hits"] <= mh["n_hits"]


def test_recommend_planes_tracks_corpus_size():
    from apde_etl_spark.operators.similarity import recommend_planes

    assert recommend_planes(500) == 3            # testdata scale
    assert recommend_planes(600_000) == 14       # the stress tool's choice
    assert recommend_planes(10**8) == 21
    assert recommend_planes(10) == 1
    assert recommend_planes(10**12) == 30        # clamp
    import pytest as _pytest
    with _pytest.raises(ValueError):
        recommend_planes(0)


def test_asof_join_composite_key(spark):
    """Multiple key columns partition independently — a build row only
    matches probes sharing BOTH keys."""
    probe = spark.createDataFrame(
        [(1, "a", 1, _ts("2024-01-01 10:00:00")),
         (2, "a", 2, _ts("2024-01-01 10:00:00")),
         (3, "b", 1, _ts("2024-01-01 10:00:00"))],
        "pid int, region string, dev int, ts timestamp",
    )
    build = spark.createDataFrame(
        [("a", 1, _ts("2024-01-01 09:00:00"), 10.0),
         ("b", 1, _ts("2024-01-01 09:30:00"), 30.0)],
        "region string, dev int, bts timestamp, v double",
    )
    out = {r["pid"]: r["v"] for r in asof_join(
        probe, build, on=["region", "dev"], probe_ts="ts", build_ts="bts",
        build_cols=["v"]).collect()}
    assert out == {1: 10.0, 2: None, 3: 30.0}
