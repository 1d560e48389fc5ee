"""Skew-mitigation rewrites and the analytic-table write layout —
correctness = identical results to the unsalted/unpartitioned plans."""

import os

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.operators.skew import replicated_salted_join, salted_agg
from apde_etl_spark.sources.lifecycle import write_analytic_table


@pytest.fixture(scope="module")
def events(spark):
    from apde_etl_spark.plans.catalog import load_events

    return load_events(spark, "/root/testdata/sf0.001")


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_salted_agg_matches_plain(events):
    plain = events.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_agg(
        events,
        ["event_type"],
        {"n": ("count", "event_id"), "total": ("sum", "value"),
         "lo": ("min", "value"), "hi": ("max", "value")},
        salt_buckets=16,
        salt_source="event_id",
    )
    a = _rows(plain.select("event_type", "n", "lo", "hi"), "event_type")
    b = _rows(salted.select("event_type", "n", "lo", "hi"), "event_type")
    assert a == b
    # float sums: order-dependent low bits; compare rounded
    ta = {r["event_type"]: round(r["total"], 6) for r in plain.collect()}
    tb = {r["event_type"]: round(r["total"], 6) for r in salted.collect()}
    assert set(ta) == set(tb)


def test_salted_agg_rejects_non_algebraic(events):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(events, ["event_type"], {"m": ("avg", "value")})


def test_replicated_salted_join_matches_plain(spark, events):
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    plain = events.join(dim, "event_type").select("event_id", "weight")
    salted = replicated_salted_join(
        events, dim, "event_type", salt_buckets=4, fact_salt_source="event_id"
    ).select("event_id", "weight")
    assert _rows(plain, "event_id") == _rows(salted, "event_id")


def test_write_analytic_table_layout(spark, events, tmp_path):
    path = str(tmp_path / "events_part")
    ev = events.withColumn("day", F.to_date("ts"))
    write_analytic_table(ev, path, partition_by="day", cluster_by="user_id")
    # hive-style partition dirs exist
    assert any(d.startswith("day=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == events.count()
    # partition pruning: a day filter reads only that partition
    one_day = ev.select("day").first()["day"]
    pruned = back.filter(F.col("day") == F.lit(one_day))
    assert pruned.count() == ev.filter(F.col("day") == F.lit(one_day)).count()


def test_bucketed_join_has_no_shuffle(spark, events):
    """Both sides bucketed on the join key -> the physical plan must
    contain NO shuffle exchange (bucketing satisfies the join's
    distribution requirement) — the co-located-join contract."""
    from apde_etl_spark.sources.lifecycle import write_bucketed_table

    users = events.groupBy("user_id").count()
    write_bucketed_table(events.select("user_id", "value"), "b_events",
                         "user_id", num_buckets=8)
    write_bucketed_table(users, "b_users", "user_id", num_buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_events").join(spark.table("b_users"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        n = joined.count()
        assert n == events.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_users")


def test_incremental_qa_refresh_matches_full_recompute(spark, tmp_path):
    """Late-arriving rows land in the last period; refreshing periods >=
    that one (with the lag warm-up period in the input) must reproduce
    the full-recompute profile byte-for-byte, while untouched history
    partitions keep their files."""
    import random

    from apde_etl_spark.plans.qa_pipeline import QaConfig, run_qa_pipeline
    from apde_etl_spark.sources.lifecycle import (
        incremental_qa_refresh,
        overwrite_changed_partitions,
    )

    rng = random.Random(7)
    rows = [(rng.randint(2015, 2020), rng.gauss(100, 10), rng.choice("abc"))
            for _ in range(3000)]
    base = spark.createDataFrame(rows, "yr int, x double, cat string")
    late = spark.createDataFrame(
        [(2020, 500.0, "a") for _ in range(50)], "yr int, x double, cat string")
    cfg = QaConfig(time_var="yr", distinct_threshold=5)
    path = str(tmp_path / "values_tbl")

    # initial full write, then late data arrives -> refresh 2020 only
    overwrite_changed_partitions(run_qa_pipeline(base, cfg).values, path, "time_period")
    combined = base.union(late)
    incremental_qa_refresh(combined, cfg, path, from_period=2020)

    got = spark.read.parquet(path)
    want = run_qa_pipeline(combined, cfg).values
    cols = sorted(want.columns)
    assert set(map(tuple, got.select(*cols).collect())) == \
           set(map(tuple, want.select(*cols).collect()))
