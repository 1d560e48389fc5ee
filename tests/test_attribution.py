"""Multi-touch attribution semantics (plans/catalog_r5e.py).

The gate proves engine parity on testdata; these pin the model
semantics on constructed frames: window boundaries, tie-breaks, the
direct bucket, and the reconciliation identity (every model's grand
total == total purchase revenue).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.plans.catalog_r5e import attribution_multitouch


@pytest.fixture(scope="module")
def attr_fixture(tmp_path_factory, spark):
    """events.parquet with surgically placed touches around one purchase
    per scenario user."""
    base = dt.datetime(2024, 3, 10, 12, 0, 0)

    def ev(eid, ts, uid, etype, value):
        return (eid, ts, uid, etype, value, None)

    rows = [
        # user 1: touches inside the window, tie on ts broken by event_id
        ev(1, base - dt.timedelta(days=1), 1, "click", 0.0),
        ev(2, base - dt.timedelta(hours=2), 1, "view", 0.0),
        ev(3, base - dt.timedelta(hours=2), 1, "click", 0.0),  # ts tie w/ 2
        ev(4, base, 1, "purchase", 90.0),
        # user 2: one touch exactly AT the purchase ts -> excluded (strict <),
        # one exactly at the window start -> included (>=)
        ev(5, base, 2, "click", 0.0),
        ev(6, base - dt.timedelta(days=7), 2, "view", 0.0),
        ev(7, base, 2, "purchase", 50.0),
        # user 3: touch outside the window -> direct
        ev(8, base - dt.timedelta(days=8), 3, "click", 0.0),
        ev(9, base, 3, "purchase", 30.0),
        # user 4: touch AFTER the purchase -> direct
        ev(10, base + dt.timedelta(hours=1), 4, "view", 0.0),
        ev(11, base, 4, "purchase", 10.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tmp_path_factory.mktemp("attr")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_attribution_semantics(spark, attr_fixture):
    out = {
        r["channel"]: r.asDict()
        for r in attribution_multitouch(spark, attr_fixture).collect()
    }
    # user 1: 3 touches (click d-1, view h-2, click h-2).
    #   first = click(d-1); last = ts tie between 2 and 3 -> event_id DESC
    #   picks 3 (click); linear = 30 each -> click 60, view 30.
    # user 2: only the window-start view counts -> view gets all 50.
    # users 3+4: direct 40.
    assert out["click"]["first_touch_rev"] == 90.0
    assert out["click"]["last_touch_rev"] == 90.0
    assert out["view"]["first_touch_rev"] == 50.0
    assert out["view"]["last_touch_rev"] == 50.0
    assert out["click"]["linear_rev"] == 60.0
    assert out["view"]["linear_rev"] == 30.0 + 50.0
    assert out["direct"]["n_credits"] == 2
    assert out["direct"]["linear_rev"] == 40.0


def test_attribution_models_reconcile(spark, attr_fixture):
    """Every model's grand total equals total purchase revenue."""
    out = attribution_multitouch(spark, attr_fixture)
    tot = out.agg(
        F.sum("linear_rev").alias("lin"),
        F.sum("first_touch_rev").alias("fst"),
        F.sum("last_touch_rev").alias("lst"),
    ).collect()[0]
    assert tot["lin"] == pytest.approx(180.0, abs=1e-6)
    assert tot["fst"] == 180.0
    assert tot["lst"] == 180.0


def test_attribution_reconciles_on_testdata(spark, sf_dir):
    out = attribution_multitouch(spark, sf_dir)
    tot = out.agg(F.sum("linear_rev").alias("lin"),
                  F.sum("first_touch_rev").alias("fst"),
                  F.sum("last_touch_rev").alias("lst")).collect()[0]
    from apde_etl_spark.plans.catalog import load_events
    rev = (
        load_events(spark, sf_dir)
        .filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull())
        .agg(F.sum("value")).collect()[0][0]
    )
    for model in ("lin", "fst", "lst"):
        assert tot[model] == pytest.approx(rev, rel=1e-9)
