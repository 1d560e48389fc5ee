"""Round-5 extension catalog: multi-touch marketing attribution.

The reference's QA pipeline stops at per-table profiles; attribution is
the canonical EVENT-analytics workload one step up — assigning each
conversion's revenue to the touchpoints that preceded it. One
oracle-gated entry covers the three standard models side by side
(first-touch, last-touch, linear) plus the 'direct' bucket for
unassisted conversions, so the numbers reconcile: every model's total
equals total purchase revenue.

Determinism: touch order is pinned by (ts, event_id) in both engines;
per-row credits are rounded half-away to 6 and summed as DECIMAL(38,6)
(exact, order-independent) before a final cast to DOUBLE — a raw double
sum's low bits would depend on partial-aggregation order, which the
repo's decimal-exact aggregation convention exists to eliminate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.plans.catalog import _sql_round, load_events, register

_ATTR_WINDOW_DAYS = 7
_TOUCH_TYPES = ("click", "view")

_ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
  FROM events WHERE ts IS NOT NULL
), conv AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts, value AS revenue
  FROM ev WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS channel
  FROM ev WHERE event_type IN ('click', 'view')
), j AS MATERIALIZED (
  -- equality-only ON + residual WHERE: stated with the ranges in the
  -- ON clause, DuckDB's planner can pick an inequality join over the
  -- full conv x touch at large n (observed at the sf1 gate: 45+ GB of
  -- temp spill); the pure equi-join hashes on user_id and filters
  SELECT p_id, revenue, channel,
         count(*) OVER (PARTITION BY p_id) AS n,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY t_ts ASC, t_id ASC) AS rn_first,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY t_ts DESC, t_id DESC) AS rn_last
  FROM (
    SELECT c.p_id, c.revenue, t.channel, t.t_ts, t.t_id
    FROM conv c JOIN touch t ON t.user_id = c.user_id
    WHERE t.t_ts < c.p_ts
      AND t.t_ts >= c.p_ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY) w
), credited AS (
  SELECT channel,
         CAST({_sql_round('revenue / n', 6)} AS DECIMAL(38,6)) AS linear_rev,
         CAST(CASE WHEN rn_first = 1 THEN {_sql_round('revenue', 6)}
              ELSE 0.0 END AS DECIMAL(38,6)) AS first_rev,
         CAST(CASE WHEN rn_last = 1 THEN {_sql_round('revenue', 6)}
              ELSE 0.0 END AS DECIMAL(38,6)) AS last_rev
  FROM j
  UNION ALL
  -- direct = conversions with no row in j (anti join against the
  -- materialized assisted set — reuses the one equi-join instead of a
  -- second correlated range probe)
  SELECT 'direct' AS channel,
         CAST({_sql_round('revenue', 6)} AS DECIMAL(38,6)),
         CAST({_sql_round('revenue', 6)} AS DECIMAL(38,6)),
         CAST({_sql_round('revenue', 6)} AS DECIMAL(38,6))
  FROM conv c
  LEFT JOIN (SELECT DISTINCT p_id FROM j) a ON a.p_id = c.p_id
  WHERE a.p_id IS NULL
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(sum(linear_rev) AS DOUBLE) AS linear_rev,
       CAST(sum(first_rev) AS DOUBLE) AS first_touch_rev,
       CAST(sum(last_rev) AS DOUBLE) AS last_touch_rev
FROM credited GROUP BY channel
"""


@register("attribution_multitouch", _ATTRIBUTION_SQL)
def attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last/linear multi-touch attribution of purchase revenue to
    the click/view touches in the preceding {window}-day window, with a
    'direct' bucket for unassisted purchases (left-anti join).

    Plan shape at scale: ONE equi-join on user_id (the time predicates
    ride the join as a residual filter — per-user touch x purchase
    products are bounded by per-user activity, same skew posture as
    asof_join with asof_join_salted as the escape hatch), then two
    window passes over the conversion key and one groupBy(channel).
    The three models reconcile by construction: each model's grand
    total equals total purchase revenue (pinned in
    tests/test_attribution.py)."""
    ev = load_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_ts"), F.col("value").alias("revenue"),
    )
    touch = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("event_id").alias("t_id"), "user_id",
        F.col("ts").alias("t_ts"), F.col("event_type").alias("channel"),
    )
    in_window = (
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts")
           - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS"))
    )
    from apde_etl_spark.operators.cache import tracked_persist

    j = conv.join(touch, ["user_id"]).filter(in_window)
    w = Window.partitionBy("p_id")
    j = (
        j.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn(
            "rn_first",
            F.row_number().over(
                w.orderBy(F.col("t_ts").asc(), F.col("t_id").asc())),
        )
        .withColumn(
            "rn_last",
            F.row_number().over(
                w.orderBy(F.col("t_ts").desc(), F.col("t_id").desc())),
        )
    )
    # j feeds both the credit projection and the touched-id anti-join —
    # persist so events is scanned three times total (conv x2, touch x1)
    # instead of five
    j = tracked_persist(j, scope="default")
    # Per-row credits are rounded half-away to 6 THEN summed as
    # DECIMAL(38,6): a raw double sum's low bits depend on Spark's
    # partial-aggregation order vs DuckDB's sequential fold, and a
    # final round-to-6 can straddle a boundary — decimal addition is
    # exact and order-independent, so the gate hash cannot flake.
    dec = "decimal(38,6)"
    credited = j.select(
        "channel",
        round_half_away(F.col("revenue") / F.col("n"), 6)
        .cast(dec).alias("linear_rev"),
        F.when(F.col("rn_first") == 1, round_half_away(F.col("revenue"), 6))
        .otherwise(F.lit(0.0)).cast(dec).alias("first_rev"),
        F.when(F.col("rn_last") == 1, round_half_away(F.col("revenue"), 6))
        .otherwise(F.lit(0.0)).cast(dec).alias("last_rev"),
    )
    # purchases with zero in-window touches -> 'direct' (anti join on the
    # credited conversion ids, not a correlated subquery — same result)
    touched_ids = j.select("p_id").distinct()
    rev6 = round_half_away(F.col("revenue"), 6).cast(dec)
    direct = conv.join(touched_ids, "p_id", "left_anti").select(
        F.lit("direct").alias("channel"),
        rev6.alias("linear_rev"),
        rev6.alias("first_rev"),
        rev6.alias("last_rev"),
    )
    out = credited.unionByName(direct)
    return out.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.sum("linear_rev").cast("double").alias("linear_rev"),
        F.sum("first_rev").cast("double").alias("first_touch_rev"),
        F.sum("last_rev").cast("double").alias("last_touch_rev"),
    )
