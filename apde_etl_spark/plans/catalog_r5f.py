"""Round-5 extension catalog: classic analytic breadth — TPC-H Q5/Q10
shapes, ranking-window families, and a cube navigator.

Q5 and Q10 complete the classic multi-join survey started by
q1/q3/q12/q17/q18 (README "classic analytic shapes"): Q5 is the 6-table
snowflake join with the region filter entering through TWO paths
(customer AND supplier must share the nation), Q10 the
returned-item revenue report (selective fact filter + 4-way join +
top-k). Both use the decimal-exact aggregation idiom the other classic
entries established.

``window_rank_families`` pins the full ranking toolbox — ntile,
percent_rank, cume_dist — whose rational definitions (rank-based
divisions of integers) are bit-reproducible across engines, unlike
arbitrary float sums.

``cube_rollup_navigator`` proves aggregate-navigation correctness: a
(event_type, day)-grain cube materialized once answers a coarser
(event_type)-grain query by re-aggregation, and the oracle computes the
same answer straight from the facts — the rewrite every OLAP serving
layer at 100 TB depends on (query the cube, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.plans.catalog import _sql_round, load, load_events, register

# ===========================================================================
# TPC-H Q5 — local supplier volume (6-table snowflake)
# ===========================================================================

_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", _Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the region predicate reaches the fact scan through
    two dimension chains (customer-nation and supplier-nation must
    MATCH), so the join graph has a cycle the optimizer must break.
    Plan: nation⋈region broadcast onto supplier AND customer; the two
    facts join once on the order key; the nationkey equality rides the
    supplier join as a residual. Decimal-exact revenue."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem", rebalance=True)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    sn = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", F.col("s_nationkey").alias("sup_nationkey"), "n_name"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (F.col("sup_nationkey") == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ===========================================================================
# TPC-H Q10 — returned-item revenue report
# ===========================================================================

_Q10_ORACLE = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective flags on BOTH facts (returned lines x
    one quarter of orders), 4-way join, revenue per customer, top-20 by
    TakeOrdered (never a full sort). The nation dim broadcasts onto the
    customer side; the quarter filter prunes orders before the fact-fact
    join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem", rebalance=True).filter(
        F.col("l_returnflag") == "R"
    )
    n = load(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ===========================================================================
# Ranking-window families — ntile / percent_rank / cume_dist
# ===========================================================================

_RANK_FAMILIES_ORACLE = f"""
WITH rev AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       {_sql_round('spend', 6)} AS spend,
       CAST(ntile(10) OVER w AS INTEGER) AS decile,
       {_sql_round('percent_rank() OVER w', 6)} AS pct_rank,
       {_sql_round('cume_dist() OVER w', 6)} AS cume
FROM rev
WINDOW w AS (ORDER BY spend ASC, o_custkey ASC)
"""


@register("window_rank_families", _RANK_FAMILIES_ORACLE)
def window_rank_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking toolbox over customer spend: NTILE(10) value
    bands, percent_rank, cume_dist. All three are rational functions of
    integer ranks (ntile's remainder rule, (rank-1)/(n-1), rank/n), so
    they hash-match across engines bit-for-bit — the deterministic
    subset of window analytics, unlike float running sums. Total order
    pinned by (spend, custkey). Single-partition window by design: the
    GLOBAL ranking is the point; at 100 TB you range-partition by spend
    first (the W1 median machinery shows that decomposition)."""
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double").alias("spend")
    )
    w = Window.orderBy(F.col("spend").asc(), F.col("o_custkey").asc())
    return rev.select(
        "o_custkey",
        round_half_away(F.col("spend"), 6).alias("spend"),
        F.ntile(10).over(w).cast("int").alias("decile"),
        round_half_away(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_half_away(F.cume_dist().over(w), 6).alias("cume"),
    )


# ===========================================================================
# Cube navigator — answer a coarse query from a materialized finer cube
# ===========================================================================

_CUBE_NAV_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL
GROUP BY event_type
"""


@register("cube_rollup_navigator", _CUBE_NAV_ORACLE)
def cube_rollup_navigator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate navigation: materialize the (event_type, day) cube once
    (counts + sums — both re-aggregable measures), then answer the
    coarser per-event_type query BY RE-AGGREGATING THE CUBE, never
    touching the fact table again. The oracle computes the same answer
    straight from the facts, so the hash match proves the
    rollup-compatibility reasoning (sum of sums, sum of counts) — the
    rewrite a 100 TB serving layer lives on. NOTE the float caveat this
    entry deliberately demonstrates AVOIDING: only re-aggregable
    measures (sum/count/min/max) live in the cube; averages are derived
    at query time as sum/count."""
    ev = load_events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    cube = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # decimal-exact measure: re-aggregation is then EXACTLY equal to
        # the flat aggregate (float partial sums would differ in the
        # low bits depending on the grouping path)
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )
    # the coarse query runs on the cube only
    return cube.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_value").cast("double").alias("sum_value"),
    )
