"""Query catalog: every SURVEY.md §2 operator as a (Spark DataFrame
program, DuckDB oracle SQL) pair — the driver's correctness contract
(``__spark_entry__.py`` re-exports :data:`QUERIES` / :data:`ORACLES`).

Cross-engine hash discipline (the driver compares row count + schema +
order-insensitive value hash):

- every computed column is aliased identically on both sides;
- integer aggregates are cast to BIGINT on both sides (DuckDB ``sum(int)``
  is HUGEINT, Spark is long);
- money sums go through ``DECIMAL`` so partial-aggregation order cannot
  perturb low bits, then back to DOUBLE;
- float outputs that involve multi-row summation are rounded with the SAME
  half-away-from-zero formula on both sides (not each engine's ``round``);
- ``year()`` is cast to INTEGER on both sides (DuckDB returns BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.operators import profile as P
from apde_etl_spark.operators.finalize import complete_grid

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Read nanos as long (legacy conf) and truncate to
    microseconds — exactly what DuckDB does when it reads the same file,
    so both engines see identical timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        # integer `div`, not `/`: double division loses precision on
        # 1.7e18-scale nano values (53-bit mantissa)
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


def _sql_round(expr: str, digits: int) -> str:
    """DuckDB-side half-away rounding, same formula as
    :func:`round_half_away` so doubles match bit-for-bit."""
    f = float(10**digits)
    return f"sign({expr}) * floor(abs({expr}) * {f} + 0.5) / {f}"


# ===========================================================================
# Flagship / pricing summary (P1 P2 P3 F1 F5 A2 O1 — TPC-H Q1 shape)
# ===========================================================================

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + range predicate + hash aggregate; sums via DECIMAL so
    the result is independent of partial-agg order (exact at any scale)."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ===========================================================================
# A1 — missingness profile (orders by order year)
# ===========================================================================

_ORDERS_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]

_A1_ORACLE = " UNION ALL ".join(
    f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS time_period,
           '{c}' AS varname,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nrow,
           SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) / COUNT(*) AS proportion
    FROM orders GROUP BY 1
    """
    for c in _ORDERS_PROFILE_COLS
)


@register("a1_missingness_orders", _A1_ORACLE)
def a1_missingness_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A1/R1: one groupBy(time) pass with per-column conditional
    sums, melt applied to the aggregated (tiny) relation only."""
    orders = load(spark, sf_dir, "orders")
    return P.missingness_profile(
        orders, F.year("o_orderdate").cast("int"), _ORDERS_PROFILE_COLS
    )


# ===========================================================================
# A2/A3 — continuous stats with exact median (lineitem by ship year)
# ===========================================================================

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_A2_ORACLE = " UNION ALL ".join(
    f"""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS time_period,
           '{c}' AS varname,
           {_sql_round(f"AVG(CAST({c} AS DOUBLE))", 6)} AS mean,
           {_sql_round(f"median(CAST({c} AS DOUBLE))", 6)} AS median,
           MIN(CAST({c} AS DOUBLE)) AS min,
           MAX(CAST({c} AS DOUBLE)) AS max
    FROM lineitem GROUP BY 1
    """
    for c in _NUM_COLS
)


@register("a2_numeric_stats_lineitem", _A2_ORACLE)
def a2_numeric_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A2/A3: mean + exact interpolating median (R semantics per
    SURVEY §2.10.1) + min/max, one pass, aggregate-then-stack."""
    li = load(spark, sf_dir, "lineitem")
    stats = P.numeric_stats(li, F.year("l_shipdate").cast("int"), _NUM_COLS)
    return stats.select(
        "time_period", "varname",
        round_half_away(F.col("mean"), 6).alias("mean"),
        round_half_away(F.col("median"), 6).alias("median"),
        "min", "max",
    )


# ===========================================================================
# A4 — date stats with floor-midpoint median (orders by year)
# ===========================================================================

_A4_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS time_period,
       'o_orderdate' AS varname,
       MIN(CAST(o_orderdate AS DATE)) AS min_date,
       MAX(CAST(o_orderdate AS DATE)) AS max_date,
       DATE '1970-01-01' + CAST(CAST(floor(median(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS DOUBLE))) AS INTEGER) AS INTEGER) AS median_date
FROM orders GROUP BY 1
"""


@register("a4_date_stats_orders", _A4_ORACLE)
def a4_date_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A4: min/max/median date; median = floor of the interpolated
    epoch-day percentile == the reference's two-middle-rows midpoint rule
    (R/etl_qa_run_pipeline.R:1405-1410)."""
    orders = load(spark, sf_dir, "orders")
    return P.date_stats(orders, F.year("o_orderdate").cast("int"), ["o_orderdate"])


# ===========================================================================
# A5/A7 — categorical frequency + within-group proportion (events by day)
# ===========================================================================

_A5_ORACLE = """
SELECT CAST(ts AS DATE) AS time_period,
       'event_type' AS varname,
       event_type AS value,
       CAST(COUNT(*) AS BIGINT) AS count,
       COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY CAST(ts AS DATE)) AS proportion
FROM events GROUP BY 1, 3
"""


@register("a5_categorical_freq_events", _A5_ORACLE)
def a5_categorical_freq_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A5/A7: melt -> count -> windowed proportion. Map-side partial
    agg bounds the shuffle by distinct (day, varname, value)."""
    ev = load_events(spark, sf_dir)
    return P.categorical_freq(ev, F.col("ts").cast("date"), ["event_type"])


# ===========================================================================
# W2/A8/O2 — top-8 dense-rank + 'Other values' rollup (brands by ship year)
# ===========================================================================

_O2_ORACLE = """
WITH freq AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS time_period,
         'p_brand' AS varname, p_brand AS value,
         CAST(COUNT(*) AS BIGINT) AS count
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 3
), ranked AS (
  SELECT *, CASE WHEN value IS NULL THEN 0
                 ELSE dense_rank() OVER (PARTITION BY time_period, varname ORDER BY count DESC)
            END AS rank
  FROM freq
), rolled AS (
  SELECT time_period, varname,
         CASE WHEN rank <= 8 THEN value ELSE 'Other values' END AS value,
         CAST(SUM(count) AS BIGINT) AS count
  FROM ranked GROUP BY 1, 2, 3
)
SELECT time_period, varname, value, count,
       count / SUM(count) OVER (PARTITION BY time_period, varname) AS proportion
FROM rolled
"""


@register("o2_top8_other_brands", _O2_ORACLE)
def o2_top8_other_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY W2/A8/O2 over a join (J2): part is broadcast (small dim), the
    frequency shuffle and the rank window share the (time, varname) key."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    freq = (
        joined.groupBy(
            F.year("l_shipdate").cast("int").alias("time_period"),
            F.lit("p_brand").alias("varname"),
            F.col("p_brand").alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return P.top_k_with_other(freq, k=8)


# ===========================================================================
# A6 — distinct-count gate
# ===========================================================================

_GATE_COLS = ["l_quantity", "l_discount", "l_tax", "l_linenumber", "l_extendedprice"]
_A6_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS varname, CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
        CASE WHEN COUNT(DISTINCT {c}) < 60 THEN 'categorical' ELSE 'continuous' END AS treat_as
        FROM lineitem"""
    for c in _GATE_COLS
)


@register("a6_distinct_gate_lineitem", _A6_ORACLE)
def a6_distinct_gate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A6: exact distinct gate (melt + two-phase agg — no Expand,
    map-side combine bounds shuffle by per-partition distincts)."""
    li = load(spark, sf_dir, "lineitem")
    counts = P.distinct_counts(li, _GATE_COLS)
    return counts.select(
        "varname",
        "n_distinct",
        F.when(F.col("n_distinct") < 60, "categorical").otherwise("continuous").alias("treat_as"),
    )


# ===========================================================================
# W3 — lag change flags (yearly mean drift on lineitem)
# ===========================================================================

_W3_ORACLE = f"""
WITH yearly AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS time_period,
         'l_extendedprice' AS varname,
         AVG(CAST(l_extendedprice AS DOUBLE)) AS mean
  FROM lineitem GROUP BY 1
), lagged AS (
  SELECT time_period, varname, mean,
         lag(mean) OVER (PARTITION BY varname ORDER BY time_period) AS prev
  FROM yearly
)
SELECT time_period, varname, {_sql_round('mean', 4)} AS mean,
       CASE WHEN abs((mean / prev - 1) * 100) > 0.0
            THEN CAST({_sql_round('abs((mean / prev - 1) * 100)', 1)} AS VARCHAR) || '%'
            ELSE NULL END AS rel_mean_change
FROM lagged
"""


@register("w3_change_flags_mean", _W3_ORACLE)
def w3_change_flags_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY W3/F4/F5: lag-1 window + percent-string flag (strings or
    NULL, never booleans — SURVEY §2.10.5)."""
    from apde_etl_spark.functions.core import change_flag_rel

    li = load(spark, sf_dir, "lineitem")
    yearly = li.groupBy(F.year("l_shipdate").cast("int").alias("time_period")).agg(
        F.avg(F.col("l_extendedprice").cast("double")).alias("mean")
    ).select("time_period", F.lit("l_extendedprice").alias("varname"), "mean")
    w = Window.partitionBy("varname").orderBy("time_period")
    return yearly.select(
        "time_period", "varname",
        round_half_away(F.col("mean"), 4).alias("mean"),
        change_flag_rel(F.col("mean"), F.lag("mean").over(w), 0.0).alias("rel_mean_change"),
    )


# ===========================================================================
# J6 — anti join (customers without orders)
# ===========================================================================

_J6_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) >= 2001
)
"""


@register("j6_customers_without_orders", _J6_ORACLE)
def j6_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY J6: left-anti join — the reference's two-sided sync primitive
    (deduplicate_addresses.R:121-122). Restricted to recent orders so the
    anti side is non-trivially selective."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") >= 2001)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ===========================================================================
# J1/J2 — star join: revenue by region and year (bench headline)
# ===========================================================================

_J2_ORACLE = """
SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


@register("j2_revenue_by_region", _J2_ORACLE)
def j2_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY J1/J2: multi-way star join. Dimension sides (customer,
    nation, region) are broadcast so the only shuffle is the fact-fact
    lineitem-orders join + final agg; DECIMAL sum keeps the result exact
    under any partial-agg order."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ===========================================================================
# W4 — keep newest per key (latest event per user)
# ===========================================================================

_W4_ORACLE = """
SELECT user_id, event_id, event_type, value, ts FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@register("w4_latest_event_per_user", _W4_ORACLE)
def w4_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY W4: first-row-per-group, keep-newest (deduplicate_addresses.R:90-94)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
    )


# ===========================================================================
# A10 — duplicate-count histogram (events per user)
# ===========================================================================

_A10_ORACLE = """
SELECT row_cnt, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS row_cnt FROM events GROUP BY user_id
) GROUP BY row_cnt
"""


@register("a10_dup_count_histogram", _A10_ORACLE)
def a10_dup_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A10: per-key count -> histogram of counts
    (deduplicate_addresses.R:80-84)."""
    ev = load_events(spark, sf_dir)
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("row_cnt"))
    return per_key.groupBy("row_cnt").agg(F.count(F.lit(1)).alias("n_keys"))


# ===========================================================================
# U1 — schema-evolving union (orders split with differing columns)
# ===========================================================================

_U1_ORACLE = """
WITH unioned AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         NULL AS o_orderpriority
  FROM orders WHERE year(o_orderdate) < 1998
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, NULL AS o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders WHERE year(o_orderdate) >= 1998
)
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_priority,
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_totalprice
FROM unioned GROUP BY 1
"""


@register("u1_union_evolving_orders", _U1_ORACLE)
def u1_union_evolving_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY U1: per-era tables with different column sets stacked via
    unionByName(allowMissingColumns=True) — the reference's generated
    NULL-padded UNION ALL (load_table_from_file.R:596-665)."""
    o = load(spark, sf_dir, "orders")
    era1 = o.filter(F.year("o_orderdate") < 1998).drop("o_orderpriority")
    era2 = o.filter(F.year("o_orderdate") >= 1998).drop("o_totalprice")
    unioned = era1.unionByName(era2, allowMissingColumns=True)
    return unioned.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias("n_null_priority"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("n_null_totalprice"),
    )


# ===========================================================================
# U2 — date-split UNION with dedup (archive ∪ new)
# ===========================================================================

_U2_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM (
  SELECT * FROM orders WHERE year(o_orderdate) <= 1998
  UNION
  SELECT * FROM orders WHERE year(o_orderdate) >= 1998
)
GROUP BY 1
"""


@register("u2_dateswitch_union_dedup", _U2_ORACLE)
def u2_dateswitch_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY U2: archive/new reload split on a date cutpoint with
    deduplicating UNION (load_table_from_sql.R:383-393); the overlapping
    1998 slice must not double-count."""
    o = load(spark, sf_dir, "orders")
    archive = o.filter(F.year("o_orderdate") <= 1998)
    new = o.filter(F.year("o_orderdate") >= 1998)
    merged = archive.union(new).distinct()
    return merged.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


# ===========================================================================
# O1/O3 — multi-key sort + limit (top 100 orders)
# ===========================================================================

_O3_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


@register("o3_top100_orders", _O3_ORACLE)
def o3_top100_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY O1/O3: global top-k — Spark's TakeOrderedAndProject (no full
    sort materialization), deterministic via unique-key tiebreak."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).select(
        "o_orderkey", "o_totalprice"
    ).limit(100)


# ===========================================================================
# J8 — CHI-standards style domain-conformance indicator join
# ===========================================================================

_J8_ORACLE = """
WITH observed AS (
  SELECT DISTINCT 'o_orderstatus' AS varname, o_orderstatus AS value FROM orders
), standard AS (
  SELECT * FROM (VALUES ('o_orderstatus','O'), ('o_orderstatus','F'),
                        ('o_orderstatus','P'), ('o_orderstatus','X')) s(varname, value)
)
SELECT COALESCE(o.varname, s.varname) AS varname,
       COALESCE(o.value, s.value) AS value,
       CAST(CASE WHEN o.value IS NULL THEN 0 ELSE 1 END AS INTEGER) AS your_data,
       CAST(CASE WHEN s.value IS NULL THEN 0 ELSE 1 END AS INTEGER) AS chi,
       CASE WHEN o.value IS NULL OR s.value IS NULL THEN '*' ELSE NULL END AS problem
FROM observed o FULL OUTER JOIN standard s ON o.varname = s.varname AND o.value = s.value
"""


@register("j8_domain_conformance", _J8_ORACLE)
def j8_domain_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY J8: indicator full-outer join of observed domain vs standard
    domain with 0/1 flags and '*' problem marker
    (R/etl_qa_run_pipeline.R:766-801,951-982)."""
    o = load(spark, sf_dir, "orders")
    observed = o.select(
        F.lit("o_orderstatus").alias("varname"), F.col("o_orderstatus").alias("value")
    ).distinct()
    standard = spark.createDataFrame(
        [("o_orderstatus", v) for v in ["O", "F", "P", "X"]], ["varname", "value"]
    )
    ob = observed.alias("ob")
    st = standard.alias("st")
    j = ob.join(
        st,
        (F.col("ob.varname") == F.col("st.varname")) & (F.col("ob.value") == F.col("st.value")),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("ob.varname"), F.col("st.varname")).alias("varname"),
        F.coalesce(F.col("ob.value"), F.col("st.value")).alias("value"),
        F.when(F.col("ob.value").isNull(), 0).otherwise(1).alias("your_data"),
        F.when(F.col("st.value").isNull(), 0).otherwise(1).alias("chi"),
        F.when(
            F.col("ob.value").isNull() | F.col("st.value").isNull(), F.lit("*")
        ).otherwise(F.lit(None).cast("string")).alias("problem"),
    )


# ===========================================================================
# R2/J5 — template completion (dense grid with zero-fill)
# ===========================================================================

_R2_ORACLE = """
WITH actuals AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS time_period,
         o_orderpriority AS value, CAST(COUNT(*) AS BIGINT) AS count
  FROM orders WHERE o_totalprice > 400000 GROUP BY 1, 2
), times AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS time_period FROM orders
), vals AS (
  SELECT DISTINCT o_orderpriority AS value FROM orders
)
SELECT t.time_period, v.value, CAST(COALESCE(a.count, 0) AS BIGINT) AS count
FROM times t CROSS JOIN vals v
LEFT JOIN actuals a ON a.time_period = t.time_period AND a.value = v.value
"""


@register("r2_template_completion", _R2_ORACLE)
def r2_template_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY R2/J5: dense (year x value) grid cross-join, left-join
    actuals, zero-fill (CJ + merge all=T, R/etl_qa_run_pipeline.R:1578-1582).
    Grid sides are tiny -> broadcast."""
    o = load(spark, sf_dir, "orders")
    actuals = (
        o.filter(F.col("o_totalprice") > 400000)
        .groupBy(
            F.year("o_orderdate").cast("int").alias("time_period"),
            F.col("o_orderpriority").alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
    )
    times = o.select(F.year("o_orderdate").cast("int").alias("time_period")).distinct()
    vals = o.select(F.col("o_orderpriority").alias("value")).distinct()
    grid = times.crossJoin(vals)
    return grid.join(actuals, ["time_period", "value"], "left").select(
        "time_period", "value", F.coalesce(F.col("count"), F.lit(0)).cast("long").alias("count")
    )
