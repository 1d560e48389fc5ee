"""Catalog part 4: explicit per-ID entries for SURVEY.md §2 operators
whose semantics were previously only exercised inside composite queries
(a3 inside a2/qa_values, a7/a8/w2 inside o2, j5 inside r2, o1 inside
every sorted output, f1/f2/f3/f5/f8 scattered across the catalog). Each
now has its own (Spark, DuckDB-SQL) pair so the operator inventory can
be checked line by line.

Registered on import by ``__spark_entry__`` alongside the other catalog
parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.plans.catalog import _sql_round, load, register

# ===========================================================================
# A3 — exact median, R semantics (stats::median; etl_qa_run_pipeline.R:715)
# ===========================================================================

_A3_ORACLE = f"""
SELECT CAST(l_returnflag AS VARCHAR) AS grp,
       {_sql_round("median(CAST(l_quantity AS DOUBLE))", 6)} AS median_qty,
       {_sql_round("median(CAST(l_extendedprice AS DOUBLE))", 6)} AS median_price
FROM lineitem GROUP BY 1
"""


@register("a3_exact_median", _A3_ORACLE)
def a3_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A3: exact interpolating median per group — R
    ``stats::median`` semantics (etl_qa_run_pipeline.R:715), the
    reference's intended truth over its own off-by-parity T-SQL branch
    (SURVEY §2.10.1). ``F.percentile`` sorts within the hash-agg group;
    one shuffle on the group key."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").cast("string").alias("grp")).agg(
        round_half_away(
            F.percentile(F.col("l_quantity").cast("double"), F.lit(0.5)), 6
        ).alias("median_qty"),
        round_half_away(
            F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.5)), 6
        ).alias("median_price"),
    )


# ===========================================================================
# A7 — group proportion: count / sum(count) within the group window
# ===========================================================================

_A7_ORACLE = f"""
WITH freq AS (
  SELECT CAST(o_orderpriority AS VARCHAR) AS value,
         CAST(year(o_orderdate) AS INTEGER) AS time_period,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT time_period, value, CAST(cnt AS BIGINT) AS cnt,
       {_sql_round("CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY time_period)", 6)}
         AS proportion
FROM freq
"""


@register("a7_group_proportion", _A7_ORACLE)
def a7_group_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A7: within-group share ``count / sum(count) over (partition
    by time)`` (etl_qa_run_pipeline.R:1063). The window partitions on the
    groupBy key, so Catalyst reuses the aggregation's hash partitioning —
    no second exchange."""
    o = load(spark, sf_dir, "orders")
    freq = o.groupBy(
        F.year("o_orderdate").cast("int").alias("time_period"),
        F.col("o_orderpriority").cast("string").alias("value"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("time_period")
    return freq.select(
        "time_period", "value", "cnt",
        round_half_away(F.col("cnt").cast("double") / F.sum("cnt").over(w), 6)
            .alias("proportion"),
    )


# ===========================================================================
# A8/W2 — dense-rank top-k, remainder relabelled 'Other values', re-agg
# ===========================================================================

_A8_K = 3

_A8_ORACLE = f"""
WITH freq AS (
  SELECT CAST(c_mktsegment AS VARCHAR) AS value, COUNT(*) AS cnt
  FROM customer GROUP BY 1
), ranked AS (
  SELECT value, cnt, dense_rank() OVER (ORDER BY cnt DESC) AS rk FROM freq
)
SELECT CASE WHEN rk <= {_A8_K} THEN value ELSE 'Other values' END AS value,
       CAST(SUM(cnt) AS BIGINT) AS cnt
FROM ranked GROUP BY 1
"""


@register("a8_rollup_other", _A8_ORACLE)
def a8_rollup_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A8 (+W2): dense ranks 1..k kept, remainder relabelled
    ``'Other values'`` and re-aggregated (etl_qa_run_pipeline.R:1054-1062).
    The rank window runs over the tiny frequency table (distinct values),
    never the base rows."""
    c = load(spark, sf_dir, "customer")
    freq = c.groupBy(F.col("c_mktsegment").cast("string").alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rk = F.dense_rank().over(Window.orderBy(F.desc("cnt")))
    ranked = freq.withColumn("rk", rk)
    return (
        ranked.select(
            F.when(F.col("rk") <= _A8_K, F.col("value"))
             .otherwise(F.lit("Other values")).alias("value"),
            "cnt",
        )
        .groupBy("value")
        .agg(F.sum("cnt").alias("cnt"))
    )


# ===========================================================================
# J1 — metadata-style inner equi-join chain (sys.columns x sys.types x ...)
# ===========================================================================

_J1_ORACLE = """
SELECT CAST(r.r_name AS VARCHAR) AS region_name,
       CAST(n.n_name AS VARCHAR) AS nation_name,
       CAST(COUNT(s.s_suppkey) AS BIGINT) AS suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@register("j1_metadata_chain_join", _J1_ORACLE)
def j1_metadata_chain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY J1: the 4-way catalog-metadata equi-join chain
    (etl_qa_run_pipeline.R:1085-1101) as its dataflow shape — fact joined
    through two dimension hops. Both dims broadcast (25/5 rows), so the
    chain is shuffle-free up to the final aggregation."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").cast("string").alias("region_name"),
            F.col("n_name").cast("string").alias("nation_name"),
        )
        .agg(F.count("s_suppkey").alias("suppliers"))
    )


# ===========================================================================
# J5 — full outer join, template vs actuals, coalesce fill
# ===========================================================================

_J5_ORACLE = """
WITH o AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
), l AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, COUNT(*) AS n_ship
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(o.yr, l.yr) AS yr,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(l.n_ship, 0) AS BIGINT) AS n_ship
FROM o FULL OUTER JOIN l ON o.yr = l.yr
"""


@register("j5_full_outer_template", _J5_ORACLE)
def j5_full_outer_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY J5: full outer join + coalesce fill (merge(all=T),
    etl_qa_run_pipeline.R:1555-1612) — order years vs ship years; years
    present on one side only surface with a zero count. Both sides are
    post-aggregation year tables (handful of rows), so the outer join is
    trivial regardless of base-table scale."""
    o = load(spark, sf_dir, "orders").groupBy(
        F.year("o_orderdate").cast("int").alias("yr")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    l = load(spark, sf_dir, "lineitem").groupBy(
        F.year("l_shipdate").cast("int").alias("yr")
    ).agg(F.count(F.lit(1)).alias("n_ship"))
    return (
        o.withColumnRenamed("yr", "o_yr")
        .join(l.withColumnRenamed("yr", "l_yr"),
              F.col("o_yr") == F.col("l_yr"), "full")
        .select(
            F.coalesce("o_yr", "l_yr").alias("yr"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ship", F.lit(0)).alias("n_ship"),
        )
    )


# ===========================================================================
# O1 — multi-key sort (setorderv; ORDER BY varname, time)
# ===========================================================================

_O1_ORACLE = """
SELECT CAST(o_orderpriority AS VARCHAR) AS varname,
       CAST(year(o_orderdate) AS INTEGER) AS time_period,
       CAST(COUNT(*) AS BIGINT) AS nrow
FROM orders GROUP BY 1, 2
ORDER BY varname ASC, time_period ASC
"""


@register("o1_multikey_sort", _O1_ORACLE)
def o1_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY O1: canonical multi-key output ordering
    (etl_qa_run_pipeline.R:638-641). The sort runs on the aggregated
    relation (|values| x |years| rows), a range-partitioned exchange of a
    tiny input — never on base rows."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.col("o_orderpriority").cast("string").alias("varname"),
            F.year("o_orderdate").cast("int").alias("time_period"),
        )
        .agg(F.count(F.lit(1)).alias("nrow"))
        .orderBy(F.asc("varname"), F.asc("time_period"))
    )


# ===========================================================================
# F1/F2/F3 — casts, null handling, conditionals
# ===========================================================================

_F123_ORACLE = """
SELECT CAST(l_linenumber AS INTEGER) AS linenum,
       CAST(COUNT(CASE WHEN CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) = CAST(l_quantity AS DOUBLE)
                       THEN 1 END) AS BIGINT) AS roundtrip_ok,
       CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1995-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS early_ship,
       CAST(COUNT(CASE WHEN COALESCE(CAST(NULLIF(l_returnflag, 'N') AS VARCHAR), 'none') = 'none'
                       THEN 1 END) AS BIGINT) AS coalesced_n
FROM lineitem GROUP BY 1
"""


@register("f123_cast_null_conditional", _F123_ORACLE)
def f123_cast_null_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F1 (casts: numeric->string->numeric round-trip, date
    compare), F2 (COALESCE/NULLIF null handling), F3 (CASE WHEN
    conditionals) — the scalar families of etl_qa_run_pipeline.R:711-751,
    1193-1194, all as native Column expressions inside one codegen'd
    aggregation pass."""
    li = load(spark, sf_dir, "lineitem")
    qty_roundtrip = (
        F.col("l_quantity").cast("string").cast("double")
        == F.col("l_quantity").cast("double")
    )
    flag_null = F.when(F.col("l_returnflag") == "N", F.lit(None)).otherwise(
        F.col("l_returnflag").cast("string")
    )
    return li.groupBy(F.col("l_linenumber").cast("int").alias("linenum")).agg(
        F.count(F.when(qty_roundtrip, 1)).alias("roundtrip_ok"),
        F.sum(
            F.when(
                F.col("l_shipdate").cast("date") < F.lit("1995-01-01").cast("date"), 1
            ).otherwise(0)
        ).alias("early_ship"),
        F.count(F.when(F.coalesce(flag_null, F.lit("none")) == "none", 1)).alias(
            "coalesced_n"
        ),
    )


# ===========================================================================
# F5/F8 — arithmetic and math scalars (abs, floor/ceiling, %, ratios)
# ===========================================================================

_F58_ORACLE = f"""
SELECT CAST(l_linenumber AS INTEGER) AS linenum,
       CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_floor_price,
       CAST(SUM(CAST(CEIL(CAST(l_discount AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS sum_ceil_disc_pct,
       {_sql_round("SUM(ABS(CAST(l_discount AS DOUBLE) - 0.05))", 4)} AS sum_abs_dev,
       CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS even_orders
FROM lineitem GROUP BY 1
"""


@register("f58_arithmetic_math", _F58_ORACLE)
def f58_arithmetic_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F5 (column arithmetic, % parity — :1536,1406) and F8 (abs,
    floor/ceiling — :1807-1819): math scalar families in one pruned-scan
    aggregation."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_linenumber").cast("int").alias("linenum")).agg(
        F.sum(F.floor(F.col("l_extendedprice").cast("double")).cast("bigint"))
            .alias("sum_floor_price"),
        F.sum(F.ceil(F.col("l_discount").cast("double") * 100).cast("bigint"))
            .alias("sum_ceil_disc_pct"),
        round_half_away(
            F.sum(F.abs(F.col("l_discount").cast("double") - 0.05)), 4
        ).alias("sum_abs_dev"),
        F.sum(
            F.when(F.col("l_orderkey") % 2 == 0, 1).otherwise(0)
        ).alias("even_orders"),
    )
