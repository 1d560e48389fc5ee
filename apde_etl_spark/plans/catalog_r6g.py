"""Round-6 extension catalog, part 7: the remaining TPC-H-class
decision-support shapes.

Query breadth already covers Q1/Q3/Q4/Q5/Q10/Q12/Q17/Q18/Q21/Q22
analogues; this module closes the classic shapes a reference user
writes next — multi-nation trade flows, market-share ratios,
profit rollups, HAVING-against-global-scalar, the left-join count
histogram, conditional-aggregate ratios, disjunctive predicate
pushdown, and the nested aggregate→semi-join chain (Q7, Q8, Q9, Q11,
Q13, Q14, Q19, Q20 shapes, adapted to the testdata's columns: no
partsupp/commitdate/shipmode, so cost and availability proxies are
derived where TPC-H uses them — the JOIN/aggregation structure, which
is what Catalyst plans, is the faithful part).

All revenue aggregation follows the q5 convention: the per-row
product is one IEEE op, CAST to DECIMAL(18,4) and summed exactly —
order-independent, hash-gateable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apde_etl_spark.plans.catalog import _sql_round, load, register

_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


def _rev_col() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,4)")


# ===========================================================================
# Q7 — trade volume between two nations by ship year
# ===========================================================================

_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {_REV_DEC} AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) GROUP BY 1, 2, 3
"""


@register("q7_nation_volume", _Q7_SQL)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The fact table joins two INDEPENDENT dimension chains
    (supplier→nation and order→customer→nation) with a symmetric
    disjunctive filter across them — the shape that punishes planners
    that can't push a cross-chain OR below the join. Both nation dims
    broadcast; the only fact shuffle is the final 3-key groupBy."""
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    su = (load(spark, sf_dir, "supplier")
          .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cu = (load(spark, sf_dir, "customer")
          .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
          .select("c_custkey", F.col("n_name").alias("cust_nation")))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cu), orders.o_custkey == cu.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    )
    return (
        pair.groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
    )


# ===========================================================================
# Q8 — market share of one nation within its region
# ===========================================================================

_Q8_SQL = f"""
WITH home AS (
  SELECT n_nationkey, n_regionkey FROM nation WHERE n_name = 'NATION_1'
), vol AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {_REV_DEC} AS volume,
         CASE WHEN s_nationkey = (SELECT n_nationkey FROM home)
              THEN {_REV_DEC} ELSE CAST(0 AS DECIMAL(18,4)) END AS home_vol
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE n2.n_regionkey = (SELECT n_regionkey FROM home)
    AND p_type_of(l_partkey) = 'ECONOMY'
)
SELECT o_year,
       {_sql_round(
           'CAST(SUM(home_vol) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE)',
           6)} AS mkt_share
FROM vol GROUP BY o_year
"""


def _q8_oracle() -> str:
    # inline the part-type lookup (DuckDB has no p_type_of helper —
    # the placeholder keeps the CTE readable above)
    return _Q8_SQL.replace(
        "p_type_of(l_partkey) = 'ECONOMY'",
        "l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')")


@register("q8_market_share", _q8_oracle())
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1's share of ECONOMY-part revenue among
    orders from customers in its own region, by order year. The share
    is a conditional aggregate over the SAME rows (home volume vs all
    volume) — one pass, never two scans joined back — and the ratio is
    one division of two exact decimal sums. The home nation/region
    scalars resolve once; the part-type filter is a broadcast
    semi-join that prunes the fact scan before any shuffle."""
    n = load(spark, sf_dir, "nation")
    home = n.filter(F.col("n_name") == "NATION_1") \
        .select("n_nationkey", "n_regionkey").first()
    li = load(spark, sf_dir, "lineitem")
    econ = (load(spark, sf_dir, "part")
            .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(n.filter(
                F.col("n_regionkey") == home.n_regionkey)
                .select("n_nationkey")),
                F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
            .select("c_custkey"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    vol = (
        li.join(F.broadcast(econ),
                li.l_partkey == econ.p_partkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey,
              "left_semi")
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev_col().alias("volume"),
            F.when(F.col("s_nationkey") == home.n_nationkey,
                   _rev_col())
            .otherwise(F.lit(0).cast("decimal(18,4)")).alias("home_vol"))
    )
    return vol.groupBy("o_year").agg(
        F.expr(_sql_round(
            "CAST(SUM(home_vol) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE)",
            6)).alias("mkt_share"))


# ===========================================================================
# Q9 — profit by supplier nation and year
# ===========================================================================

# no partsupp in the testdata: cost proxy = half the retail price per
# unit (the JOIN/rollup structure is the point, not the cost model)
_PROFIT_DEC = ("CAST(l_extendedprice * (1 - l_discount)"
               " - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,4))")

_Q9_SQL = f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {_PROFIT_DEC} AS amount
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%bolt%'
) GROUP BY 1, 2
"""


@register("q9_product_profit", _Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product family rolled up by supplier
    nation and order year — the expression-heavy 5-table star with a
    LIKE filter on the part dim. The part filter prunes the fact scan
    through a broadcast join BEFORE the orders join (dim-first
    reordering Catalyst does from stats); the profit expression is one
    row-local computation cast to exact DECIMAL."""
    li = load(spark, sf_dir, "lineitem")
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_name").like("%bolt%"))
            .select("p_partkey", "p_retailprice"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey",
                                                  "o_orderdate")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.5 * F.col("p_retailprice") * F.col("l_quantity")) \
        .cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(n), sup.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ===========================================================================
# Q11 — important brands (HAVING against a global scalar)
# ===========================================================================

_Q11_FRACTION = 0.02

_Q11_SQL = f"""
WITH brand_val AS (
  SELECT p_brand,
         SUM({_REV_DEC}) AS val
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand
)
SELECT p_brand, CAST(val AS DOUBLE) AS value
FROM brand_val
WHERE val > (SELECT SUM(val) * {_Q11_FRACTION} FROM brand_val)
"""


@register("q11_important_brands", _Q11_SQL)
def q11_important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate exceeds a FRACTION OF
    THE GLOBAL TOTAL — the HAVING-against-scalar-subquery pattern. The
    global total derives from the SAME grouped aggregate (one fact
    pass; the scalar is a second tiny aggregate over the group frame,
    broadcast back), never a second fact scan. The comparison runs on
    exact decimals — a float total would make the cut nondeterministic
    for groups near the threshold."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bv = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(_rev_col()).alias("val"))
    )
    tot = bv.agg((F.sum("val") * F.lit(_Q11_FRACTION)).alias("cut"))
    return (
        bv.crossJoin(F.broadcast(tot))
        .filter(F.col("val") > F.col("cut"))
        .select("p_brand", F.col("val").cast("double").alias("value"))
    )


# ===========================================================================
# Q13 — customer order-count distribution (left join histogram)
# ===========================================================================

_Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
"""


@register("q13_custdist", _Q13_SQL)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count-per-customer histogram,
    INCLUDING zero-order customers — the left-join-then-double-
    aggregate that trips engines which drop unmatched rows (count of
    the join COLUMN, not count(*), is what makes the zero bucket
    appear). First groupBy co-partitions with the join key (no second
    shuffle); the histogram aggregate is |distinct counts| rows."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist"))


# ===========================================================================
# Q14 — promo revenue share per month
# ===========================================================================

_Q14_SQL = f"""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
       {_sql_round(
           "100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
           + _REV_DEC + " ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
           " / CAST(SUM(" + _REV_DEC + ") AS DOUBLE)", 6)} AS promo_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1
"""


@register("q14_promo_revenue", _Q14_SQL)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share per ship month — the
    conditional-aggregate ratio (CASE inside SUM), one pass, one
    division of exact decimal sums per group."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev_col()) \
        .otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.date_trunc("month", "l_shipdate").cast("date")
                .alias("ship_month"),
                promo.alias("__promo"), _rev_col().alias("__rev"))
        .groupBy("ship_month")
        .agg(F.expr(_sql_round(
            "100.0 * CAST(SUM(__promo) AS DOUBLE)"
            " / CAST(SUM(__rev) AS DOUBLE)", 6)).alias("promo_pct"))
    )


# ===========================================================================
# Q19 — disjunctive predicate revenue (OR-of-ANDs pushdown)
# ===========================================================================

_Q19_SQL = f"""
SELECT CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


@register("q19_disjunctive_revenue", _Q19_SQL)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three conjunctive
    brand/size/quantity envelopes — the disjunctive-pushdown test.
    Catalyst splits the common part-side conjuncts (brand IN (...),
    size <= 50) below the join while the mixed residual stays on the
    join — the difference between scanning 3 brands' rows and scanning
    the whole fact table."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    env = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2")
           & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(env).agg(
        F.sum(_rev_col()).cast("double").alias("revenue"))


# ===========================================================================
# Q20 — suppliers with excess shipped volume (aggregate -> semi chain)
# ===========================================================================

_Q20_MIN_QTY = 60

_Q20_SQL = f"""
WITH small_parts AS (
  SELECT p_partkey FROM part WHERE p_type = 'SMALL'
), sp_qty AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM small_parts)
  GROUP BY l_suppkey, l_partkey
)
SELECT s_name, CAST(n_parts AS BIGINT) AS n_parts
FROM supplier
JOIN (
  SELECT l_suppkey, count(*) AS n_parts FROM sp_qty
  WHERE qty > {_Q20_MIN_QTY} GROUP BY l_suppkey
) q ON s_suppkey = q.l_suppkey
"""


@register("q20_supplier_part_chain", _Q20_SQL)
def q20_supplier_part_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold of
    any SMALL part — the nested aggregate→filter→semi-join chain (the
    original correlates availqty against a per-(supp,part) lineitem
    sum; the testdata has no partsupp, so the correlated aggregate IS
    the target). Decorrelated by construction: one grouped aggregate
    on the composite key, a threshold filter, a count per supplier,
    and a dim join — no per-row subquery anywhere."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity")
    small = (load(spark, sf_dir, "part")
             .filter(F.col("p_type") == "SMALL").select("p_partkey"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    spq = (
        li.join(F.broadcast(small),
                li.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    per_supp = (spq.filter(F.col("qty") > _Q20_MIN_QTY)
                .groupBy("l_suppkey")
                .agg(F.count(F.lit(1)).cast("long").alias("n_parts")))
    return (
        sup.join(per_supp, sup.s_suppkey == per_supp.l_suppkey)
        .select("s_name", "n_parts")
    )
