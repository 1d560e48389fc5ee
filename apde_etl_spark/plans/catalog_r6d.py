"""Round-6 extension catalog, part 4: exact-moment statistics, data
lifecycle (deletion / CDC), and feature engineering.

Five families past the reference surface (SURVEY §2.13 extension
contract — oracle-gated, scale-noted):

- ``corr_matrix_lineitem``: the Pearson correlation matrix over the
  lineitem measures from ONE aggregation pass of exact DECIMAL
  moments — float sums are partial-order-dependent and can never
  hash-gate, so every Σx, Σx², Σxy is exact fixed-point and the
  closed-form correlation is derived from those exact scalars.
- ``decayed_engagement_score``: per-user exponentially time-decayed,
  type-weighted engagement — the feature-store staple (recency-
  weighted activity), decimal-exact per the repo convention.
- ``session_path_topk``: top event-type paths per session — funnel
  discovery over the sessionizer's output (ordered path assembly
  inside each session, then one tiny frequency top-k).
- ``gdpr_cascade_delete``: right-to-be-forgotten purge cascading
  customer -> orders -> lineitem with per-table audit counts — the
  compliance operation every training-data pipeline must support
  (takedown requests), expressed as semi/anti joins against a
  broadcast tombstone set.
- ``cdc_apply_tombstones``: apply a change-data-capture log
  (insert/update/delete ops, last-writer-wins by event time) to
  derive the live table — the Debezium-feed apply step; deletes are
  tombstones, so a key whose last op is D vanishes entirely
  (stricter than SCD1 upsert, which never removes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.plans.catalog import (
    _sql_round,
    load,
    load_events,
    register,
)

# ===========================================================================
# Pearson correlation matrix from exact decimal moments
# ===========================================================================

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_formula(a: str, b: str) -> str:
    """Closed-form Pearson r from the exact moment scalars (cast to
    DOUBLE once; the same expression text runs in both engines)."""
    return (
        f"(n * s_{a}_{b} - s_{a} * s_{b}) / "
        f"sqrt((n * s_{a}_{a} - s_{a} * s_{a})"
        f" * (n * s_{b}_{b} - s_{b} * s_{b}))"
    )


def _corr_moment_sql() -> str:
    parts = ["CAST(count(*) AS DOUBLE) AS n"]
    for i, a in enumerate(_CORR_COLS):
        parts.append(
            f"CAST(sum(CAST({_sql_round(a, 2)} AS DECIMAL(15,2)))"
            f" AS DOUBLE) AS s_{a}")
        for b in _CORR_COLS[i:]:
            parts.append(
                f"CAST(sum(CAST({_sql_round(a, 2)} AS DECIMAL(15,2))"
                f" * CAST({_sql_round(b, 2)} AS DECIMAL(15,2)))"
                f" AS DOUBLE) AS s_{a}_{b}")
    return ", ".join(parts)


_CORR_SQL = f"""
WITH m AS (SELECT {_corr_moment_sql()} FROM lineitem)
{" UNION ALL ".join(
    f"SELECT '{a}' AS col_a, '{b}' AS col_b, CAST(n AS BIGINT) AS n, "
    f"{_sql_round(_corr_formula(a, b), 6)} AS corr FROM m"
    for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:])}
"""


@register("corr_matrix_lineitem", _CORR_SQL)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (upper triangle incl. diagonal) over
    the lineitem measures. ONE full-scan aggregation computes every
    first and second moment as an EXACT DECIMAL sum (values rounded to
    their 2-decimal domain, so each product is exact fixed-point and
    the sums are order-independent — a float Σxy differs run-to-run
    with partial-aggregation order and could never hash-gate); the
    10 correlations are then closed-form scalar arithmetic on the
    1-row moment frame. At 100 TB this is the map-side-combine
    aggregate Spark does best — no second pass, no ``F.corr`` per
    pair (which would rescan per coefficient)."""
    li = load(spark, sf_dir, "lineitem")
    # round+cast each measure ONCE in a projection below the aggregate:
    # inlined into the 14 sum expressions, the half-away rounding chain
    # (signum/abs/floor) was re-evaluated per aggregate that references
    # the column — up to 6x per row per column; aggregate-buffer
    # updates don't share subexpressions the way a projection does
    # (guide §1.2 per-task work). Same expressions, same decimal
    # values, bit-identical sums (A/B-verified equal collect).
    dec = li.select(*[
        round_half_away(F.col(c), 2).cast("decimal(15,2)").alias(f"__d_{c}")
        for c in _CORR_COLS
    ])
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i, a in enumerate(_CORR_COLS):
        aggs.append(F.sum(F.col(f"__d_{a}")).cast("double").alias(f"s_{a}"))
        for b in _CORR_COLS[i:]:
            aggs.append(F.sum(F.col(f"__d_{a}") * F.col(f"__d_{b}"))
                        .cast("double").alias(f"s_{a}_{b}"))
    m = dec.agg(*aggs)
    # derive all 10 coefficients FROM THE ONE MOMENT ROW by exploding
    # an array of structs — a 10-way union of selects would re-plan
    # (and re-scan) the aggregate per arm, since each arm prunes to
    # its own moment subset and nothing is reusable
    cells = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.col("n").cast("long").alias("n"),
            round_half_away(F.expr(_corr_formula(a, b)), 6).alias("corr"))
        for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:]
    ])
    return (m.select(F.explode(cells).alias("__r"))
            .select("__r.col_a", "__r.col_b", "__r.n", "__r.corr"))


# ===========================================================================
# Exponentially decayed, type-weighted engagement score
# ===========================================================================

_DECAY_TAU_DAYS = 30.0
_DECAY_WEIGHTS = {"purchase": 5, "signup": 3, "click": 2, "view": 1,
                  "error": 0}

_DECAY_CASE = ("CASE event_type "
               + " ".join(f"WHEN '{k}' THEN {v}"
                          for k, v in _DECAY_WEIGHTS.items())
               + " ELSE 0 END")

_DECAY_SQL = f"""
WITH mx AS (SELECT CAST(max(ts) AS DATE) AS mxd FROM events),
sc AS (
  SELECT user_id,
         CAST({_sql_round(
             f"({_DECAY_CASE}) * exp(-date_diff('day', CAST(ts AS DATE),"
             f" mx.mxd) / {_DECAY_TAU_DAYS})", 9
         )} AS DECIMAL(20,9)) AS d9
  FROM events CROSS JOIN mx
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       {_sql_round('CAST(sum(d9) AS DOUBLE)', 6)} AS engagement
FROM sc GROUP BY user_id
"""


@register("decayed_engagement_score", _DECAY_SQL)
def decayed_engagement_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement feature: Σ weight(event_type) ·
    exp(-age_days/τ), ages measured against the corpus max date — the
    recency-weighted activity score every feature store ships first.
    One scalar aggregate (max date, broadcast), one projection, one
    groupBy on the user key. Each event's decay term is a pure
    function of (type, age) rounded to 9 places and summed as
    DECIMAL(20,9) — exact and order-independent (the decimal-exact
    convention), so the feature is reproducible bit-for-bit across
    engines, partitionings and retries — which is what makes it safe
    to backfill and serve from different systems."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("mxd"))
    w = F.expr(_DECAY_CASE)
    age = F.datediff(F.col("mxd"), F.col("ts").cast("date"))
    d9 = round_half_away(
        w * F.exp(-age / F.lit(_DECAY_TAU_DAYS)), 9).cast("decimal(20,9)")
    return (
        ev.crossJoin(F.broadcast(mx))
        .select("user_id", d9.alias("d9"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             round_half_away(F.sum("d9").cast("double"), 6)
             .alias("engagement"))
    )


# ===========================================================================
# Top session paths (funnel discovery)
# ===========================================================================

_PATH_GAP_MIN = 1440.0
_PATH_TOPK = 10

_PATH_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w)
                      > {_PATH_GAP_MIN} * 60.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), se AS (
  SELECT user_id, event_id, event_type, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_seq
  FROM ev
), paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM se GROUP BY user_id, session_seq
), freq AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM paths
  GROUP BY path
)
SELECT path, n_sessions, CAST(rk AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
  FROM freq
) WHERE rk <= {_PATH_TOPK}
"""


@register("session_path_topk", _PATH_SQL)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent event-type paths per session (24h-gap sessions,
    the sessionize_events convention) — funnel DISCOVERY, where the
    funnel entry measures a path you already chose. Sessionization
    reuses :func:`batch_sessionize` (one user-keyed window); the path
    string is assembled per session by sorting the collected (ts,
    event_id, type) structs INSIDE each group — array_sort on a
    grouped collect, not a second global window — then one tiny
    frequency aggregate and a top-k. Path cardinality is bounded by
    observed behavior, so the final ordering sorts a small frame; the
    per-session collect is bounded by session length (cap it for
    adversarial clickstreams — the documented skew case)."""
    from apde_etl_spark.streaming.sessionize import batch_sessionize

    ev = load_events(spark, sf_dir).select("user_id", "event_id",
                                           "event_type", "ts")
    se = batch_sessionize(ev, "user_id", "ts", gap_minutes=_PATH_GAP_MIN)
    paths = (
        se.groupBy("user_id", "session_seq")
        .agg(F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("__evs"))
        .select(F.array_join(
            F.transform("__evs", lambda s: s["event_type"]), ">")
            .alias("path"))
    )
    freq = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"))
    # top-k FIRST via TakeOrdered (per-partition top-k, k-row driver
    # merge), then rank the k survivors — a rank-then-filter global
    # window would single-task the whole path-frequency frame
    top = freq.orderBy(F.desc("n_sessions"), F.asc("path")) \
        .limit(_PATH_TOPK)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn("rank", F.row_number().over(wr).cast("int"))


# ===========================================================================
# GDPR cascade delete with audit counts
# ===========================================================================

_GDPR_MOD = 97
_GDPR_REM = 3

_GDPR_SQL = f"""
WITH req AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_GDPR_MOD} = {_GDPR_REM}
), del_o AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM req)
)
SELECT 'customer' AS table_name,
       (SELECT CAST(count(*) AS BIGINT) FROM customer) AS rows_before,
       (SELECT CAST(count(*) AS BIGINT) FROM req) AS rows_removed,
       (SELECT CAST(count(*) AS BIGINT) FROM customer)
         - (SELECT CAST(count(*) AS BIGINT) FROM req) AS rows_after
UNION ALL
SELECT 'orders',
       (SELECT CAST(count(*) AS BIGINT) FROM orders),
       (SELECT CAST(count(*) AS BIGINT) FROM del_o),
       (SELECT CAST(count(*) AS BIGINT) FROM orders)
         - (SELECT CAST(count(*) AS BIGINT) FROM del_o)
UNION ALL
SELECT 'lineitem',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)),
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
         - (SELECT CAST(count(*) AS BIGINT) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM del_o))
"""


@register("gdpr_cascade_delete", _GDPR_SQL)
def gdpr_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge: a deterministic request set of
    customers cascades through orders to lineitem, reporting the audit
    row counts (before / removed / after) per table — the numbers a
    compliance log must record. The cascade is two LEFT SEMI joins
    down the foreign-key chain; the kept tables would be the matching
    anti-joins. At 100 TB the tombstone key set is broadcast (or a
    bloom filter at billions of requests) so each fact table is purged
    in one scan with zero shuffles — and the same plan services
    training-data takedown requests, which is why deletion is a
    first-class operator here and not an afterthought."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    req = cust.filter(F.col("c_custkey") % _GDPR_MOD == _GDPR_REM)
    del_o = orders.join(
        F.broadcast(req),
        orders.o_custkey == req.c_custkey, "left_semi",
    ).select("o_orderkey")
    del_l = li.join(
        F.broadcast(del_o.select(F.col("o_orderkey").alias("l_orderkey"))),
        "l_orderkey", "left_semi")

    def audit(name: str, base: DataFrame, removed: DataFrame) -> DataFrame:
        b = base.agg(F.count(F.lit(1)).cast("long").alias("rows_before"))
        r = removed.agg(
            F.count(F.lit(1)).cast("long").alias("rows_removed"))
        return (b.crossJoin(r)
                .select(F.lit(name).alias("table_name"), "rows_before",
                        "rows_removed",
                        (F.col("rows_before") - F.col("rows_removed"))
                        .alias("rows_after")))

    return (
        audit("customer", cust, req)
        .unionByName(audit("orders", orders, del_o))
        .unionByName(audit("lineitem", li, del_l))
    )


# ===========================================================================
# CDC log apply with tombstones
# ===========================================================================

_CDC_OP = ("CASE event_type WHEN 'error' THEN 'D'"
           " WHEN 'signup' THEN 'I' ELSE 'U' END")

_CDC_SQL = f"""
WITH log AS (
  SELECT user_id, {_CDC_OP} AS op, value, ts, event_id FROM events
), latest AS (
  SELECT user_id, op, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_ops
  FROM log
)
SELECT user_id, op AS last_op,
       {_sql_round('value', 6)} AS last_value,
       CAST(n_ops AS BIGINT) AS n_ops
FROM latest WHERE rn = 1 AND op <> 'D'
"""


@register("cdc_apply_tombstones", _CDC_SQL)
def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC op log (insert/update/delete derived from the event
    stream, last-writer-wins by event time with the w4 tiebreak) to
    materialize the live table: one key-partitioned window picks each
    key's newest op, and a DELETE there is a TOMBSTONE — the key
    vanishes from the output (strictly stronger than SCD1 upsert,
    which never removes). This is the Debezium-feed apply step; the
    streaming twin is the foreachBatch upsert family. One shuffle on
    the key; at scale the same window rides the MERGE write path
    (scd/upsert precedent) instead of rewriting the table."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type",
                                           "value", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.select(
            "user_id", F.expr(_CDC_OP).alias("op"), "value", "ts",
            "event_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wc).cast("long"))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", F.col("op").alias("last_op"),
                round_half_away(F.col("value"), 6).alias("last_value"),
                "n_ops")
    )


# ===========================================================================
# Benford's-law leading-digit forensic
# ===========================================================================

_BENFORD_SQL = f"""
WITH cents AS (
  SELECT CAST(CAST({_sql_round('o_totalprice', 2)} AS DECIMAL(18,2)) * 100
              AS BIGINT) AS c
  FROM orders WHERE o_totalprice > 0
), digits AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM cents
), obs AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
), tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM obs)
SELECT digit, n,
       {_sql_round('n / total', 6)} AS obs_p,
       {_sql_round('log10(1.0 + 1.0 / digit)', 6)} AS exp_p,
       {_sql_round(
           '(n - total * log10(1.0 + 1.0 / digit))'
           ' * (n - total * log10(1.0 + 1.0 / digit))'
           ' / (total * log10(1.0 + 1.0 / digit))', 6)} AS chi2_term
FROM obs CROSS JOIN tot
"""


@register("benford_totalprice_digits", _BENFORD_SQL)
def benford_totalprice_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law leading-digit forensic over order totals — the
    classic fabricated-data / broken-upstream-feed detector (a
    synthetic uniform generator, like this testdata's, FAILS Benford
    loudly: that's the point of the check, and the chi2 terms say so).
    Numeric robustness: the leading digit comes from the EXACT integer
    cents (decimal-scaled, then the first character of the bigint's
    decimal rendering — identical across engines), never from float
    log10 of the value, whose 2.999…96 edge cases would misbin powers
    of ten. One scan, a 9-row aggregate, closed-form expectations."""
    orders = load(spark, sf_dir, "orders")
    cents = (orders.filter(F.col("o_totalprice") > 0)
             .select((round_half_away(F.col("o_totalprice"), 2)
                      .cast("decimal(18,2)") * 100)
                     .cast("bigint").alias("c")))
    obs = (cents.select(
               F.substring(F.col("c").cast("string"), 1, 1)
               .cast("int").alias("digit"))
           .groupBy("digit")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = obs.agg(F.sum("n").cast("double").alias("total"))
    exp_n = F.col("total") * F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            round_half_away(F.col("n") / F.col("total"), 6).alias("obs_p"),
            round_half_away(F.log10(1.0 + 1.0 / F.col("digit")), 6)
            .alias("exp_p"),
            round_half_away(
                (F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n, 6)
            .alias("chi2_term"))
    )
