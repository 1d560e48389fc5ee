"""Round-6 extension catalog, part 2: behavioral analytics and
string-similarity breadth — funnel conversion, market-basket pair
support, and banded edit-distance near-dup.

Three more families a reference user reaches for next (the reference —
apde.etl v2.2.0 — stops at per-table QA profiles; SURVEY §2.13
extension contract applies: oracle-gated, scale-noted):

- ``funnel_conversion_steps``: the ordered view -> click -> purchase
  funnel per user (each stage's FIRST event strictly after the prior
  stage's), counted per stage. Three bounded aggregations chained by
  user-keyed joins — no window over the whole event stream, no
  per-user UDF.
- ``basket_pair_support``: frequent item PAIRS by co-occurrence
  support — the A-Priori first pass. The self-join is keyed on the
  basket id, so the blow-up is per-basket quadratic (avg basket ~4
  lines), never corpus-quadratic; at 100 TB the same plan shuffles
  once on l_orderkey and the support groupBy absorbs hot pairs
  map-side.
- ``editdistance_neardup_parts``: Levenshtein near-dup over part
  names, FIRST-TOKEN BLOCKED (the classic cheap blocking key) so the
  quadratic verify runs inside blocks only — the same
  block-then-verify posture as every LSH family here, but with an
  edit-distance verifier, exercising Spark's and DuckDB's native
  ``levenshtein`` against each other (identical classic DP semantics —
  the cross-engine hash IS the test). Output is the verified
  DISTINCT-NAME-pair table with id-pair multiplicity, never the
  id-pair enumeration (see the entry docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apde_etl_spark.plans.catalog import load, load_events, register

# ===========================================================================
# Ordered funnel conversion
# ===========================================================================

_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE ts IS NOT NULL
), s1 AS (
  SELECT user_id, min(ts) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM ev e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM ev e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT stage, n_users, CAST(step AS INTEGER) AS step FROM (
  SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users, 1 AS step
  FROM s1
  UNION ALL
  SELECT 'view>click', CAST(count(*) AS BIGINT), 2 FROM s2
  UNION ALL
  SELECT 'view>click>purchase', CAST(count(*) AS BIGINT), 3 FROM s3
)
"""


@register("funnel_conversion_steps", _FUNNEL_SQL)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click that
    precedes a purchase (strict event-time order, FIRST qualifying
    event per stage). Three min-aggregations, each keyed on user_id and
    joined to the previous stage — the stage frames shrink
    monotonically, so each join's right side is at most the previous
    stage's user set (broadcastable long before 100 TB user counts;
    AQE picks it). No corpus-wide window, no state machine UDF: the
    'strictly after' correlation rides the join as a residual
    predicate."""
    ev = load_events(spark, sf_dir).filter(F.col("ts").isNotNull()).select(
        "user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == "click")
          .join(s1, "user_id")
          .filter(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "purchase")
          .join(s2, "user_id")
          .filter(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))

    def row(df: DataFrame, stage: str, step: int) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(stage).alias("stage"), "n_users",
            F.lit(step).cast("int").alias("step"))

    return (
        row(s1, "view", 1)
        .unionByName(row(s2, "view>click", 2))
        .unionByName(row(s3, "view>click>purchase", 3))
    )


# ===========================================================================
# Market-basket pair support (A-Priori first pass)
# ===========================================================================

_BASKET_MIN_SUPPORT = 2

_BASKET_SQL = f"""
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
       CAST(count(*) AS BIGINT) AS support
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {_BASKET_MIN_SUPPORT}
"""


@register("basket_pair_support", _BASKET_SQL)
def basket_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent item pairs by basket co-occurrence — the A-Priori /
    market-basket first pass (and the co-purchase edge weighting the
    graph family consumes upstream). Self-join keyed on the BASKET id
    with the item inequality as residual: the blow-up is per-basket
    quadratic (avg ~4 lines/order), never corpus-quadratic, and the
    support groupBy's partial aggregation absorbs hot pairs map-side.
    A giant basket is the skew case — at 100 TB cap basket size first
    (the standard mining guard); the testdata needs none."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("__ok"),
                  F.col("l_partkey").alias("item_a"))
    b = li.select(F.col("l_orderkey").alias("__ok"),
                  F.col("l_partkey").alias("item_b"))
    return (
        a.join(b, "__ok")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= _BASKET_MIN_SUPPORT)
    )


# ===========================================================================
# Banded edit-distance near-dup (native levenshtein, cross-engine)
# ===========================================================================

_EDIT_MAX_DIST = 4
_EDIT_BLOCK_CAP = 2000

def _edit_split_levels_sql() -> str:
    """The 3-level iterative hot-block split (dedup.py
    editdist_neardup_pairs): level k extends still-hot keys with char
    k of the second token."""
    ctes = ["k0 AS (SELECT tok1 AS blk, p_name, cnt FROM names)"]
    for lv in (1, 2, 3):
        ctes.append(
            f"s{lv} AS (SELECT blk, count(*) AS n FROM k{lv - 1} GROUP BY 1)")
        ctes.append(
            f"k{lv} AS (SELECT CASE WHEN n > {_EDIT_BLOCK_CAP} "
            f"THEN blk || '|' || substr(split_part(p_name, ' ', 2), {lv}, 1) "
            f"ELSE blk END AS blk, p_name, cnt "
            f"FROM k{lv - 1} JOIN s{lv} USING (blk))")
    return ", ".join(ctes)


_EDIT_SQL = f"""
WITH names AS (
  SELECT split_part(p_name, ' ', 1) AS tok1, p_name,
         CAST(count(*) AS BIGINT) AS cnt
  FROM part GROUP BY 1, 2
), {_edit_split_levels_sql()}
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist,
       a.cnt * b.cnt AS n_pairs
FROM k3 a JOIN k3 b
  ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_EDIT_MAX_DIST}
"""


@register("editdistance_neardup_parts", _EDIT_SQL)
def editdistance_neardup_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup over part names with FIRST-TOKEN blocking:
    the quadratic Levenshtein verify runs only inside same-first-word
    blocks (the classic cheap blocking key — same block-then-verify
    posture as the LSH families, different verifier). Exercises Spark's
    native ``levenshtein`` against DuckDB's — both classic DP edit
    distance, and the hash gate proves they agree pair-for-pair.

    Scale posture — the DISTINCT-VALUE rewrite (the same trick as the
    BPE encode stage): names repeat heavily, so the Levenshtein verify
    runs over DISTINCT name pairs per block (bounded by the name
    vocabulary squared, with a length-difference prefilter and the
    THRESHOLDED banded-DP ``levenshtein(a, b, k)`` that early-exits
    past k). The OUTPUT is the verified name-pair table with the id-
    pair multiplicity (``n_pairs = cnt_a * cnt_b``) — information-
    equivalent to enumerating id pairs, which on repetitive fixtures
    is a 400×-input blow-up the operator refuses to materialize (the
    consumer fans out with one broadcast join when it truly needs id
    granularity; the round-6 rework measured the enumeration at 27.7s
    of pure row transfer vs 0.9s for this table, identical content).
    Identical names are excluded (exact dedup's job).

    Round 7: the HOT-BLOCK GUARD is now executable, not documentation —
    any block whose distinct-name count exceeds {cap} splits on the
    first char of the second token (operators/dedup.py:
    editdist_neardup_pairs; the linkage/LSH escape-hatch pattern).
    The fixture's largest block is 8 names, so the gate output is
    bit-identical; the planted 50k-name hot block is measured by
    tools/scale_stress_editdist.py."""
    from apde_etl_spark.operators.dedup import editdist_neardup_pairs

    return editdist_neardup_pairs(
        load(spark, sf_dir, "part"), "p_name",
        max_dist=_EDIT_MAX_DIST, block_cap=_EDIT_BLOCK_CAP)
