"""Round-6 extension catalog, part 3: recursive queries, language-model
quality scoring, and behavioral segmentation.

Five more families past the reference surface (apde.etl v2.2.0 stops at
per-table QA profiles; SURVEY §2.13 extension contract applies —
oracle-gated, scale-noted):

- ``recursive_hierarchy_rollup``: subtree rollup over a derived part
  hierarchy via a NATIVE ``WITH RECURSIVE`` CTE — the one Catalyst
  query class (UnionLoopExec, new in Spark 4) the gate never
  exercised. The SAME SQL text runs verbatim in Spark and DuckDB.
- ``graph_bfs_hopdist``: minimum-hop BFS over the co-purchase graph —
  the frontier-loop transitive closure (per-level dedup + anti-join,
  lineage-truncated) against a recursive-CTE oracle.
- ``perplexity_bigram_score``: CCNet-style bigram language-model
  perplexity per document (Wenzek et al. 2020, arXiv:1911.00359 —
  the standard LLM corpus quality filter), add-k smoothed, trained on
  the corpus itself. Per-token log-probs are rounded then summed as
  DECIMAL so the doc scores are exact and hash-gateable despite float
  logs (the cube_rollup_navigator decimal-exact convention).
- ``markov_event_transitions``: first-order next-event transition
  matrix over per-user event streams (lag window), with exact counts
  and derived probabilities.
- ``rfm_customer_segments``: recency/frequency/monetary segmentation
  with VALUE-BASED quintile scores — breakpoints from one exact
  percentile aggregate broadcast back over customers, deliberately
  NOT ``ntile`` (a global ntile is an all-rows-one-partition window,
  the classic single-task scale killer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.operators.graph import bfs_min_hop
from apde_etl_spark.plans.catalog import (
    _sql_round,
    load,
    load_events,
    register,
)

# ===========================================================================
# Native recursive CTE — hierarchy rollup (Spark 4 UnionLoopExec)
# ===========================================================================

# Derived 10-ary tree over part keys: parent(p) = p // 10, roots are
# p < 10 (part key 0 would otherwise self-parent). Same SQL text in
# both engines — integer floor division spelled portably, money summed
# as DECIMAL(18,2) so the rollup is exact in any execution order.
_HIER_SQL = f"""
WITH RECURSIVE h(id, root, depth, price) AS (
  SELECT p_partkey, p_partkey, 0,
         CAST({_sql_round('p_retailprice', 2)} AS DECIMAL(18,2))
  FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT p.p_partkey, h.root, h.depth + 1,
         CAST({_sql_round('p.p_retailprice', 2)} AS DECIMAL(18,2))
  FROM part p JOIN h ON CAST(floor(p.p_partkey / 10.0) AS BIGINT) = h.id
  WHERE p.p_partkey >= 10
)
SELECT root, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(max(depth) AS INTEGER) AS max_depth,
       CAST(sum(price) AS DOUBLE) AS subtree_price
FROM h GROUP BY root
"""


@register("recursive_hierarchy_rollup", _HIER_SQL)
def recursive_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup (node count, max depth, exact price total) per
    root of a derived 10-ary part hierarchy, computed by a NATIVE
    ``WITH RECURSIVE`` CTE — Spark 4's UnionLoopExec, the recursive
    query class the registry never exercised before. The identical SQL
    text is the DuckDB oracle, so the gate pins Spark's recursive-CTE
    semantics (anchor + iterated join, UNION ALL accumulation)
    against an independent engine. Each recursion level is one
    broadcast-able equi-join of the (shrinking) level frontier against
    the part table on the derived parent key; depth is bounded by the
    key width (log10), so the loop terminates structurally. For
    unbounded-depth or dense-graph traversals prefer the explicit
    frontier loop (``graph_bfs_hopdist``) — recursive UNION ALL
    enumerates paths, not nodes."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_HIER_SQL)


# ===========================================================================
# BFS minimum hop distance over the co-purchase graph
# ===========================================================================

_BFS_SUPPORT = 2
_BFS_SEED_MOD = 100
_BFS_MAX_HOPS = 3

_BFS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_BFS_SUPPORT}
), e AS (
  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
), seeds AS (
  SELECT DISTINCT src AS node FROM e WHERE src % {_BFS_SEED_MOD} = 0
), r(node, hop) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, r.hop + 1
  FROM r JOIN e ON e.src = r.node WHERE r.hop < {_BFS_MAX_HOPS}
)
SELECT node, CAST(min(hop) AS INTEGER) AS hop
FROM r GROUP BY node
"""


@register("graph_bfs_hopdist", _BFS_SQL)
def graph_bfs_hopdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance from a deterministic seed set over the
    undirected co-purchase graph (edges = part pairs sharing >=
    ``_BFS_SUPPORT`` orders — the ``basket_pair_support`` edge
    weighting). The Spark path is the frontier loop
    (:func:`bfs_min_hop`): per level ONE join frontier x edges + one
    anti-join against visited, frontiers bounded by |V| — the
    transitive-closure plan that survives dense graphs, where the
    oracle's recursive UNION enumerates (node, hop) pairs and leans on
    per-round dedup. Edges are localCheckpointed once (the loop
    re-reads them every level) and each frontier truncates lineage."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("__ok"),
                  F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("__ok"),
                  F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "__ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= _BFS_SUPPORT)
        .select("src", "dst")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    seeds = (edges.select(F.col("src").alias("node"))
             .filter(F.col("node") % _BFS_SEED_MOD == 0).distinct())
    return bfs_min_hop(edges, seeds, max_hops=_BFS_MAX_HOPS)


# ===========================================================================
# Bigram-LM perplexity quality score (CCNet-style filter)
# ===========================================================================

_PPL_K = 0.5  # add-k smoothing

_PPL_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
), d2 AS (SELECT * FROM d WHERE len(t) >= 2),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS prev,
         unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS cur
  FROM d2
),
cnt AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2),
ctx AS (SELECT prev, sum(cb) AS cp FROM cnt GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS vsz FROM (SELECT unnest(t) AS w FROM d2)),
sc AS (
  SELECT bg.doc_id,
         CAST({_sql_round(
             f'ln((cnt.cb + {_PPL_K}) / (ctx.cp + {_PPL_K} * v.vsz))', 9
         )} AS DECIMAL(20,9)) AS lp9
  FROM bg JOIN cnt USING (prev, cur) JOIN ctx USING (prev) CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {_sql_round('CAST(sum(lp9) AS DOUBLE)', 6)} AS log_lik,
       {_sql_round('exp(-CAST(sum(lp9) AS DOUBLE) / count(*))', 6)
       } AS perplexity
FROM sc GROUP BY doc_id
"""


@register("perplexity_bigram_score", _PPL_SQL)
def perplexity_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram language-model perplexity, add-k smoothed —
    the CCNet-class quality filter (Wenzek et al. 2020,
    arXiv:1911.00359: docs are kept/bucketed by LM perplexity; the
    production model is KenLM, the statistical shape is exactly this).
    Trained on the corpus itself: bigram counts and context totals are
    two keyed aggregations, the vocabulary size one scalar.

    Plan: bigram extraction is a pure projection
    (``transform(sequence(...))`` + explode — no window, no shuffle);
    the count tables share the bigram shuffle key; the score join is
    keyed on the (prev, cur) digest-narrow pair and AQE broadcasts the
    count tables while they fit, degrading to a co-partitioned shuffle
    join at corpus-vocabulary scale. Determinism: each bigram log-prob
    is a pure function of three integers, rounded to 9 places and
    summed as DECIMAL(20,9) — exact, order-independent, hash-equal
    across engines (the decimal-exact aggregation convention)."""
    from apde_etl_spark.operators.cache import tracked_persist

    docs = load(spark, sf_dir, "documents")
    toks = (docs.select(
                "doc_id",
                F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
            .filter(F.size("t") >= 2))
    bg = (toks.select("doc_id", F.explode(F.expr(
              "transform(sequence(1, size(t)-1),"
              " i -> struct(t[i-1] AS prev, t[i] AS cur))")).alias("b"))
          .select("doc_id", "b.prev", "b.cur"))
    # Persist the exploded bigram projection ONCE: it feeds the count
    # table, the vocabulary aggregate AND the score-join probe — the
    # un-shared plan scanned + tokenized + re-exploded the corpus for
    # each (3 full scans; guide §2.4 "two operations keyed the same way
    # can share", here they share the whole projection). The vocabulary
    # is derived from prev ∪ cur instead of re-exploding tokens: every
    # token position of a >= 2-token doc appears in one of the two legs,
    # so the distinct set is identical. Aggregation semantics are
    # untouched — bit-identical results, 2 fewer scans.
    bg = tracked_persist(bg, scope="text")
    cnt = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    ctx = cnt.groupBy("prev").agg(F.sum("cb").alias("cp"))
    vsz = (bg.select(F.col("prev").alias("w"))
           .unionAll(bg.select(F.col("cur").alias("w")))
           .agg(F.countDistinct("w").alias("vsz")))
    lp = F.log((F.col("cb") + F.lit(_PPL_K))
               / (F.col("cp") + F.lit(_PPL_K) * F.col("vsz")))
    scored = (
        bg.join(cnt, ["prev", "cur"]).join(ctx, "prev")
        .crossJoin(F.broadcast(vsz))
        .select("doc_id",
                round_half_away(lp, 9).cast("decimal(20,9)").alias("lp9"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
             F.sum("lp9").alias("__ll"))
        .select(
            "doc_id", "n_bigrams",
            round_half_away(F.col("__ll").cast("double"), 6)
            .alias("log_lik"),
            round_half_away(
                F.exp(-F.col("__ll").cast("double") / F.col("n_bigrams")),
                6).alias("perplexity"))
    )


# ===========================================================================
# Markov next-event transition matrix
# ===========================================================================

_MARKOV_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS prev_type, next_type,
       CAST(count(*) AS BIGINT) AS n,
       {_sql_round(
           'CAST(count(*) AS DOUBLE)'
           ' / sum(count(*)) OVER (PARTITION BY event_type)', 6
       )} AS p
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@register("markov_event_transitions", _MARKOV_SQL)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: counts and conditional probabilities of event_type ->
    next event_type (ordered by event time, event_id tiebreak — the
    w4 convention). One window keyed on user_id (the natural cluster
    partitioning), one bounded groupBy (|types|² rows), one window
    over the tiny aggregate for row-normalization. Probability is a
    single division of two exact counts — deterministic across
    engines."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type",
                                           "ts", "event_id")
    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    agg = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    wn = Window.partitionBy("prev_type")
    return agg.select(
        "prev_type", "next_type", "n",
        round_half_away(
            F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("p"))


# ===========================================================================
# RFM customer segmentation (value-based quintiles)
# ===========================================================================

_RFM_QS = (0.2, 0.4, 0.6, 0.8)


def _rfm_score_sql(metric: str, qcols: list[str], invert: bool) -> str:
    cmp_ = " + ".join(f"CASE WHEN {metric} > {q} THEN 1 ELSE 0 END"
                      for q in qcols)
    return f"6 - (1 + {cmp_})" if invert else f"1 + {cmp_}"


_RFM_SQL = f"""
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   (SELECT CAST(max(o_orderdate) AS DATE)
                    FROM orders)) AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST({_sql_round('o_totalprice', 2)}
                       AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
), cuts AS (
  SELECT
    {', '.join(
        f"{_sql_round(f'quantile_cont(CAST({m} AS DOUBLE), {q})', 6)}"
        f" AS {m[0]}q{int(q * 100)}"
        for m in ('recency_days', 'frequency', 'monetary')
        for q in _RFM_QS)}
  FROM cust
)
SELECT CAST({_rfm_score_sql('recency_days',
                            [f'rq{int(q * 100)}' for q in _RFM_QS], True)}
            AS INTEGER) AS r_score,
       CAST({_rfm_score_sql('frequency',
                            [f'fq{int(q * 100)}' for q in _RFM_QS], False)}
            AS INTEGER) AS f_score,
       CAST({_rfm_score_sql('monetary',
                            [f'mq{int(q * 100)}' for q in _RFM_QS], False)}
            AS INTEGER) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       {_sql_round(
           'CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) / count(*)',
           4)} AS avg_monetary
FROM cust CROSS JOIN cuts
GROUP BY 1, 2, 3
"""


@register("rfm_customer_segments", _RFM_SQL)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order,
    vs the corpus max date), frequency (order count) and monetary
    (exact DECIMAL revenue), scored 1-5 by VALUE-BASED quintiles and
    aggregated per segment. Breakpoints come from ONE exact percentile
    aggregate (12 scalars) broadcast back over customers — deliberately
    not ``ntile()``, whose unpartitioned global sort is the single-task
    window that dies first at scale; value-based scoring is one
    parallel projection, at the cost of ties sharing a score (the
    correct semantics for segmentation anyway). avg_monetary divides
    two exact quantities once — deterministic across engines. At
    100 TB swap the exact percentile for the approx-quantile sketch,
    same shape (the a3 histogram-mode precedent)."""
    orders = load(spark, sf_dir, "orders")
    maxd = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("__mx"))
    cust = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("__mx"),
                       F.max(F.col("o_orderdate").cast("date")))
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(round_half_away(F.col("o_totalprice"), 2)
                  .cast("decimal(18,2)")).cast("double").alias("monetary"),
        )
    )
    cuts = cust.agg(*[
        round_half_away(
            F.expr(f"percentile(CAST({m} AS DOUBLE), {q})"), 6)
        .alias(f"{m[0]}q{int(q * 100)}")
        for m in ("recency_days", "frequency", "monetary")
        for q in _RFM_QS
    ])

    def score(metric: str, prefix: str, invert: bool):
        s = F.lit(1)
        for q in _RFM_QS:
            s = s + F.when(
                F.col(metric) > F.col(f"{prefix}q{int(q * 100)}"),
                1).otherwise(0)
        return (F.lit(6) - s if invert else s).cast("int")

    return (
        cust.crossJoin(F.broadcast(cuts))
        .select(
            score("recency_days", "r", True).alias("r_score"),
            score("frequency", "f", False).alias("f_score"),
            score("monetary", "m", False).alias("m_score"),
            "monetary",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             round_half_away(
                 F.sum(F.col("monetary").cast("decimal(18,2)"))
                 .cast("double") / F.count(F.lit(1)), 4)
             .alias("avg_monetary"))
    )
