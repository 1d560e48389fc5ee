"""Graph analytics — fixed-point integer PageRank and degree stats.

Centrality is a first-class curation signal (Common Crawl ranks domains
by harmonic centrality / PageRank to weight training corpora); the
reference has no graph surface at all, so this is extension surface
(SURVEY §2.13) built the Spark way: edges are a DataFrame, every
iteration is one equi-join + one groupBy on the node key — the
Pregel-without-Pregel shape that co-partitions cleanly on a cluster.

The trick that makes the ORACLE possible: all arithmetic is FIXED-POINT
INTEGER. Float PageRank cannot be hash-gated across engines (sum order
changes the low bits); here ranks are BIGINTs scaled by 10^12,
per-neighbor shares use integer division, and integer addition is
associative-commutative — bit-identical in any execution order, in any
engine. The damping update is

    r'(v) = (15 * SCALE) // (100 * N)  +  (85 * SUM_{u->v} r(u)//deg(u)) // 100

(floor division; all operands positive). Nodes with no in-edges after a
directed step keep only the teleport term; dangling-node mass is
dropped, documented — on an undirected edge list (both directions
present) there are no dangling nodes. Total mass therefore decays by
the truncation, which is fine for a RANKING signal: order, not measure.

Overflow headroom: SCALE=10^12, so 85 * SUM <= 85 * SCALE ~ 8.5e13 and
the teleport product 15 * SCALE = 1.5e13 — far inside int64 even at
billions of nodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_integer", "degree_table"]

SCALE = 10**12


def degree_table(edges: DataFrame, src: str = "src") -> DataFrame:
    """Out-degree per node — (node, deg)."""
    return edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
    seed_pred: Column | None = None,
    cache_scope: str | None = None,
    broadcast_below: int = 0,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Pass both edge directions for an undirected graph. Returns
    (node, rank) with rank a BIGINT in fixed-point ``scale`` units.
    The caller should persist ``edges`` if it is expensive to recompute
    (the loop re-reads it every iteration).

    ``seed_pred`` (a boolean Column over ``node``) switches to
    PERSONALIZED PageRank: teleport mass goes only to the seed set
    (split evenly over |S| seeds, same fixed-point floor division), and
    the initial distribution is the teleport vector — ranks then measure
    proximity to the seeds, the similar-entity-discovery primitive.

    Plan: degree once, then per iteration one join (ranks x edges on the
    node key) and one groupBy(dst) sum — 2 shuffles per iteration, both
    on the node id, AQE-coalesced; no collect, no floats.

    ``broadcast_below`` is the size gate for the rank/degree side: when
    |V| (counted once, off the persisted degree table) is at or under
    it, the per-iteration joins broadcast the node-sized frames so the
    only shuffle left per iteration is the groupBy(dst) — the right
    plan while ranks fit an executor. Past the gate the joins stay
    shuffle joins; at 100 TB the answer is co-partitioning edges and
    ranks on the node id, not broadcast. Results are identical either
    way (integer arithmetic; the unit suite pins partitioning
    invariance).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not (0 < damp_num < damp_den):
        raise ValueError("damping must satisfy 0 < damp_num < damp_den")
    deg = degree_table(edges, src)
    if cache_scope is not None:
        # deg (|V| rows) is referenced twice per iteration — share→free
        # it; the edge join, 5-10x larger, is the caller's persist call.
        from apde_etl_spark.operators.cache import tracked_persist

        deg = tracked_persist(deg, scope=cache_scope)
    is_seed = seed_pred if seed_pred is not None else F.lit(True)
    n_nodes_df = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(is_seed, 1).otherwise(0)).cast("long").alias("n_seed"),
    )
    # teleport term: (15*scale) // (100*|teleport set|), zero off-seed.
    # One tiny cross-join literalizes it onto every row (broadcast).
    teleport = n_nodes_df.select(
        F.expr(
            f"CAST({(damp_den - damp_num)} * CAST({scale} AS BIGINT) AS BIGINT)"
            f" div ({damp_den} * n_seed)"
        ).alias("__tp_seed"),
        F.col("n").alias("__n"),
        F.col("n_seed").alias("__n_seed"),
    )
    if seed_pred is None:
        ranks = deg.crossJoin(F.broadcast(teleport)).select(
            "node",
            F.expr(f"CAST({scale} AS BIGINT) div __n").alias("rank"),
        )
    else:
        # personalized: start from the teleport vector itself
        ranks = deg.crossJoin(F.broadcast(teleport)).select(
            "node",
            F.when(
                is_seed,
                F.expr(f"CAST({scale} AS BIGINT) div __n_seed"),
            ).otherwise(F.lit(0)).cast("long").alias("rank"),
        )
    small = (
        broadcast_below > 0
        and deg.limit(broadcast_below + 1).count() <= broadcast_below
    )

    def node_sized(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("__dst"))
    for _ in range(iters):
        sums = (
            node_sized(ranks.join(node_sized(deg), "node")
                       .withColumn("__share", F.expr("rank div deg")))
            .join(e, "node")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum("__share").alias("__in"))
        )
        # node universe = nodes with >= 1 out-edge (deg); a node with no
        # in-mass this round keeps the bare teleport term. Mass flowing
        # into pure sinks (absent from deg) is dropped — the documented
        # dangling rule; absent by construction on undirected inputs.
        ranks = (
            deg.select("node")
            .join(node_sized(sums), "node", "left")
            .withColumn("__in", F.coalesce(F.col("__in"), F.lit(0).cast("long")))
            .crossJoin(F.broadcast(teleport))
            .select(
                "node",
                (
                    F.when(is_seed, F.col("__tp_seed"))
                    .otherwise(F.lit(0))
                    + F.expr(f"({damp_num} * __in) div {damp_den}")
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks
