"""Integer PageRank tests (operators/graph.py).

The oracle gate (catalog_r5d) proves 5-iteration engine parity on the
co-purchase graph; these tests pin the semantics on graphs small enough
to reason about: symmetry, mass concentration, teleport floor,
dangling-mass rule, and validation.
"""

from __future__ import annotations

import pytest

from apde_etl_spark.operators.graph import SCALE, degree_table, pagerank_integer


def _undirected(spark, pairs):
    e = spark.createDataFrame(pairs, "a long, b long")
    return e.selectExpr("a AS src", "b AS dst").unionAll(
        e.selectExpr("b AS src", "a AS dst")
    )


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_symmetric_graph_equal_ranks(spark):
    # triangle: all nodes equivalent -> identical integer ranks
    edges = _undirected(spark, [(1, 2), (2, 3), (3, 1)])
    r = _ranks(pagerank_integer(edges, iters=4))
    assert len(set(r.values())) == 1
    # symmetric fixed point: each node keeps ~SCALE/3 (minus truncation)
    assert abs(next(iter(r.values())) - SCALE // 3) < 10**7


def test_star_center_dominates(spark):
    edges = _undirected(spark, [(0, i) for i in range(1, 6)])
    r = _ranks(pagerank_integer(edges, iters=5))
    center, leaves = r[0], [r[i] for i in range(1, 6)]
    assert all(center > leaf for leaf in leaves)
    assert len(set(leaves)) == 1  # leaves are symmetric


def test_teleport_floor_on_directed_source(spark):
    # 1 -> 2 only: node 1 never receives mass, keeps the bare teleport
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    one_way = spark.createDataFrame([(1, 2)], "src long, dst long")
    r2 = _ranks(pagerank_integer(edges, iters=3))
    assert r2[1] == r2[2]  # 2-cycle is symmetric
    # directed edge with a sink: universe = out-degree nodes only {1}
    r1 = _ranks(pagerank_integer(one_way, iters=3))
    assert set(r1) == {1}
    teleport = (15 * SCALE) // (100 * 1)
    assert r1[1] == teleport  # sink swallowed the damped mass


def test_ranks_are_deterministic_across_runs(spark):
    edges = _undirected(
        spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    a = _ranks(pagerank_integer(edges, iters=5))
    b = _ranks(pagerank_integer(edges.repartition(7), iters=5))
    assert a == b  # integer arithmetic: partitioning cannot change bits


def test_degree_table(spark):
    edges = _undirected(spark, [(1, 2), (1, 3)])
    d = {r["node"]: r["deg"] for r in degree_table(edges).collect()}
    assert d == {1: 2, 2: 1, 3: 1}


def test_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_integer(edges, iters=0)
    with pytest.raises(ValueError):
        pagerank_integer(edges, damp_num=100, damp_den=100)


def test_personalized_pagerank_seeds_dominate(spark):
    from pyspark.sql import functions as F

    # path graph 1-2-3-4-5, seed {1}. Strict per-hop decay is NOT a
    # theorem on a bipartite path (mass oscillates between parity
    # classes), so assert the robust structure: the seed dominates,
    # the seed-side half holds more mass than the far half, and the
    # far end still receives propagated (teleport-free) mass.
    edges = _undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    r = _ranks(pagerank_integer(
        edges, iters=8, seed_pred=F.col("node") == 1))
    assert r[1] == max(r.values())
    assert r[1] + r[2] > r[4] + r[5]
    assert r[5] > 0


def test_personalized_pagerank_far_nodes_zero(spark):
    from pyspark.sql import functions as F

    # two disconnected components; seed in one -> other stays at 0
    edges = _undirected(spark, [(1, 2), (10, 11)])
    r = _ranks(pagerank_integer(
        edges, iters=4, seed_pred=F.col("node") <= 2))
    assert r[10] == 0 and r[11] == 0
    assert r[1] > 0 and r[2] > 0
