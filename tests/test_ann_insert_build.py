"""Insertion-built HNSW (round 9): artifact contract + recall floor.

The insert build (operators/ann_index.py:build_knn_graph_insert) must
(a) land in the exact-build artifact layout so the unchanged layered
serve reads it, (b) respect its degree bounds, and (c) not pay the
gate-free construction with recall — the floor here pins the sf-gate
measurement (insert-built 1.0 / 0.914 at sf0.01 / sf0.1 vs exact-built
1.0 / 0.886); the 200k-point comparison lives in
tools/scale_stress_anngraph.py --mode insert.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.operators.ann_index import (
    ann_graph_search_layered,
    build_knn_graph_insert,
)
from apde_etl_spark.operators.similarity import exact_topk_pairs


@pytest.fixture(scope="module")
def ins_index(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = tempfile.mkdtemp(prefix="apde_test_hnswins_")
    meta = build_knn_graph_insert(
        emb, d, n_neighbors=16, n_entries=16, n_long_links=2,
        n_layers=2, layer_factor=8, layer_neighbors=4, boot_rows=128,
        descend_beam=8, hops_per_layer=1, insert_beam=16, insert_hops=3,
        refresh_passes=1, refresh_hops=3, refresh_beam=16)
    yield emb, d, meta
    shutil.rmtree(d, ignore_errors=True)


def test_artifact_layout_and_degree_bounds(spark, ins_index):
    emb, d, meta = ins_index
    n = emb.count()
    assert meta["n_batches"] >= 1  # 500 rows / boot 128 -> 2 batches
    graph = spark.read.parquet(f"{d}/graph")
    # k-NN rows rank 1..16, long links 17..18; per-src degree bounded
    deg = graph.filter(F.col("rank") <= 16).groupBy("src").count()
    assert deg.agg(F.max("count")).first()[0] <= 16
    assert graph.agg(F.max("rank")).first()[0] <= 18
    # every edge endpoint is a corpus node
    ids = emb.select(F.col("vec_id").cast("long").alias("dst"))
    assert graph.join(ids, "dst", "left_anti").count() == 0
    upper = spark.read.parquet(f"{d}/graph_upper")
    assert upper.groupBy("layer", "src").count() \
        .agg(F.max("count")).first()[0] <= 4
    lm = spark.read.parquet(f"{d}/layer_meta").first()
    assert (lm["n_layers"], lm["layer_factor"]) == (2, 8)
    assert spark.read.parquet(f"{d}/graph_meta").count() == min(16, n)


def test_insertbuilt_recall_floor(spark, ins_index):
    emb, d, _ = ins_index
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    approx = ann_graph_search_layered(
        spark, d, queries, emb, k=5, beam=10, hops=3,
        descend_beam=8, hops_per_layer=2,
    ).select(F.col("query_id").alias("id_a"),
             F.col("vec_id").alias("id_b"))
    truth = exact_topk_pairs(
        emb, "vec_id", "embedding", k=5,
        query_filter=F.col("vec_id") % 97 == 0)
    n_exact = truth.count()
    hits = approx.join(truth, ["id_a", "id_b"]).count()
    # exact-built recall is 1.0 at this corpus; the gate-free build
    # must stay within 5% of it (measured: 1.0)
    assert hits / n_exact >= 0.95
