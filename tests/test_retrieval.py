"""Unit tests for the sparse + hybrid retrieval family (round-6e)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apde_etl_spark.plans import catalog_r6e as C


def test_bm25_known_corpus_ranks_heavier_doc_first(spark, tmp_path):
    rows = [
        (1, "hash join hash join hash scan filter"),   # dense in query
        (2, "hash morning coffee and a quiet walk"),   # one hit
        (3, "no relevant words at all here today"),    # zero hits
        (4, "join scan join scan hash hash hash pad"),  # densest
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    out = C.bm25_search_topk(spark, d).orderBy("rank").collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids                       # no-hit doc never scored
    assert ids[0] in (1, 4)                   # a dense doc leads
    assert ids.index(2) == len(ids) - 1       # single-hit doc ranks last
    # ranks dense 1..n, scores non-increasing
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_plan_filters_before_shuffle_and_topk(spark, sf_dir):
    df = C.bm25_search_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the query-term membership predicate must sit under the first
    # aggregation (filter-before-shuffle), visible as a Filter on the
    # exploded column in the same stage as the Generate
    assert "Generate explode" in plan


def test_rrf_fusion_flags_and_bounds(spark, sf_dir):
    rows = C.hybrid_rrf_fusion(spark, sf_dir).collect()
    assert 0 < len(rows) <= C._RRF_TOPK
    for r in rows:
        assert r.in_sparse + r.in_dense >= 1
        # max possible contribution: rank 1 in both lists
        assert r.rrf_score <= 2 * round(1.0 / (C._RRF_C + 1), 9) + 1e-9
    # a doc in both lists must outrank a doc in one list at same ranks:
    # verified structurally — fused ordering is by score desc
    scores = [r.rrf_score for r in sorted(rows, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)


def test_rrf_query_doc_is_top_dense_hit(spark, sf_dir):
    # vec 0 has cosine 1.0 with itself -> dense rank 1, so doc 0 must
    # appear in the fused list unless 10 docs beat 1/(60+1)+...
    rows = {r.doc_id: r for r in
            C.hybrid_rrf_fusion(spark, sf_dir).collect()}
    assert C._RRF_QVEC_ID in rows
    assert rows[C._RRF_QVEC_ID].in_dense == 1


def test_bm25_phrase_known_corpus(spark, tmp_path):
    """Adjacency and window semantics on a planted corpus: only true
    adjacent 'hash join' counts as a phrase hit; 'scan ... sort' within
    the ±4 window counts as proximity; reversed-order phrase does not."""
    rows = [
        (1, "hash join hash join pad pad pad"),        # 2 phrase hits
        (2, "join hash pad pad pad pad pad"),          # reversed: 0
        (3, "scan pad pad sort pad pad pad"),          # prox within 4
        (4, "scan pad pad pad pad pad sort"),          # gap 6: no prox
        (5, "hash join scan sort pad pad pad"),        # both
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in C.bm25_phrase_topk(spark, d).collect()}
    assert 2 not in out and 4 not in out
    assert out[1].phrase_tf == 2 and out[1].prox_tf == 0
    assert out[3].prox_tf == 1 and out[3].phrase_tf == 0
    assert out[5].phrase_tf == 1 and out[5].prox_tf == 1
    # doc 5 matches both components -> outranks single-component docs
    assert out[5].rank == 1


def test_bm25_phrase_plan_filters_before_position_joins(spark, sf_dir):
    df = C.bm25_phrase_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # postings explode + vocabulary filter in the scan stage, position
    # joins keyed on doc_id (no cartesian), top-k without a global sort
    assert "Generate posexplode" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
