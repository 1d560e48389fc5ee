"""Scale stress for the graph ANN family: build the persisted k-NN
graph at the exact-topk harness cap (200k vectors — the documented
build-on-a-routing-sample posture), then SERVE a bounded query batch
from the frozen artifacts and measure both walls separately. The
serving number is the one that matters at 100 TB: per query per hop
the frontier is <= beam * n_neighbors rows, each one dot fold — a
bounded graph walk, independent of corpus growth once the graph is
built. Recall is scored against the exact truth of the query sample.

Usage: python tools/scale_stress_anngraph.py [n_corpus] [n_queries]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.ann_index import (
        ann_graph_search,
        build_knn_graph,
    )
    from apde_etl_spark.plans.catalog_r3 import clustered_embeddings
    from apde_etl_spark.session import get_spark

    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    regime = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    spark = get_spark("scale-stress-anngraph")

    # Two regimes, because they split the index families: "uniform"
    # (n_clusters = n -> every vector its own center; spread cosine
    # landscape) is the NAVIGABLE regime where graph search shines;
    # "clustered" (32 tight clusters) is DEGENERATE for graph walks —
    # intra-cluster members are near-equidistant to any query (the
    # center dominates every cosine), so greedy guidance has no
    # gradient and recall collapses regardless of entry coverage
    # (measured 0.011 even with 128 stratified entries). That regime
    # belongs to IVF/IVFPQ, whose cells ARE the clusters — the
    # documented pick-the-index-per-regime split.
    n_clusters = n_corpus if regime == "uniform" else 32
    emb = clustered_embeddings(
        spark, n=n_corpus, n_clusters=n_clusters).persist()
    emb.count()

    d = tempfile.mkdtemp(prefix="apde_anngraph_stress_")
    try:
        # 128 hash-stratified entries: with 32 clusters the exact k-NN
        # graph is disconnected across them, so entry coverage IS the
        # recall ceiling (e^-4 ~ 2% clusters uncovered at 128 draws);
        # measured 0.001 recall with ONE entry at this same scale
        t0 = time.perf_counter()
        build_knn_graph(emb, d, n_neighbors=8, n_entries=128)
        build_wall = time.perf_counter() - t0

        stride = max(1, n_corpus // n_queries)
        queries = emb.filter(F.col("vec_id") % stride == 0)
        nq = queries.count()
        t0 = time.perf_counter()
        approx = ann_graph_search(
            spark, d, queries, emb, k=5, beam=32, hops=8)
        n_results = approx.count()
        serve_wall = time.perf_counter() - t0

        # exact truth over the query sample only (queries x corpus via
        # the same batched matmul shape the harness uses elsewhere)
        from apde_etl_spark.operators.similarity import exact_topk_pairs

        t0 = time.perf_counter()
        truth = exact_topk_pairs(
            emb, "vec_id", "embedding", k=5,
            query_filter=F.col("vec_id") % stride == 0)
        hits = (
            approx.select(F.col("query_id").alias("id_a"),
                          F.col("vec_id").alias("id_b"))
            .join(truth, ["id_a", "id_b"]).count()
        )
        n_truth = truth.count()
        truth_wall = time.perf_counter() - t0

        print(json.dumps({
            "tool": "scale_stress_anngraph",
            "regime": regime,
            "n_corpus": n_corpus,
            "n_queries": nq,
            "build_wall_sec": round(build_wall, 2),
            "serve_wall_sec": round(serve_wall, 2),
            "truth_wall_sec": round(truth_wall, 2),
            "n_results": n_results,
            "recall_at_5": round(hits / n_truth, 4) if n_truth else None,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
