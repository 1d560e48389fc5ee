"""Scale stress for the graph ANN family: build the persisted k-NN
graph at the exact-topk harness cap (200k vectors — the documented
build-on-a-routing-sample posture), then SERVE a bounded query batch
from the frozen artifacts and measure both walls separately. The
serving number is the one that matters at 100 TB: per query per hop
the frontier is <= beam * n_neighbors rows, each one dot fold — a
bounded graph walk, independent of corpus growth once the graph is
built. Recall is scored against the exact truth of the query sample.

Usage: python tools/scale_stress_anngraph.py [n_corpus] [n_queries]
           [regime] [mode]
``mode`` = "flat" (round-7 single-layer walk), "hier" (round-8
HNSW-class layered descent — the fix for the flat walk's
diameter-limited recall at 200k: 0.75 with hops=12), or "insert"
(round-9 insertion-built graph — same layered serve, construction by
batched layered-search insertion with NO exact-kNN kernel past the
bootstrap, so it runs at corpus sizes where "hier"/"flat" raise on the
200k harness cap; the 1M row is the build-scale evidence).

Past the 200k cap the exact truth switches from the collected-matrix
kernel to a DISTRIBUTED join + window over the query sample — bounded
by n_queries * n_corpus scored rows, never a corpus collect.
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


def _manifold_embeddings(spark, n: int, dim: int = 64, latent: int = 4):
    """Intrinsic-low-dim corpus: 4 latent coords per row (integer-mix
    uniforms) pushed through a fixed random-ish linear map to 64-dim.
    Nearest neighbors in 64-dim = nearest in the 4-dim latent, so the
    k-NN graph is navigable — the structure real embeddings carry."""
    from pyspark.sql import functions as F

    t = [
        ((F.col("id") * F.lit(2654435761 + 97 * a) + F.lit(12345 + a))
         % F.lit(1000003)).cast("double") / F.lit(1000003.0)
        for a in range(latent)
    ]
    coeff = [
        [(((d * (40503 + a) + 7 * a + d) * 2246822519) % 2000001
          - 1000000) / 1e6
         for a in range(latent)]
        for d in range(dim)
    ]
    vec = F.array(*[
        sum((t[a] * F.lit(coeff[d][a]) for a in range(1, latent)),
            t[0] * F.lit(coeff[d][0]))
        for d in range(dim)
    ])
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.ann_index import (
        ann_graph_search,
        ann_graph_search_layered,
        build_knn_graph,
        build_knn_graph_insert,
    )
    from apde_etl_spark.plans.catalog_r3 import clustered_embeddings
    from apde_etl_spark.session import get_spark

    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    regime = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    mode = sys.argv[4] if len(sys.argv) > 4 else "flat"
    # insert-mode builds checkpoint per-round beam/adjacency state; the
    # 8g default heap OOMed at the 200k build (blocks + execution
    # spikes share one local-mode JVM). Default the heap to ~40% of
    # MemAvailable, capped at 48g (round-9 ADVICE #3: a flat 48g
    # default fails JVM startup on smaller hosts); override with
    # SPARK_GRAFT_DRIVER_MEM=<n>g.
    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        avail_gib = 16
        try:
            with open("/proc/meminfo") as fh:
                for line in fh:
                    if line.startswith("MemAvailable:"):
                        avail_gib = int(line.split()[1]) // (1024 * 1024)
                        break
        except OSError:
            pass
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = (
            f"{max(4, min(48, avail_gib * 2 // 5))}g")
    spark = get_spark("scale-stress-anngraph")

    # Three regimes, because they split the index families:
    # - "manifold" (4-dim latent coords, linear 64-dim embedding):
    #   intrinsic-low-dimension data — what real embedding models emit
    #   and the premise of every navigable-graph index. Graph search's
    #   home regime.
    # - "uniform" (i.i.d. 64-dim): NO navigable structure —
    #   concentration of measure flattens the cosine landscape, greedy
    #   guidance has nothing to follow (measured recall 0.02 at 200k
    #   even at beam=32/hops=8). The documented adversarial case.
    # - "clustered" (32 tight clusters): DISCONNECTED k-NN graph +
    #   near-equidistant intra-cluster members (measured 0.011 with
    #   128 stratified entries) — IVF/IVFPQ's home turf, whose cells
    #   ARE the clusters (>=0.9 in-gate).
    if regime == "manifold":
        emb = _manifold_embeddings(spark, n_corpus).persist()
    else:
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
        n_batches = None
        t0 = time.perf_counter()
        if mode == "hier":
            # 4 factor-8 layers at 200k → top layer ~49 nodes; the
            # upper-layer k-NN builds are over n/8, n/64, ... nodes —
            # marginal next to the layer-0 exact-kNN cost
            build_knn_graph(emb, d, n_neighbors=12, n_entries=128,
                            n_long_links=3, n_layers=4, layer_factor=8,
                            layer_neighbors=12)
        elif mode == "insert":
            # stored layer-0 degree 24 = 2x the exact build's 12 (the
            # maxM0 = 2M convention — see build_knn_graph_insert); no
            # exact-kNN kernel, so this arm runs past the 200k cap.
            # Knobs env-overridable for sweeps (SPARK_GRAFT_INS_*).
            def _k(name: str, dflt: int) -> int:
                return int(os.environ.get(f"SPARK_GRAFT_INS_{name}", dflt))

            meta = build_knn_graph_insert(
                emb, d, n_neighbors=_k("M0", 24), n_entries=128,
                n_long_links=3, n_layers=4, layer_factor=8,
                layer_neighbors=12, boot_rows=_k("BOOT", 1024),
                descend_beam=_k("DBEAM", 12),
                hops_per_layer=_k("HPL", 1),
                insert_beam=_k("BEAM", 24), insert_hops=_k("HOPS", 3),
                refresh_passes=_k("RPASS", 2),
                refresh_hops=_k("RHOPS", 3),
                refresh_beam=_k("RBEAM", 32))
            n_batches = meta["n_batches"]
        else:
            build_knn_graph(emb, d, n_neighbors=12, n_entries=128,
                            n_long_links=3)
        build_wall = time.perf_counter() - t0

        stride = max(1, n_corpus // n_queries)
        queries = emb.filter(F.col("vec_id") % stride == 0)
        nq = queries.count()
        t0 = time.perf_counter()
        if mode in ("hier", "insert"):
            approx = ann_graph_search_layered(
                spark, d, queries, emb, k=5, beam=48, hops=8,
                descend_beam=16, hops_per_layer=2)
        else:
            approx = ann_graph_search(
                spark, d, queries, emb, k=5, beam=48, hops=12)
        n_results = approx.count()
        serve_wall = time.perf_counter() - t0

        # exact truth over the query sample only: the collected-matrix
        # kernel below the 200k cap, a distributed join + window past it
        # (n_queries * n_corpus scored rows — bounded by the sample,
        # never a corpus collect)
        from apde_etl_spark.operators.similarity import (
            EXACT_TOPK_MAX_ROWS,
            dot,
            exact_topk_pairs,
            l2_norm,
        )

        t0 = time.perf_counter()
        if n_corpus <= EXACT_TOPK_MAX_ROWS:
            truth = exact_topk_pairs(
                emb, "vec_id", "embedding", k=5,
                query_filter=F.col("vec_id") % stride == 0)
        else:
            from pyspark.sql import Window

            qv = queries.select(
                F.col("vec_id").alias("id_a"),
                F.col("embedding").alias("__qv"),
            ).withColumn("__qn", l2_norm(F.col("__qv")))
            cv = emb.select(
                F.col("vec_id").alias("id_b"),
                F.col("embedding").alias("__cv"),
            ).withColumn("__cn", l2_norm(F.col("__cv")))
            w = Window.partitionBy("id_a").orderBy(
                F.desc("__cos"), F.asc("id_b"))
            truth = (
                cv.crossJoin(F.broadcast(qv))
                .filter(F.col("id_a") != F.col("id_b"))
                .select(
                    "id_a", "id_b",
                    (dot(F.col("__cv"), F.col("__qv"))
                     / (F.col("__cn") * F.col("__qn"))).alias("__cos"))
                .withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= 5)
                .select("id_a", "id_b")
            )
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
            "mode": mode,
            "n_corpus": n_corpus,
            "n_batches": n_batches,
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
