"""Scale stress for the integer-PageRank family: synthesize a graph
orders of magnitude past the testdata and time the 5-iteration ranks,
checking the claimed posture — per iteration ONE join + ONE groupBy on
the node id, cost linear in |E|.

Graph model: power-law-ish bipartite co-purchase (hot suppliers exist,
as in the real graph): per edge, customer from a uniform hash, supplier
from a quadratic-fold hash (mass concentrates on low ids). Generated in
place with Spark expressions — no driver loops.

Usage: python tools/scale_stress_graph.py [n_edges ...]
Prints one JSON line per size; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.graph import pagerank_integer
    from apde_etl_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 20_000_000]
    spark = get_spark("scale-stress-graph")

    for n_edges in sizes:
        n_cust = max(1000, n_edges // 40)
        n_supp = max(100, n_edges // 4000)
        e0 = (
            spark.range(n_edges)
            .withColumn("hc", F.abs(F.xxhash64(F.col("id"))))
            .withColumn("hs", F.abs(F.xxhash64(F.col("id"), F.lit(3))))
            .select(
                (F.col("hc") % n_cust * 2).alias("c"),
                # quadratic fold -> hot suppliers (power-law-ish)
                ((F.col("hs") % n_supp) * (F.col("hs") % n_supp) % n_supp * 2
                 + 1).alias("s"),
            )
            .distinct()
        )
        edges = (
            e0.selectExpr("c AS src", "s AS dst")
            .unionAll(e0.selectExpr("s AS src", "c AS dst"))
            .persist()
        )
        m = edges.count()  # materialize outside the timed window
        t0 = time.time()
        pr = pagerank_integer(edges, iters=5)
        top = pr.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(5)
        rows = top.collect()
        wall = time.time() - t0
        # determinism probe: a second run must reproduce bit-identical ranks
        again = (
            pagerank_integer(edges.repartition(64), iters=5)
            .orderBy(F.col("rank").desc(), F.col("node").asc()).limit(5)
            .collect()
        )
        assert [(r["node"], r["rank"]) for r in rows] == [
            (r["node"], r["rank"]) for r in again
        ], "integer PageRank must be partitioning-invariant"
        print(json.dumps({
            "tool": "scale_stress_graph",
            "n_edges_requested": n_edges,
            "n_directed_edges": m,
            "pagerank_5iter_sec": round(wall, 1),
            "top_node": rows[0]["node"],
            "top_rank": rows[0]["rank"],
            "loadavg": round(os.getloadavg()[0], 2),
        }))
        edges.unpersist()


if __name__ == "__main__":
    main()
