"""Scale stress for the frontier-loop BFS (round-6 family).

Measures min-hop BFS over synthetic preferential-attachment-ish edge
lists at N and 10N edges (4 hops, fixed seed set), reporting wall and
reached-node counts. The claim under test: each level is ONE
frontier×edges join + one anti-join against visited, so wall tracks
the touched-edge count — never the path count, which on these dense
graphs grows multiplicatively and is what a naive recursive UNION ALL
enumeration would pay.

Edges are generated deterministically (hash-derived endpoints, heavy
right-skew so hubs exist — the frontier hits most of the graph by hop
2, the worst case for the visited anti-join).

Usage: python tools/scale_stress_bfs.py [n_edges]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.graph import bfs_min_hop
    from apde_etl_spark.session import get_spark

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("scale-stress-bfs")
    out: dict[str, object] = {"n_edges": n_edges}

    for label, n in (("n", n_edges), ("10n", 10 * n_edges)):
        n_nodes = n // 8
        e = spark.range(n).select(
            F.pmod(F.hash(F.col("id") * 7919), n_nodes).alias("src"),
            # right-skewed destinations: hubs get a large in-degree
            F.pmod(
                F.hash(F.col("id") * 104729),
                F.greatest(F.pmod(F.hash(F.col("id")), n_nodes),
                           F.lit(64))).alias("dst"),
        ).localCheckpoint(eager=True)
        seeds = e.select("src").filter(F.col("src") % 997 == 0).distinct()
        t0 = time.perf_counter()
        reached = bfs_min_hop(e, seeds, max_hops=4).count()
        out[f"bfs_{label}_s"] = round(time.perf_counter() - t0, 2)
        out[f"reached_{label}"] = reached
    out["ratio_10x"] = round(
        out["bfs_10n_s"] / max(out["bfs_n_s"], 1e-9), 2)  # type: ignore
    out["loadavg"] = os.getloadavg()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
