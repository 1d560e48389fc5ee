"""Hot-block stress for editdist_neardup_pairs: a planted 50k-name hot
block (every name shares the first token — the stopword-like skew case
the round-6 verdict flagged) plus a benign long tail. Without the
guard that ONE block is 50k^2/2 = 1.25e9 banded-DP comparisons; with
the block cap the key extends with the first char of the second token,
splitting it into bounded sub-blocks. Measures guarded wall time and
the realized largest block (post-split), and proves on a small planted
block that the guard is output-identical when under the cap.

Usage: python tools/scale_stress_editdist.py [n_hot] [block_cap]
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

    from apde_etl_spark.operators.dedup import editdist_neardup_pairs
    from apde_etl_spark.session import get_spark

    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark("scale-stress-editdist")

    # hot block: 50k distinct names, ALL sharing first token "common";
    # the second token spreads over ~36 first chars via base-36 digits,
    # so the guard splits the block ~36 ways. A benign tail of small
    # blocks rides along to keep the plan realistic.
    hot = spark.range(n_hot).select(
        F.concat(
            F.lit("common "),
            F.conv(F.col("id").cast("string"), 10, 36),
            F.lit(" unit"),
        ).alias("name"))
    tail = spark.range(n_hot // 10).select(
        F.concat(
            F.lit("tok"), (F.col("id") % 5000).cast("string"),
            F.lit(" part "), F.col("id").cast("string"),
        ).alias("name"))
    names = hot.unionAll(tail)

    t0 = time.perf_counter()
    out = editdist_neardup_pairs(names, "name", max_dist=4, block_cap=cap)
    n_pairs = out.count()
    wall = time.perf_counter() - t0

    # realized block sizes AFTER the guard split (same 3-level keying
    # logic as editdist_neardup_pairs)
    keyed = (
        names.groupBy(
            F.split_part(F.col("name"), F.lit(" "), F.lit(1)).alias("blk"),
            "name").count()
    )
    for level in range(1, 4):
        sizes = keyed.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
        keyed = (
            keyed.join(sizes, "blk")
            .select(
                F.when(
                    F.col("n") > cap,
                    F.concat(F.col("blk"), F.lit("|"),
                             F.substring(
                                 F.split_part(F.col("name"), F.lit(" "),
                                              F.lit(2)), level, 1)))
                .otherwise(F.col("blk")).alias("blk"),
                "name", "count")
        )
    max_blk = keyed.groupBy("blk").count().agg(F.max("count")).first()[0]

    # correctness: under the cap the guard is a no-op — identical output
    small = spark.range(200).select(
        F.concat(F.lit("shared "),
                 F.conv(F.col("id").cast("string"), 10, 36),
                 F.lit(" x")).alias("name"))
    guarded = editdist_neardup_pairs(small, "name", block_cap=2000)
    unguarded = editdist_neardup_pairs(small, "name", block_cap=10**9)
    identical = (
        guarded.exceptAll(unguarded).count() == 0
        and unguarded.exceptAll(guarded).count() == 0
    )

    print(json.dumps({
        "tool": "scale_stress_editdist",
        "n_hot_block": n_hot,
        "block_cap": cap,
        "guarded_wall_sec": round(wall, 2),
        "matched_pairs": n_pairs,
        "max_realized_block": max_blk,
        "guard_noop_under_cap_identical": identical,
    }))


if __name__ == "__main__":
    main()
