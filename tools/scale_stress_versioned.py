"""Scale stress for the versioned-table lifecycle: a 10M-row target
table, a 1% update + 0.1% insert + 0.1% delete MERGE batch (the
realistic nightly shape), then compaction of a 512-file fragmented
layout. Measures merge wall, compaction wall, and verifies row
accounting exactly — the numbers that say the maintenance jobs stay
bounded as the table grows (the merge is one full-outer join where
AQE broadcasts the small batch; the compaction is one shuffle-write).

Usage: python tools/scale_stress_versioned.py [n_rows]
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

    from apde_etl_spark.sources.lifecycle import (
        compact_table,
        data_file_count,
        merge_into_versioned,
        read_version,
        versioned_write,
    )
    from apde_etl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-stress-versioned")

    root = tempfile.mkdtemp(prefix="apde_versioned_stress_")
    table = f"{root}/t"
    try:
        base = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
            F.conv((F.col("id") % 97).cast("string"), 10, 36).alias("tag"),
        )
        t0 = time.perf_counter()
        versioned_write(base, table, n_files=512)
        write_wall = time.perf_counter() - t0
        assert data_file_count(table, 1) == 512

        # compact the FRAGMENTED snapshot first (v=1 512 files -> v=2
        # 32), so the measurement is the streaming-ingest-aftermath
        # rewrite, not a re-write of an already-sane layout
        t0 = time.perf_counter()
        _, before, after = compact_table(spark, table, 32)
        compact_wall = time.perf_counter() - t0
        assert (before, after) == (512, 32)
        assert read_version(spark, table, 2).count() == n

        updates = spark.range(0, n, 100).select(      # 1% updated
            F.col("id").alias("k"),
            F.lit(-1.0).alias("v"), F.lit("upd").alias("tag"),
        ).unionAll(spark.range(n, n + n // 1000).select(  # 0.1% inserted
            F.col("id").alias("k"),
            F.lit(0.0).alias("v"), F.lit("new").alias("tag"),
        ))
        deletes = spark.range(0, n, 1000).select(F.col("id").alias("k"))
        t0 = time.perf_counter()
        merge_into_versioned(spark, table, updates, "k", ["v", "tag"],
                             deletes=deletes)
        merge_wall = time.perf_counter() - t0
        v2_rows = read_version(spark, table, 3).count()
        expected = n + n // 1000 - len(range(0, n, 1000))
        assert v2_rows == expected, (v2_rows, expected)

        print(json.dumps({
            "tool": "scale_stress_versioned",
            "n_rows": n,
            "fragmented_write_wall_sec": round(write_wall, 2),
            "merge_wall_sec": round(merge_wall, 2),
            "compact_wall_sec": round(compact_wall, 2),
            "files_before": before,
            "files_after": after,
            "v2_rows": v2_rows,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
