"""Scale stress for Z-order clustering in write_analytic_table.

Writes the same N-row lineitem-derived table twice — Morton-interleaved
(zorder=True) and lexicographic (the round-4 cluster_by) — and measures:

- write wall for each (the clustering overhead a 100 TB compaction job
  pays is ONE extra projected column + the same range partitioning);
- parquet row-group min/max overlap for a 10%-of-domain predicate on
  EACH clustered key (the fraction a pruning reader must touch);
- runtime scan output rows for the same predicates (actual skipping).

Usage: python tools/scale_stress_zorder.py [n_copies]
(default 10 -> ~6M rows from the sf0.1 lineitem). Prints one JSON line;
paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rg_overlap(path: str, col: str, thr) -> tuple[int, int]:
    import pyarrow.parquet as pq

    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min <= thr:
                touched += 1
    return touched, total


def scan_rows(spark, df) -> int:
    """numOutputRows of the leaf scan after executing df (AQE off for a
    stable leaf traversal; collect() populates metrics)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df.collect()
        node = df._jdf.queryExecution().executedPlan()
        while node.children().nonEmpty():
            node = node.children().head()
        return int(node.metrics().apply("numOutputRows").value())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.session import get_spark
    from apde_etl_spark.sources.lifecycle import write_analytic_table

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-stress-zorder")
    work = tempfile.mkdtemp(prefix="scale_stress_z_")
    out: dict[str, object] = {"n_copies": n_copies}

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    max_o = li.agg(F.max("l_orderkey")).first()[0]
    max_p = li.agg(F.max("l_partkey")).first()[0]
    # shift keys per copy so the key domain grows with the data (10x the
    # rows in the SAME domain would just deepen, not widen, each bucket)
    big = spark.range(n_copies).crossJoin(li).select(
        (F.col("l_orderkey") + F.col("id") * (max_o + 1)).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("id") * (max_p + 1)).alias("l_partkey"),
        "l_quantity",
    )
    n_rows = big.count()
    out["n_rows"] = n_rows

    opts = {"parquet.block.size": 1 << 20}
    paths = {}
    for mode, z in (("zorder", True), ("lex", False)):
        p = paths[mode] = f"{work}/{mode}"
        t0 = time.perf_counter()
        write_analytic_table(big, p, cluster_by=["l_orderkey", "l_partkey"],
                             zorder=z, target_file_rows=500_000,
                             writer_options=opts)
        out[f"write_{mode}_s"] = round(time.perf_counter() - t0, 2)

    thr_o = (max_o + 1) * n_copies // 10
    thr_p = (max_p + 1) * n_copies // 10
    for mode, p in paths.items():
        for col, thr in (("l_orderkey", thr_o), ("l_partkey", thr_p)):
            touched, total = rg_overlap(p, col, thr)
            out[f"{mode}_{col}_rg"] = f"{touched}/{total}"
        back = spark.read.parquet(p)
        for col, thr in (("l_orderkey", thr_o), ("l_partkey", thr_p)):
            probe = back.filter(F.col(col) <= thr).select(F.sum("l_quantity"))
            out[f"{mode}_{col}_scan_rows"] = scan_rows(spark, probe)

    print(json.dumps(out))
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
