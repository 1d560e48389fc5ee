"""SimHash band-bucket census: the width argument, measured.

For a dup-heavy synthetic corpus (scale_stress.gen_documents: 1% exact
+ 0.5% near dups), compares fingerprint widths by the numbers that
decide whether banded self-join survives corpus growth:

- max / p99 bucket size per (band, slice-value) key, and
- total candidate pairs = sum over buckets of C(size, 2)

at bits=16 (4-bit slices, 16 values/band), bits=32 (8-bit slices, 256
values/band) and bits=64 (16-bit slices, 65536 values/band). Narrow
prints collapse distinct documents into the same slice value, so
candidates grow ~n^2/values; 64-bit keeps buckets near the dup groups
themselves. Prints one JSON line; paste into BASELINE.md.

Usage: python tools/simhash_bucket_stats.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F
    from scale_stress import gen_documents

    import apde_etl_spark.operators.similarity as SIM
    from apde_etl_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    spark = get_spark("simhash-bucket-stats")
    work = tempfile.mkdtemp(prefix="simhash_stats_")
    gen_documents(spark, n_docs, f"{work}/documents.parquet")
    docs = spark.read.parquet(f"{work}/documents.parquet")
    n_total = docs.count()

    out = {"n_docs": n_total, "bands": 4, "widths": {}}
    for bits in (16, 32, 64):
        rows = bits // 4
        mask = (1 << rows) - 1
        fp = SIM.simhash(docs, "doc_id", "text", bits=bits)
        slices = F.array(*[
            F.concat_ws(
                ":", F.lit(str(j)),
                (F.shiftright(F.col("simhash"), j * rows)
                 .bitwiseAND(F.lit(mask))).cast("string"),
            )
            for j in range(4)
        ])
        buckets = (
            fp.select(F.explode(slices).alias("band"))
            .groupBy("band").agg(F.count(F.lit(1)).alias("sz"))
        )
        stats = buckets.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket"),
            F.expr("percentile_approx(sz, 0.99)").alias("p99_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("cand_pairs"),
        ).first()
        out["widths"][bits] = {
            "slice_bits": rows,
            "n_buckets": stats["n_buckets"],
            "max_bucket": stats["max_bucket"],
            "p99_bucket": int(stats["p99_bucket"]),
            "candidate_pairs": int(stats["cand_pairs"]),
        }
    print(json.dumps(out))

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
