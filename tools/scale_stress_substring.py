"""Scale stress for exact substring dedup
(operators/text.py:remove_duplicated_substrings): synthesize corpora
orders of magnitude past the testdata and time the full
spans -> covered -> anti-join -> re-assembly pipeline, checking the
claimed posture — cost linear in corpus token count (the k-gram
explode), no quadratic path, hot boilerplate grams absorbed map-side.

Corpus model: ~40 random-vocab tokens per doc (xxhash64-derived, no
driver loop); 10% of docs get a fixed 12-token boilerplate phrase
appended (the duplicated material a real crawl carries), plus id-pair
near-dups every 97th doc sharing a 16-token prefix.

Usage: python tools/scale_stress_substring.py [--stats] [n_docs ...]
Prints one JSON line per size; paste into BASELINE.md. ``--stats``
adds the interval-union memory envelope: total marked spans and the
max/p99 spans per doc — the per-group state the interval-merge
aggregation holds, i.e. the quantity that must stay bounded for the
stage to be spill-safe at any corpus size (it is bounded by tokens
per doc, not by corpus size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.text import remove_duplicated_substrings
    from apde_etl_spark.session import get_spark

    args = sys.argv[1:]
    want_stats = "--stats" in args
    sizes = [int(a) for a in args if a != "--stats"] or [100_000, 1_000_000]
    spark = get_spark("scale-stress-substring")

    boiler = " ".join(f"bp{i}" for i in range(12))
    for n_docs in sizes:
        body = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("w"),
                    (F.abs(F.xxhash64(F.col("id"), i)) % 5000).cast("string"),
                ),
            ),
            " ",
        )
        # every 97th doc shares a 16-token prefix with its neighbor pair
        # (id div 2 seeds the prefix) — the near-dup channel
        prefix = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: F.concat(
                    F.lit("p"),
                    (F.abs(F.xxhash64((F.col("id") / 194).cast("long"), i))
                     % 999983).cast("string"),
                ),
            ),
            " ",
        )
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.when(F.col("id") % 97 < 2, prefix).otherwise(F.lit("")),
                body,
                F.when(F.col("id") % 10 == 0, F.lit(boiler)).otherwise(
                    F.lit("")),
            ).alias("text"),
        ).persist()
        docs.count()  # materialize outside the timed window
        t0 = time.time()
        out = remove_duplicated_substrings(docs, k=8, min_count=2)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_removed").alias("removed"),
            F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias(
                "docs_touched"),
        ).collect()[0]
        wall = time.time() - t0
        rec = {
            "tool": "scale_stress_substring",
            "n_docs": n_docs,
            "dedup_sec": round(wall, 1),
            "docs_touched": int(agg["docs_touched"]),
            "tokens_removed": int(agg["removed"]),
            "loadavg": round(os.getloadavg()[0], 2),
        }
        if want_stats:
            # interval-union memory envelope: the merge aggregates each
            # doc's marked spans in one group — per-doc span count IS
            # the per-group state bound (it cannot exceed tokens/doc,
            # so it is corpus-size-invariant; this records the measured
            # ceiling)
            from apde_etl_spark.operators.text import (
                duplicated_substring_spans,
            )

            spans = duplicated_substring_spans(docs, k=8, min_count=2)
            per_doc = spans.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("c"))
            st = per_doc.agg(
                F.sum("c").alias("n_spans"),
                F.max("c").alias("max_spans_per_doc"),
                F.expr("percentile_approx(c, 0.99)").alias("p99_spans"),
            ).collect()[0]
            rec.update({
                "n_spans": int(st["n_spans"] or 0),
                "max_spans_per_doc": int(st["max_spans_per_doc"] or 0),
                "p99_spans_per_doc": int(st["p99_spans"] or 0),
            })
        print(json.dumps(rec))
        docs.unpersist()


if __name__ == "__main__":
    main()
