"""Order-higher scale stress for the NEWEST families (round-3 curation +
incremental ingest): 2M docs by default — 20x the standard stress point,
~130M tokens — exercising exactly the operators whose shuffle keys must
stay fixed-width and corpus-size-invariant:

- decontam_ngram_overlap  (full-md5 gram keys, left_semi)
- repeated_span_docs      (rolling-hash span mining)
- curation_pipeline_end2end (composed lazy DAG)
- incremental_ingest_dedup (digest anti-join + asymmetric band join;
  ~26% of the corpus re-arrives as the batch)
- boilerplate_segment_dedup (per-source segment frequency)

Reuses scale_stress.gen_documents (deterministic, generated in place —
no driver row loop). Lineitem/QA/ANN families are covered by the
standard tools/scale_stress.py point; this tool isolates the newest
code so the 2M point stays a ~15-minute run instead of hours.

Usage: python tools/scale_stress_curation.py [n_docs]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F
    from scale_stress import gen_documents

    from apde_etl_spark.operators.cache import release_scope
    from apde_etl_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("scale-stress-curation")
    work = tempfile.mkdtemp(prefix="scale_stress_cur_")
    t: dict[str, float] = {}

    t0 = time.perf_counter()
    gen_documents(spark, n_docs, f"{work}/documents.parquet")
    t["generate"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(f"{work}/documents.parquet")
    n_total = docs.count()
    n_tokens = docs.select(F.sum(F.size(F.split(F.trim("text"), r"\s+")))).first()[0]

    from apde_etl_spark.plans.catalog_r2 import boilerplate_segment_dedup
    from apde_etl_spark.plans.catalog_r3b import (
        curation_pipeline_end2end,
        decontam_ngram_overlap,
        incremental_ingest_dedup,
        repeated_span_docs,
    )

    t0 = time.perf_counter()
    n_decontam = decontam_ngram_overlap(spark, work).count()
    t["decontam_ngram"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_spans = repeated_span_docs(spark, work).count()
    t["repeated_spans"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_curated = curation_pipeline_end2end(spark, work).count()
    t["curation_pipeline_full"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_boiler = boilerplate_segment_dedup(spark, work).count()
    t["boilerplate_segments"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ingest_counts = {
        r["status"]: r["n"]
        for r in incremental_ingest_dedup(spark, work)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    t["incremental_ingest"] = round(time.perf_counter() - t0, 2)
    release_scope(None)

    print(json.dumps({
        "n_docs": n_total,
        "n_tokens": int(n_tokens),
        "n_decontam_flagged": n_decontam,
        "n_repeated_spans": n_spans,
        "n_curated_final": n_curated,
        "n_boilerplate_docs": n_boiler,
        "ingest_status_counts": ingest_counts,
        "times_sec": t,
    }))

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
