"""Behavioral tests for the round-3 extension entries (catalog_r3b):
properties the DuckDB oracle equivalence can't express — redaction
completeness, split hygiene, cap determinism/contiguity, span truth."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from apde_etl_spark.operators import text as TX
from apde_etl_spark.plans.catalog_r3b import (
    _CAP_PER_SOURCE,
    _DECON_FLAG,
    _SPAN_MIN_DOCS,
    _SPAN_K,
    decontam_ngram_overlap,
    per_source_doc_cap,
    pii_redact_contacts,
    quality_logistic_score,
    repeated_span_docs,
)


def test_pii_redaction_is_complete(spark, sf_dir):
    rows = pii_redact_contacts(spark, sf_dir).collect()
    assert rows
    pats = [re.compile(p) for _, p in TX.PII_PATTERNS]
    for r in rows:
        assert r["n_emails"] >= 1
        assert r["n_phones"] >= 1
        for pat in pats:
            assert not pat.search(r["redacted"]), (r["redacted"], pat.pattern)
        # labels actually present (every contact card carries all three)
        assert "[EMAIL]" in r["redacted"]
        assert "[PHONE]" in r["redacted"]
        assert "[ID]" in r["redacted"]


def test_pii_redaction_order_most_specific_first(spark):
    # the email's digits must be consumed by [EMAIL], not chewed by [ID]
    # (uses the shared session fixture: calling get_spark with a
    # different shuffle_partitions here would reconfigure the shared
    # session and poison order-dependent AQE tests)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"t": ["mail me at a1234567@host.org or 12-345-678-9012 id 99999999"]})
    )
    out = df.select(TX.redact_pii("t").alias("r")).collect()[0]["r"]
    assert out == "mail me at [EMAIL] or [PHONE] id [ID]"


def test_decontam_output_is_train_only_and_flag_consistent(spark, sf_dir):
    out = decontam_ngram_overlap(spark, sf_dir)
    rows = out.collect()
    split = {
        r["doc_id"]: r["split"]
        for r in TX.hash_split(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id"
        ).collect()
    }
    for r in rows:
        assert split[r["doc_id"]] == "train"
        assert r["contaminated"] == (r["n_overlap"] >= _DECON_FLAG)


def test_per_source_cap_contiguous_deterministic(spark, sf_dir):
    out = per_source_doc_cap(spark, sf_dir)
    rows = out.collect()
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["sample_rank"])
    for src, ranks in by_src.items():
        assert len(ranks) <= _CAP_PER_SOURCE
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
    # deterministic: a second evaluation yields the identical kept set
    again = {(r["doc_id"], r["sample_rank"]) for r in out.collect()}
    assert again == {(r["doc_id"], r["sample_rank"]) for r in rows}


def test_repeated_spans_occur_in_enough_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = repeated_span_docs(spark, sf_dir).collect()
    texts = [(r["doc_id"], re.split(r"\s+", r["text"].strip())) for r in docs.collect()]
    for r in out[:20]:
        span_toks = r["span"].split(" ")
        assert len(span_toks) == _SPAN_K
        n = sum(
            1
            for _id, toks in texts
            if any(
                toks[i : i + _SPAN_K] == span_toks
                for i in range(len(toks) - _SPAN_K + 1)
            )
        )
        assert n == r["n_docs"] >= _SPAN_MIN_DOCS


def test_incremental_ingest_statuses(spark, sf_dir):
    from apde_etl_spark.plans.catalog_r3b import incremental_ingest_dedup

    rows = {r["doc_id"]: r["status"] for r in
            incremental_ingest_dedup(spark, sf_dir).collect()}
    assert rows
    exact = [s for d, s in rows.items() if 20_000_000 <= d < 30_000_000]
    revised = [s for d, s in rows.items() if 30_000_000 <= d < 40_000_000]
    uniq = [s for d, s in rows.items() if d >= 40_000_000]
    # re-crawled pages are always exact duplicates of the corpus
    assert exact and all(s == "exact_dup" for s in exact)
    # uppercased pages share no shingle with the lowercase corpus
    assert uniq and all(s == "unique" for s in uniq)
    # revised pages are near-dups up to LSH banding recall (never exact)
    assert revised and all(s != "exact_dup" for s in revised)
    assert sum(s == "near_dup" for s in revised) >= 0.8 * len(revised)


def test_hash_priority_cap_matches_plain_window_even_when_rescued(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from apde_etl_spark.operators.similarity import hash60
    from apde_etl_spark.operators.skew import hash_priority_cap

    # skewed frame: one hot key with 5000 rows, several cold keys
    df = spark.range(5600).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") < 5000, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 6).cast("string")))
        .alias("grp"),
    )
    n = 10
    pr = hash60(F.col("rid").cast("string"))
    w = Window.partitionBy("grp").orderBy(pr.asc(), F.col("rid").asc())
    plain = {
        (r["grp"], r["rid"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n).collect()
    }
    # safety=1.0: expected survivors == n exactly, so ~half the keys
    # come up short and MUST go through the rescue re-rank — the
    # equality below proves the rescue path restores exactness
    for safety in (1.0, 8.0):
        fast = {
            (r["grp"], r["rid"], r["sample_rank"])
            for r in hash_priority_cap(df, "grp", "rid", n, safety=safety).collect()
        }
        assert fast == plain, f"safety={safety}"

    # n=1, safety=1.0: ~e^-1 of keys get ZERO survivors from the prune
    # — the rescue must be driven off the per-key counts, not the
    # survivor set, or those keys vanish from the output entirely
    w1 = Window.partitionBy("grp").orderBy(pr.asc(), F.col("rid").asc())
    plain1 = {
        (r["grp"], r["rid"])
        for r in df.withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= 1).collect()
    }
    fast1 = {
        (r["grp"], r["rid"])
        for r in hash_priority_cap(df, "grp", "rid", 1, safety=1.0).collect()
    }
    assert fast1 == plain1


def test_hash_priority_cap_keeps_null_keys(spark):
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.skew import hash_priority_cap

    df = spark.range(50).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(
            (F.col("id") % 2).cast("string")
        ).alias("grp"),
    )
    out = hash_priority_cap(df, "grp", "rid", 5)
    # the NULL-key group ranks like any other (plain window semantics):
    # the null-safe joins must not drop it
    assert out.filter(F.col("grp").isNull()).count() == 5
    assert out.count() == 15


def test_scd1_upsert_is_idempotent(spark, sf_dir):
    from pyspark.sql import functions as F

    from apde_etl_spark.sources.lifecycle import scd1_upsert

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    updates = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    first = scd1_upsert(cust, updates, "c_custkey", ["c_acctbal", "c_mktsegment"])
    acts = {r["action"] for r in first.select("action").distinct().collect()}
    assert "updated" in acts
    # re-applying the SAME batch to the merged snapshot changes nothing
    again = scd1_upsert(
        first.drop("action"), updates, "c_custkey", ["c_acctbal", "c_mktsegment"]
    )
    assert again.filter(F.col("action") != "unchanged").count() == 0
    assert again.count() == first.count()


def test_expectations_null_semantics(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.expect import Expectation, expectations_report

    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, None], "v": [5.0, None, 3.0]}).astype(object)
    )
    out = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in expectations_report(
            df,
            row_checks=[Expectation("v_positive", F.col("v") > 0)],
            unique_keys={"k_unique": ["k"]},
        ).collect()
    }
    # NULL predicate result counts as a violation, not a silent pass
    assert out["v_positive"] == (1, False)
    # duplicate k=1 is one surplus row; the NULL key is another (a NULL
    # "key" cannot claim a slot in the distinct count)
    assert out["k_unique"] == (2, False)


def test_quality_score_bounds_and_keep(spark, sf_dir):
    rows = quality_logistic_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["quality_score"] < 1.0
        # keep is decided on the unrounded p; allow the 6-digit boundary
        if abs(r["quality_score"] - 0.5) > 1e-5:
            assert r["keep"] == (r["quality_score"] >= 0.5)
