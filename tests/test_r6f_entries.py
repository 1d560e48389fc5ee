"""Unit tests for round-6f: held-out perplexity OOV semantics and
streaming CDC micro-batch invariance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from apde_etl_spark.plans import catalog_r6f as C


def test_heldout_unseen_bigram_hits_smoothing_floor(spark, tmp_path):
    # train docs (ids 1,2 — % 5 != 0) never contain token 'z'; test
    # doc (id 5) is entirely novel, so every bigram must coalesce to
    # the k/(k*V) floor and n_unseen == n_bigrams
    rows = [
        (1, "a b a"),
        (2, "b a b"),
        (5, "z z z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in
           C.perplexity_heldout_score(spark, d).collect()}
    assert set(out) == {5}
    r = out[5]
    assert r.n_bigrams == 2 and r.n_unseen == 2
    k, V = C._PPL_K, 2.0  # train vocab = {a, b}
    floor = round(math.log(k / (0 + k * V)), 9)
    assert abs(r.log_lik - round(2 * floor, 6)) < 1e-9


def test_heldout_seen_bigram_uses_train_counts(spark, tmp_path):
    rows = [
        (1, "a b a b"),   # train: (a,b)=2, (b,a)=1; ctx a=2->... cp(a)=2, cp(b)=1
        (5, "a b"),       # test: one seen bigram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    r = C.perplexity_heldout_score(spark, d).collect()[0]
    k, V = C._PPL_K, 2.0
    lp = round(math.log((2 + k) / (2 + k * V)), 9)
    assert r.doc_id == 5 and r.n_unseen == 0
    assert abs(r.log_lik - round(lp, 6)) < 1e-9


def test_stream_cdc_is_microbatch_invariant(spark, sf_dir, tmp_path):
    """Scatter the event log across three files with one-file
    micro-batches: the applied state must equal the 1-batch run and
    the batch cdc_apply_tombstones entry (last-writer-wins on event
    time is associative, so arrival batching cannot change it)."""
    from apde_etl_spark.plans.catalog import load_events, normalize_ts
    from apde_etl_spark.plans.catalog_r2 import run_idempotent_upsert
    from apde_etl_spark.plans.catalog_r6d import cdc_apply_tombstones
    from apde_etl_spark.functions.core import round_half_away

    ev = load_events(spark, sf_dir)
    src3 = str(tmp_path / "e3")
    for part in range(3):
        ev.filter(F.col("event_id") % 3 == part).coalesce(1) \
            .write.mode("append").parquet(src3)

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src3)
    )
    target = run_idempotent_upsert(
        normalize_ts(src), str(tmp_path / "w3"), C.fold_cdc_state)
    state = spark.read.parquet(target)
    got = sorted(map(tuple, state.filter(F.col("op") != "D").select(
        "user_id", F.col("op").alias("last_op"),
        round_half_away(F.col("value"), 6).alias("last_value"),
        "n_ops").collect()))
    expected = sorted(map(tuple,
                          cdc_apply_tombstones(spark, sf_dir).collect()))
    assert got == expected
    # tombstoned keys are retained in state but absent from the view
    n_tomb = state.filter(F.col("op") == "D").count()
    all_users = ev.select("user_id").distinct().count()
    assert len(got) + n_tomb == all_users
