"""Physical-plan regression tests: the scale-critical plan properties
(broadcast vs shuffle, pushdown reaching the scan, top-k without a full
sort, shuffle-free projections) asserted on the actual executed/optimized
plans at sf0.001 — the properties PLANS.md documents, enforced."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_the_filtered_dimension(spark, sf_dir, qs):
    plan = _plan(qs["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the ordered limit must be TakeOrdered (per-partition top-k),
    # never a global Sort + CollectLimit
    assert "TakeOrderedAndProject" in plan


def test_q1_pushes_filter_into_scan(spark, sf_dir, qs):
    plan = _plan(qs["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_split_train_holdout_is_pure_projection(spark, sf_dir, qs):
    plan = _plan(qs["split_train_holdout"](spark, sf_dir))
    assert "Exchange" not in plan  # no shuffle at any scale


def test_langid_char_ngram_is_pure_projection(spark, sf_dir, qs):
    plan = _plan(qs["langid_char_ngram"](spark, sf_dir))
    assert "Exchange" not in plan


def test_ann_cosine_topk_avoids_full_sort(spark, sf_dir, qs):
    plan = _plan(qs["ann_cosine_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_j2_broadcasts_dimension_chain(spark, sf_dir, qs):
    plan = _plan(qs["j2_revenue_by_region"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # one fact shuffle max


def test_qa_values_reads_only_profiled_columns(spark, sf_dir, qs):
    df = qs["qa_values_full"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # column pruning: the untouched wide column must not be read
    assert "l_comment" not in plan  # not in the table at all (sanity)
    exec_plan = _plan(df)
    assert "ReadSchema" in exec_plan
