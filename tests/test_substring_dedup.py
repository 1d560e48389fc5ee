"""Exact substring dedup (operators/text.py:duplicated_substring_spans /
remove_duplicated_substrings) — the Lee-et-al.-class pass the round-5
verdict asked for. Pins the three semantics the cross-document maxspan
miner provably lacks: within-doc repeats (multiplicity counting), the
occurrence (not distinct-doc) threshold, and covered-region merging of
NEARBY distinct duplicated substrings; plus removal correctness against
hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from apde_etl_spark.operators.text import (
    duplicated_substring_spans,
    remove_duplicated_substrings,
    repeated_max_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in df.collect()
    )


def test_within_doc_repeat_found_and_invisible_to_maxspan(spark):
    # one doc repeats an 8-token phrase twice; no other doc shares it.
    phrase = "a b c d e f g h"
    filler = " ".join(f"u{i}" for i in range(10))
    filler2 = " ".join(f"v{i}" for i in range(10))
    docs = _docs(spark, [
        (1, f"{phrase} {filler} {phrase}"),
        (2, filler2),
    ])
    got = _spans(duplicated_substring_spans(docs, k=8, min_count=2))
    # two occurrences at token 0 and token 18, both covered
    assert got == [(1, 0, 7, 8), (1, 18, 25, 8)]
    # the cross-document miner cannot see it even at min_docs=2:
    # its threshold is DISTINCT docs
    assert repeated_max_spans(docs, k=8, min_docs=2).count() == 0


def test_cross_doc_span_found_by_both(spark):
    shared = " ".join(f"s{i}" for i in range(12))  # 12-token shared span
    docs = _docs(spark, [
        (1, f"{shared} x1 x2 x3"),
        (2, f"y1 y2 {shared}"),
        (3, "z0 z1 z2 z3 z4 z5 z6 z7 z8"),
    ])
    got = _spans(duplicated_substring_spans(docs, k=8, min_count=2))
    assert (1, 0, 11, 12) in got and (2, 2, 13, 12) in got
    assert not any(d == 3 for d, *_ in got)


def test_nearby_duplicated_substrings_merge_into_one_region(spark):
    # two DIFFERENT duplicated 8-grams, 3 filler tokens apart in doc 1:
    # covered intervals [0,7] and [11,18] have gap 11-7-1=3 < k -> the
    # anchors are 11 apart > k=8, so they stay separate islands; with
    # 1-token gap (anchor distance 9 > 8) still separate; with anchor
    # distance <= k they merge. Pin both sides of the boundary.
    p1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    p2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = _docs(spark, [
        # anchor positions 0 and 8 (adjacent): merge into [0,15]
        (1, f"{p1} {p2}"),
        (2, f"x1 x2 {p1} x3 x4"),
        (3, f"y1 {p2} y2 y3"),
        # anchor positions 0 and 9 (gap 1 token): two islands
        (4, f"{p1} gap {p2}"),
    ])
    got = _spans(duplicated_substring_spans(docs, k=8, min_count=2))
    assert (1, 0, 15, 16) in got
    assert (4, 0, 7, 8) in got and (4, 9, 16, 8) in got


def test_removal_output_hand_checked(spark):
    phrase = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = _docs(spark, [
        (1, f"keep1 {phrase} keep2"),
        (2, f"{phrase}"),
        (3, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),
    ])
    out = {r["doc_id"]: r for r in
           remove_duplicated_substrings(docs, k=8, min_count=2).collect()}
    assert out[1]["n_tokens"] == 10 and out[1]["n_removed"] == 8
    assert out[1]["cleaned_text"] == "keep1 keep2"
    assert out[2]["n_tokens"] == 8 and out[2]["n_removed"] == 8
    assert out[2]["cleaned_text"] == ""  # fully covered doc -> empty
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == "n1 n2 n3 n4 n5 n6 n7 n8 n9"


def test_short_docs_below_k_are_passed_through(spark):
    docs = _docs(spark, [
        (1, "one two three"),          # < k tokens: no grams possible
        (2, "one two three"),          # identical, still below k
    ])
    assert duplicated_substring_spans(docs, k=8, min_count=2).count() == 0
    out = {r["doc_id"]: r for r in
           remove_duplicated_substrings(docs, k=8, min_count=2).collect()}
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == "one two three"


def test_removal_is_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = remove_duplicated_substrings(docs, k=8, min_count=2)
    b = remove_duplicated_substrings(docs.repartition(13), k=8, min_count=2)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
