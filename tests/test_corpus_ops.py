"""Behavioral tests for the corpus-analytics extensions: Gopher-style
repetition metrics, tf-idf salience, exact deciles, z-score anomalies,
and sliding-window counts (batch semantics of the streaming helper)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from apde_etl_spark.operators.text import repetition_metrics, tfidf_top_terms
from apde_etl_spark.streaming.profile_stream import windowed_sliding_counts


def test_repetition_metrics_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),                       # fully repetitive
            (2, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # fully distinct
            (3, "hello"),                          # single token: no bigrams
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}

    r1 = rows[1]
    assert r1["n_tokens"] == 4
    assert abs(r1["dup_token_frac"] - 0.75) < 1e-12      # 1 - 1/4
    assert abs(r1["top_bigram_frac"] - 1.0) < 1e-12      # "a a" x3 of 3
    assert r1["repetitive"] is True

    r2 = rows[2]
    assert r2["dup_token_frac"] == 0.0
    assert abs(r2["top_bigram_frac"] - 1.0 / 9.0) < 1e-12
    assert r2["repetitive"] is False

    r3 = rows[3]
    assert r3["n_tokens"] == 1
    assert r3["top_bigram_frac"] == 0.0
    assert r3["repetitive"] is False


def test_repetition_metrics_is_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    plan = repetition_metrics(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_top_terms_ranks_distinctive_term_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique common common", "A"),
            (2, "common common other", "B"),
        ],
        ["doc_id", "text", "source"],
    )
    out = tfidf_top_terms(docs, "source", "text", k=3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    a = sorted(by_src["A"], key=lambda r: r["rank"])
    assert a[0]["term"] == "unique" and a[0]["tfidf"] > 0
    # 'common' appears in both sources -> idf = ln(1) = 0
    common = [r for r in out if r["term"] == "common"]
    assert all(r["tfidf"] == 0.0 for r in common)
    # ranks are 1..k without gaps inside each group
    for rows in by_src.values():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_percentile_deciles_linear_interpolation(spark):
    # n_chars = 0..10 -> decile p is exactly p*10 under linear interpolation
    docs = spark.createDataFrame([("s", i) for i in range(11)],
                                 ["source", "n_chars"])
    qs = docs.groupBy("source").agg(
        F.percentile("n_chars", F.array(*[F.lit(i / 10.0) for i in range(1, 10)]))
        .alias("qs")
    ).collect()[0]["qs"]
    assert qs == [float(i) for i in range(1, 10)]


def test_zscore_anomalies_catalog_entry(spark, sf_dir):
    import __spark_entry__ as e

    out = e.queries()["zscore_anomalies_events"](spark, sf_dir)
    rows = out.collect()
    assert out.columns == ["event_id", "event_type", "value", "zscore"]
    # every flagged row really is beyond 3 sigma (rounded to 6 dp)
    assert all(abs(r["zscore"]) > 2.999999 for r in rows)


def test_sliding_window_counts_batch_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 15)   # -> [9:30,10:30) + [10:00,11:00)
    t1 = datetime.datetime(2024, 1, 1, 10, 45)   # -> [10:00,11:00) + [10:30,11:30)
    ev = spark.createDataFrame(
        [(t0, "click"), (t1, "click"), (t1, "view")], ["ts", "event_type"]
    )
    out = windowed_sliding_counts(ev, "ts", "event_type").collect()
    # each event is in exactly two 1h/30min windows
    assert sum(r["count"] for r in out) == 2 * 3
    click = {
        (r["window_start"].strftime("%H:%M"), r["count"])
        for r in out if r["event_type"] == "click"
    }
    assert click == {("09:30", 1), ("10:00", 2), ("10:30", 1)}


def test_containment_prefix_filter_detects_subset_doc(spark):
    from apde_etl_spark.operators.similarity import containment_prefix_pairs

    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4"),                # subset of doc 2
            (2, "w1 w2 w3 w4 w5 w6"),
            (3, "x1 x2 x3 x4 x5"),             # unrelated
        ],
        ["doc_id", "text"],
    )
    rows = {(r["id_a"], r["id_b"]): r["containment"]
            for r in containment_prefix_pairs(docs, threshold=0.6).collect()}
    # C(1,2) = 2/2 = 1.0; C(2,1) = 2/4 = 0.5 < 0.6 is excluded
    assert set(rows) == {(1, 2)}
    assert rows[(1, 2)] == 1.0


def test_containment_prefix_filter_is_lossless(spark, sf_dir):
    """Prefix filtering must reproduce the brute-force result exactly
    (pigeonhole argument) — checked on the real documents table."""
    from pyspark.sql import functions as F

    from apde_etl_spark.operators.similarity import (
        containment_prefix_pairs, word_shingles,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fast = {
        (r["id_a"], r["id_b"]): round(r["containment"], 9)
        for r in containment_prefix_pairs(docs, threshold=0.6).collect()
    }
    sh = docs.select("doc_id", word_shingles(F.col("text"), 3).alias("s")) \
             .filter(F.size("s") > 0)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    cont = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size("sa")
    brute = {
        (r["id_a"], r["id_b"]): round(r["containment"], 9)
        for r in a.join(b, F.col("id_a") != F.col("id_b"))
                  .withColumn("containment", cont)
                  .filter(F.col("containment") >= 0.6)
                  .select("id_a", "id_b", "containment").collect()
    }
    assert fast == brute


def test_scd2_merge_all_four_cases(spark):
    import datetime

    from apde_etl_spark.sources.lifecycle import scd2_merge

    d0 = datetime.date(1995, 1, 1)
    cur = spark.createDataFrame(
        [(1, "A", d0), (2, "B", d0), (3, "C", d0)],
        ["k", "attr", "valid_from"],
    )
    snap = spark.createDataFrame(
        [(1, "A"), (2, "B2"), (4, "D")],   # 1 unchanged, 2 changed, 3 deleted, 4 new
        ["k", "attr"],
    )
    out = scd2_merge(cur, snap, "k", ["attr"], "1996-01-01")
    rows = sorted(
        (r["k"], r["attr"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        (1, "A", "1995-01-01", "None", True),           # unchanged
        (2, "B", "1995-01-01", "1996-01-01", False),    # closed
        (2, "B2", "1996-01-01", "None", True),          # re-opened
        (3, "C", "1995-01-01", "1996-01-01", False),    # deleted -> closed
        (4, "D", "1996-01-01", "None", True),           # new
    ]


def test_robust_mad_stats_entry(spark, sf_dir):
    import __spark_entry__ as e

    out = e.queries()["robust_mad_stats"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["mad"] >= 0 and 0 <= r["n_outliers"] <= r["n"]


def test_asof_join_inclusive_and_null_when_no_prior(spark):
    import datetime

    from apde_etl_spark.operators.temporal import asof_join

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(101, 7, t(2)), (102, 7, t(3)), (103, 7, t(0)), (104, 8, t(5))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(7, t(1), 201), (7, t(3), 202)], ["user_id", "ts", "rid"]
    )
    out = {r["event_id"]: r["rid"]
           for r in asof_join(left, right, on="user_id",
                              build_cols=["rid"]).collect()}
    assert out[101] == 201    # latest right at-or-before t=2
    assert out[102] == 202    # inclusive: right at exactly t=3 matches
    assert out[103] is None   # no right row at-or-before t=0
    assert out[104] is None   # no right rows for this key at all


def test_asof_join_carries_right_row_atomically(spark):
    """A NULL inside a carried attribute of the LATEST matching right
    row must stay NULL — not be backfilled per-column from an older
    right row (row-atomic struct carry)."""
    import datetime

    from apde_etl_spark.operators.temporal import asof_join

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, 7, t(10))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(7, t(1), 201, 5), (7, t(9), 202, None)],
        "user_id int, ts timestamp, rid int, b int",
    )
    out = asof_join(left, right, on="user_id",
                    build_cols=["rid", "b"]).collect()
    assert out[0]["rid"] == 202
    assert out[0]["b"] is None   # NOT 5 from the older right row


def test_scd2_merge_full_table_input_passes_closed_rows_through(spark):
    """Feeding a FULL SCD2 table (open + closed history rows): closed
    rows pass through untouched; only open rows merge with the
    snapshot."""
    import datetime

    from apde_etl_spark.sources.lifecycle import scd2_merge

    d0, d1 = datetime.date(1994, 1, 1), datetime.date(1995, 1, 1)
    full = spark.createDataFrame(
        [
            (1, "A0", d0, d1, False),    # closed history row for key 1
            (1, "A1", d1, None, True),   # open row, will change -> close
            (2, "B", d0, None, True),    # open row, unchanged
        ],
        "k int, attr string, valid_from date, valid_to date, is_current boolean",
    )
    snap = spark.createDataFrame([(1, "A2"), (2, "B")], ["k", "attr"])
    out = scd2_merge(full, snap, "k", ["attr"], "1996-01-01")
    rows = sorted(
        (r["k"], r["attr"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        (1, "A0", "1994-01-01", "1995-01-01", False),   # history untouched
        (1, "A1", "1995-01-01", "1996-01-01", False),   # open row closed
        (1, "A2", "1996-01-01", "None", True),          # new open row
        (2, "B", "1994-01-01", "None", True),           # unchanged
    ]


def test_asof_join_tie_break_is_deterministic(spark):
    import datetime

    from apde_etl_spark.operators.temporal import asof_join

    ts = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, 5, ts)], ["event_id", "user_id", "ts"])
    # two right rows at the identical timestamp: highest tie_col wins
    right = spark.createDataFrame(
        [(5, ts, 300), (5, ts, 301)], ["user_id", "ts", "rid"]
    )
    out = asof_join(left, right, on="user_id", build_cols=["rid"],
                    tiebreak_cols=["rid"]).collect()
    assert out[0]["rid"] == 301


def test_range_join_binned_boundaries(spark):
    from apde_etl_spark.operators.temporal import range_join_binned

    facts = spark.createDataFrame(
        [(0.0,), (99.99,), (100.0,), (249.9,), (499.99,), (500.0,)], ["value"]
    )
    tiers = spark.createDataFrame(
        [("lo", 0.0, 100.0), ("mid", 100.0, 250.0), ("hi", 250.0, 500.0)],
        ["tier", "lo", "hi"],
    )
    got = sorted((r["value"], r["tier"]) for r in
                 range_join_binned(tiers, facts, "lo", "hi", "value", bin_width=50.0).collect())
    # lo inclusive, hi exclusive; 500.0 falls outside every tier
    assert got == [(0.0, "lo"), (99.99, "lo"), (100.0, "mid"),
                   (249.9, "mid"), (499.99, "hi")]


def test_repeated_max_spans_catches_what_fixed_length_misses(spark):
    """A 9-token boilerplate shared by 3 docs: the fixed-length k=5 pass
    reports only its five overlapping 5-gram FRAGMENTS (never the whole
    span); repeated_max_spans recovers the full 9-token span, and only
    it (span_tokens > k filter)."""
    from apde_etl_spark.operators.similarity import word_shingles
    from apde_etl_spark.operators.text import repeated_max_spans

    boiler = "this content is provided as is without warranty whatsoever"
    assert len(boiler.split()) == 9
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"{boiler} unrelated tail words here"),
            (3, f"pre amble words {boiler}"),
            (4, "completely different text with no shared runs at all"),
        ],
        ["doc_id", "text"],
    )
    out = repeated_max_spans(docs, k=5, min_docs=3).collect()
    spans = {r["span"]: r for r in out}
    assert boiler in spans, spans
    assert spans[boiler]["n_docs"] == 3
    assert spans[boiler]["span_tokens"] == 9
    # nothing shorter-or-equal to k leaks through
    assert all(r["span_tokens"] > 5 for r in out)

    # the fixed-length pass over the same docs: every output is exactly
    # a 5-gram; the full boilerplate is provably absent
    sp = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 5)).alias("span")
    )
    fixed = (
        sp.groupBy("span").agg(F.countDistinct("doc_id").alias("n"))
        .filter(F.col("n") >= 3).collect()
    )
    fixed_spans = {r["span"] for r in fixed}
    assert boiler not in fixed_spans
    assert all(len(s.split()) == 5 for s in fixed_spans)
    # ...but its fragments are there (sanity that the fixture is shared)
    assert any(s in boiler for s in fixed_spans)


def test_repeated_max_spans_distinct_partner_sets_still_verified(spark):
    """Chained positions whose grams are repeated with DIFFERENT partner
    docs must not fabricate a long span count: the final full-span
    groupBy re-verifies, so a span only counts docs containing the WHOLE
    span."""
    from apde_etl_spark.operators.text import repeated_max_spans

    a = "one two three four five six"           # 6 tokens, shared by 1-3
    docs = spark.createDataFrame(
        [
            (1, a),
            (2, a),
            (3, a),
            (4, "one two three four five zzz"),  # shares only a 5-prefix
        ],
        ["doc_id", "text"],
    )
    out = {r["span"]: r for r in repeated_max_spans(docs, k=5, min_docs=3).collect()}
    assert a in out and out[a]["n_docs"] == 3
    # doc 4's 5-token prefix run is not longer than k, so it cannot
    # appear as a maxspan row
    assert all(r.span_tokens > 5 for r in out.values())
