"""True merge-loop BPE: trainer determinism, artifact provenance, exact
Python<->DuckDB replay equivalence (the property the gate's hash check
rests on), and the Spark distinct-word pipeline."""

from __future__ import annotations

import random

import duckdb
import pytest

from apde_etl_spark.operators import bpe


def test_default_merges_are_the_trainers_output():
    """DEFAULT_MERGES is a learned artifact, not hand-typed: retraining
    on the pinned frequency snapshot must reproduce it exactly."""
    assert bpe.bpe_train(bpe.CORPUS_WORD_FREQS, bpe.N_MERGES) == bpe.DEFAULT_MERGES


def test_trainer_is_deterministic_under_dict_order():
    freqs = {"ab": 5, "ba": 5, "aa": 5}
    shuffled = dict(reversed(list(freqs.items())))
    assert bpe.bpe_train(freqs, 3) == bpe.bpe_train(shuffled, 3)


def test_encode_known_values():
    m = bpe.DEFAULT_MERGES
    assert bpe.bpe_encode_tokens("join", m) == ["join"]
    assert bpe.bpe_encode_tokens("hash", m) == ["hash"]
    assert bpe.bpe_encode_tokens("batch", m) == ["batch"]
    # partial compression: 'the' has no (t,h)/(th,e) merges in this vocab
    assert bpe.bpe_token_count("the", m) == 3
    # out-of-corpus word still encodes (chars + applicable merges)
    assert bpe.bpe_token_count("zzz", m) == 3
    assert bpe.bpe_encode_tokens("", m) == []


def test_merge_order_is_rank_not_position():
    """The lowest-RANKED applicable rule fires first even when a
    higher-ranked rule matches earlier in the word."""
    merges = [("b", "c"), ("a", "b")]
    # rank 0 (b,c) must fire first: abc -> a|bc, then (a,b) can't apply
    assert bpe.bpe_encode_tokens("abc", merges) == ["a", "bc"]


def test_replace_all_left_to_right_overlap():
    """'aaaa' under an (a,a) merge: replace-all non-overlapping gives
    aa|aa, then (aa,aa) if present — the exact str.replace semantics the
    SQL replay shares."""
    assert bpe.bpe_encode_tokens("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert bpe.bpe_encode_tokens("aaaaa", [("a", "a")]) == ["aa", "aa", "a"]
    assert bpe.bpe_encode_tokens("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]


def _duck_counts(words: list[str], merges) -> dict[str, int]:
    con = duckdb.connect()
    vals = ", ".join("(" + "'" + w.replace("'", "''") + "'" + ")" for w in words)
    q = (
        "WITH RECURSIVE corpus_words(w) AS (VALUES " + vals + "),"
        + bpe.bpe_oracle_sql_counts(merges)
        + "\nSELECT w, n_bpe_tokens FROM bpe_counts"
    )
    return dict(con.execute(q).fetchall())


def test_python_and_sql_replay_agree_on_adversarial_words():
    merges = [("a", "a"), ("a", "b"), ("aa", "ab"), ("b", "a"), ("c", "aab")]
    words = ["aaaa", "aaab", "abab", "aabaab", "caab", "bacaab", "xyz",
             "aaaaaaa", "ab", "ba"]
    duck = _duck_counts(words, merges)
    for w in words:
        assert duck[w] == bpe.bpe_token_count(w, merges), w


def test_python_and_sql_replay_agree_on_random_words():
    rng = random.Random(13)
    merges = bpe.DEFAULT_MERGES
    words = list({
        "".join(rng.choice("abcehijnorstuw") for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    })
    duck = _duck_counts(words, merges)
    for w in words:
        assert duck[w] == bpe.bpe_token_count(w, merges), w


def test_spark_doc_counts_match_reference(spark):
    rows = [
        (1, "s1", "join hash the zzz"),
        (2, "s1", "batch batch scan"),
        (3, "s2", "customer, filter 42!"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {r["doc_id"]: r for r in bpe.bpe_doc_token_counts(
        df, id_cols=("doc_id",)).collect()}

    import re

    for doc_id, _, text in rows:
        words = re.findall(bpe.WORD_PATTERN, text)
        exp = sum(bpe.bpe_token_count(w, bpe.DEFAULT_MERGES) for w in words)
        assert out[doc_id]["n_bpe_tokens"] == exp, doc_id
        assert out[doc_id]["n_words"] == len(words), doc_id


def test_exact_diverges_from_heuristic(spark):
    """The point of the exact entry: the heuristic (1 token per word
    run) systematically undercounts; the ratio must exceed 1."""
    df = spark.createDataFrame(
        [(1, "s", "the customer filter window query")],
        "doc_id int, source string, text string")
    r = bpe.bpe_doc_token_counts(df, id_cols=("doc_id",)).collect()[0]
    assert r["n_bpe_tokens"] > r["n_words"]


def test_vocab_join_shuffle_fallback_matches_broadcast(spark):
    """The size gate only changes the join STRATEGY: forcing the
    shuffle fallback (the >2M-word regime) must give identical counts,
    and the auto gate (an actual count_distinct job) must agree too.
    With auto-broadcast disabled, only the forced-hint path may still
    broadcast — proving False really drops the hint and leaves the
    choice to Spark's size estimate."""
    rows = [(i, "s", f"alpha{i % 7} beta gamma{i % 3} delta") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    canon = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    bc = bpe.bpe_doc_token_counts(df, broadcast_vocab=True)
    sh = bpe.bpe_doc_token_counts(df, broadcast_vocab=False)
    auto = bpe.bpe_doc_token_counts(df)
    assert canon(bc) == canon(sh) == canon(auto)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def plan(d):
            return d._sc._jvm.PythonSQLUtils.explainString(
                d._jdf.queryExecution(), "formatted")
        assert "BroadcastHashJoin" in plan(
            bpe.bpe_doc_token_counts(df, broadcast_vocab=True))
        assert "BroadcastHashJoin" not in plan(
            bpe.bpe_doc_token_counts(df, broadcast_vocab=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
