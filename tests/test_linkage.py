"""Fellegi–Sunter record-linkage operator tests (operators/linkage.py).

The oracle gate (catalog_r5c) proves engine parity on the testdata; the
corpus there is dup-heavy, so only strong-text candidates appear. These
tests pin the full decision space (match / possible / non_match), the
NULL and boundary semantics of each gamma, and the weight model itself
on constructed frames.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.operators import linkage as LK


def test_field_weights_values():
    ws = LK.field_weights((0.18, 0.82), (0.60, 0.40))
    assert ws == (math.log2(0.18 / 0.60), math.log2(0.82 / 0.40))


@pytest.mark.parametrize(
    "m,u",
    [
        ((0.5, 0.5), (0.5,)),        # length mismatch
        ((0.5, 0.4), (0.5, 0.5)),    # m doesn't sum to 1
        ((1.0, 0.0), (0.5, 0.5)),    # zero probability
    ],
)
def test_field_weights_validation(m, u):
    with pytest.raises(ValueError):
        LK.field_weights(m, u)


def test_default_weights_signs():
    # every field: disagreement weight negative, top agreement positive
    for field, ws in LK.DEFAULT_WEIGHTS.items():
        assert ws[0] < 0, field
        assert ws[-1] > 0, field


@pytest.fixture(scope="module")
def tiny_linkage(spark):
    ents = spark.createDataFrame(
        [
            (1, "en", "srcA", 100),
            (2, "en", "srcA", 125),   # vs 1: len 100/125 = 0.8 exactly
            (3, "de", "srcB", 126),   # vs 2: 125/126 > 0.8; lang/src differ
            (4, None, "srcA", None),  # NULLs never agree
            (5, None, "srcA", 100),
        ],
        "doc_id int, lang string, source string, n_chars int",
    )
    pairs = spark.createDataFrame(
        [
            (1, 2, 0.9),   # strong text
            (2, 3, 0.3),   # weak text
            (1, 3, 0.1),   # text disagree
            (1, 4, 0.6),
            (4, 5, 0.6),   # both langs NULL -> g_lang = 0
        ],
        "id_a int, id_b int, jaccard_sim double",
    )
    feats = LK.pair_features(
        pairs, ents, id_col="doc_id", sim_col="jaccard_sim",
        exact_cols=("lang", "source"), len_col="n_chars",
        strong=0.5, weak=0.2, len_ratio=(4, 5),
    )
    return {
        (r["id_a"], r["id_b"]): r.asDict() for r in feats.collect()
    }


def test_gamma_levels(tiny_linkage):
    f = tiny_linkage
    assert f[(1, 2)]["g_text"] == 2
    assert f[(2, 3)]["g_text"] == 1
    assert f[(1, 3)]["g_text"] == 0


def test_gamma_exact_and_null(tiny_linkage):
    f = tiny_linkage
    assert f[(1, 2)]["g_lang"] == 1 and f[(1, 2)]["g_source"] == 1
    assert f[(2, 3)]["g_lang"] == 0 and f[(2, 3)]["g_source"] == 0
    # NULL never agrees — not even with another NULL
    assert f[(1, 4)]["g_lang"] == 0
    assert f[(4, 5)]["g_lang"] == 0
    assert f[(4, 5)]["g_source"] == 1


def test_gamma_len_integer_boundary(tiny_linkage):
    f = tiny_linkage
    # 100/125 = 4/5 exactly -> agree (>= is inclusive), via integer math
    assert f[(1, 2)]["g_len"] == 1
    assert f[(2, 3)]["g_len"] == 1
    # NULL length -> disagree
    assert f[(1, 4)]["g_len"] == 0


def test_score_and_classify_all_classes(spark):
    rows = [
        (2, 1, 1, 1),  # all agree -> strong match
        (2, 1, 0, 1),  # source disagrees -> between thresholds
        (0, 0, 0, 0),  # all disagree -> deep negative
    ]
    df = spark.createDataFrame(
        rows, "g_text int, g_lang int, g_source int, g_len int")
    raw = LK.score_column(LK.DEFAULT_WEIGHTS)
    out = df.select(
        raw.alias("score"),
        LK.classify_column(raw, 6.0, 0.0).alias("decision"),
    ).collect()

    def expected(g):
        w = LK.DEFAULT_WEIGHTS
        return (w["text"][g[0]] + w["lang"][g[1]]
                + w["source"][g[2]] + w["len"][g[3]])

    for r, g in zip(out, rows):
        assert r["score"] == pytest.approx(expected(g), abs=0.0)
    assert [r["decision"] for r in out] == ["match", "possible", "non_match"]


def test_classify_threshold_validation():
    with pytest.raises(ValueError):
        LK.classify_column(F.lit(0.0), upper=1.0, lower=2.0)


def test_score_empty_weights_rejected():
    with pytest.raises(ValueError):
        LK.score_column({})


def test_entity_clusters_end_to_end(spark):
    """matches -> connected components: transitive identity with a
    deterministic min-id entity label."""
    from apde_etl_spark.operators.dedup import connected_components

    matches = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a int, id_b int")
    comp = {
        r["id"]: r["component"]
        for r in connected_components(matches, "id_a", "id_b").collect()
    }
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[7] == comp[8] == 7


# ---------------------------------------------------------------------------
# EM estimation
# ---------------------------------------------------------------------------


def _planted_patterns():
    # clear two-component structure: matches agree everywhere, rest don't
    return [
        ((2, 1, 1, 1), 100),
        ((2, 1, 0, 1), 20),
        ((0, 0, 0, 0), 5000),
        ((0, 1, 0, 0), 800),
        ((1, 0, 0, 1), 40),
    ]


def test_em_recovers_planted_structure():
    fit = LK.em_estimate(_planted_patterns(), (3, 2, 2, 2), iters=50)
    m, u = fit["m"], fit["u"]
    # match class concentrates on text agreement (strong dominates),
    # u class on disagreement — the planted two-component structure
    assert m[0][2] > 0.5 and m[0][2] > m[0][0]
    assert u[0][0] > 0.9
    assert m[3][1] > u[3][1]
    # prior ~ share of the agreeing block (160 / 5960)
    assert 0.01 < fit["prior"] < 0.1


def test_em_deterministic_under_input_order():
    pats = _planted_patterns()
    a = LK.em_estimate(pats, (3, 2, 2, 2))
    b = LK.em_estimate(list(reversed(pats)), (3, 2, 2, 2))
    assert a == b


def test_em_probabilities_clamped_and_normalized():
    fit = LK.em_estimate(_planted_patterns(), (3, 2, 2, 2))
    for side in (fit["m"], fit["u"]):
        for field in side:
            for prob in field:
                assert 1e-6 <= prob <= 1 - 1e-6
            # per-field levels form (approximately) a distribution
            assert sum(field) == pytest.approx(1.0, abs=1e-4)


@pytest.mark.parametrize(
    "pats,levels",
    [
        ([], (2,)),                       # empty histogram
        ([((0, 1), 3)], (2,)),            # arity mismatch
        ([((5,), 3)], (2,)),              # level out of range
    ],
)
def test_em_validation(pats, levels):
    with pytest.raises(ValueError):
        LK.em_estimate(pats, levels)


# ---------------------------------------------------------------------------
# Fixed-point EM (the hash-gateable variant)
# ---------------------------------------------------------------------------


def test_em_fixedpoint_tracks_float_fit():
    pats = _planted_patterns()
    ff = LK.em_estimate(pats, (3, 2, 2, 2), iters=50, init_prior=0.1)
    fi = LK.em_estimate_fixedpoint(pats, (3, 2, 2, 2), iters=50)
    S = LK.EM_SCALE
    assert abs(ff["prior"] - fi["prior"] / S) < 1e-4
    for f in range(4):
        for lvl in range(len(ff["m"][f])):
            assert abs(ff["m"][f][lvl] - fi["m"][f][lvl] / S) < 1e-3
            assert abs(ff["u"][f][lvl] - fi["u"][f][lvl] / S) < 1e-3


def test_em_fixedpoint_integer_and_order_invariant():
    pats = _planted_patterns()
    a = LK.em_estimate_fixedpoint(pats, (3, 2, 2, 2))
    b = LK.em_estimate_fixedpoint(list(reversed(pats)), (3, 2, 2, 2))
    assert a == b
    S = LK.EM_SCALE
    assert isinstance(a["prior"], int) and 1 <= a["prior"] <= S - 1
    for side in (a["m"], a["u"]):
        for field in side:
            assert all(isinstance(x, int) and 1 <= x <= S - 1 for x in field)


@pytest.mark.parametrize(
    "pats,levels",
    [
        ([], (2,)),
        ([((0, 1), 3)], (2,)),
        ([((5,), 3)], (2,)),
    ],
)
def test_em_fixedpoint_validation(pats, levels):
    with pytest.raises(ValueError):
        LK.em_estimate_fixedpoint(pats, levels)
