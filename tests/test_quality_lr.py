"""Fixed-point logistic-regression trainer + KMV set-difference helper
(round-8): determinism and semantics of the driver-side GD loop, the
feature/label builder's exactness contract, and the week-over-prior
difference served from sketch state (catalog_r8)."""

from __future__ import annotations

import pytest

from apde_etl_spark.operators import text as TX


def _teacher_histogram():
    """Tiny separable histogram: y follows sign(x1 - x2)."""
    pats = []
    for x1 in range(-3, 4):
        for x2 in range(-3, 4):
            if x1 == x2:
                continue
            pats.append(((x1, x2, 0, 1 if x1 > x2 else 0), 5))
    return pats


def test_lr_trainer_deterministic_and_learns_signs():
    fit1 = TX.quality_lr_train_fixedpoint(_teacher_histogram())
    fit2 = TX.quality_lr_train_fixedpoint(list(reversed(_teacher_histogram())))
    # bit-identical regardless of input order (the trainer sorts)
    assert fit1 == fit2
    # learned signs follow the teacher: +x1, -x2, ~0 x3
    assert fit1["w1"] > 0 > fit1["w2"]
    assert abs(fit1["w3"]) < abs(fit1["w1"])
    # all quantities are exact ints on the 1e-6 lattice
    assert all(isinstance(fit1[k], int) for k in ("b", "w1", "w2", "w3"))


def test_lr_trainer_matches_manual_one_step():
    # single pattern, one iteration: z=0 -> p=S/2, err=S/2-y*S
    S = TX.QLR_SCALE
    fit = TX.quality_lr_train_fixedpoint([((2, 0, 0, 1), 1)], iters=1,
                                         lr_den=1)
    err = S // 2 - S            # -S/2
    assert fit["b"] == -err     # b -= err*1 // (1*1)
    assert fit["w1"] == -err * 2
    assert fit["w2"] == 0 and fit["w3"] == 0


def test_lr_trainer_rejects_empty():
    with pytest.raises(ValueError, match="empty"):
        TX.quality_lr_train_fixedpoint([])


def test_lr_hard_sigmoid_clamps():
    # a hugely positive z must clamp p at S (err 0 for y=1): weights
    # stop moving once every point is saturated-correct
    S = TX.QLR_SCALE
    fit0 = TX.quality_lr_train_fixedpoint([((10, 0, 0, 1), 1)], iters=200)
    z = fit0["b"] + fit0["w1"] * 10
    p = (min(max(z, -2 * S), 2 * S) + 2 * S) // 4
    assert p == S  # converged into saturation


def test_quality_lr_features_exact_integers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "zz yy xx ww vv uu")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in TX.quality_lr_features(df).collect()}
    S = TX.QLR_SCALE
    # doc 1: 5 tokens, 3 stopwords (the, and, the), 15 non-space chars
    (q1, c1, o1), (q2, c2, o2), (q3, c3, o3) = TX.QLR_F1, TX.QLR_F2, TX.QLR_F3
    assert rows[1]["x1"] == min((3 * S // 5) // q1, c1) - o1    # 36
    assert rows[1]["x2"] == min((15 * S // 5) // q2, c2) - o2   # -11
    assert rows[1]["x3"] == min(5 // q3, c3) - o3               # -25
    assert rows[2]["x1"] == 0 - o1  # no stopwords
    assert rows[1]["y"] in (0, 1) and rows[2]["y"] in (0, 1)


def test_kmv_weekly_difference_exact_when_unsaturated(spark):
    """With < k distinct hashes per sketch, the KMV difference is EXACT:
    est_new_users == exact_new_users for every week."""
    import datetime

    from pyspark.sql import functions as F

    from apde_etl_spark.operators.sketch import kmv_sketch
    from apde_etl_spark.plans.catalog_r8 import _kmv_new_users_weekly

    # 3 weeks: w1 users 0..9, w2 users 5..19 (10 new), w3 users 0..4
    # (0 new)
    rows = []
    weeks = [(datetime.date(2024, 1, 1), range(0, 10)),
             (datetime.date(2024, 1, 8), range(5, 20)),
             (datetime.date(2024, 1, 15), range(0, 5))]
    for day, users in weeks:
        rows += [(day, f"u{u}") for u in users]
    ev = spark.createDataFrame(rows, "day date, user_id string")
    sk = kmv_sketch(ev, "user_id", ["day"]).select(
        F.col("day").alias("wk"), "hval")
    out = {r["wk"].isoformat(): r
           for r in _kmv_new_users_weekly(spark, sk, ev).collect()}
    assert set(out) == {"2024-01-08", "2024-01-15"}
    for r in out.values():
        assert r["est_new_users"] == r["exact_new_users"]
    assert out["2024-01-08"]["exact_new_users"] == 10
    assert out["2024-01-15"]["exact_new_users"] == 0
