"""Drift monitor invariants: frozen-baseline deciles make the baseline
histogram uniform by construction, proportions sum to one per period,
and the distance terms are consistent with the proportions."""

from __future__ import annotations

import pytest

from apde_etl_spark.plans.catalog_r5b import drift_value_by_period


@pytest.fixture(scope="module")
def out(spark, sf_dir):
    return drift_value_by_period(spark, sf_dir).collect()


def test_bins_complete_and_props_normalized(out):
    assert sorted(r.bin for r in out) == list(range(10))
    assert sum(r.baseline_prop for r in out) == pytest.approx(1.0, abs=1e-5)
    assert sum(r.current_prop for r in out) == pytest.approx(1.0, abs=1e-5)


def test_baseline_histogram_uniform_by_construction(out):
    """Bins are the baseline's own deciles, so every baseline proportion
    must be ~0.1 (exact up to interpolation ties)."""
    for r in out:
        assert r.baseline_prop == pytest.approx(0.1, abs=0.02), r


def test_distance_terms_consistent(out):
    for r in out:
        d = r.current_prop - r.baseline_prop
        assert r.chi2_term == pytest.approx(d * d / r.baseline_prop, abs=2e-6)
        assert r.tv_term == pytest.approx(abs(d) / 2.0, abs=2e-6)
        assert r.chi2_term >= 0 and r.tv_term >= 0
