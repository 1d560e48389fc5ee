"""Deterministic sampling operators — reproducible subsets at 100 TB.

Every operator here derives randomness from content hashes (md5-based
``hash60`` — bit-identical in DuckDB, so every entry is oracle-checkable)
instead of an RNG: the same row set produces the same sample on every
run, every engine, every cluster layout and retry. That property is what
makes samples usable as debugging slices, eval holdouts, and audit
artifacts for a 100 TB pipeline — Spark's ``df.sample``/``sampleBy``
Bernoulli draws give a different answer per run and per partitioning.

- :func:`deterministic_uniform` — u in (0, 1] from the row key.
- :func:`priority_sample` — weighted k-sample per stratum via PRIORITY
  SAMPLING (Duffield, Lund & Thorup, JACM 2007): priority q = w/u, keep
  the k largest per stratum. Inclusion probability rises with weight,
  and the (k+1)-th priority is the threshold for unbiased subset-sum
  estimation. Chosen over Efraimidis-Spirakis (u^(1/w)) because the
  priority needs ONLY an IEEE division — correctly rounded and therefore
  bit-identical across engines — where pow/ln differ in the last ulp
  between libm implementations and could flip ranks at the boundary.

Scale: a per-row projection plus one per-stratum top-k window — the
window shuffles on the stratum key; for heavy skew route through
operators/skew.py or pre-aggregate strata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apde_etl_spark.operators.similarity import hash60

__all__ = ["deterministic_uniform", "priority_sample"]

#: 2^60 — hash60's value range; the uniform denominator
_HASH60_RANGE = float(1 << 60)


def deterministic_uniform(key: Column) -> Column:
    """u in (0, 1] derived from the md5-based 60-bit hash of ``key`` —
    the deterministic stand-in for ``rand()``. (0 is excluded so u can
    sit in a denominator; 60 bits of resolution.)"""
    return (hash60(key) + F.lit(1).cast("double")) / F.lit(_HASH60_RANGE)


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata: list[str] | None = None,
    priority_name: str = "priority",
) -> DataFrame:
    """Keep the ``k`` highest-priority rows per stratum, priority
    ``q = weight / u`` with ``u = deterministic_uniform(key)`` — the
    priority-sampling estimator: P[included] ≈ min(1, w/τ) for the
    per-stratum threshold τ (the (k+1)-th priority), so heavy rows are
    (near-)certainly kept and light rows enter proportionally to their
    weight. Ties (identical priorities) break on the key ascending, so
    the sample is a pure function of the data. Appends the priority
    column for downstream threshold estimation."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    strata = list(strata or [])
    q = (F.col(weight_col).cast("double")
         / deterministic_uniform(F.col(key_col).cast("string")))
    scored = df.withColumn(priority_name, q)
    if not strata:
        # global top-k: orderBy().limit() compiles to
        # TakeOrderedAndProject — per-partition top-k + a k-row driver
        # merge. An empty-partition window here would move EVERY row to
        # one reducer, the classic WindowExec trap this branch avoids.
        return scored.orderBy(F.col(priority_name).desc(),
                              F.col(key_col).asc()).limit(k)
    w = (
        Window.partitionBy(*strata)
        .orderBy(F.col(priority_name).desc(), F.col(key_col).asc())
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
