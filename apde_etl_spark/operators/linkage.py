"""Record linkage / entity resolution — Fellegi–Sunter over blocked pairs.

The reference pipeline QA-profiles single tables (qa_load_data.R,
explore_data.R); linking records ACROSS loads (same entity, differing
rows) is the natural next operator a public-health ETL needs and a core
training-data-curation primitive (same document from two crawls, same
user across event streams). This module implements the classic
Fellegi–Sunter decision model (Fellegi & Sunter 1969, JASA) the
Spark-first way:

1. **Blocking** is delegated to the existing LSH machinery
   (operators/similarity.py:minhash_lsh_pairs): banded MinHash buckets
   generate candidate pairs WITHOUT an all-pairs join — the only shape
   that survives 100 TB. Any (id_a, id_b, sim) pair list works.
2. **Comparison vectors** (:func:`pair_features`): the pair list joins
   back to the entity table twice on the id — two equi-joins whose
   shuffle is bounded by the candidate count, never by n². Agreement
   levels are integer-coded Columns; the length-ratio gamma uses pure
   integer arithmetic (``min*den >= max*num``) so it is bit-reproducible
   across engines.
3. **Scoring** (:func:`score_column`): sum of per-field log2(m/u)
   likelihood weights, selected per agreement level. Weights are plain
   Python floats computed once at import; both the Spark literal and the
   SQL oracle embed ``repr(w)``, and the terms add left-to-right in
   field-declaration order, so the double arithmetic is identical in
   both engines.
4. **Classification** (:func:`classify_column`): two-threshold
   match / possible / non_match — the FS decision rule.
5. **Clustering** is delegated to operators/dedup.py:connected_components
   over the accepted matches.

Everything here is native Column expressions — no UDFs, no collect.
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_M_U",
    "DEFAULT_WEIGHTS",
    "field_weights",
    "pair_features",
    "score_column",
    "classify_column",
    "em_estimate",
    "em_estimate_fixedpoint",
    "EM_SCALE",
]


def field_weights(
    m_levels: Sequence[float], u_levels: Sequence[float]
) -> tuple[float, ...]:
    """log2 likelihood-ratio weight per agreement level.

    ``m_levels[i]`` = P(gamma = i | pair is a true match),
    ``u_levels[i]`` = P(gamma = i | pair is a non-match); level order is
    disagree .. strongest-agree. Computed driver-side once; the floats
    are embedded as literals in BOTH engines (repr round-trips through
    DuckDB's decimal parser to the identical double).
    """
    if len(m_levels) != len(u_levels):
        raise ValueError("m/u level vectors must have equal length")
    if not math.isclose(sum(m_levels), 1.0) or not math.isclose(sum(u_levels), 1.0):
        raise ValueError("m/u level probabilities must each sum to 1")
    if any(p <= 0 for p in (*m_levels, *u_levels)):
        raise ValueError("m/u probabilities must be strictly positive")
    return tuple(math.log2(m / u) for m, u in zip(m_levels, u_levels))


#: (m_levels, u_levels) per comparison field for the documents-table
#: linkage entries. text is 3-level (disagree / weak shingle overlap /
#: strong); the rest are binary. Fixed model parameters, not estimates —
#: an EM fit would be corpus-specific and nondeterministic.
DEFAULT_M_U: Mapping[str, tuple[tuple[float, ...], tuple[float, ...]]] = {
    "text": ((0.02, 0.18, 0.80), (0.90, 0.09, 0.01)),
    "lang": ((0.05, 0.95), (0.40, 0.60)),
    "source": ((0.10, 0.90), (0.75, 0.25)),
    "len": ((0.08, 0.92), (0.70, 0.30)),
}

#: level -> log2(m/u) weight per field, in field-declaration order (the
#: summation order of the score — keep both engines on this order).
DEFAULT_WEIGHTS: Mapping[str, tuple[float, ...]] = {
    f: field_weights(ms, us) for f, (ms, us) in DEFAULT_M_U.items()
}


def _exact_gamma(a: Column, b: Column) -> Column:
    """Binary agreement for a categorical field: 1 iff both non-NULL and
    equal. NULL never agrees with NULL (consistent with SQL equality and
    with asof_join's NULL-key rule)."""
    return F.when(a.isNotNull() & (a == b), F.lit(1)).otherwise(F.lit(0))


def _len_gamma(a: Column, b: Column, num: int, den: int) -> Column:
    """Binary length-ratio agreement: 1 iff both non-NULL and
    min/max >= num/den — evaluated as ``min*den >= max*num`` in integer
    arithmetic (no float division, bit-identical everywhere)."""
    agree = (
        a.isNotNull()
        & b.isNotNull()
        & (F.least(a, b) * den >= F.greatest(a, b) * num)
    )
    return F.when(agree, F.lit(1)).otherwise(F.lit(0))


def pair_features(
    pairs: DataFrame,
    entities: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "jaccard_sim",
    exact_cols: Sequence[str] = ("lang", "source"),
    len_col: str | None = "n_chars",
    strong: float = 0.5,
    weak: float = 0.2,
    len_ratio: tuple[int, int] = (4, 5),
) -> DataFrame:
    """Comparison vectors for candidate pairs.

    ``pairs`` carries (id_a, id_b, sim_col); ``entities`` carries the id
    and attribute columns. Output keeps the pair key + similarity and
    adds integer gamma columns: ``g_text`` (0/1/2 by sim thresholds),
    ``g_<field>`` per exact field, ``g_len``.

    Plan shape: two equi-joins of the bounded candidate list against the
    entity table on its id (Catalyst broadcasts the small side; at scale
    both are shuffle joins keyed on the entity id — never all-pairs).
    """
    num, den = len_ratio
    attr_cols = [*exact_cols] + ([len_col] if len_col else [])
    a = entities.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"__a_{c}") for c in attr_cols],
    )
    b = entities.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"__b_{c}") for c in attr_cols],
    )
    sim = F.col(sim_col)
    out = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "g_text",
            F.when(sim >= strong, F.lit(2))
            .when(sim >= weak, F.lit(1))
            .otherwise(F.lit(0)),
        )
    )
    for c in exact_cols:
        out = out.withColumn(
            f"g_{c}", _exact_gamma(F.col(f"__a_{c}"), F.col(f"__b_{c}"))
        )
    if len_col:
        out = out.withColumn(
            "g_len", _len_gamma(F.col(f"__a_{len_col}"), F.col(f"__b_{len_col}"), num, den)
        )
    gammas = ["g_text", *[f"g_{c}" for c in exact_cols]] + (["g_len"] if len_col else [])
    return out.select("id_a", "id_b", sim_col, *gammas)


def score_column(
    weights: Mapping[str, Sequence[float]] = DEFAULT_WEIGHTS,
    gamma_prefix: str = "g_",
) -> Column:
    """Fellegi–Sunter composite score: per-field CASE over the gamma
    level picking the level's weight literal, summed left-to-right in
    the mapping's iteration order. Pure projection — codegen'd, no
    shuffle."""
    total: Column | None = None
    for field, ws in weights.items():
        g = F.col(f"{gamma_prefix}{field}")
        term: Column = F.lit(float(ws[0]))
        for level in range(len(ws) - 1, 0, -1):
            term = F.when(g == level, F.lit(float(ws[level]))).otherwise(term)
        total = term if total is None else total + term
    if total is None:
        raise ValueError("weights mapping is empty")
    return total


def classify_column(
    score: Column, upper: float, lower: float
) -> Column:
    """FS two-threshold decision: match / possible / non_match."""
    if lower > upper:
        raise ValueError("lower threshold must not exceed upper")
    return (
        F.when(score >= upper, F.lit("match"))
        .when(score >= lower, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )


_EM_EPS = 1e-6


def em_estimate(
    patterns: Sequence[tuple[Sequence[int], int]],
    level_counts: Sequence[int],
    iters: int = 50,
    init_prior: float = 0.1,
) -> dict:
    """Winkler-style EM for the FS m/u parameters from gamma-pattern
    counts (Winkler 1988, the standard unsupervised fit under
    conditional independence).

    ``patterns`` is the tiny distinct-pattern histogram
    ``[(gamma_tuple, count), ...]`` — the DISTRIBUTED aggregation
    produces it (one groupBy over the candidate pairs; see
    linkage_gamma_patterns), and EM runs driver-side over the handful of
    distinct patterns. Determinism: patterns are processed in sorted
    order, iteration count is fixed, and all arithmetic is plain Python
    floats — the same inputs give the same estimates on every run and
    host. The ESTIMATES stay iterative-float (rows-only gate entry, the
    ann_recall_ivf_trained precedent); the pattern histogram feeding
    them is hash-gated.

    Returns ``{"prior": p, "m": {field_idx: [per-level]},
    "u": {...}, "iters": iters}`` with probabilities clamped to
    ``[1e-6, 1-1e-6]`` (zero cells would freeze EM and blow up the log
    weights).
    """
    pats = sorted((tuple(g), int(n)) for g, n in patterns)
    if not pats:
        raise ValueError("empty pattern histogram")
    n_fields = len(level_counts)
    if any(len(g) != n_fields for g, _ in pats):
        raise ValueError("gamma tuple arity != number of fields")
    for g, _ in pats:
        for f, lvl in enumerate(g):
            if not 0 <= lvl < level_counts[f]:
                raise ValueError(f"gamma level {lvl} out of range for field {f}")
    total = float(sum(n for _, n in pats))

    def clamp(x: float) -> float:
        return min(max(x, _EM_EPS), 1.0 - _EM_EPS)

    # init: agreement-leaning m, disagreement-leaning u — the standard
    # symmetric-break; EM refines from there.
    m = [
        [clamp((lvl + 1.0) / sum(range(1, lc + 1))) for lvl in range(lc)]
        for lc in level_counts
    ]
    u = [
        [clamp((lc - lvl) / sum(range(1, lc + 1))) for lvl in range(lc)]
        for lc in level_counts
    ]
    p = clamp(init_prior)

    for _ in range(iters):
        # E-step: posterior match probability per pattern
        w = []
        for g, _n in pats:
            pm, pu = p, 1.0 - p
            for f, lvl in enumerate(g):
                pm *= m[f][lvl]
                pu *= u[f][lvl]
            w.append(pm / (pm + pu))
        # M-step
        wm = sum(w[j] * n for j, (_, n) in enumerate(pats))
        wu = total - wm
        p = clamp(wm / total)
        for f, lc in enumerate(level_counts):
            for lvl in range(lc):
                num_m = sum(
                    w[j] * n for j, (g, n) in enumerate(pats) if g[f] == lvl
                )
                num_u = sum(
                    (1.0 - w[j]) * n
                    for j, (g, n) in enumerate(pats)
                    if g[f] == lvl
                )
                m[f][lvl] = clamp(num_m / wm) if wm > 0 else _EM_EPS
                u[f][lvl] = clamp(num_u / wu) if wu > 0 else _EM_EPS
    return {"prior": p, "m": m, "u": u, "iters": iters}


#: fixed-point EM scale: probabilities live in [1, SCALE-1] as integers —
#: the integer 1 IS the float version's 1e-6 clamp epsilon.
EM_SCALE = 1_000_000


def em_estimate_fixedpoint(
    patterns: Sequence[tuple[Sequence[int], int]],
    level_counts: Sequence[int],
    iters: int = 50,
    init_prior: tuple[int, int] = (1, 10),
) -> dict:
    """Winkler EM in SCALED-INTEGER arithmetic — every quantity is an
    exact integer, so the fit is bit-identical across hosts, engines,
    and iteration orders, and therefore HASH-GATEABLE: the DuckDB
    oracle restates the same updates in a ``WITH RECURSIVE`` CTE over
    HUGEINTs and lands on the same integers (round-6 verdict item #1 —
    the fixed-point-PageRank treatment applied to EM).

    Probabilities are integers scaled by :data:`EM_SCALE` (S = 10^6),
    clamped to [1, S-1] (the integer 1 plays the float 1e-6 epsilon).
    One E/M step, with ``//`` = floor division (non-negative operands,
    so Python ``//`` == SQL integer division):

    - ``pm_j = p * prod_f m[f][g_j[f]]`` (scaled S^5, <= 10^30 — fits
      int128, which is why the oracle can run it in HUGEINT)
    - ``w_j = (pm_j * S) // (pm_j + pu_j)`` (posterior, scaled S)
    - ``p' = clamp(sum_j w_j n_j // total)``
    - ``m[f][l]' = clamp(S * sum_{j: g_j[f]=l} w_j n_j // wm)`` and the
      ``u`` mirror over ``S - w_j``; a zero denominator freezes the
      parameter at the epsilon, as in the float version.

    ``init_prior`` is a rational (num, den). Init mirrors
    :func:`em_estimate`'s triangular split, floored onto the lattice.

    Returns ``{"prior": int, "m": [[int]], "u": [[int]], "scale": S,
    "iters": iters}``.
    """
    S = EM_SCALE
    pats = sorted((tuple(g), int(n)) for g, n in patterns)
    if not pats:
        raise ValueError("empty pattern histogram")
    n_fields = len(level_counts)
    if any(len(g) != n_fields for g, _ in pats):
        raise ValueError("gamma tuple arity != number of fields")
    for g, _ in pats:
        for f, lvl in enumerate(g):
            if not 0 <= lvl < level_counts[f]:
                raise ValueError(f"gamma level {lvl} out of range for field {f}")

    def clamp(x: int) -> int:
        return min(max(x, 1), S - 1)

    m = [
        [clamp(((lvl + 1) * S) // (lc * (lc + 1) // 2)) for lvl in range(lc)]
        for lc in level_counts
    ]
    u = [
        [clamp(((lc - lvl) * S) // (lc * (lc + 1) // 2)) for lvl in range(lc)]
        for lc in level_counts
    ]
    p = clamp((init_prior[0] * S) // init_prior[1])
    total = sum(n for _, n in pats)

    for _ in range(iters):
        w = []
        for g, _n in pats:
            pm, pu = p, S - p
            for f, lvl in enumerate(g):
                pm *= m[f][lvl]
                pu *= u[f][lvl]
            w.append((pm * S) // (pm + pu))
        wm = sum(w[j] * n for j, (_, n) in enumerate(pats))
        wu = total * S - wm
        p = clamp(wm // total) if total > 0 else p
        for f, lc in enumerate(level_counts):
            for lvl in range(lc):
                num_m = sum(
                    w[j] * n for j, (g, n) in enumerate(pats) if g[f] == lvl
                )
                num_u = sum(
                    (S - w[j]) * n
                    for j, (g, n) in enumerate(pats)
                    if g[f] == lvl
                )
                m[f][lvl] = clamp((num_m * S) // wm) if wm > 0 else 1
                u[f][lvl] = clamp((num_u * S) // wu) if wu > 0 else 1
    return {"prior": p, "m": m, "u": u, "scale": S, "iters": iters}
