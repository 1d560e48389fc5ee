"""Similarity-search operators over embedding columns (extension surface —
BASELINE.json north star: dedup / similarity search / ANN at 100 TB).

Round 1 ships the brute-force cosine top-k baseline as native Column
expressions (``zip_with`` + ``aggregate`` fold — JVM-side, codegen'd, no
Python in the loop). The LSH-bucketed scale path follows in a later round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over two array<double> columns —
    fold order is deterministic, so results are bit-stable and match any
    oracle that folds the same way."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of ``query_vec`` against every row.

    The query vector rides along as a literal (broadcast by construction);
    the plan is scan -> project(cosine) -> TakeOrderedAndProject, i.e. one
    pass with per-partition top-k then a k-row driver merge — no shuffle
    of the full table even at 100 TB.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = as_double_array(vec_col)
    out = df.select(
        F.col(id_col),
        cosine(emb, q).alias("cosine_sim"),
    )
    return out.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)
