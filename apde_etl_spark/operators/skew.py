"""Skew-mitigation primitives for 100 TB-scale shuffles.

AQE (enabled in :mod:`apde_etl_spark.session`) already splits skewed
partitions in sort-merge joins at runtime; these helpers cover the two
cases AQE does not: hash-aggregation skew (one hot group key overwhelms
a reducer) and broadcast-ineligible dimension joins against a skewed fact
key. Both are plan-level rewrites — pure DataFrame ops, no sampling pass.

The reference never needed any of this (its biggest shuffle was a
single-server GROUP BY); it exists for the engine's scale target.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups by (keys + salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 re-combines per key. Only
    *algebraic* aggregates survive two-stage recombination; supported
    ``aggs`` = {out_col: (fn, in_col)} with fn in
    {sum, count, min, max}. ``count`` recombines as sum of partial counts.

    ``salt_source``: a column whose hash spreads rows (e.g. a unique id)
    — deterministic, retry-safe. Defaults to ``monotonically_increasing_id``
    hashed, which is stable within a task attempt.
    """
    supported = {"sum", "count", "min", "max"}
    bad = {fn for fn, _ in aggs.values()} - supported
    if bad:
        raise ValueError(f"non-algebraic aggregates not salt-safe: {sorted(bad)}")

    if salt_source is None:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    else:
        src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(src), F.lit(salt_buckets))

    partial_aggs = []
    final_aggs = []
    for out, (fn, col) in aggs.items():
        p = f"__p_{out}"
        if fn == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))

    staged = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return staged.groupBy(*keys).agg(*final_aggs)


def replicated_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    fact_salt_source: str | Column | None = None,
) -> DataFrame:
    """Equi-join a skew-keyed fact against a dimension too large to
    broadcast: the fact side gets a deterministic salt in
    ``[0, salt_buckets)``, the dimension is replicated once per salt
    value (explode over a literal range — dim rows x buckets), and the
    join key becomes (key, salt). The hot fact key now lands on
    ``salt_buckets`` reducers instead of one.

    Replication cost is ``salt_buckets`` x dim size — choose the smallest
    bucket count that flattens the skew (or use AQE's skew-join for
    sort-merge cases; this helper is for when you must hash-partition).

    Only fact-preserving join types are accepted: under ``right``/
    ``full``/``right_semi`` the replicated dim rows that matched no fact
    row would each survive once PER SALT VALUE (``salt_buckets``
    null-padded duplicates per unmatched dim key), so the rewrite is not
    semantics-preserving there and such hows raise instead of silently
    corrupting.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"replicated_salted_join: join type '{how}' is not "
            "fact-preserving under dim replication (unmatched dim rows "
            "would duplicate once per salt value); use inner/left/"
            "left_semi/left_anti"
        )
    if fact_salt_source is None:
        fsalt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    else:
        src = (
            F.col(fact_salt_source)
            if isinstance(fact_salt_source, str)
            else fact_salt_source
        )
        fsalt = F.pmod(F.xxhash64(src), F.lit(salt_buckets))

    f_salted = fact.withColumn("__salt", fsalt)
    d_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    out = f_salted.join(d_rep, [key, "__salt"], how)
    return out.drop("__salt")


def hash_priority_cap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n: int,
    safety: float = 8.0,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Per-key top-``n`` by deterministic hash priority WITHOUT shuffling
    the full key group — the hot-domain guard for per-domain caps.

    A plain ``row_number`` window ships every row of a key to one
    reducer; a crawl domain with 10^9 pages makes that reducer the job.
    Here the priority is a uniform content-free hash, so the kept rows
    almost surely sit in the smallest ``n/cnt`` quantile of the hash
    space. Three cheap steps replace the full shuffle:

    1. per-key counts (map-side-combined agg, one tiny row per key),
       broadcast back;
    2. prune to rows with hash below ``n * safety / cnt`` of the hash
       space (a scan-side filter: expected survivors ~``n * safety``
       per key, independent of key size);
    3. the exact window runs over survivors only.

    Exactness is guaranteed, not probabilistic: a key whose survivor
    count came up short of ``min(n, cnt)`` (hash clustering beyond the
    safety margin — Chernoff-improbable but possible) is detected by
    comparing kept counts against expectations and re-ranked over its
    FULL rows; the rescue set is empty in every sane run, so the extra
    pass costs an empty scan. Output = input columns + ``rank_col``,
    identical to the plain-window cap row-for-row.
    """
    from pyspark.sql.window import Window

    from apde_etl_spark.operators.similarity import hash60

    HASH_SPACE = float(1 << 60)  # hash60 range [0, 2^60)
    pr = hash60(F.col(id_col).cast("string"))
    cols = df.columns

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__cnt"))
    cut = (
        F.when(F.col("__cnt") <= F.lit(int(n * safety)), F.lit(1 << 62))
        .otherwise(
            (F.lit(HASH_SPACE) * F.lit(float(n) * safety) / F.col("__cnt"))
            .cast("long")
        )
        .alias("__cut")
    )
    # all key joins below are NULL-SAFE: groupBy collects NULL keys into
    # one group like the plain window does, so the equality joins must
    # match that group too or NULL-key rows silently vanish
    # no broadcast HINT on the counts table: at web-crawl domain
    # cardinality (millions of keys) a forced broadcast can blow the
    # driver/executor broadcast limit. The join is a plain equi-join —
    # AQE broadcasts it when it is actually small (the common case) and
    # falls back to a shuffle join when it is not; both are correct.
    thresholds = counts.select(F.col(key_col).alias("__k"), "__cnt", cut)
    tagged = (
        df.withColumn("__pr", pr)
        .join(thresholds, F.col(key_col).eqNullSafe(F.col("__k")))
        .drop("__k")
    )
    surv = tagged.filter(F.col("__pr") <= F.col("__cut"))
    w = Window.partitionBy(key_col).orderBy(
        F.col("__pr").asc(), F.col(id_col).asc()
    )
    from apde_etl_spark.operators.cache import tracked_persist

    ranked = tracked_persist(
        surv.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n),
        scope="skew",  # read twice: rescue probe + final union;
        # release_scope("skew") once consumed
    )
    # rescue probe: any key whose kept count < min(n, cnt) was pruned
    # too hard — re-rank that key's FULL rows (exactness guard). Driven
    # from `counts` (every key), NOT from `ranked`: a key whose prune
    # left ZERO survivors has no ranked row at all and would otherwise
    # escape detection and vanish from the output.
    kept = ranked.groupBy(key_col).agg(F.count(F.lit(1)).alias("__kept"))
    short = (
        counts.select(F.col(key_col).alias("__sk"), "__cnt")
        .join(
            kept.select(F.col(key_col).alias("__kk"), "__kept"),
            F.col("__sk").eqNullSafe(F.col("__kk")),
            "left",
        )
        .filter(
            F.coalesce(F.col("__kept"), F.lit(0))
            < F.least(F.lit(n), F.col("__cnt"))
        )
        .select("__sk")
    )
    # rescue keys: empty in every sane run, but unhinted for the same
    # reason as the counts table — AQE picks broadcast when small
    rescue = (
        tagged.join(
            short, F.col(key_col).eqNullSafe(F.col("__sk")), "left_semi"
        )
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )
    ok = ranked.join(
        short, F.col(key_col).eqNullSafe(F.col("__sk")), "left_anti"
    )
    out_cols = [*cols, rank_col]
    return ok.select(*out_cols).unionByName(rescue.select(*out_cols))
