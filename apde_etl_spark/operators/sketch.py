"""Mergeable frequency / quantile sketches with portable integer state.

The same design contract as :mod:`profile`'s portable HLL registers:
sketch state is PLAIN INTEGERS (no engine-native binary blobs), so it
persists as parquet, merges across shards/days with one associative
groupBy, and hash-gates against a DuckDB restatement of the identical
arithmetic. Two families:

- **Count-Min sketch** (Cormode & Muthukrishnan 2005, public method):
  ``depth`` independent hash rows of ``width`` counters; point-frequency
  estimate = min over rows of the hashed counter. Counters are exact
  BIGINT sums, so registers merge with SUM and the estimate is
  deterministic. The one-sided error guarantee (estimate >= true count,
  over by at most eps*N with probability 1-delta) is checked in-gate by
  emitting estimate and exact side by side.

- **Log-binned histogram** (the HdrHistogram/DDSketch family reduced to
  its deterministic core): bin id = bit length of the value scaled to
  integer ticks, i.e. power-of-two relative-error buckets. Counts are
  exact BIGINTs per bin; quantile queries return the EXACT BOUNDS of the
  bin containing the target rank — a guaranteed enclosure, not a point
  estimate, so the result hash-gates without any float quantile
  interpolation.

Reference parity note: the reference engine profiles frequencies and
quantiles exactly per batch (qa_load_file_snapshot.R:61-108's row-count
and distribution checks); these sketches are the 100 TB continuation —
per-partition state built once at ingest, any window answered by
merging ~KB of integers instead of rescanning history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apde_etl_spark.operators.similarity import hash60

#: Count-Min geometry. width is a power of two (the modulo is cheap) and
#: small enough that a full sketch is depth*width = 1024 BIGINTs — ~8 KB
#: of state per group regardless of key cardinality.
CMS_DEPTH = 4
CMS_WIDTH = 256


def _salted_pos(key: Column, j: Column | int, m: int) -> Column:
    """hash60 of the j-salted key, reduced mod m. The salt is a string
    prefix (``j:``) so the DuckDB twin is the same md5 over the same
    bytes. ONE home for the formula — Count-Min buckets and Bloom
    positions both use it (and :func:`sql_salted_pos` is its SQL
    twin), so a salt-scheme change cannot silently diverge."""
    r = F.lit(j) if isinstance(j, int) else j
    return (
        hash60(F.concat(r.cast("string"), F.lit(":"), key.cast("string")))
        % F.lit(m)
    ).cast("int")


def _cms_bucket(key: Column, row_id: Column | int) -> Column:
    return _salted_pos(key, row_id, CMS_WIDTH)


def cms_registers(df: DataFrame, key_col: str,
                  group_cols: Sequence[str] = ()) -> DataFrame:
    """Build Count-Min registers: (group..., row_id, bucket, cnt).

    One explode to depth rows per input row, then an exact groupBy SUM —
    partial aggregation absorbs hot keys map-side, and the result is at
    most depth*width rows per group no matter how many distinct keys
    passed through (the whole point at 100 TB: frequency state that does
    NOT grow with key cardinality). NULL keys are ignored. Merging
    shards/days is ``groupBy(row_id, bucket).sum(cnt)`` — associative
    and exact."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1)))
    keyed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, F.col(key_col).alias("__k"),
                rows.alias("row_id"))
    )
    return (
        keyed.select(*group_cols, "row_id",
                     _cms_bucket(F.col("__k"), F.col("row_id"))
                     .alias("bucket"))
        .groupBy(*group_cols, "row_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(registers: DataFrame, keys: DataFrame,
                 key_col: str) -> DataFrame:
    """Point-frequency estimates for ``keys`` from (merged) registers:
    join each key's depth (row, bucket) probes against the register
    table and take MIN(cnt) — missing registers count as 0. The keys
    frame is the small side by construction (a probe set), so it
    broadcasts; the register table is <= depth*width rows and would
    broadcast too, but keeping it the build side lets the same code
    serve per-group register tables that are wider than one sketch.
    Returns (key, est_cnt)."""
    probes = keys.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1)))
        .alias("row_id"),
    )
    probes = probes.select(
        "__k", "row_id",
        _cms_bucket(F.col("__k"), F.col("row_id")).alias("bucket"))
    return (
        F.broadcast(probes)
        .join(registers, ["row_id", "bucket"], "left")
        .groupBy(F.col("__k").alias(key_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long")
             .alias("est_cnt"))
    )


def sql_salted_pos(key_expr: str, j_expr: str, m: int) -> str:
    """DuckDB twin of :func:`_salted_pos`."""
    salted = f"CAST({j_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)"
    h = f"CAST(concat('0x', substr(md5({salted}), 1, 15)) AS BIGINT)"
    return f"CAST({h} % {m} AS INTEGER)"


def sql_cms_bucket(key_expr: str, row_expr: str) -> str:
    """DuckDB twin of :func:`_cms_bucket` (same md5-prefix hash60)."""
    return sql_salted_pos(key_expr, row_expr, CMS_WIDTH)


# ===========================================================================
# Log-binned histogram: deterministic quantile enclosures
# ===========================================================================

#: values are scaled to integer ticks before binning so the bin edges are
#: exact decimals; 1000 ticks = 3 decimal digits preserved near zero
QHIST_TICKS = 1000


def qhist_registers(df: DataFrame, value_col: str,
                    group_cols: Sequence[str] = ()) -> DataFrame:
    """(group..., bin, cnt) — exact counts per power-of-two bin: 0 for
    v < 1 tick, else bit length of the tick count (bin b holds ticks
    in [2^(b-1), 2^b)). The bit length comes from the binary-string
    length — the same exact-integer trick as HLL's rho, agreed by both
    engines' ``bin()`` — never a float log2. Merging is SUM; NULL and
    negative values are excluded (the sketch serves latency/size-style
    non-negative metrics)."""
    v = F.col(value_col)
    ticks = F.floor(v.cast("double") * QHIST_TICKS).cast("long")
    t = (
        df.filter(v.isNotNull() & (v >= 0))
        .select(*group_cols, ticks.alias("__ticks"))
    )
    # cap at bin 62: ticks >= 2^62 (bit length 63+) land in the top
    # bucket so the bound expressions shiftleft(1, bin) never exceed
    # int64 (the DuckDB twin would raise Out of Range at bin 63; Spark
    # would wrap negative — capping keeps both engines exact and
    # identical). For capped values the top bucket's hi bound 2^62 is
    # OPEN-ENDED — it no longer encloses the true value; see the
    # qhist_quantile_bounds / qhist_rolling docstrings.
    b = (
        F.when(F.col("__ticks") <= 0, F.lit(0))
        .otherwise(F.least(F.length(F.expr("bin(__ticks)")), F.lit(62)))
        .cast("int")
    )
    return (
        t.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def qhist_quantile_bounds(registers: DataFrame, q_num: int,
                          q_den: int) -> DataFrame:
    """Exact enclosure of the q-quantile from (merged) bins: the target
    rank is ceil(q*n) computed in INTEGER arithmetic ((n*q_num +
    q_den - 1) div q_den), the running cumulative count locates its
    bin, and the returned bounds are that bin's exact INTEGER tick
    edges — lo_ticks = 2^(b-1), hi_ticks = 2^b (bin 0 is [0, 1)) —
    so the guarantee ``lo_ticks <= exact_ticks < hi_ticks`` hash-gates
    with no float arithmetic anywhere. Caveat: when the quantile lands
    in the capped top bucket (bin 62, which absorbs ticks >= 2^62),
    its hi bound is open-ended — ``exact_ticks < hi_ticks`` is not
    guaranteed there (see qhist_registers' bin cap). One window over
    <= 64 bin rows (post-aggregation state, the documented tiny-window
    class).
    Returns (n, rank, bin, lo_ticks, hi_ticks)."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = registers.agg(F.sum("cnt").alias("__n"))
    cum = (
        registers.crossJoin(F.broadcast(tot))
        .select(
            "bin", "cnt", "__n",
            F.sum("cnt").over(w).alias("__cum"),
        )
    )
    rank = F.expr(f"(__n * {q_num} + {q_den} - 1) div {q_den}")
    hit = (
        cum.filter(F.col("__cum") >= rank)
        .orderBy("bin").limit(1)
    )
    lo = F.when(F.col("bin") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bin - 1)"))
    hi = F.expr("shiftleft(CAST(1 AS BIGINT), bin)")
    return hit.select(
        F.col("__n").alias("n"), rank.cast("long").alias("rank"), "bin",
        lo.alias("lo_ticks"), hi.alias("hi_ticks"),
    )


# ===========================================================================
# KMV (k-minimum-values) distinct sketch: set algebra over sketches
# ===========================================================================

#: sketch size. Small enough that a saturated sketch is 64 BIGINTs
#: (~0.5 KB) per group, large enough for ~12% standard error on
#: distinct estimates (1/sqrt(k-2)); chosen so the SATURATED estimator
#: path (not just the exact small-set path) is exercised at the gate's
#: own scale factors.
KMV_K = 64

#: hash60 values live in [0, 2^60)
KMV_SPACE = 1 << 60


def kmv_sketch(df: DataFrame, key_col: str,
               group_cols: Sequence[str] = (), k: int = KMV_K) -> DataFrame:
    """Build per-group KMV sketches: (group..., rnk, hval) — the k
    SMALLEST DISTINCT hash60 values of the key (Bar-Yossef et al. 2002
    / Beyer et al. 2007, public method). Unlike HLL registers (union
    only), KMV sketches support INTERSECTION estimates, because the
    k-min set is a uniform sample of the hashed key space.

    Scale shape: distinct-then-rank. The rank filter is a
    ``row_number() <= k`` predicate that Spark's WindowGroupLimit
    rewrite turns into a per-partition top-k (no full per-group
    materialization); merging sketches later never rescans this input
    — it unions <= groups*k integer rows. NULL keys are ignored,
    matching countDistinct."""
    from pyspark.sql import Window

    from apde_etl_spark.operators.similarity import hash60

    hashed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols,
                hash60(F.col(key_col).cast("string")).alias("hval"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("hval")
    return (
        hashed.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def kmv_merge(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge per-group sketches into ONE sketch: distinct hvals across
    all groups, re-ranked, k smallest kept. Input is <= groups*k rows
    (post-aggregation sketch state, the documented tiny-window class),
    so the global window is a few KB, never the raw data."""
    from pyspark.sql import Window

    w = Window.orderBy("hval")
    return (
        sketches.select("hval").distinct()
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate from ONE merged sketch -> 1 row
    (n_in_sketch, kth_min, est_distinct). Saturated: est = floor(
    (k-1) * 2^60 / kth_min) — INTEGER arithmetic end to end. The
    numerator exceeds int64, so both engines do the division in their
    exact wide-integer type: Spark's integral ``div`` over
    DECIMAL(38,0) (never the rounding fractional ``/``), DuckDB's
    HUGEINT ``//`` — bit-identical floors. Unsaturated (< k distinct
    values seen): the sketch IS the set, estimate = exact count."""
    agg = sketch.agg(
        F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
        F.max(F.when(F.col("rnk") == k, F.col("hval"))).alias("kth_min"),
    )
    return agg.select("n_in_sketch", "kth_min",
                      kmv_estimate_expr(k).alias("est_distinct"))


def kmv_estimate_expr(k: int = KMV_K) -> Column:
    """The estimator as a Column over (n_in_sketch, kth_min) — the ONE
    place the (k-1)*2^60/kth arithmetic lives on the Spark side, so
    grouped consumers (per-window estimates) share it with
    :func:`kmv_estimate`."""
    num = (k - 1) * KMV_SPACE
    return F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch")
    ).otherwise(F.expr(
        f"CAST(CAST({num} AS DECIMAL(38,0))"
        f" div CAST(kth_min AS DECIMAL(38,0)) AS BIGINT)")).cast("long")


def sql_kmv_estimate(k: int = KMV_K) -> str:
    """DuckDB twin of the :func:`kmv_estimate` arithmetic, as an
    expression over columns (n_in_sketch, kth_min)."""
    num = (k - 1) * KMV_SPACE
    return (f"CAST(CASE WHEN n_in_sketch < {k} THEN n_in_sketch "
            f"ELSE CAST({num} AS HUGEINT) // kth_min END AS BIGINT)")


# ===========================================================================
# Bloom filter: portable set-membership bits
# ===========================================================================

#: filter geometry: m bits, k salted hashes. Small enough that a full
#: filter is <= 4096 integer rows per group; at the gate's sf0.1 the
#: inserts exceed m so the measured false-positive rate is non-trivial
#: (the accuracy contract is IN the gate, not assumed).
BLOOM_M = 4096
BLOOM_K = 3


def bloom_bits(df: DataFrame, key_col: str,
               group_cols: Sequence[str] = ()) -> DataFrame:
    """Build Bloom registers: (group..., pos) — the DISTINCT set bit
    positions (Bloom 1970, public method). Position j of a key =
    hash60("j:" || key) mod m, the same salt scheme as the Count-Min
    rows so the DuckDB twin is the same md5 bytes. State is plain
    integers: persists as parquet, merges across shards/days with
    DISTINCT (bitwise OR), membership = all k positions present.
    NULL keys are ignored."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1)))
    keyed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, F.col(key_col).alias("__k"),
                rows.alias("__j"))
    )
    pos = _salted_pos(F.col("__k"), F.col("__j"), BLOOM_M)
    return keyed.select(*group_cols, pos.alias("pos")).distinct()


def bloom_contains(bits: DataFrame, keys: DataFrame,
                   key_col: str) -> DataFrame:
    """Membership probes against (merged) bits: a key is flagged
    member iff ALL k of its positions are set. The probe frame is
    small by construction and broadcasts; the bit table is <= m rows.
    Returns (key, is_member). No false negatives, by construction."""
    probes = keys.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("__j"),
    )
    probes = probes.select(
        "__k", _salted_pos(F.col("__k"), F.col("__j"), BLOOM_M)
        .alias("pos"))
    # broadcast the BITS side: it is <= m rows, and a LEFT join can
    # only build its right side (a broadcast hint on the preserved
    # probe side would be silently dropped by JoinSelection)
    hit = probes.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "pos", "left")
    return (
        hit.groupBy(F.col("__k").alias(key_col))
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce(F.col("__set"),
                                                    F.lit(0))))
             .alias("is_member"))
    )


def sql_bloom_pos(key_expr: str, j_expr: str) -> str:
    """DuckDB twin of the Bloom position hash."""
    return sql_salted_pos(key_expr, j_expr, BLOOM_M)
