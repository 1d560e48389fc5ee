"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference engine has no temporal-join surface (SURVEY.md §2.4: it
never joins on inequality; its event analysis stops at lag/lead change
flags, covered by W3); these operators extend the engine the way a
training-data / event-analytics pipeline needs — attributing an
observation to the nearest state row (as-of), and joining points into
intervals (range) — while staying inside Spark's shuffle model:

- :func:`asof_join` is the union + single-window formulation: both
  inputs are unioned on the join key and scanned ONCE in event-time
  order per key, so the whole operation is ONE hash shuffle on the key
  (plus Spark's in-partition sort) — no range-condition join, no
  BroadcastNestedLoop, no per-probe subquery. Cost is
  O(shuffle(|probe| + |build|)), independent of how far matches reach.
  This is the shape a 1000-executor cluster wants at 100 TB.
- :func:`range_join_binned` discretizes the range dimension (time OR a
  numeric measure) into fixed-width bins and turns the interval-overlap
  predicate into a bin EQUI-join (interval side exploded to covered
  bins, point side hashed to its single bin) refined by the exact
  predicate — candidate volume is sum(interval_span/bin_width) x
  per-bin point density instead of |intervals| x |points|, and the join
  shuffles on (key, bin) like any other equi-join. A point lands in
  exactly one bin, so no post-join dedup is needed; overlapping
  intervals still each match (one candidate row per covering interval).

Skew posture: both operators shuffle on the caller's key columns; a
single pathological key (one user with 10^8 events) serializes into one
task, the same caveat as every per-key window in the engine — route
such keys through the skew helpers (operators/skew.py) or widen the key
before calling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_salted", "range_join_binned"]


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    probe_ts: str = "ts",
    build_ts: str = "ts",
    build_cols: Sequence[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = True,
    tiebreak_cols: Sequence[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """For each probe row, attach the nearest build row per key:
    ``backward`` = greatest ``build_ts`` at-or-before (``allow_exact``)
    or strictly-before the probe timestamp; ``forward`` = least
    ``build_ts`` at-or-after / strictly-after. Left semantics: probe
    rows with no eligible build row keep NULL build columns.
    ``build_cols`` defaults to every build column except the key and
    timestamp; each arrives as ``{name}{suffix}``, plus the matched
    build timestamp as ``{build_ts}{suffix}`` (``{build_ts}_matched``
    when that would collide with the probe timestamp column).

    Several build rows at the same (key, build_ts) are ordered by
    ``tiebreak_cols`` (default: all carried columns, in order) and the
    LARGEST wins — deterministic regardless of partitioning. (DuckDB's
    native ASOF JOIN leaves this case ambiguous; pre-aggregate the
    build side to unique (key, ts) when comparing against it.)

    Implementation: tag and union both inputs, then one window per key
    ordered by (ts, side-flag, tiebreaks) taking
    ``last(payload, ignorenulls)`` over the unbounded-preceding frame —
    the running "latest build state seen so far". The side-flag
    ordering encodes the bound: build rows sort BEFORE probe rows at
    equal ts exactly when an equal-ts build row is eligible
    (``allow_exact``); ``forward`` is the mirror image, ordering ts
    descending. The build payload rides as ONE struct so all attached
    columns come from the SAME matched row (per-column
    ``last(ignorenulls)`` could mix rows when a build column is NULL in
    the matched row)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = [on] if isinstance(on, str) else list(on)
    if build_cols is None:
        build_cols = [c for c in build.columns if c not in on and c != build_ts]
    build_cols = list(build_cols)
    tiebreak_cols = list(tiebreak_cols) if tiebreak_cols is not None else build_cols

    probe_payload_names = [c for c in probe.columns if c not in on and c != probe_ts]
    match_ts_name = f"{build_ts}{suffix}"
    if match_ts_name == probe_ts:
        match_ts_name = f"{build_ts}_matched"
    out_build_names = [match_ts_name] + [f"{c}{suffix}" for c in build_cols]
    clashes = set(out_build_names) & set(on + [probe_ts] + probe_payload_names)
    if clashes or len(set(out_build_names)) != len(out_build_names):
        raise ValueError(
            f"asof_join output name collision on {sorted(clashes) or out_build_names}; "
            "pass suffix=... (or rename/trim build_cols) so attached build "
            "columns don't shadow probe columns"
        )

    payload = F.struct(
        F.col(build_ts).alias("__match_ts"),
        *[F.col(c).alias(c) for c in build_cols],
    )
    # a NULL build timestamp has no position on the time axis — it can
    # never be "at-or-before/after" anything (DuckDB ASOF agrees: NULL
    # never matches), so drop such rows instead of letting NULLS FIRST
    # sort them ahead of every probe row. NULL join KEYS are dropped for
    # the same reason: Window.partitionBy groups NULLs together, so
    # without this filter a NULL-key probe row would pick up a NULL-key
    # build row — SQL equality (and DuckDB ASOF) says NULL = NULL never
    # matches. NULL-key probe rows are kept and get NULL matches.
    build_eligible = F.col(build_ts).isNotNull()
    for k in on:
        build_eligible = build_eligible & F.col(k).isNotNull()
    b = build.filter(build_eligible).select(
        *[F.col(k) for k in on],
        F.col(build_ts).alias("__t"),
        F.lit(True).alias("__is_build"),
        payload.alias("__payload"),
    )
    # cast via the DataType object, not simpleString: column names that
    # need backquoting would break the string round-trip
    payload_type = b.schema["__payload"].dataType

    probe_payload_cols = probe_payload_names
    p = probe.select(
        *[F.col(k) for k in on],
        F.col(probe_ts).alias("__t"),
        F.lit(False).alias("__is_build"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c) for c in probe_payload_cols],
    )
    b = b.select(
        *on, "__t", "__is_build", "__payload",
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_payload_cols],
    )
    u = p.unionByName(b)

    # Side-flag ordering encodes the bound at equal timestamps: the
    # window's last() at a probe row must have already scanned every
    # ELIGIBLE build row, so eligible-at-equal-ts => build sorts first.
    # Either direction: an equal-ts build row is eligible iff allow_exact.
    # NULLS FIRST in BOTH directions: a NULL-ts probe row then precedes
    # every (non-null-ts) build row in the scan, so its last() sees
    # nothing and it gets the NULL match its undefined position deserves.
    build_first = allow_exact
    ts_order: Column = (
        F.col("__t").asc_nulls_first() if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    flag = F.when(F.col("__is_build"), F.lit(0 if build_first else 1)).otherwise(
        F.lit(1 if build_first else 0)
    )
    # Tiebreaks totally order equal-ts build rows (probe rows carry NULL
    # payloads and sort among themselves, where order is irrelevant);
    # ascending + last() => largest tiebreak wins.
    order_cols: list[Column] = [ts_order, flag.asc()]
    order_cols += [F.col(f"__payload.{c}").asc_nulls_first() for c in tiebreak_cols]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))

    return matched.filter(~F.col("__is_build")).select(
        *on,
        F.col("__t").alias(probe_ts),
        *[F.col(c) for c in probe_payload_cols],
        F.col("__m.__match_ts").alias(match_ts_name),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in build_cols],
    )


def _axis_num(col: Column, dtype: str) -> Column:
    """Monotone numeric image of the time axis for slicing: timestamps
    via epoch seconds, dates via timestamp (no direct long cast in
    Spark 4), numerics as-is."""
    if dtype.startswith("date"):
        return col.cast("timestamp").cast("double")
    if dtype.startswith("timestamp"):
        return col.cast("double")
    return col.cast("double")


def asof_join_salted(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    probe_ts: str = "ts",
    build_ts: str = "ts",
    build_cols: Sequence[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = True,
    tiebreak_cols: Sequence[str] | None = None,
    suffix: str = "",
    n_slices: int = 32,
) -> DataFrame:
    """Skew-safe :func:`asof_join`: identical semantics and output, but a
    single pathological key no longer serializes into one task. The time
    axis is cut into ``n_slices`` equal slices (bounds from one tiny
    2-value aggregate over both inputs) and the window key widens to
    ``(key, slice)``, so a hot key's rows spread across up to
    ``n_slices`` tasks.

    Correctness hinges on the carry-in rows — the state-replication
    analogue of ``replicated_salted_join`` (operators/skew.py): a probe
    row early in slice *s* may match a build row from an EARLIER slice,
    so for each (key, slice) the winning build row of that slice (the
    one the plain formulation would pick at the slice boundary: max
    (ts, tiebreaks) for backward, min ts / max tiebreaks for forward) is
    replicated into the slices it can carry into — only up to the next
    occupied build slice (``lead`` over the per-key slice list; later
    representatives dominate beyond it, and a dominated extra copy would
    be harmless anyway since the inner window still picks the latest),
    so replication is O(#occupied_slices + n_slices) rows per key, NOT
    O(n_slices^2), and only fixed-width boundary rows are duplicated.
    The sliced problem then delegates to the plain :func:`asof_join` on
    ``on + [slice]`` — one shuffle, same NULL semantics (NULL-ts/NULL-key
    probe rows land in windows with no build rows and keep NULL matches).

    Trade-off vs the plain form: one extra tiny aggregate (axis bounds)
    and the representative/carry computation (a per-(key, slice) top-1 —
    itself sliced, so skew-safe) — worth it when one key dominates;
    pointless when keys are well-distributed. ``n_slices=1`` degenerates
    to the plain operator."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    on = [on] if isinstance(on, str) else list(on)
    if build_cols is None:
        build_cols = [c for c in build.columns if c not in on and c != build_ts]
    build_cols = list(build_cols)
    tiebreak_cols = list(tiebreak_cols) if tiebreak_cols is not None else build_cols

    if n_slices == 1:
        return asof_join(probe, build, on, probe_ts, build_ts, build_cols,
                         direction, allow_exact, tiebreak_cols, suffix)

    p_num = _axis_num(F.col(probe_ts), dict(probe.dtypes)[probe_ts])
    b_num = _axis_num(F.col(build_ts), dict(build.dtypes)[build_ts])
    bounds = (
        probe.select(p_num.alias("v")).unionByName(build.select(b_num.alias("v")))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .first()
    )
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None or hi <= lo:
        # empty or degenerate axis — nothing to slice
        return asof_join(probe, build, on, probe_ts, build_ts, build_cols,
                         direction, allow_exact, tiebreak_cols, suffix)
    width = (hi - lo) / n_slices

    def slice_of(num: Column) -> Column:
        return F.least(
            F.floor((num - F.lit(lo)) / F.lit(width)), F.lit(n_slices - 1)
        ).cast("int")

    probe_s = probe.withColumn("__slice", slice_of(p_num))

    eligible = F.col(build_ts).isNotNull()
    for k in on:
        eligible = eligible & F.col(k).isNotNull()
    b = build.filter(eligible).withColumn("__slice", slice_of(b_num))

    # per-(key, slice) winning representative, ordered exactly as the
    # inner window would pick it at the slice boundary
    if direction == "backward":
        rep_order = [F.col(build_ts).desc()] + [F.col(c).desc_nulls_last()
                                                for c in tiebreak_cols]
    else:
        rep_order = [F.col(build_ts).asc()] + [F.col(c).desc_nulls_last()
                                               for c in tiebreak_cols]
    rep_w = Window.partitionBy(*on, "__slice").orderBy(*rep_order)
    reps = (
        b.withColumn("__rn", F.row_number().over(rep_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # replicate each representative only across the gap to the adjacent
    # occupied slice (lead/lag over the per-key occupied-slice list — a
    # window over <= n_slices rows per key, never over the raw events)
    gap_w = Window.partitionBy(*on).orderBy("__slice")
    if direction == "backward":
        nxt = F.coalesce(F.lead("__slice").over(gap_w), F.lit(n_slices - 1))
        lo_t, hi_t = F.col("__slice") + 1, nxt
    else:
        prv = F.coalesce(F.lag("__slice").over(gap_w), F.lit(0))
        lo_t, hi_t = prv, F.col("__slice") - 1
    carry = (
        reps.withColumn(
            "__targets",
            F.when(lo_t <= hi_t, F.sequence(lo_t, hi_t))
             .otherwise(F.array().cast("array<int>")),
        )
        .withColumn("__slice2", F.explode("__targets"))
        .drop("__targets", "__slice")
        .withColumnRenamed("__slice2", "__slice")
    )

    build_salted = b.unionByName(carry.select(*b.columns))
    out = asof_join(
        probe_s, build_salted, on=on + ["__slice"],
        probe_ts=probe_ts, build_ts=build_ts, build_cols=build_cols,
        direction=direction, allow_exact=allow_exact,
        tiebreak_cols=tiebreak_cols, suffix=suffix,
    )
    return out.drop("__slice")


def _bin_of(col: Column, dtype: str, width: float) -> Column:
    """Bin index for a range-dimension column: timestamps bin on epoch
    seconds (cast to long — monotone, so interval and point columns stay
    consistent), dates via timestamp so ``bin_width`` stays in seconds
    for every temporal type (DATE has no direct long cast in Spark 4),
    numerics bin on their raw value."""
    if dtype.startswith("date"):
        v = col.cast("timestamp").cast("long")
    elif dtype.startswith("timestamp"):
        v = col.cast("long")
    else:
        v = col
    return F.floor(v / F.lit(width)).cast("long")


def range_join_binned(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_width: float,
    on: Sequence[str] | None = None,
    end_inclusive: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Join point rows into intervals (``start <= x < end``, or
    ``<= end`` with ``end_inclusive``) as a bin equi-join: the interval
    side explodes to every ``bin_width``-wide bin it covers, the point
    side hashes to its single bin, and the exact predicate refines the
    per-bin candidates. The range dimension may be a timestamp (bins
    are ``bin_width`` seconds) or a numeric column (bins are
    ``bin_width`` units). ``on`` adds ordinary equi-key columns to the
    bin key. ``how="left"`` keeps empty intervals with NULL point
    columns (null-safe anti-join on the matched interval rows — the bin
    join itself stays inner so unmatched interval×bin rows never
    multiply, and intervals carrying NULL attributes are matched
    correctly). Interval and point column names must not collide
    (beyond ``on``) — raises otherwise.

    Pick ``bin_width`` near the typical interval span: each interval
    explodes to ~span/bin_width + 1 rows, and each candidate list is
    one bin of points — both bounded, both shuffle-friendly. A 30-day
    retention window over years of data wants coarse bins; sub-second
    sensor windows want fine ones."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    # a non-positive (or NaN) width would produce Infinity/NaN bin
    # indices or degenerate F.sequence ranges and fail opaquely at
    # execution time — reject at call time instead
    if not bin_width > 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width!r}")
    on = list(on or [])
    overlap = (set(intervals.columns) & set(points.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"range_join_binned column name collision on {sorted(overlap)}; "
            "rename one side (only `on` keys may be shared)"
        )
    iv_dtypes = dict(intervals.dtypes)
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin_of(F.col(start_col), iv_dtypes[start_col], bin_width),
                _bin_of(F.col(end_col), iv_dtypes[end_col], bin_width),
            )
        ),
    )
    pt = points.withColumn(
        "__bin", _bin_of(F.col(ts_col), dict(points.dtypes)[ts_col], bin_width)
    )

    upper = (
        F.col(ts_col) <= F.col(end_col)
        if end_inclusive
        else F.col(ts_col) < F.col(end_col)
    )
    joined = iv.join(pt, on=on + ["__bin"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & upper
    ).drop("__bin")
    if how == "inner":
        return joined

    from functools import reduce

    from apde_etl_spark.operators.cache import tracked_persist

    # the matched rows feed BOTH output branches (the union and the
    # anti-join's key set) — persist so the explode+join+refine subplan
    # runs once, not twice; release with release_scope("temporal") once
    # the result is consumed
    joined = tracked_persist(joined, scope="temporal")
    point_cols = [c for c in points.columns if c not in on and c != "__bin"]
    iv_cols = list(intervals.columns)
    mk = joined.select(*iv_cols).distinct().select(
        *[F.col(c).alias(f"__mk_{i}") for i, c in enumerate(iv_cols)]
    )
    # null-safe equality: an interval row with a NULL attribute must
    # still count as matched (plain left_anti equality would re-emit it
    # as an empty row — the double-count bug)
    cond = reduce(
        lambda a, b: a & b,
        [intervals[c].eqNullSafe(F.col(f"__mk_{i}"))
         for i, c in enumerate(iv_cols)],
    )
    empties = intervals.join(mk, on=cond, how="left_anti")
    for c in point_cols:
        empties = empties.withColumn(c, F.lit(None).cast(points.schema[c].dataType))
    return joined.unionByName(empties)
