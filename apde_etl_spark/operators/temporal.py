"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference engine has no temporal-join surface (its event analysis
stops at lag/lead change flags, qa_load_data.R-era semantics covered by
W3); these operators extend the engine the way a training-data /
event-analytics pipeline needs — attributing an observation to the most
recent state row at-or-before it (as-of), and joining points into time
intervals (range) — while staying inside Spark's shuffle model:

- :func:`asof_join` is the union + single-window formulation: both
  inputs are unioned on the join key and scanned ONCE in event-time
  order per key, so the whole operation is ONE hash shuffle on the key
  (plus Spark's in-partition sort) — no range-condition join, no
  BroadcastNestedLoop, no per-probe binary search. This is the same
  shape a 1000-executor cluster wants at 100 TB: cost is
  O(shuffle(|probe| + |build|)), independent of how far back matches
  reach.
- :func:`range_join_binned` discretizes time into fixed-width bins and
  turns the interval-overlap predicate into a bin EQUI-join (interval
  side exploded to covered bins, point side hashed to its single bin)
  refined by the exact predicate — candidate volume is
  sum(interval_span/bin_width) x per-bin point density instead of
  |intervals| x |points|, and the join shuffles on (key, bin) like any
  other equi-join. A point lands in exactly one bin, so no
  post-join dedup is needed.

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

__all__ = ["asof_join", "range_join_binned"]


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    probe_ts: str,
    build_ts: str,
    build_cols: Sequence[str],
    direction: str = "backward",
    allow_exact: bool = True,
    suffix: str = "",
) -> DataFrame:
    """For each probe row, attach the nearest build row per key:
    ``backward`` = greatest ``build_ts`` at-or-before (``allow_exact``)
    or strictly-before the probe timestamp; ``forward`` = least
    ``build_ts`` at-or-after / strictly-after. Left semantics: probe
    rows with no eligible build row keep NULL build columns.

    If ``build`` has several rows at the same (key, build_ts), the one
    sorting last in the window order wins — pre-aggregate the build
    side to unique (key, ts) when you need a deterministic result (the
    catalog entries do; DuckDB's ASOF JOIN has the same ambiguity).

    Implementation: tag and union both inputs, then one window per key
    ordered by (ts, side-flag) taking ``last(payload, ignorenulls)``
    over the unbounded-preceding frame — the running "latest build
    state seen so far". The side-flag ordering encodes the bound: for
    backward+exact, build rows sort BEFORE probe rows at equal ts (an
    equal-ts build row is eligible); for strict, after. ``forward`` is
    the mirror image, ordering ts descending. The build payload rides
    as ONE struct so all attached columns come from the SAME matched
    row (per-column ``last(ignorenulls)`` could mix rows when a build
    column is NULL in the matched row)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    build_cols = list(build_cols)

    payload = F.struct(
        F.col(build_ts).alias("__match_ts"),
        *[F.col(c).alias(c) for c in build_cols],
    )
    b = build.select(
        *[F.col(k) for k in on],
        F.col(build_ts).alias("__t"),
        F.lit(True).alias("__is_build"),
        payload.alias("__payload"),
    )
    payload_type = b.schema["__payload"].dataType.simpleString()

    probe_payload_cols = [c for c in probe.columns if c not in on and c != probe_ts]
    p = probe.select(
        *[F.col(k) for k in on],
        F.col(probe_ts).alias("__t"),
        F.lit(False).alias("__is_build"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c) for c in probe_payload_cols],
    )
    b = b.select(
        *on, "__t", "__is_build", "__payload",
        *[F.lit(None).cast(dict(probe.dtypes)[c]).alias(c)
          for c in probe_payload_cols],
    )
    u = p.unionByName(b)

    # Side-flag ordering encodes the bound at equal timestamps: the
    # window's last() at a probe row must have already scanned every
    # ELIGIBLE build row, so eligible-at-equal-ts => build sorts first.
    # either direction: an equal-ts build row is eligible iff allow_exact
    build_first = allow_exact
    ts_order: Column = (
        F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    )
    flag = F.when(F.col("__is_build"), F.lit(0 if build_first else 1)).otherwise(
        F.lit(1 if build_first else 0)
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, flag.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))

    out = matched.filter(~F.col("__is_build")).select(
        *on,
        F.col("__t").alias(probe_ts),
        *[F.col(c) for c in probe_payload_cols],
        F.col("__m.__match_ts").alias(f"{build_ts}{suffix}"
                                      if f"{build_ts}{suffix}" != probe_ts
                                      else f"{build_ts}_matched"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in build_cols],
    )
    return out


def range_join_binned(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_seconds: int,
    on: Sequence[str] | None = None,
    end_inclusive: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Join point rows into time intervals (``start <= ts < end``, or
    ``<= end`` with ``end_inclusive``) as a bin equi-join: the interval
    side explodes to every ``bin_seconds``-wide bin it covers, the
    point side hashes to its single bin, and the exact predicate
    refines the per-bin candidates. ``on`` adds ordinary equi-key
    columns to the bin key. ``how="left"`` keeps empty intervals with
    NULL point columns (anti-join on the matched interval rows — the
    bin join itself stays inner so unmatched interval×bin rows never
    multiply).

    Pick ``bin_seconds`` near the typical interval span: each interval
    explodes to ~span/bin_seconds + 1 rows, and each candidate list is
    one bin of points — both bounded, both shuffle-friendly. A 30-day
    retention window over years of data wants coarse bins; sub-second
    sensor windows want fine ones."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on or [])
    w = int(bin_seconds)
    s_bin = F.floor(F.col(start_col).cast("long") / w)
    e_bin = F.floor(F.col(end_col).cast("long") / w)
    iv = intervals.withColumn("__bin", F.explode(F.sequence(s_bin, e_bin)))
    pt = points.withColumn("__bin", F.floor(F.col(ts_col).cast("long") / w))

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

    point_cols = [c for c in points.columns if c not in on and c != "__bin"]
    matched_keys = joined.select(*intervals.columns).distinct()
    empties = intervals.join(matched_keys, on=list(intervals.columns),
                             how="left_anti")
    for c in point_cols:
        empties = empties.withColumn(c, F.lit(None).cast(dict(points.dtypes)[c]))
    return joined.unionByName(empties)
