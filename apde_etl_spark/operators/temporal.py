"""Temporal join operators the reference (and stock Spark SQL) lack:
as-of join and point-in-interval range join, built scale-first.

SURVEY.md §2.4 records that the reference never joins on inequality;
these are extension operators for the events/analytics surface, named
in the build plan as the classic "operators Spark lacks" family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` within the same ``on`` key (inclusive as-of
    semantics), or NULLs when no such row exists.

    Algorithm (the scalable one — no per-row subquery, no range
    self-join): tag and union both inputs, then one window pass per key
    ordered by (ts, tag, tie_col) carrying ``last(right row, ignore
    nulls)`` forward; left rows read the carried values. One shuffle on
    the key, state per row is O(carried columns). Ties are broken
    deterministically: right rows sort before left rows at equal
    timestamps (inclusive match), and ``tie_col`` (default: the first
    carried column) totally orders equal-timestamp right rows so the
    result never depends on partitioning.

    Row atomicity: ALL carried right columns are packed into ONE struct
    and carried with a single ``last(struct, ignorenulls=True)``, so the
    output row is exactly the latest matching right row — a NULL inside
    one attribute of that row stays NULL rather than being backfilled
    from an older right row (which per-column carries would do).
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    tie = tie_col or right_cols[0]

    lt = left.withColumn("__tag", F.lit(1))
    # One struct per right row: null-free at the struct level (the struct
    # itself is non-null for right rows, absent for left rows), so
    # last(ignorenulls) skips left rows but keeps nulls INSIDE the row.
    rt = right.select(
        F.col(on),
        (F.col(right_ts).alias(left_ts) if right_ts != left_ts
         else F.col(left_ts)),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    ).withColumn("__tag", F.lit(0))

    u = lt.unionByName(rt, allowMissingColumns=True)
    order_cols = [F.col(left_ts).asc(), F.col("__tag").asc()]
    if len(right_cols) > 0:
        order_cols.append(F.col("__r")[tie].asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    out = u.filter(F.col("__tag") == 1).drop("__tag")
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__r")[c])
    return out.drop("__r")


def range_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 50.0,
) -> DataFrame:
    """Point-in-interval join (``lo <= value < hi``) via binning: each
    interval explodes into the integer bins it covers, facts compute
    their bin in the projection, and the join becomes an EQUI-join on
    the bin plus a residual range filter.

    This is the shape that survives scale: a naive inequality join is a
    broadcast nested loop (O(facts x intervals) comparisons); the binned
    form is a hash join whose fan-out is bounded by
    ``interval_width / bin_width`` per interval, and it stays a hash
    join even when the interval table is too big to broadcast."""
    binned_iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    binned_facts = facts.withColumn(
        "__bin", F.floor(F.col(value_col) / bin_width).cast("long")
    )
    return (
        binned_facts.join(binned_iv, "__bin")
        .filter((F.col(value_col) >= F.col(lo_col))
                & (F.col(value_col) < F.col(hi_col)))
        .drop("__bin")
    )
