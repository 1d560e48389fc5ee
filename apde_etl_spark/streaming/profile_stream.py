"""Structured Streaming wrappers over the profiling aggregations.

The reference has zero streaming code (SURVEY.md §2.12) — this module is
an explicit extension, not a port: the same missingness/frequency
semantics over event-time tumbling windows with watermarked late-data
handling. Each function accepts a *streaming or batch* DataFrame; on a
batch frame the same plan computes the identical result (Spark's
unified-API property), which is how the tests oracle-check it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apde_etl_spark.operators.reshape import melt_long


def windowed_missingness(
    df: DataFrame,
    event_time: str,
    cols: Sequence[str],
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Missingness profile per tumbling event-time window.

    Same aggregate-first shape as the batch operator: one window-grouped
    pass with per-column conditional sums, melt applied to the aggregated
    rows. Watermark bounds state: windows older than ``watermark`` are
    finalized and evicted, so state size is O(open windows x columns),
    independent of stream length.
    """
    src = df
    if df.isStreaming:
        src = df.withWatermark(event_time, watermark)
    aggs = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    wide = src.groupBy(F.window(event_time, window).alias("win")).agg(
        *aggs, F.count(F.lit(1)).alias("__total")
    )
    wide = wide.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "__total",
        *cols,
    )
    long = melt_long(
        wide, ["window_start", "window_end", "__total"], list(cols),
        value_name="nrow", value_type="long",
    )
    return long.select(
        "window_start", "window_end", "varname", "nrow",
        (F.col("nrow") / F.col("__total")).alias("proportion"),
    )


def windowed_numeric_stats(
    df: DataFrame,
    event_time: str,
    cols: Sequence[str],
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Numeric profile (mean/min/max, NULLs ignored) per tumbling
    event-time window — the A2 batch operator's streaming face. Exact
    medians are deliberately absent: a per-window percentile buffer is
    unbounded streaming state; use the batch histogram path on the
    landed data when medians are needed. One window-grouped pass with
    per-column aggregates, melt applied to the aggregated rows;
    watermark bounds state to O(open windows x columns)."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(event_time, watermark)
    aggs: list = []
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [
            F.avg(d).alias(f"{c}__mean"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
        ]
    wide = src.groupBy(F.window(event_time, window).alias("win")).agg(*aggs)
    pairs = ", ".join(f"'{c}', `{c}__mean`, `{c}__min`, `{c}__max`" for c in cols)
    stack = f"stack({len(cols)}, {pairs}) as (varname, mean, min, max)"
    return wide.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        F.expr(stack),
    )


def windowed_categorical_freq(
    df: DataFrame,
    event_time: str,
    col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Value frequencies per tumbling window for one categorical column.

    Counts only (no windowed proportion): a running proportion over a
    streaming aggregate would need a second stateful stage; downstream
    consumers derive it per finalized window instead.
    """
    src = df
    if df.isStreaming:
        src = df.withWatermark(event_time, watermark)
    return (
        src.groupBy(
            F.window(event_time, window).alias("win"),
            F.col(col).cast("string").alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.lit(col).alias("varname"),
            "value",
            "count",
        )
    )


def stream_exact_dedup(
    df: DataFrame,
    event_time: str,
    key_cols: Sequence[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: emit each key the first time it is
    seen (the streaming analog of content-hash dedup in a training-data
    ingest — documents arrive continuously, only unseen ones pass).

    Streaming uses ``dropDuplicatesWithinWatermark`` so per-key state is
    evicted once the key is older than ``watermark`` — state stays
    O(keys per watermark window), independent of stream length (plain
    ``dropDuplicates`` on non-event-time keys would grow state forever).
    On a batch frame the same call site computes plain DISTINCT, which is
    how the oracle checks it.

    Caveat (the price of bounded state): "first time seen" holds only
    WITHIN the watermark. A key recurring more than ``watermark`` after
    its last occurrence has had its state evicted and is emitted AGAIN,
    so the streaming output diverges from the batch DISTINCT oracle on
    data whose duplicates are spaced wider than the watermark. Size
    ``watermark`` to the maximum expected duplicate spacing, or use the
    batch path when exact global dedup is required.
    """
    if df.isStreaming:
        deduped = df.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    else:
        deduped = df.dropDuplicates(list(key_cols))
    return deduped.select(*key_cols)


def windowed_sliding_counts(
    df: DataFrame,
    event_time: str,
    group_col: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-group counts over *sliding* event-time windows (extension,
    SURVEY §2.12 — the reference has no streaming at all).

    Each event lands in ``window/slide`` overlapping windows; Spark
    expands them at the window operator, so state is bounded by
    (windows-in-watermark x groups), independent of stream length."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(event_time, watermark)
    return (
        src.groupBy(
            F.window(event_time, window, slide).alias("win"),
            F.col(group_col),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "count",
        )
    )


def windowed_session_counts(
    df: DataFrame,
    event_time: str,
    group_col: str,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-group session aggregates with Spark's NATIVE ``session_window``
    (extension, SURVEY §2.12): sessions merge while consecutive events
    are <= ``gap`` apart (a gap of exactly the duration still merges);
    a session's end is last-event-time + ``gap``.

    This is the built-in dynamic-gap counterpart of the custom
    ``applyInPandasWithState`` sessionizer in
    :mod:`apde_etl_spark.streaming.sessionize` — state is merged by the
    engine (no Python in the loop), bounded by open sessions per group,
    and evicted by the watermark. Append mode emits a session only once
    the watermark passes its end, which is what makes the output final."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(event_time, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(event_time), gap).alias("win"),
            F.col(group_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            group_col,
            "n_events",
        )
    )
