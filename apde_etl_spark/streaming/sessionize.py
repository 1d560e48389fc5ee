"""Gap-based sessionization — the canonical custom stateful operator
(extension surface; the reference has no streaming, SURVEY.md §2.12).

Batch path: pure window functions (lag -> gap flag -> running sum), fully
oracle-checkable in SQL. Streaming path: ``applyInPandasWithState``
carrying (last_ts, session_seq) per user with an idle-timeout that closes
sessions — the pattern for any operator whose state outlives a microbatch.
Both assign identical session ids on the same data, which is how the
tests check the stateful implementation.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def batch_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign ``session_seq`` (0-based per user) to every row: a new
    session starts when the gap to the previous event exceeds
    ``gap_minutes``. lag + conditional flag + running sum — one shuffle
    on the user key, everything else stays in the sorted partition."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = F.lit(gap_minutes * 60.0)
    prev = F.lag(ts_col).over(w)
    new_flag = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_s),
        1,
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", (F.sum(new_flag).over(running) - 1).cast("int"))


def session_stats(sessions: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """Collapse sessionized rows to one row per (user, session):
    start/end/n_events."""
    return sessions.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


#: output schema of the streaming sessionizer (closed + open sessions)
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.IntegerType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.IntegerType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def stream_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
    idle_timeout_minutes: float | None = None,
):
    """Streaming sessionizer: per-user state = (current session seq, start,
    last event, count). Each microbatch folds its (sorted) rows into the
    state, emitting a row per session touched (including the still-open
    one, update semantics — downstream keeps the newest row per
    (user, session_seq)). State is O(users), not O(events) — the
    applyInPandasWithState contract.

    ``idle_timeout_minutes`` adds a processing-time timeout that evicts
    idle users' state and re-emits their final session. Leave it None for
    drain-style runs (``availableNow``): a registered timeout keeps the
    drained query alive with empty cleanup microbatches until the clock
    fires, which for a gap-sized timeout means hours of busy-waiting.
    Set it (usually = gap) on continuous streams, where state eviction is
    what bounds memory.

    Returns a streaming DataFrame (use outputMode('update')).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes * 60 * 1_000_000)
    timeout_ms = (
        int(idle_timeout_minutes * 60 * 1000) if idle_timeout_minutes else None
    )

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):  # noqa: F821
        import pandas as pd

        (user,) = key
        if state.hasTimedOut:
            seq, start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user], "session_seq": [seq],
                 "session_start": [pd.Timestamp(start_us, unit="us")],
                 "session_end": [pd.Timestamp(last_us, unit="us")],
                 "n_events": [n]}
            )
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col]))
        ts_list.sort()

        if state.exists:
            seq, start_us, last_us, n = state.get
        else:
            seq, start_us, last_us, n = -1, None, None, 0

        out = []
        for t in ts_list:
            if last_us is None or (t - last_us) > gap_us:
                if last_us is not None:
                    out.append((seq, start_us, last_us, n))
                seq += 1
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((seq, start_us, last_us, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        out.append((seq, start_us, last_us, n))  # current (possibly open) session

        import pandas as pd  # noqa: F811

        yield pd.DataFrame(
            {
                "user_id": [user] * len(out),
                "session_seq": [o[0] for o in out],
                "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                "n_events": [o[3] for o in out],
            }
        )

    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def tws_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
    state_ttl_minutes: float | None = None,
):
    """The :func:`stream_sessionize` twin on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: typed state handles (ValueState here)
    instead of one opaque tuple, declarative per-state TTL instead of a
    hand-rolled processing-time timeout, and a RocksDB-backed store
    (set ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider — transformWithState requires it).

    Same fold, same emission contract (update semantics, one row per
    session touched per microbatch, downstream keeps the newest row per
    (user, session_seq)) — the equality test runs BOTH stateful
    implementations plus the batch window recipe on the same data and
    demands identical session assignments, which is the strongest
    correctness evidence a custom stateful operator gets.

    ``state_ttl_minutes``: evict idle users' state after this long
    (processing time). Unlike the aPWS timeout, TTL eviction is silent —
    no final re-emission — so leave it None when draining with
    availableNow and size it >= the gap on continuous streams.

    Runtime dependency: transformWithState's Python<->JVM state protocol
    is protobuf-based, so the ``protobuf`` package must be installed
    (the equality test skips, with the reason recorded, where it is
    not); the fold itself mirrors :func:`stream_sessionize` line for
    line, which the shared batch oracle pins down.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = int(gap_minutes * 60 * 1_000_000)
    ttl_ms = int(state_ttl_minutes * 60 * 1000) if state_ttl_minutes else None

    class _Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sess = handle.getValueState("sess", _STATE_SCHEMA, ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            (user,) = key
            ts_list: list[int] = []
            for pdf in rows:
                ts_list.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col])
                )
            ts_list.sort()
            if self._sess.exists():
                seq, start_us, last_us, n = self._sess.get()
            else:
                seq, start_us, last_us, n = -1, None, None, 0

            out = []
            for t in ts_list:
                if last_us is None or (t - last_us) > gap_us:
                    if last_us is not None:
                        out.append((seq, start_us, last_us, n))
                    seq += 1
                    start_us, n = t, 0
                last_us = t
                n += 1
            self._sess.update((seq, start_us, last_us, n))
            out.append((seq, start_us, last_us, n))  # current (open) session
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(out),
                    "session_seq": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                }
            )

        def close(self) -> None:
            pass

    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return src.groupBy(F.col(user_col)).transformWithStateInPandas(
        statefulProcessor=_Sessionizer(),
        outputStructType=SESSION_SCHEMA,
        outputMode="Update",
        # state TTL is only assignable under ProcessingTime time mode
        # (Spark raises STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL
        # otherwise); TTL-less drains keep NoTime
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
