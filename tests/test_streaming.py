"""Streaming profile tests: run the same plan as a file-source stream
(availableNow trigger -> memory sink) and as a batch frame; results must
be identical — the unified-API oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.streaming.profile_stream import (
    windowed_categorical_freq,
    windowed_missingness,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from apde_etl_spark.plans.catalog import normalize_ts
    return normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, events_batch):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the sf dir has many tables; restrict by pathGlobFilter
    ev = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(f"{sf_dir}/")
    )
    from apde_etl_spark.plans.catalog import normalize_ts
    return normalize_ts(ev)


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_missingness_stream_matches_batch(spark, events_batch, events_stream):
    cols = ["event_type", "value", "props"]
    # append mode only emits windows the watermark has passed: the final
    # window (end > max_ts - watermark) stays open and is correctly held
    # back — the batch oracle must exclude it.
    max_ts = events_batch.agg(F.max("ts")).first()[0]
    import datetime

    horizon = max_ts - datetime.timedelta(hours=1)
    batch = windowed_missingness(events_batch, "ts", cols, window="6 hours").filter(
        F.col("window_end") <= F.lit(horizon)
    )
    stream = _run_stream(
        spark,
        windowed_missingness(events_stream, "ts", cols, window="6 hours", watermark="1 hour"),
        "miss_stream",
    )
    assert _canon(stream) == _canon(batch)
    assert stream.count() > 0


def test_windowed_freq_stream_matches_batch(spark, events_batch, events_stream):
    import datetime

    max_ts = events_batch.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=2)  # default watermark
    batch = windowed_categorical_freq(events_batch, "ts", "event_type", window="12 hours").filter(
        F.col("window_end") <= F.lit(horizon)
    )
    stream = _run_stream(
        spark,
        windowed_categorical_freq(events_stream, "ts", "event_type", window="12 hours"),
        "freq_stream",
    )
    assert _canon(stream) == _canon(batch)
    # sanity: window bounds align to the tumbling grid
    r = stream.first()
    assert (r["window_end"] - r["window_start"]).total_seconds() == 12 * 3600


# ---------------------------------------------------------------------------
# Stateful sessionization: applyInPandasWithState vs the batch window recipe
# ---------------------------------------------------------------------------


def test_stream_sessionize_matches_batch(spark, events_batch, events_stream):
    from apde_etl_spark.streaming.sessionize import (
        batch_sessionize,
        session_stats,
        stream_sessionize,
    )

    # a user subset keeps the Python state-store exchange small; the
    # algorithm is per-user, so the subset loses no coverage
    batch_sub = events_batch.filter(F.col("user_id") < 150)
    stream_sub = events_stream.filter(F.col("user_id") < 150)

    expected = _canon(
        session_stats(
            batch_sessionize(batch_sub, "user_id", "ts", gap_minutes=1440.0)
        )
    )

    sessions = stream_sessionize(stream_sub, "user_id", "ts", gap_minutes=1440.0)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_df = spark.sql(
        """
        SELECT user_id, session_seq, session_start, session_end, n_events
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id, session_seq ORDER BY n_events DESC
          ) AS rn
          FROM sessions_sink
        ) WHERE rn = 1
        """
    )
    assert _canon(got_df) == expected


def test_stream_exact_dedup_matches_batch_distinct(spark, sf_dir):
    from apde_etl_spark.plans.catalog import load_events
    from apde_etl_spark.streaming.profile_stream import stream_exact_dedup

    ev = load_events(spark, sf_dir)
    batch = stream_exact_dedup(ev, "ts", ["user_id", "event_type"])
    expected = {(r["user_id"], r["event_type"]) for r in batch.collect()}

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from apde_etl_spark.plans.catalog import normalize_ts
    src = normalize_ts(src)
    deduped = stream_exact_dedup(src, "ts", ["user_id", "event_type"])
    q = (
        deduped.writeStream.format("memory").queryName("dedup_test_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_type"])
        for r in spark.table("dedup_test_sink").collect()
    }
    assert got == expected


def test_watermark_drops_late_data(spark, tmp_path):
    """Two stream runs over a shared checkpoint: run 1 advances the
    watermark past an old window and finalizes it; run 2 (watermark
    restored from the checkpoint) delivers a late event for that window.
    The late row must NOT reopen or re-emit the finalized window — the
    watermark contract."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    sink = str(tmp_path / "late_out")

    def run():
        schema = "event_id long, ts timestamp, value double"
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
            .select(F.col("win.start").alias("ws"), "n", "sv")
        )
        q = (
            agg.writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink)

    # run 1: events at hours 0..11 -> watermark ends at 11:00 - 1h =
    # 10:00; windows ending <= 10:00 are finalized and emitted.
    spark.createDataFrame(
        [(i, base + datetime.timedelta(hours=i), float(i)) for i in range(12)],
        "event_id long, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(src)
    out1 = run()
    hour1 = base + datetime.timedelta(hours=1)
    rows1 = out1.collect()
    got1 = {r["ws"]: (r["n"], r["sv"]) for r in rows1}
    # hour-1 window finalized with exactly its one on-time event
    assert got1[hour1] == (1, 1.0)

    # run 2: a LATE event back inside the finalized hour-1 window, plus
    # an on-time event at hour 12. Watermark (10:00) comes from the
    # checkpoint, so the late row is dropped on arrival.
    spark.createDataFrame(
        [(100, base + datetime.timedelta(hours=1, minutes=30), 99.0),
         (101, base + datetime.timedelta(hours=12), 12.0)],
        "event_id long, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(src)
    out2 = run()
    rows2 = out2.collect()  # cumulative parquet sink: run 1 + run 2 rows
    # the hour-1 window was NOT re-emitted (no reopening, no duplicate)
    assert len([r for r in rows2 if r["ws"] == hour1]) == 1
    # the late row (value 99.0) was dropped, not merged anywhere
    assert all(r["sv"] != 99.0 and r["sv"] != 100.0 for r in rows2)
    # run 2 did make progress (newly finalized window(s) appended)
    assert len(rows2) > len(rows1)


def test_tws_sessionize_matches_batch_and_apws(spark, events_batch, events_stream):
    """transformWithStateInPandas twin: identical session assignment as
    the batch window recipe (and therefore as the applyInPandasWithState
    implementation, tested above on the same expected set).

    Requires protobuf (the TWS state-server wire protocol); skipped
    where absent — the containers this repo is built in lack it."""
    # PERMANENT skip where protobuf is absent (this container): TWS is
    # an API twin — the identical session semantics are asserted via
    # applyInPandasWithState and the batch recipe in the tests above,
    # so no sessionization behavior goes untested; vendoring Spark's
    # generated state-protocol stubs would test protobuf, not the engine.
    pytest.importorskip(
        "google.protobuf",
        reason="permanent in this container: transformWithState API twin"
               "; identical semantics asserted via applyInPandasWithState"
               " + batch twin above",
    )
    from apde_etl_spark.streaming.sessionize import (
        batch_sessionize,
        session_stats,
        tws_sessionize,
    )

    batch_sub = events_batch.filter(F.col("user_id") < 150)
    stream_sub = events_stream.filter(F.col("user_id") < 150)
    expected = _canon(
        session_stats(
            batch_sessionize(batch_sub, "user_id", "ts", gap_minutes=1440.0)
        )
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sessions = tws_sessionize(stream_sub, "user_id", "ts", gap_minutes=1440.0)
        q = (
            sessions.writeStream.format("memory")
            .queryName("tws_sessions_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got_df = spark.sql(
            """
            SELECT user_id, session_seq, session_start, session_end, n_events
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id, session_seq ORDER BY n_events DESC
              ) AS rn
              FROM tws_sessions_sink
            ) WHERE rn = 1
            """
        )
        assert _canon(got_df) == expected
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def _write_stream_file(spark, rows, dirpath, name, mtime):
    import glob
    import os
    import shutil

    df = spark.createDataFrame(rows, "id int, s string").select(
        "id", F.col("s").cast("timestamp").alias("ts"))
    tmp = f"{dirpath}__tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = glob.glob(f"{tmp}/*.parquet")[0]
    dst = f"{dirpath}/{name}.parquet"
    shutil.copy(src, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


def test_watermark_keep_drop_boundary_pinned(spark, tmp_path):
    """The exact late-data semantics the stream_late_data_boundary
    oracle replays, pinned on a constructed 3-batch sequence: the
    late-event filter of batch k uses the watermark through batch k-2
    (one batch behind eviction), so a late row whose window end <=
    max(batch-0 ts) - delay is DROPPED while a later-windowed row from
    the same file merges; availableNow's final no-data batch emits every
    window whose end <= max(all ts) - delay."""
    import os

    d = str(tmp_path / "stream")
    os.makedirs(d)
    # batch0: on-time, max ts 13:30 -> late-WM for batch2 = 12:30
    _write_stream_file(spark, [(1, "2024-01-01 10:15:00"),
                               (2, "2024-01-01 11:20:00"),
                               (3, "2024-01-01 13:30:00")], d, "f1", 1.7e9)
    # batch1: advances eviction (windows <= 12:30 evicted at its commit)
    _write_stream_file(spark, [(5, "2024-01-01 13:40:00")], d, "f2", 1.7e9 + 100)
    # batch2: 10:50 (win end 11:00 <= 12:30 -> DROP), 12:50 (win end
    # 13:00 > 12:30 -> KEEP, but its window is withheld: final WM =
    # 13:45 - 1h = 12:45 < 13:00), 13:45 (advances final WM)
    _write_stream_file(spark, [(10, "2024-01-01 10:50:00"),
                               (11, "2024-01-01 12:50:00"),
                               (12, "2024-01-01 13:45:00")], d, "f3", 1.7e9 + 200)

    schema = spark.read.parquet(d).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "1").parquet(d))
    agg = (src.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.collect_list("id").alias("ids")))
    q = (agg.select(F.col("w.start").alias("ws"), "n", "ids")
         .writeStream.format("memory").queryName("wm_pin_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {str(r["ws"]): sorted(r["ids"])
           for r in spark.table("wm_pin_sink").collect()}
    # id 10 dropped (NOT re-emitted into the already-finalized window),
    # id 11 kept but unfinalized, ids 1..3/5/12 in their windows
    assert got == {"2024-01-01 10:00:00": [1],
                   "2024-01-01 11:00:00": [2]}, got
    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])
    assert dropped == 1


def test_stream_late_fixture_straddles_boundary(spark):
    """The gate entry is only meaningful if the late batch has rows on
    BOTH sides of the watermark: assert non-empty drop AND keep sets at
    the test SF."""
    import os

    from apde_etl_spark.operators.similarity import hash60
    from apde_etl_spark.plans.catalog import load_events

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    ev = load_events(spark, sf_dir).select("event_id", "ts")
    b = hash60(F.col("event_id").cast("string")) % 20
    tagged = ev.withColumn("b", b)
    wm = (tagged.filter(F.col("b") >= 2)
          .agg(F.max("ts")).first()[0])
    import datetime

    cut = wm - datetime.timedelta(hours=24)
    f3 = tagged.filter(F.col("b") == 0)
    win_end = F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")
    n_drop = f3.filter(win_end <= F.lit(cut)).count()
    n_keep = f3.filter(win_end > F.lit(cut)).count()
    assert n_drop > 0 and n_keep > 0, (n_drop, n_keep)


def test_session_window_boundaries_pinned(spark, tmp_path):
    """Pins the three boundary rules the stream_session_window_counts
    oracle restates, none of which the sf testdata happens to exercise:

    - a gap of exactly 1800 s still MERGES (split requires gap > gap
      duration — the window is closed at last_ts + gap);
    - append emits sessions with end <= the final watermark (= max ts
      with 0 s delay), INCLUDING one ending exactly at it; only the
      stream head's session (end > WM) stays open in the state store.
    """
    from apde_etl_spark.streaming.profile_stream import windowed_session_counts

    base = 1704067200  # 2024-01-01 00:00:00 UTC
    rows = [
        (1, base + 0), (1, base + 1799),      # merge: end = base+3599
        (2, base + 0), (2, base + 1800),      # exactly-gap: still merges
        (2, base + 5400),                     # 1801+ s after: splits
        (3, base + 8200),                     # end = base+10000 == final WM
        (4, base + 10000),                    # stream head: end > WM
    ]
    d = str(tmp_path / "sess_src")
    df = spark.createDataFrame(rows, "user_id int, e long").select(
        "user_id", F.timestamp_seconds("e").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(d)

    schema = spark.read.parquet(d).schema
    src = spark.readStream.schema(schema).parquet(d)
    sess = windowed_session_counts(src, "ts", "user_id",
                                   gap="30 minutes", watermark="0 seconds")
    q = (sess.writeStream.format("memory").queryName("sess_pin_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {
        (r.user_id, int(r.session_start.timestamp()) - base,
         int(r.session_end.timestamp()) - base, r.n_events)
        for r in spark.table("sess_pin_sink").collect()
    }
    assert got == {
        (1, 0, 3599, 2),       # 1799 s gap merged
        (2, 0, 3600, 2),       # exactly-1800 s gap ALSO merged
        (2, 5400, 7200, 1),    # 1800 s past the session end: split
        (3, 8200, 10000, 1),   # end == final WM: emitted (<=)
        # user 4 (stream head, end > WM) withheld
    }

    # batch mode of the same helper sees ALL sessions incl. the open ones
    batch = windowed_session_counts(df, "ts", "user_id", gap="30 minutes")
    assert batch.count() == 5


def test_stream_linkage_upsert_is_microbatch_invariant(spark, sf_dir, tmp_path):
    """The streaming entity-resolution twin: scatter the batch docs
    (doc_id % 5 == 0) across three files and force one-file
    micro-batches — the final golden-record table must equal the 1-batch
    run AND the batch linkage_incremental entry (records resolve
    independently against the frozen corpus, so micro-batching cannot
    change the answer; this proves the checkpoint/upsert machinery)."""
    from pyspark.sql import functions as F

    from apde_etl_spark.plans.catalog_r5c import linkage_incremental
    from apde_etl_spark.plans.catalog_r6 import run_stream_linkage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    src3 = str(tmp_path / "b3")
    for part in range(3):
        batch.filter(F.col("doc_id") % 3 == part).coalesce(1) \
            .write.mode("append").parquet(src3)
    src1 = str(tmp_path / "b1")
    batch.coalesce(1).write.mode("append").parquet(src1)

    def run(src_dir, work):
        src = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        return run_stream_linkage(spark, sf_dir, src, str(tmp_path / work))

    got3 = sorted(map(tuple, run(src3, "w3").collect()))
    got1 = sorted(map(tuple, run(src1, "w1").collect()))
    assert got3 == got1
    expected = sorted(map(tuple, linkage_incremental(spark, sf_dir).collect()))
    assert got3 == expected
