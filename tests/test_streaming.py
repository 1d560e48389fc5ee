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
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, events_batch):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ev = spark.readStream.schema(raw_schema).parquet(f"{sf_dir}/")
    # the sf dir has many tables; restrict by pathGlobFilter instead
    ev = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(f"{sf_dir}/")
    )
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
