"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas stages with the deterministic fake decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apde_etl_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=i, content=bytes(f"fake-media-payload-{i}", "utf-8"), frame_count=25 + i)
        for i in range(50)
    ]
    return spark.createDataFrame(rows)


def test_default_decoder_is_explicit_stub(media):
    with pytest.raises(Exception) as ei:
        MM.decode_images(media).collect()
    assert "NotImplementedError" in str(ei.value) or "media decoding" in str(ei.value)


def test_decode_images_appends_meta(media):
    out = MM.decode_images(media, decoder=MM.deterministic_fake_decoder)
    rows = out.collect()
    assert len(rows) == 50
    assert set(out.columns) == {"media_id", "content", "frame_count",
                                "width", "height", "channels", "format"}
    r = next(x for x in rows if x["media_id"] == 7)
    # deterministic: same payload -> same fake dims on every run
    again = MM.decode_images(media, decoder=MM.deterministic_fake_decoder).collect()
    r2 = next(x for x in again if x["media_id"] == 7)
    assert (r["width"], r["height"], r["format"]) == (r2["width"], r2["height"], r2["format"])
    assert 64 <= r["width"] < 256 and r["format"] in ("jpeg", "png", "webp")


def test_extract_features_shape_and_projection(media):
    out = MM.extract_features(media, decoder=MM.deterministic_fake_decoder)
    assert out.columns == ["media_id", "features"]
    rows = out.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r["features"])
    # features feed the similarity operators directly
    from apde_etl_spark.operators.similarity import brute_force_topk

    q = rows[0]["features"]
    top = brute_force_topk(out, q, k=3, vec_col="features", id_col="media_id").collect()
    assert top[0]["media_id"] == rows[0]["media_id"]
    assert top[0]["cosine_sim"] == pytest.approx(1.0)


def test_frame_sample_plan(media):
    out = MM.frame_sample_plan(media, every_n=10)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    assert by_id[0] == [0, 10, 20]          # frame_count 25 -> idx 0..24
    assert by_id[6] == [0, 10, 20, 30]      # frame_count 31 -> idx 0..30


def test_resize_images_plumbing(spark):
    from apde_etl_spark.operators.multimodal import (
        deterministic_fake_resizer,
        resize_images,
    )
    from pyspark.sql import functions as F
    import hashlib

    docs = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two")], "media_id long, content binary"
    )
    out = resize_images(docs, "content", 128, 96, resizer=deterministic_fake_resizer)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["width"] == 128 and rows[1]["height"] == 96
    expect = b"128x96:" + hashlib.md5(b"payload-one").digest()
    assert bytes(rows[1]["content"]) == expect


def test_resize_images_default_raises(spark):
    from apde_etl_spark.operators.multimodal import resize_images
    import pytest as _pytest

    docs = spark.createDataFrame([(1, b"x")], "media_id long, content binary")
    # the NotImplementedError surfaces wrapped in Spark's PythonException
    with _pytest.raises(Exception, match="imaging library"):
        resize_images(docs, "content").collect()


def test_audio_chunk_plan_covers_all_samples(spark):
    rows = [Row(media_id=1, n_samples=40000), Row(media_id=2, n_samples=16000),
            Row(media_id=3, n_samples=15999)]
    out = MM.audio_chunk_plan(spark.createDataFrame(rows), chunk_samples=16000)
    got = {(r["media_id"], r["chunk_index"], r["start_sample"], r["end_sample"])
           for r in out.collect()}
    assert got == {
        (1, 0, 0, 16000), (1, 1, 16000, 32000), (1, 2, 32000, 40000),
        (2, 0, 0, 16000),
        (3, 0, 0, 15999),
    }


def test_extract_audio_features_deterministic(media):
    out = MM.extract_audio_features(
        media, "media_id", "content", decoder=MM.deterministic_fake_audio_decoder
    )
    rows = out.collect()
    assert len(rows) == 50
    assert set(out.columns) == {"media_id", "sample_rate", "n_samples", "rms"}
    r = next(x for x in rows if x["media_id"] == 3)
    expect = MM.deterministic_fake_audio_decoder(b"fake-media-payload-3")
    assert (r["sample_rate"], r["n_samples"], r["rms"]) == (
        expect["sample_rate"], expect["n_samples"], expect["rms"])
    assert r["sample_rate"] in (8000, 16000, 44100) and 0.0 <= r["rms"] <= 1.0


def test_extract_audio_features_default_raises(media):
    with pytest.raises(Exception) as ei:
        MM.extract_audio_features(media, "media_id", "content").collect()
    assert "NotImplementedError" in str(ei.value) or "media decoding" in str(ei.value)
