"""Codec ACTIVATION tests: run the real Pillow decode/resize path
end-to-end through the Spark stages whenever the optional dependency
exists. In a container without Pillow these skip cleanly (importorskip);
with Pillow installed they prove the seam at
operators/multimodal.py (default_decoder/_default_resizer) is one
``pip install`` from working — no code changes needed."""

from __future__ import annotations

import io

import pytest
from pyspark.sql import Row

# PERMANENT skip where Pillow is absent (this container): these are
# ACTIVATION twins for the optional real-codec path; every Spark stage
# they drive (decode -> stats -> resize plumbing) is fully covered with
# stdlib codecs in tests/test_stdlib_codecs.py, so no engine behavior
# goes untested without Pillow — installing it is the only delta.
PIL = pytest.importorskip(
    "PIL",
    reason="permanent in this container: Pillow activation twin; the "
           "same Spark stages are covered via stdlib codecs in "
           "test_stdlib_codecs.py")

from apde_etl_spark.operators import multimodal as MM  # noqa: E402


def _png_bytes(w: int, h: int, color) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, content=bytearray(_png_bytes(32, 24, (255, 0, 0)))),
        Row(media_id=2, content=bytearray(_png_bytes(48, 48, (0, 255, 0)))),
        Row(media_id=3, content=bytearray(_png_bytes(16, 64, (0, 0, 255)))),
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_pillow_decode_images_end_to_end(media):
    out = {r["media_id"]: r for r in MM.decode_images(
        media, decoder=MM.pillow_decoder).collect()}
    assert (out[1]["width"], out[1]["height"]) == (32, 24)
    assert (out[2]["width"], out[2]["height"]) == (48, 48)
    assert (out[3]["width"], out[3]["height"]) == (16, 64)
    assert all(r["channels"] == 3 and r["format"] == "png" for r in out.values())


def test_pillow_extract_features_end_to_end(media):
    out = {r["media_id"]: r["features"] for r in MM.extract_features(
        media, decoder=MM.pillow_decoder).collect()}
    assert all(len(v) == MM.FEATURE_DIM for v in out.values())
    assert all(all(-1.0 <= x <= 1.0 for x in v) for v in out.values())
    # solid-color images: flat feature vectors, distinct across colors
    assert len({tuple(v) for v in out.values()}) == 3


def test_pillow_resize_images_end_to_end(media):
    from PIL import Image

    out = MM.resize_images(media, target_w=8, target_h=8,
                           resizer=MM.pillow_resizer).collect()
    assert len(out) == 3
    for r in out:
        assert (r["width"], r["height"]) == (8, 8)
        with Image.open(io.BytesIO(bytes(r["content"]))) as im:
            assert im.size == (8, 8)
            assert im.format == "PNG"
