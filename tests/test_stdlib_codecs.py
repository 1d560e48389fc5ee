"""REAL media decode with stdlib codecs — no optional dependency, so
unlike tests/test_multimodal_codecs.py (Pillow importorskip) these run
everywhere: encoder->decoder round trips over real byte formats (WAV
RIFF PCM, BMP bottom-up BGR, PNG zlib + all five scanline filters),
format edge cases, and the Spark end-to-end stages the catalog_r5 gate
entries use."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import Row

from apde_etl_spark.operators import multimodal as MM


def _expected_px_sum(w: int, h: int, seed: int) -> int:
    return sum(
        MM.pixel_value(x, y, c, seed)
        for y in range(h) for x in range(w) for c in range(3)
    )


def test_wav_round_trip_exact_rms():
    for seed in (0, 7, 123):
        amp, n, sr = 500 + seed * 997 % 30000, 400 + seed % 300, [8000, 16000, 44100][seed % 3]
        d = MM.stdlib_wav_decoder(MM.encode_wav_square(amp, n, sr))
        assert (d["sample_rate"], d["n_samples"]) == (sr, n)
        # every sample is +/-amp, so RMS is exactly amp
        assert d["rms"] == pytest.approx(amp, abs=1e-9)
        assert d["first_sample"] == amp


def test_wav_rejects_stereo():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00" * 4)
    with pytest.raises(ValueError, match="mono"):
        MM.stdlib_wav_decoder(buf.getvalue())


def test_bmp_round_trip_inverts_layout():
    """px_first proves the bottom-up row flip and BGR->RGB reorder: the
    first DECODED byte must be pixel (0,0,R), which the encoder stored
    LAST-row-first and in BGR order."""
    for w, h, seed in [(5, 5, 0), (13, 7, 9), (16, 12, 200)]:
        d = MM.stdlib_bmp_decoder(MM.encode_bmp24(w, h, seed))
        assert (d["width"], d["height"], d["channels"], d["format"]) == (w, h, 3, "bmp")
        assert d["px_sum"] == _expected_px_sum(w, h, seed)
        assert d["px_first"] == MM.pixel_value(0, 0, 0, seed)
        assert len(d["features"]) == MM.FEATURE_DIM


def test_bmp_padding_excluded_from_sum():
    """Width 5 -> row stride 16 with one padding byte per row; a decoder
    that summed raw rows would include the zero padding but also the
    un-flipped order — px_sum over an asymmetric pixel formula catches
    both."""
    d = MM.stdlib_bmp_decoder(MM.encode_bmp24(5, 3, 11))
    assert d["px_sum"] == _expected_px_sum(5, 3, 11)


def test_bmp_rejects_non_bmp_and_wrong_bpp():
    with pytest.raises(ValueError, match="not a BMP"):
        MM.stdlib_bmp_decoder(b"PK\x03\x04junk")
    # patch bpp field to 8
    blob = bytearray(MM.encode_bmp24(4, 4, 0))
    struct.pack_into("<H", blob, 28, 8)
    with pytest.raises(ValueError, match="24-bpp"):
        MM.stdlib_bmp_decoder(bytes(blob))


def test_png_round_trip_all_filters():
    """h >= 5 makes the encoder emit every filter type 0..4; a wrong
    unfilter implementation corrupts downstream rows (Up/Paeth chain on
    the previous RECONSTRUCTED row), so px_sum equality certifies all
    five paths."""
    for w, h, seed in [(4, 5, 0), (13, 7, 9), (10, 12, 77)]:
        d = MM.stdlib_png_decoder(MM.encode_png_rgb(w, h, seed))
        assert (d["width"], d["height"], d["channels"], d["format"]) == (w, h, 3, "png")
        assert d["px_sum"] == _expected_px_sum(w, h, seed)
        assert d["px_first"] == MM.pixel_value(0, 0, 0, seed)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _raw_png(width: int, height: int, color: int, channels: int,
             pixels: bytes, depth: int = 8) -> bytes:
    stride = width * channels
    filtered = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(filtered))
            + _png_chunk(b"IEND", b""))


def test_png_grayscale_and_rgba():
    gray = bytes((x * 7 + y * 3) % 256 for y in range(4) for x in range(6))
    d = MM.stdlib_png_decoder(_raw_png(6, 4, 0, 1, gray))
    assert (d["width"], d["height"], d["channels"]) == (6, 4, 1)
    assert d["px_sum"] == sum(gray) and d["px_first"] == gray[0]

    rgba = bytes((x + y + c) % 256 for y in range(3) for x in range(5)
                 for c in range(4))
    d = MM.stdlib_png_decoder(_raw_png(5, 3, 6, 4, rgba))
    assert (d["width"], d["height"], d["channels"]) == (5, 3, 4)
    assert d["px_sum"] == sum(rgba)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        MM.stdlib_png_decoder(b"GIF89a....")
    gray = bytes(24)
    with pytest.raises(ValueError, match="supports 8-bit"):
        MM.stdlib_png_decoder(_raw_png(6, 4, 0, 1, gray, depth=16))


def test_stdlib_decode_spark_end_to_end(spark):
    """The catalog_r5 shape without the filesystem: binary columns in,
    decode_image_stats / extract_audio_features with the stdlib codecs,
    exact values out."""
    rows = [
        Row(media_id=i, img=bytearray(MM.encode_bmp24(5 + i, 5 + i, i)),
            png=bytearray(MM.encode_png_rgb(4 + i, 5 + i, i)),
            wav=bytearray(MM.encode_wav_square(1000 + i, 100 + i, 8000)))
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "media_id long, img binary, png binary, wav binary")

    bmp = {r["media_id"]: r for r in MM.decode_image_stats(
        df, content_col="img", decoder=MM.stdlib_bmp_decoder).collect()}
    png = {r["media_id"]: r for r in MM.decode_image_stats(
        df, content_col="png", decoder=MM.stdlib_png_decoder).collect()}
    wav = {r["media_id"]: r for r in MM.extract_audio_features(
        df, content_col="wav", decoder=MM.stdlib_wav_decoder).collect()}
    for i in range(4):
        assert bmp[i]["px_sum"] == _expected_px_sum(5 + i, 5 + i, i)
        assert png[i]["px_sum"] == _expected_px_sum(4 + i, 5 + i, i)
        assert wav[i]["rms"] == pytest.approx(1000 + i)
        assert wav[i]["n_samples"] == 100 + i


def test_stdlib_png_matches_pillow_if_available():
    """Cross-codec check whenever Pillow exists: the stdlib decoder and
    PIL must agree on dimensions and raw pixel bytes."""
    Image = pytest.importorskip("PIL.Image")
    import io

    blob = MM.encode_png_rgb(9, 7, 42)
    ours = MM.stdlib_png_decoder(blob)
    with Image.open(io.BytesIO(blob)) as im:
        assert (im.width, im.height) == (ours["width"], ours["height"])
        pil_sum = sum(v for px in im.convert("RGB").getdata() for v in px)
    assert pil_sum == ours["px_sum"]
