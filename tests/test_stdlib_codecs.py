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
    # PERMANENT skip where Pillow is absent: pure cross-codec
    # agreement check; the stdlib decoder itself is fully asserted by
    # the other tests in this file (dimensions, px_sum, bit-exact px).
    Image = pytest.importorskip(
        "PIL.Image",
        reason="permanent in this container: Pillow cross-check only; "
               "stdlib decoder asserted independently above")
    import io

    blob = MM.encode_png_rgb(9, 7, 42)
    ours = MM.stdlib_png_decoder(blob)
    with Image.open(io.BytesIO(blob)) as im:
        assert (im.width, im.height) == (ours["width"], ours["height"])
        pil_sum = sum(v for px in im.convert("RGB").getdata() for v in px)
    assert pil_sum == ours["px_sum"]


# ---------------------------------------------------------------------------
# Baseline JPEG (operators/jpegcodec.py)
# ---------------------------------------------------------------------------

def test_jpeg_flat_blocks_decode_bit_exact():
    from apde_etl_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
        encode_jpeg_flat_blocks,
    )

    for seed in (0, 7, 123, 255, 4093):
        w, h = 8 * (1 + seed % 4), 8 * (1 + seed % 3)
        width, height, channels, px = decode_baseline_jpeg(
            encode_jpeg_flat_blocks(w, h, seed))
        assert (width, height, channels) == (w, h, 1)
        for by in range(h // 8):
            for bx in range(w // 8):
                v = (17 * bx + 29 * by + seed) % 256
                assert all(
                    px[(by * 8 + y) * w + bx * 8 + x] == v
                    for y in range(8) for x in range(8)
                ), f"flat block mismatch at seed={seed} block=({bx},{by})"


def test_jpeg_ac_path_matches_numpy_reference():
    """Full-DCT path (AC coefficients, Huffman runs, EXTEND, IDCT)
    against an INDEPENDENT numpy implementation of the same pipeline:
    numpy forward DCT -> quantize -> dequantize -> numpy IDCT -> round
    -> clamp must agree with the pure-Python decoder to <= 1 LSB (float
    path divergence only; any Huffman/zigzag/EXTEND bug would diverge
    by whole coefficient magnitudes)."""
    import numpy as np

    from apde_etl_spark.operators.jpegcodec import (
        _ZIGZAG,
        decode_baseline_jpeg,
        encode_jpeg_gray,
    )

    w = h = 16
    src = np.array(
        [[((3 * x + 7 * y + 11) * (x ^ y) + x * y) % 256 for x in range(w)]
         for y in range(h)], dtype=np.float64)
    quant = [1 if i == 0 else 2 + (i % 3) for i in range(64)]
    blob = encode_jpeg_gray(bytes(src.astype(np.uint8).flatten()), w, h,
                            quant=quant)
    width, height, channels, px = decode_baseline_jpeg(blob)
    got = np.frombuffer(px, dtype=np.uint8).astype(int).reshape(h, w)

    # independent reference: matrix-form DCT in numpy
    C = np.array([[(np.sqrt(0.5) if u == 0 else 1.0)
                   * np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
                   for x in range(8)] for u in range(8)])
    Q = np.array(quant, dtype=np.float64).reshape(8, 8)
    ref = np.zeros_like(src)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = src[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            coef = C @ blk @ C.T
            qz = np.sign(coef) * np.floor(np.abs(coef) / Q + 0.5)
            rec = C.T @ (qz * Q) @ C + 128.0
            ref[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                np.floor(rec + 0.5), 0, 255)
    assert np.abs(got - ref).max() <= 1
    # and the zigzag table is a permutation covering all 64 cells
    assert sorted(r * 8 + c for r, c in _ZIGZAG) == list(range(64))


def test_jpeg_decoder_rejects_unsupported_with_guidance():
    import pytest

    from apde_etl_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
        encode_jpeg_flat_blocks,
    )

    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"\x00\x01")
    # flip SOF0 -> SOF2 (progressive): must raise with Pillow guidance
    blob = bytearray(encode_jpeg_flat_blocks(8, 8, seed=1))
    idx = bytes(blob).find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline sequential only"):
        decode_baseline_jpeg(bytes(blob))


def test_jpeg_nonaligned_dims_and_padding_crop():
    import numpy as np

    from apde_etl_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
        encode_jpeg_gray,
    )

    w, h = 11, 13
    src = bytes((5 * x + 9 * y) % 256 for y in range(h) for x in range(w))
    width, height, channels, px = decode_baseline_jpeg(
        encode_jpeg_gray(src, w, h, quant=[1] * 64))
    assert (width, height, len(px)) == (w, h, w * h)
    a = np.frombuffer(px, dtype=np.uint8).astype(int)
    b = np.frombuffer(src, dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() <= 2


def test_stdlib_jpeg_decoder_contract():
    from apde_etl_spark.operators.jpegcodec import encode_jpeg_flat_blocks
    from apde_etl_spark.operators.multimodal import stdlib_jpeg_decoder

    m = stdlib_jpeg_decoder(encode_jpeg_flat_blocks(16, 24, seed=77))
    assert (m["width"], m["height"], m["channels"]) == (16, 24, 1)
    assert m["format"] == "jpeg" and len(m["features"]) == 16
    vals = [(17 * bx + 29 * by + 77) % 256
            for by in range(3) for bx in range(2)]
    assert m["px_sum"] == 64 * sum(vals)
    assert m["px_first"] == 77 % 256
    assert m["pixel_channels"] == 1 and len(m["pixels"]) == 16 * 24


# ---------------------------------------------------------------------------
# Y4M video container (round-8: the last decode seam closed)
# ---------------------------------------------------------------------------


def test_y4m_round_trip_frame_exact():
    for seed in (0, 5, 31):
        w, h, nf = 4 + seed % 6, 3 + seed % 5, 12 + seed % 20
        blob = MM.encode_y4m(w, h, nf, seed=seed, fps=(30, 1))
        m = MM.stdlib_y4m_decoder(blob)
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, nf)
        assert (m["fps_num"], m["fps_den"]) == (30, 1)
        for f in (0, nf - 1):
            fr = MM.y4m_frame(blob, m, f)
            assert len(fr) == 3 * w * h
            assert fr[0] == MM.frame_pixel_value(0, 0, 0, f, seed)
            assert sum(fr) == sum(
                MM.frame_pixel_value(x, y, c, f, seed)
                for c in range(3) for y in range(h) for x in range(w)
            )


def test_y4m_rejects_wrong_magic_and_colorspace():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        MM.stdlib_y4m_decoder(b"RIFF1234\n")
    blob = MM.encode_y4m(4, 3, 2, seed=1)
    c420 = blob.replace(b"C444", b"C420", 1)
    with pytest.raises(ValueError, match="C444"):
        MM.stdlib_y4m_decoder(c420)


def test_y4m_rejects_truncated_frame():
    blob = MM.encode_y4m(4, 3, 3, seed=2)
    with pytest.raises(ValueError, match="truncated"):
        MM.stdlib_y4m_decoder(blob[:-5])


def test_y4m_frame_params_on_frame_marker():
    # spec allows per-frame parameters between FRAME and the newline
    blob = MM.encode_y4m(4, 3, 2, seed=3)
    patched = blob.replace(b"FRAME\n", b"FRAME Xcustom\n", 1)
    m = MM.stdlib_y4m_decoder(patched)
    assert m["n_frames"] == 2
    assert MM.y4m_frame(patched, m, 0)[0] == MM.frame_pixel_value(0, 0, 0, 0, 3)


def test_extract_video_meta_and_frame_stats(spark):
    rows = [
        Row(media_id=i, content=MM.encode_y4m(4 + i, 3 + i, 11 + i, seed=i))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows)
    meta = MM.extract_video_meta(df).orderBy("media_id").collect()
    assert [m["n_frames"] for m in meta] == [11, 12, 13]
    plan = MM.frame_sample_plan(
        spark.createDataFrame(
            [Row(media_id=m["media_id"], frame_count=m["n_frames"])
             for m in meta]),
        every_n=10,
    )
    stats = (
        MM.extract_frame_stats(df.join(plan, "media_id"))
        .orderBy("media_id", "frame_index").collect()
    )
    # every file has frames 0 and 10 sampled
    assert [(s["media_id"], s["frame_index"]) for s in stats] == [
        (0, 0), (0, 10), (1, 0), (1, 10), (2, 0), (2, 10)]
    for s in stats:
        i, f = s["media_id"], s["frame_index"]
        w, h = 4 + i, 3 + i
        assert s["px_first"] == MM.frame_pixel_value(0, 0, 0, f, i)
        assert s["px_sum"] == sum(
            MM.frame_pixel_value(x, y, c, f, i)
            for c in range(3) for y in range(h) for x in range(w))
