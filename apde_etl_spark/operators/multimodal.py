"""Multimodal (image/audio/video) column support for training-data
pipelines (extension surface; BASELINE.json north star).

Design: media ride as opaque ``binary`` columns with typed metadata
columns beside them. Decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages — the only places Python
touches data, sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual codec calls are STUBBED in this container (no PIL/ffmpeg):
each stage takes a ``decoder`` callable; the default raises
``NotImplementedError`` with installation guidance, and
``deterministic_fake_decoder`` supplies a seeded, content-derived fake so
the Spark-side plumbing (schema, batching, partitioning) is fully
exercised in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a decoded-image record appended by ``decode_images``
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FEATURE_DIM = 16


def default_decoder(payload: bytes) -> dict:
    raise NotImplementedError(
        "media decoding requires an image/audio library (e.g. Pillow, "
        "torchaudio) not present in this container; pass decoder="
        "deterministic_fake_decoder for plumbing tests"
    )


def deterministic_fake_decoder(payload: bytes) -> dict:
    """Content-derived fake decode: stable pseudo-dimensions and a
    16-dim feature vector from the md5 digest. Deterministic, so tests
    and oracles can assert exact values."""
    d = hashlib.md5(payload).digest()
    return {
        "width": 64 + d[0] % 192,
        "height": 64 + d[1] % 192,
        "channels": 3,
        "format": ["jpeg", "png", "webp"][d[2] % 3],
        "features": [((b / 255.0) * 2.0 - 1.0) for b in d],
    }


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    decoder: Callable[[bytes], dict] = default_decoder,
) -> DataFrame:
    """Append decoded metadata (width/height/channels/format) to each row.

    ``mapInPandas`` keeps the full row, adds the meta columns; Arrow
    moves the binary payloads in columnar batches. Partitioning is
    whatever the upstream scan produced — no shuffle is introduced."""
    out_schema = T.StructType(df.schema.fields + list(IMAGE_META_SCHEMA.fields))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            metas = [decoder(bytes(p)) for p in pdf[content_col]]
            for k in ("width", "height", "channels", "format"):
                pdf[k] = [m[k] for m in metas]
            yield pdf

    return df.mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    decoder: Callable[[bytes], dict] = default_decoder,
) -> DataFrame:
    """(id, features array<double>) per media row — the input the
    similarity operators consume. Projection happens INSIDE the stage:
    only (id, content) cross the Arrow boundary, not the full row."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    src = df.select(id_col, content_col)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [decoder(bytes(p))["features"] for p in pdf[content_col]],
                }
            )

    return src.mapInPandas(run, out_schema)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling *plan*: emit (media_id, frame_index) rows for
    every ``every_n``-th frame given a frame_count metadata column. Pure
    native expressions (sequence + explode); the actual frame decode is a
    later ``mapInPandas`` stage over this plan."""
    idx = F.sequence(F.lit(0), F.col("frame_count") - 1, F.lit(every_n))
    return df.select(id_col, F.explode(idx).alias("frame_index"))


def resize_images(
    df: DataFrame,
    content_col: str = "content",
    target_w: int = 224,
    target_h: int = 224,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage: binary in -> binary out plus (width, height) set to
    the target. The codec call is stubbed (``resizer=None`` raises with
    guidance); ``deterministic_fake_resizer`` keeps the payload's md5
    lineage so tests can assert the transform ran per-row. Arrow batches
    carry the binaries; no shuffle is introduced — at corpus scale this
    stage pipelines directly after the scan."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            T.StructField(content_col, T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    fn = resizer if resizer is not None else _default_resizer

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            pdf = pdf.copy()
            pdf[content_col] = [fn(bytes(p), target_w, target_h) for p in pdf[content_col]]
            pdf["width"] = target_w
            pdf["height"] = target_h
            yield pdf[[f.name for f in out_schema.fields]]

    return df.mapInPandas(run, out_schema)


def _default_resizer(payload: bytes, w: int, h: int) -> bytes:
    raise NotImplementedError(
        "image resizing requires an imaging library (e.g. Pillow) not present "
        "in this container; pass resizer=deterministic_fake_resizer for "
        "plumbing tests"
    )


def deterministic_fake_resizer(payload: bytes, w: int, h: int) -> bytes:
    """Content-derived fake: target dims + source digest, deterministic."""
    return f"{w}x{h}:".encode() + hashlib.md5(payload).digest()


# ---------------------------------------------------------------------------
# Audio: fixed-size sample-window chunk plan + feature stage
# ---------------------------------------------------------------------------

#: schema of a decoded-audio record appended by ``extract_audio_features``
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def deterministic_fake_audio_decoder(payload: bytes) -> dict:
    """Content-derived fake audio decode: stable pseudo sample-rate /
    length / RMS from the md5 digest, so tests assert exact values."""
    d = hashlib.md5(payload).digest()
    return {
        "sample_rate": [8000, 16000, 44100][d[0] % 3],
        "n_samples": 8000 + int.from_bytes(d[1:4], "big") % 48000,
        "rms": round(d[4] / 255.0, 6),
    }


def audio_chunk_plan(
    df: DataFrame,
    chunk_samples: int = 16000,
    id_col: str = "media_id",
    n_samples_col: str = "n_samples",
) -> DataFrame:
    """Audio chunking *plan*: (media_id, chunk_index, start_sample,
    end_sample) rows covering ``n_samples`` in fixed windows — the audio
    twin of :func:`frame_sample_plan`. Pure native expressions
    (sequence + explode); the waveform decode consuming this plan is a
    later ``mapInPandas`` stage. No shuffle: the explode happens in the
    scan stage and each chunk row carries only ids and offsets."""
    n = F.col(n_samples_col)
    starts = F.sequence(F.lit(0), n - 1, F.lit(chunk_samples))
    out = df.select(id_col, n.alias("__n"), F.explode(starts).alias("start_sample"))
    return out.select(
        id_col,
        (F.col("start_sample") / chunk_samples).cast("int").alias("chunk_index"),
        F.col("start_sample").cast("long"),
        F.least(F.col("start_sample") + chunk_samples, F.col("__n"))
         .cast("long").alias("end_sample"),
    )


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    decoder: Callable[[bytes], dict] = default_decoder,
) -> DataFrame:
    """(id, sample_rate, n_samples, rms) per audio row via Arrow-batched
    ``mapInPandas``. Projection happens inside the stage: only
    (id, content) cross the Arrow boundary. Codec stubbed as elsewhere."""
    out_schema = T.StructType([df.schema[id_col]] + list(AUDIO_META_SCHEMA.fields))
    src = df.select(id_col, content_col)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            metas = [decoder(bytes(p)) for p in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "n_samples": [m["n_samples"] for m in metas],
                    "rms": [m["rms"] for m in metas],
                }
            )

    return src.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Real codecs (optional dependency activation — Pillow)
# ---------------------------------------------------------------------------

def pillow_decoder(payload: bytes) -> dict:
    """Real image decode via Pillow, matching the ``decoder`` contract of
    :func:`decode_images` / :func:`extract_features`: width/height/
    channels/format plus a FEATURE_DIM-dim feature vector (4x4 grayscale
    thumbnail, scaled to [-1, 1]). Import stays inside the function so
    the module loads without Pillow; tests/test_multimodal_codecs.py
    activates this path end-to-end whenever the dependency exists
    (pytest.importorskip) — the seam is provably one pip install from
    working."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        im.load()
        fmt = (im.format or "unknown").lower()
        channels = len(im.getbands())
        thumb = im.convert("L").resize((4, 4))
        feats = [px / 255.0 * 2.0 - 1.0 for px in thumb.getdata()]
        return {
            "width": im.width,
            "height": im.height,
            "channels": channels,
            "format": fmt,
            "features": feats,
        }


def pillow_resizer(payload: bytes, w: int, h: int) -> bytes:
    """Real resize via Pillow, matching the ``resizer`` contract of
    :func:`resize_images`: re-encodes in the source format (PNG when the
    source format is unknown)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        fmt = im.format or "PNG"
        out = im.resize((w, h))
        buf = io.BytesIO()
        out.save(buf, format=fmt)
        return buf.getvalue()
