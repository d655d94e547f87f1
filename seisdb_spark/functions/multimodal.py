"""Multimodal-column plumbing: image/audio/video as opaque ``BinaryType``
payloads with typed metadata, decoded / feature-extracted via Arrow-batched
``mapInPandas`` (SURVEY §2.11).

This generalizes the engine's own blob pattern (the E2/E5 zlib record +
header tail of the SGT pipeline): payload bytes are never interpreted by the
JVM; per-batch Python (numpy over ``pd.Series`` of bytes) does the decode.

Real vs stubbed, explicitly:
  * byte-level feature extraction (:func:`decode_payload_features`) is REAL —
    numpy statistics over the payload bytes, deterministic, tested;
  * actual image decode (:func:`decode_image`) needs an image library that is
    NOT in this container — it raises ``NotImplementedError`` unless PIL is
    importable. The Spark-side plumbing around it (schema, batch iteration,
    UDF signature) is real and exercised through the deterministic fake-header
    path (:func:`decode_fake_image_headers`), which parses width/height from
    an 8-byte synthetic header the tests generate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

PAYLOAD_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # text | image | audio | video
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),  # image/video only
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio only
    ]
)

PAYLOAD_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
        T.StructField("distinct_bytes", T.IntegerType()),
        T.StructField("head_hex", T.StringType()),
    ]
)

FAKE_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixel_bytes", T.LongType()),
        T.StructField("pixel_mean", T.DoubleType()),
    ]
)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Lift the documents table into the multimodal shape:
    (doc_id, payload binary, meta struct). Text is the always-available
    modality; image/audio payloads carry the same schema."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text").alias("kind"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_payload_features(df: DataFrame) -> DataFrame:
    """Byte-level feature extraction over (doc_id, payload, meta) — REAL
    numpy work per Arrow batch; the pattern a decode/resize/frame-sample
    stage at 100 TB follows (payloads stay partition-local, no shuffle)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"], strict=True
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "kind": meta["kind"],
                        "n_bytes": int(b.size),
                        "byte_mean": round(float(b.mean()), 6) if b.size else 0.0,
                        "byte_min": int(b.min()) if b.size else 0,
                        "byte_max": int(b.max()) if b.size else 0,
                        "distinct_bytes": int(np.unique(b).size),
                        "head_hex": bytes(payload)[:8].hex(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PAYLOAD_FEATURES_SCHEMA])

    return df.mapInPandas(extract, schema=PAYLOAD_FEATURES_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - stub without PIL
    """STUB: real image decode requires an image library not present in this
    container. The call site (mapInPandas batch loop) is exercised via
    :func:`decode_fake_image_headers` instead."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode needs PIL (not installed here); "
            "use decode_fake_image_headers for the plumbing path"
        )
    import io

    return Image.open(io.BytesIO(payload))


def decode_fake_image_headers(df: DataFrame) -> DataFrame:
    """Deterministic fake-image decode: payload = 8-byte header (two little-
    endian uint32: width, height) followed by width*height pixel bytes.
    Parses the header and reduces the pixel block — the exact batch shape a
    real decoder (PIL/libjpeg) drops into."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                raw = bytes(payload)
                w, h = np.frombuffer(raw[:8], dtype="<u4")
                pix = np.frombuffer(raw[8 : 8 + w * h], dtype=np.uint8)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": int(w),
                        "height": int(h),
                        "n_pixel_bytes": int(pix.size),
                        "pixel_mean": round(float(pix.mean()), 6) if pix.size else 0.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FAKE_IMAGE_SCHEMA])

    return df.mapInPandas(extract, schema=FAKE_IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_mean", T.DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def resize_fake_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize stage over the fake-header image format: nearest-neighbour
    downsample of the pixel block, REAL numpy index math per Arrow batch —
    swap the sampler for PIL/libjpeg and nothing around it changes. Output
    carries the resized payload (BinaryType) so the stage composes with a
    downstream write or feature pass."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                raw = bytes(payload)
                w, h = (int(x) for x in np.frombuffer(raw[:8], dtype="<u4"))
                pix = np.frombuffer(raw[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)
                ys = (np.arange(out_h) * h // out_h).astype(np.int64)
                xs = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = pix[np.ix_(ys, xs)]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "out_width": out_w,
                        "out_height": out_h,
                        "resized": small.tobytes(),
                        "resized_mean": round(float(small.mean()), 6),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_IMAGE_SCHEMA])

    return df.mapInPandas(resize, schema=RESIZED_IMAGE_SCHEMA)


def sample_fake_video_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame-sampling stage over a fake video format: payload = 8-byte
    header (two little-endian uint32: n_frames, frame_size) followed by
    n_frames fixed-size frames. Emits every k-th frame's stats — one input
    row explodes to multiple output rows, the exact shape of a real
    ffmpeg-backed sampler; frames never leave the executor."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                raw = bytes(payload)
                n_frames, frame_size = (int(x) for x in np.frombuffer(raw[:8], dtype="<u4"))
                body = np.frombuffer(
                    raw[8 : 8 + n_frames * frame_size], dtype=np.uint8
                ).reshape(n_frames, frame_size)
                for idx in range(0, n_frames, every_k):
                    fr = body[idx]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_bytes": int(fr.size),
                            "frame_mean": round(float(fr.mean()), 6),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return df.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


FAKE_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def decode_fake_audio(df: DataFrame) -> DataFrame:
    """Audio feature extraction over a fake PCM format: payload = 8-byte
    header (two little-endian uint32: sample_rate, n_samples) followed by
    int16 LE samples. RMS and zero-crossing counts are REAL numpy DSP over
    the sample block — the stage a soundfile/librosa-backed extractor drops
    into, per Arrow batch, partition-local."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                raw = bytes(payload)
                sr, n = (int(x) for x in np.frombuffer(raw[:8], dtype="<u4"))
                x = np.frombuffer(raw[8 : 8 + 2 * n], dtype="<i2").astype(np.float64)
                rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
                zc = int(np.sum(np.signbit(x[:-1]) != np.signbit(x[1:]))) if n > 1 else 0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "sample_rate": sr,
                        "n_samples": n,
                        "duration_s": round(n / sr, 6) if sr else 0.0,
                        "rms": round(rms, 6),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FAKE_AUDIO_SCHEMA])

    return df.mapInPandas(extract, schema=FAKE_AUDIO_SCHEMA)
