"""Multimodal-column plumbing tests: BinaryType payload + typed metadata,
Arrow-batched mapInPandas decode, and the explicitly-stubbed image decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seisdb_spark.functions.multimodal import (
    _HAS_PIL,
    decode_fake_image_headers,
    decode_image,
    decode_payload_features,
    documents_as_binary,
)
from seisdb_spark.sources.tables import load_table
from tests.conftest import SMOKE_SF_DIR


def test_documents_as_binary_schema(spark):
    mm = documents_as_binary(load_table(spark, SMOKE_SF_DIR, "documents"))
    assert [f.name for f in mm.schema] == ["doc_id", "payload", "meta"]
    assert isinstance(mm.schema["payload"].dataType, T.BinaryType)
    meta = mm.schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "kind", "n_bytes", "width", "height", "sample_rate",
    ]
    row = mm.filter(F.col("doc_id") == 0).head()
    assert row.meta.kind == "text"
    assert row.meta.n_bytes == len(bytes(row.payload))


def test_decode_payload_features_matches_numpy(spark):
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    feats = (
        decode_payload_features(documents_as_binary(docs))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    texts = {r.doc_id: r.text for r in docs.toPandas().itertuples()}
    assert len(feats) == len(texts)
    for doc_id, text in list(texts.items())[:20]:
        b = np.frombuffer(text.encode(), dtype=np.uint8)
        row = feats.loc[doc_id]
        assert row.n_bytes == b.size
        assert row.byte_min == int(b.min())
        assert row.byte_max == int(b.max())
        assert row.distinct_bytes == int(np.unique(b).size)
        assert abs(row.byte_mean - round(float(b.mean()), 6)) < 1e-9
        assert row.head_hex == text.encode()[:8].hex()


def test_fake_image_decode_plumbing(spark):
    """The deterministic fake-header path: 8-byte (width,height) header +
    pixel block, decoded per Arrow batch — the batch shape a real decoder
    drops into."""
    rng = np.random.default_rng(5)
    rows = []
    for i, (w, h) in enumerate([(4, 3), (16, 2), (1, 1)]):
        pix = rng.integers(0, 256, size=w * h, dtype=np.uint8)
        payload = struct.pack("<II", w, h) + pix.tobytes()
        rows.append((i, bytearray(payload), float(pix.mean())))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], schema="doc_id long, payload binary"
    )
    out = decode_fake_image_headers(df).toPandas().set_index("doc_id").sort_index()
    for i, _p, mean in rows:
        r = out.loc[i]
        assert (r.width, r.height) == ((4, 3), (16, 2), (1, 1))[i]
        assert r.n_pixel_bytes == r.width * r.height
        assert abs(r.pixel_mean - round(mean, 6)) < 1e-9


@pytest.mark.skipif(_HAS_PIL, reason="PIL present: stub not in effect")
def test_decode_image_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="image decode needs PIL"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_declarative_header_parse_matches_struct_unpack(spark):
    """The JVM-side little-endian uint32 parse (no Python in the plan) must
    agree with struct.unpack on real struct-packed fake-image headers."""
    from seisdb_spark.queries.extensions import _le_u32_spark

    rng = np.random.default_rng(9)
    rows = []
    for i, (w, h) in enumerate([(4, 3), (640, 480), (1, 1), (70000, 2)]):
        payload = struct.pack("<II", w, h) + rng.integers(
            0, 256, size=8, dtype=np.uint8
        ).tobytes()
        rows.append((i, bytearray(payload), w, h))
    df = spark.createDataFrame(
        [(i, p) for i, p, _, _ in rows], schema="doc_id long, payload binary"
    )
    out = (
        df.select(
            "doc_id",
            _le_u32_spark("payload", 0).alias("w"),
            _le_u32_spark("payload", 4).alias("h"),
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, _p, w, h in rows:
        assert (out.loc[i].w, out.loc[i].h) == (w, h)


def test_resize_fake_images_nearest_neighbour(spark):
    rng = np.random.default_rng(9)
    w, h = 8, 6
    pix = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    payload = struct.pack("<II", w, h) + pix.tobytes()
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    from seisdb_spark.functions.multimodal import resize_fake_images

    out = resize_fake_images(df, out_w=4, out_h=3).toPandas().iloc[0]
    ys = (np.arange(3) * h // 3).astype(int)
    xs = (np.arange(4) * w // 4).astype(int)
    want = pix[np.ix_(ys, xs)]
    got = np.frombuffer(bytes(out.resized), dtype=np.uint8).reshape(3, 4)
    np.testing.assert_array_equal(got, want)
    assert out.out_width == 4 and out.out_height == 3
    assert abs(out.resized_mean - round(float(want.mean()), 6)) < 1e-9


def test_sample_fake_video_frames(spark):
    rng = np.random.default_rng(13)
    n_frames, frame_size = 7, 16
    body = rng.integers(0, 256, size=(n_frames, frame_size), dtype=np.uint8)
    payload = struct.pack("<II", n_frames, frame_size) + body.tobytes()
    df = spark.createDataFrame([(2, bytearray(payload))], "doc_id long, payload binary")
    from seisdb_spark.functions.multimodal import sample_fake_video_frames

    out = sample_fake_video_frames(df, every_k=3).toPandas().sort_values("frame_idx")
    assert list(out.frame_idx) == [0, 3, 6]  # every 3rd frame
    for _, r in out.iterrows():
        assert r.frame_bytes == frame_size
        assert abs(r.frame_mean - round(float(body[int(r.frame_idx)].mean()), 6)) < 1e-9


def test_decode_fake_audio_sine(spark):
    """A pure 100 Hz sine at 8 kHz: duration, RMS (A/sqrt(2)) and zero
    crossings (2 per cycle) must match signal theory."""
    from seisdb_spark.functions.multimodal import decode_fake_audio

    sr, dur_s, freq, amp = 8000, 2, 100, 10000
    t = np.arange(sr * dur_s)
    x = (amp * np.sin(2 * np.pi * freq * t / sr)).astype("<i2")
    payload = struct.pack("<II", sr, len(x)) + x.tobytes()
    df = spark.createDataFrame([(3, bytearray(payload))], "doc_id long, payload binary")
    out = decode_fake_audio(df).toPandas().iloc[0]
    assert out.sample_rate == sr and out.n_samples == len(x)
    assert abs(out.duration_s - dur_s) < 1e-9
    assert abs(out.rms - amp / np.sqrt(2)) / (amp / np.sqrt(2)) < 0.01
    assert abs(out.zero_crossings - 2 * freq * dur_s) <= 2
