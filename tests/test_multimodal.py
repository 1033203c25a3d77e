"""Multimodal plumbing tests: schema, Arrow batch shape, stubbed decode,
frame-sampling fan-out."""

from __future__ import annotations

import numpy as np
import pytest

from document_retrieval_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    fake_decoder,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "d1", "image", b"\x89PNG-fake-bytes-1", "image/png", 64, 64, None),
        ("m2", "d1", "image", b"\x89PNG-fake-bytes-2", "image/png", 32, 32, None),
        ("m3", "d2", "audio", b"RIFF-fake-audio", "audio/wav", None, None, 2500),
        ("m4", "d3", "video", b"ftyp-fake-video", "video/mp4", 640, 480, 3500),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_decode_features_deterministic(media):
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert set(rows) == {"m1", "m2", "m3", "m4"}
    for mid, r in rows.items():
        assert len(r["features"]) == FEATURE_DIM
        assert abs(float(np.linalg.norm(r["features"])) - 1.0) < 1e-5
    # deterministic: same payload -> same features as direct call
    want = fake_decoder(b"\x89PNG-fake-bytes-1")
    np.testing.assert_allclose(rows["m1"]["features"], want, rtol=1e-6)
    assert rows["m1"]["n_bytes"] == len(b"\x89PNG-fake-bytes-1")


def test_strict_decode_raises(media):
    with pytest.raises(NotImplementedError, match="media decoding"):
        decode_media(media, decoder=None)


def test_frame_sample_plan(media):
    rows = frame_sample_plan(media, every_ms=1000).collect()
    # m4 duration 3500ms -> frames at 0,1000,2000,3000
    assert [(r["frame_idx"], r["offset_ms"]) for r in sorted(rows, key=lambda x: x["offset_ms"])] == [
        (0, 0), (1, 1000), (2, 2000), (3, 3000)
    ]
    assert all(r["media_id"] == "m4" for r in rows)
