"""Media decoder dispatch: guarded optional real path + hash fallback."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from lakefs_spark.operators import multimodal as MM


def _hash_features(payload: bytes) -> np.ndarray:
    digest = hashlib.md5(payload).digest()
    return np.frombuffer(digest[: MM.FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 255.0


def test_fallback_without_pil_matches_hash_features():
    """In this container PIL is absent: image decode must fall back to
    the deterministic content-hash features the oracle restates."""
    payload = b"not-an-image"
    got = MM._decode_one(payload, "image")
    assert np.allclose(got, _hash_features(payload))


def test_real_decoder_used_when_available(monkeypatch):
    """Simulate Pillow present: a decodable payload takes the real
    path; an undecodable one still falls back (gates stay green with
    libs installed because synthetic fixtures are not images)."""
    real = np.linspace(0.0, 1.0, MM.FEATURE_DIM)

    def fake_pil(payload: bytes) -> np.ndarray:
        if payload == b"valid-image":
            return real
        raise ValueError("cannot identify image file")

    monkeypatch.setattr(MM, "_pil_image_features", fake_pil)
    assert np.allclose(MM._decode_one(b"valid-image", "image"), real)
    assert np.allclose(
        MM._decode_one(b"garbage", "image"), _hash_features(b"garbage")
    )


def test_non_image_kinds_never_touch_pil(monkeypatch):
    def exploding(payload: bytes) -> np.ndarray:
        raise AssertionError("PIL path must not run for audio/video")

    monkeypatch.setattr(MM, "_pil_image_features", exploding)
    for kind in ("audio", "video"):
        got = MM._decode_one(b"payload", kind)
        assert np.allclose(got, _hash_features(b"payload"))
    with pytest.raises(NotImplementedError):
        MM._decode_one(b"x", "hologram")
