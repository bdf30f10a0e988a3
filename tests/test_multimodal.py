"""Multimodal binary-column plumbing (stubbed decode, real Spark path)."""

from __future__ import annotations

import pytest

from bloom_spark.ops.multimodal import (
    decode_media,
    media_features,
    real_decode,
    sample_frames,
    synthesize_media,
)


@pytest.fixture()
def media(spark):
    return synthesize_media(spark, 60, num_partitions=4)


def test_real_decode_is_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"anything")


def test_synthesize_deterministic(spark):
    a = synthesize_media(spark, 10).collect()
    b = synthesize_media(spark, 10, num_partitions=3).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in a} == {
        r["media_id"]: bytes(r["payload"]) for r in b
    }


def test_decode_media(spark, media):
    dec = decode_media(media)
    rows = dec.collect()
    assert len(rows) == 60
    for r in rows:
        assert r["width"] >= 8 and r["height"] >= 8
        assert r["n_bytes"] == r["width"] * r["height"] * r["channels"] * r["n_frames"]
        assert 0.0 <= r["mean_intensity"] <= 255.0
        if r["kind"] == "image":
            assert r["n_frames"] == 1
        if r["kind"] == "audio":
            assert r["sample_rate"] == 16000


def test_media_features(spark, media):
    feats = media_features(media, bins=16).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["histogram"]) == 16
        assert sum(r["histogram"]) == pytest.approx(1.0, abs=1e-6)


def test_sample_frames(spark, media):
    frames = sample_frames(media, every=2)
    rows = frames.collect()
    assert len(rows) > 0
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, fr in by_media.items():
        meta = dec[mid]
        assert meta["kind"] == "video"
        expect_n = (meta["n_frames"] + 1) // 2
        assert len(fr) == expect_n
        fsize = meta["width"] * meta["height"] * meta["channels"]
        assert all(len(bytes(x["frame"])) == fsize for x in fr)
