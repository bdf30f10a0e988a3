"""Multimodal binary columns: REAL BMP/WAV codecs (pure numpy) for
image/audio, BMM1 fake for video (ffmpeg-less), and the Spark plumbing
over all three."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bloom_spark.io.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
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


# ------------------------------------------------------------------ codecs


def test_bmp_roundtrip_with_padding():
    # w=5 → 15-byte rows padded to 16: exercises the pad/strip path
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    w, h, c, got = decode_bmp(encode_bmp(px))
    assert (w, h, c) == (5, 9, 3)
    assert np.array_equal(got, px)


def test_bmp_bottom_up_layout_on_disk():
    # the encoder must write genuine BMP: bottom-up rows, BGR order
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[0, 0] = (1, 2, 3)  # top-left pixel, RGB
    raw = encode_bmp(px)
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    row_size = 4 * 3  # no padding at w=4
    # top row is stored LAST; first 3 bytes of it are BGR of top-left
    top_row = raw[data_offset + row_size : data_offset + 2 * row_size]
    assert top_row[:3] == bytes((3, 2, 1))


def test_bmp_top_down_decode():
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    raw = bytearray(encode_bmp(px))
    # flip the height sign → top-down raster; re-flip the stored rows
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    struct.pack_into("<i", raw, 14 + 8, -2)
    rows = raw[data_offset:]
    raw[data_offset:] = rows[12:] + rows[:12]
    _, _, _, got = decode_bmp(bytes(raw))
    assert np.array_equal(got, px)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + b"\x00" * 60)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = bytearray(encode_bmp(px))
    struct.pack_into("<H", raw, 14 + 14, 8)  # bpp → 8
    with pytest.raises(ValueError, match="24bpp"):
        decode_bmp(bytes(raw))


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.default_rng(11)
    samples = rng.integers(-30000, 30000, size=(480, 2), dtype=np.int16)
    ch, sr, bits, got = decode_wav(encode_wav(samples, 22050, bits=16))
    assert (ch, sr, bits) == (2, 22050, 16)
    assert np.array_equal(got, samples)


def test_wav_roundtrip_8bit_mono_and_chunk_skip():
    samples = np.arange(255, dtype=np.uint8)[:, None]  # odd data size → pad
    raw = encode_wav(samples, 8000, bits=8)
    # splice an unknown LIST chunk between fmt and data: real encoders do
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOxx"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    ch, sr, bits, got = decode_wav(spliced)
    assert (ch, sr, bits) == (1, 8000, 8)
    assert np.array_equal(got, samples)


def test_wav_rejects_non_pcm():
    raw = bytearray(encode_wav(np.zeros((4, 1), dtype=np.int16), 8000, 16))
    struct.pack_into("<H", raw, 12 + 8, 3)  # format → IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(raw))


# ----------------------------------------------------------------- plumbing


def test_real_decode_is_video_stub():
    with pytest.raises(NotImplementedError, match="video"):
        real_decode(b"anything")


def test_synthesize_deterministic(spark):
    a = synthesize_media(spark, 10).collect()
    b = synthesize_media(spark, 10, num_partitions=3).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in a} == {
        r["media_id"]: bytes(r["payload"]) for r in b
    }


def test_synthesized_images_are_genuine_bmp(spark):
    rows = synthesize_media(spark, 12).where("kind = 'image'").collect()
    assert rows
    for r in rows:
        i = r["media_id"]
        w, h, c, px = decode_bmp(bytes(r["payload"]))
        assert (w, h, c) == (4 * (2 + i % 4), 8 + i % 5, 3)
        want = (7 * i + 11 * np.arange(w * h * 3, dtype=np.int64)) % 256
        assert np.array_equal(px.ravel(), want.astype(np.uint8))


def test_synthesized_audio_is_genuine_wav(spark):
    rows = synthesize_media(spark, 12).where("kind = 'audio'").collect()
    assert rows
    for r in rows:
        i = r["media_id"]
        ch, sr, bits, samples = decode_wav(bytes(r["payload"]))
        assert (ch, sr, bits) == (1 + i % 2, 16000, 8)
        total = 240 + (i % 7) * 16
        want = (7 * i + 11 * np.arange(total, dtype=np.int64)) % 256
        assert np.array_equal(samples.ravel(), want.astype(np.uint8))


def test_decode_media(spark, media):
    dec = decode_media(media)
    rows = dec.collect()
    assert len(rows) == 60
    for r in rows:
        assert r["n_bytes"] == r["width"] * r["height"] * r["channels"] * r["n_frames"]
        assert 0.0 <= r["mean_intensity"] <= 255.0
        if r["kind"] == "image":
            assert r["n_frames"] == 1 and r["channels"] == 3
            assert r["width"] >= 8 and r["height"] >= 8
        if r["kind"] == "audio":
            assert r["sample_rate"] == 16000
            assert (r["width"], r["height"]) == (1, 1)
        if r["kind"] == "video":
            assert r["width"] >= 8 and r["height"] >= 8


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
