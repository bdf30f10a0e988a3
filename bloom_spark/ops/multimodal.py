"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The container ships no image/audio libraries, so the *decode* step is
stubbed (clearly marked) behind a deterministic fake-codec; everything
Spark-side — schema, partition behavior, ``mapInPandas`` signatures,
Arrow batch shapes, explode of variable-length frame samples — is real
and tested, so swapping the stub for PIL/ffmpeg later changes one
function body, not the pipeline.

Fake codec ("BMM1"): payload = 16-byte header
(magic 4s, width u16, height u16, channels u8, n_frames u8, sr u32, pad)
+ body bytes (one byte per "pixel" per frame). Deterministic per id,
with body byte j = (7*id + 11*j) mod 256 — a formula ANSI SQL can
replay, so decoded features (dims, n_bytes, mean intensity) are
exactly oracle-checkable in DuckDB without a real codec
(driver query ``multimodal_decode``).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"BMM1"
# plain format string, not struct.Struct: compiled Struct objects cannot be
# cloudpickled into UDF closures
_HEADER_FMT = "<4sHHBBIxx"  # 16 bytes
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

MEDIA_SCHEMA = "media_id long, kind string, payload binary"
DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "n_frames int, sample_rate int, n_bytes long, mean_intensity double"
)
FEATURES_SCHEMA = "media_id long, histogram array<double>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame bytes".replace("bytes", "binary")


def real_decode(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image/audio decode needs PIL/soundfile/ffmpeg, none of
    which ship in this container. The Spark plumbing calls
    ``_parse_fake`` instead; swap this in when the libs exist."""
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg (not available); "
        "the deterministic fake codec exercises the same pipeline"
    )


def _gen_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Build one BMM1 payload per input id (column ``id``). Body byte j
    is (7*id + 11*j) % 256 — deterministic AND SQL-replayable."""
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        kinds, payloads = [], []
        for i in ids:
            kind = ["image", "audio", "video"][int(i) % 3]
            w, h, c = 8 + int(i) % 8, 8 + int(i) % 5, 1 + int(i) % 3
            nf = 1 if kind == "image" else 4 + int(i) % 4
            sr = 16000 if kind == "audio" else 0
            n = w * h * c * nf
            body = ((7 * int(i) + 11 * np.arange(n, dtype=np.int64)) % 256).astype(
                np.uint8
            )
            payloads.append(
                struct.pack(_HEADER_FMT, MAGIC, w, h, c, nf, sr) + body.tobytes()
            )
            kinds.append(kind)
        yield pd.DataFrame({"media_id": ids, "kind": kinds, "payload": payloads})


def synthesize_media(
    spark: SparkSession, n_rows: int, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic fake media table. Generation runs distributed via
    mapInPandas over spark.range (fixture path, not the data path)."""
    return spark.range(0, n_rows, numPartitions=num_partitions).mapInPandas(
        _gen_media, MEDIA_SCHEMA
    )


def media_from_ids(df_ids: DataFrame, id_col: str = "id") -> DataFrame:
    """Fake media table keyed by an existing id column (e.g. the
    ``documents`` table's doc_id) — decode features over it become
    oracle-replayable in SQL against the source table's ids."""
    return df_ids.select(F.col(id_col).cast("long").alias("id")).mapInPandas(
        _gen_media, MEDIA_SCHEMA
    )


def _parse_fake(payload: bytes) -> tuple:
    magic, w, h, c, nf, sr = struct.unpack_from(_HEADER_FMT, payload, 0)
    if magic != MAGIC:
        raise ValueError("bad media magic (not a BMM1 fake payload)")
    return w, h, c, nf, sr, payload[_HEADER_SIZE:]


def decode_media(df: DataFrame) -> DataFrame:
    """Decode metadata + global intensity stats per media row.

    Arrow-batched ``mapInPandas``; per-row numpy on the payload bytes
    (binary payloads are row-opaque by nature — the vectorization axis
    is the batch, matching how a real decoder is driven)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                w, h, c, nf, sr, body = _parse_fake(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8)
                rows.append(
                    (mid, kind, w, h, c, nf, sr, len(body), float(arr.mean()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "channels",
                    "n_frames", "sample_rate", "n_bytes", "mean_intensity",
                ],
            )

    return df.mapInPandas(fn, DECODED_SCHEMA)


def media_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """Byte-histogram feature vector per media row (the stand-in for an
    embedding extractor; normalized to sum 1)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, hists = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                *_, body = _parse_fake(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8)
                hist = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)[
                    :bins
                ]
                hists.append((hist / max(1, hist.sum())).astype(float).tolist())
                out_ids.append(mid)
            yield pd.DataFrame({"media_id": out_ids, "histogram": hists})

    return df.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Explode video payloads into every-k-th frame rows — the
    variable-output-rows shape a real frame sampler needs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, nf, sr, body = _parse_fake(bytes(payload))
                fsize = w * h * c
                for fi in range(0, nf, every):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(body[fi * fsize : (fi + 1) * fsize])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.where(F.col("kind") == "video").mapInPandas(fn, FRAMES_SCHEMA)
