"""Pure-numpy codecs for the two public container formats that need no
external library: BMP (Windows V3 DIB, uncompressed BI_RGB) and WAV
(RIFF PCM). Both formats are fully specified by public documentation
(the Windows BITMAPINFOHEADER layout; the RIFF/WAVE chunk grammar), so
real parsing — header walk, row padding, bottom-up raster order,
BGR→RGB, chunk skipping, 8/16-bit PCM — is implementable with
``struct`` + numpy alone. This replaces the r4 fake codec for image and
audio payloads; video decode still needs ffmpeg and stays honestly
stubbed (``ops.multimodal.real_decode``).

Scale note: these run per-row inside Arrow-batched ``mapInPandas``
(``ops.multimodal``) — binary payloads are row-opaque, so the
vectorization axis is the batch, exactly how PIL/soundfile would be
driven; numpy does the raster math per payload.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------- BMP

_BMP_FILE_FMT = "<2sIHHI"  # magic, file size, reserved, reserved, data offset
_BMP_INFO_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER (40 bytes)
_BMP_FILE_SIZE = struct.calcsize(_BMP_FILE_FMT)  # 14
_BMP_INFO_SIZE = struct.calcsize(_BMP_INFO_FMT)  # 40


def _bmp_row_size(width: int) -> int:
    """Rows are padded to 4-byte boundaries (24bpp → 3 bytes/px)."""
    return (width * 3 + 3) & ~3


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bit BI_RGB BMP:
    bottom-up rows, BGR byte order, 4-byte row padding."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp wants an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    row = _bmp_row_size(w)
    raster = np.zeros((h, row), dtype=np.uint8)
    raster[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data_offset = _BMP_FILE_SIZE + _BMP_INFO_SIZE
    body = raster.tobytes()
    header = struct.pack(
        _BMP_FILE_FMT, b"BM", data_offset + len(body), 0, 0, data_offset
    ) + struct.pack(
        _BMP_INFO_FMT, _BMP_INFO_SIZE, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a 24-bit uncompressed BMP → ``(width, height, channels,
    pixels[h, w, 3] uint8 RGB)``. Handles bottom-up (positive height —
    the common case) and top-down (negative height) rasters and row
    padding; refuses paletted/compressed variants explicitly."""
    magic, _fsize, _r1, _r2, data_offset = struct.unpack_from(
        _BMP_FILE_FMT, payload, 0
    )
    if magic != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (
        info_size, w, h, _planes, bpp, compression,
        _img_size, _xppm, _yppm, _ncolors, _nimportant,
    ) = struct.unpack_from(_BMP_INFO_FMT, payload, _BMP_FILE_SIZE)
    if info_size < _BMP_INFO_SIZE:
        raise ValueError(f"unsupported BMP header size {info_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24bpp BI_RGB BMPs supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row = _bmp_row_size(w)
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=h * row, offset=data_offset
    ).reshape(h, row)
    px = raster[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # strip pad, BGR→RGB
    if not top_down:
        px = px[::-1]
    return w, h, 3, np.ascontiguousarray(px)


# ---------------------------------------------------------------------- WAV

_WAV_FMT_FMT = "<HHIIHH"  # format, channels, rate, byte rate, block align, bits


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Encode ``(n,)`` or ``(n, channels)`` samples as RIFF/WAVE PCM.
    8-bit PCM is unsigned (uint8 input); 16-bit is signed little-endian
    (int16 input), interleaved by frame — the canonical PCM layouts."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if bits == 8:
        if samples.dtype != np.uint8:
            raise ValueError("8-bit PCM wants uint8 samples")
        data = samples.astype("<u1").tobytes()
    elif bits == 16:
        if samples.dtype != np.int16:
            raise ValueError("16-bit PCM wants int16 samples")
        data = samples.astype("<i2").tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack(
        _WAV_FMT_FMT, 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
            b"" if len(data) % 2 == 0 else b"\x00",  # chunks are even-padded
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse RIFF/WAVE PCM → ``(channels, sample_rate, bits,
    samples[n, channels])``. Walks the chunk list (skipping LIST/fact/
    any other chunk, honoring even padding) so files from real encoders
    — which routinely interleave metadata chunks — parse too."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_at = pos + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from(_WAV_FMT_FMT, payload, body_at)
        elif cid == b"data":
            data = payload[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # chunks are even-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format={audio_format})")
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    n = len(arr) - len(arr) % channels
    return channels, sample_rate, bits, arr[:n].reshape(-1, channels)
