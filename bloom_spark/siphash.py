"""Vectorized keyed SipHash (c compression / d finalization rounds).

Needed for reference ``.blf`` Bloom-container interop: the reference's
Bloom filter is the ``bloomfilter`` crate (1.0.16), which probes with
two SipHash-1-3 hashers (``siphasher`` 1.0.1) whose RANDOM keys are
persisted in the file payload (container_memory_bloom.rs:79-85). With
a keyed SipHash-1-3 those files become readable.

SipHash is a public algorithm (Aumasson & Bernstein, "SipHash: a fast
short-input PRF", DIAC 2012); this is a from-scratch numpy
implementation of the paper's round function. Tests validate the core
against the paper's published SipHash-2-4 reference vectors (same
round function, different round counts) and the scalar path against
the vectorized one.

Batch shape: rows are processed sorted by word count (descending), so
at compression step j the active rows are a prefix — the state
vectors are updated on slices, no per-row Python in the hot loop.
"""

from __future__ import annotations

import numpy as np

_U = np.uint64
_M8 = _U(0xFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _rounds(v0, v1, v2, v3, n: int):
    for _ in range(n):
        v0 = v0 + v1
        v1 = _rotl(v1, 13) ^ v0
        v0 = _rotl(v0, 32)
        v2 = v2 + v3
        v3 = _rotl(v3, 16) ^ v2
        v0 = v0 + v3
        v3 = _rotl(v3, 21) ^ v0
        v2 = v2 + v1
        v1 = _rotl(v1, 17) ^ v2
        v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


_IV0 = _U(0x736F6D6570736575)
_IV1 = _U(0x646F72616E646F6D)
_IV2 = _U(0x6C7967656E657261)
_IV3 = _U(0x7465646279746573)


def siphash_scalar(k0: int, k1: int, data: bytes, c: int = 1, d: int = 3) -> int:
    """One value — the readable reference form (tests cross-check the
    batch path against this, and this against the SipHash-2-4 paper
    vectors with c=2, d=4)."""
    out = siphash_batch(k0, k1, [data], c=c, d=d)
    return int(out[0])


def siphash_batch(
    k0: int, k1: int, streams, c: int = 1, d: int = 3
) -> np.ndarray:
    """Keyed SipHash-c-d of each byte stream; returns uint64[n].

    ``streams`` — list/array/Series of bytes (already including any
    caller-side framing, e.g. Rust ``Hash for str`` appends 0xff)."""
    bs = [bytes(s) for s in streams]
    n = len(bs)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in bs), count=n, dtype=np.int64)
    buf = np.frombuffer(b"".join(bs) + b"\0" * 8, dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])

    full = lens // 8  # number of full 8-byte words per row
    # last word: remaining tail bytes little-endian | (len mod 256) << 56
    tail = np.zeros(n, dtype=np.uint64)
    rem = lens - 8 * full
    for t in range(7):
        m = rem > t
        if m.any():
            tail[m] |= buf[offs[m] + 8 * full[m] + t].astype(np.uint64) << _U(8 * t)
    tail |= (lens.astype(np.uint64) & _M8) << _U(56)

    # sort rows by total word count descending → active rows at step j
    # are the prefix [0:cnt_j]
    nwords = full + 1
    order = np.argsort(-nwords, kind="stable")
    offs_s, full_s, tail_s = offs[order], full[order], tail[order]
    nwords_s = nwords[order]

    k0a = np.full(n, _U(k0 & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    k1a = np.full(n, _U(k1 & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    v0 = k0a ^ _IV0
    v1 = k1a ^ _IV1
    v2 = k0a ^ _IV2
    v3 = k1a ^ _IV3

    max_words = int(nwords_s[0])
    for j in range(max_words):
        # active rows: nwords > j ⇔ -nwords < -j (array is ascending)
        cnt = int(np.searchsorted(-nwords_s, -j, side="left"))
        if cnt == 0:
            break
        o, f = offs_s[:cnt], full_s[:cnt]
        is_tail = f == j
        m = buf[o + 8 * j].astype(np.uint64)
        for t in range(1, 8):
            m |= buf[o + 8 * j + t].astype(np.uint64) << _U(8 * t)
        m = np.where(is_tail, tail_s[:cnt], m)
        a0, a1, a2, a3 = v0[:cnt], v1[:cnt], v2[:cnt], v3[:cnt]
        a3 = a3 ^ m
        a0, a1, a2, a3 = _rounds(a0, a1, a2, a3, c)
        a0 = a0 ^ m
        v0[:cnt], v1[:cnt], v2[:cnt], v3[:cnt] = a0, a1, a2, a3

    v2 = v2 ^ _U(0xFF)  # 64-bit-output finalization marker
    v0, v1, v2, v3 = _rounds(v0, v1, v2, v3, d)
    out_sorted = v0 ^ v1 ^ v2 ^ v3
    out = np.empty(n, dtype=np.uint64)
    out[order] = out_sorted
    return out
