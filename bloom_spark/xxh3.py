"""Vectorized XXH3-64 (seed 0, default secret) in pure numpy.

The reference's XXH container hashes every line with ``xxh3_64`` from
xxhash-rust (container_memory_xxh.rs:5,139). XXH3's 64-bit variant has
been frozen since xxHash v0.8.0, and xxhash-rust 0.8.x (the pinned
dependency) implements that frozen algorithm — so an implementation
that matches the reference C library (``libxxhash`` 0.8.1) bit-for-bit
also matches the Rust binary, closing the last ``.blf`` interop gap
(probing filter files written by the actual reference binary).

Written from the public algorithm description in the xxHash project
(Yann Collet, BSD-2-Clause, github.com/Cyan4973/xxHash — see
``XXH3_64bits`` in xxhash.h); ``_KSECRET`` is the project's published
192-byte default secret (``XXH3_kSecret``). Tests cross-check every
length class against ``libxxhash.so`` via ctypes when present.

Shape: one call hashes a batch of variable-length byte strings. Rows
are bucketed by the spec's length classes (0, 1-3, 4-8, 9-16, 17-128,
129-240, >240) and EVERY class — including the long path — is
processed as flat numpy gathers over one concatenated buffer, no
per-row Python anywhere (the long path sorts rows by block count so
each 1024-byte block iteration is a prefix-sliced tensor reduction —
see ``_hash_long_batch``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e"
)

_U = np.uint64
_P32_1 = _U(0x9E3779B1)
_P32_2 = _U(0x85EBCA77)
_P32_3 = _U(0xC2B2AE3D)
_P64_1 = _U(0x9E3779B185EBCA87)
_P64_2 = _U(0xC2B2AE3D27D4EB4F)
_P64_3 = _U(0x165667B19E3779F9)
_P64_4 = _U(0x85EBCA77C2B2AE63)
_P64_5 = _U(0x27D4EB2F165667C5)
_MX1 = _U(0x165667919E3779F9)
_MX2 = _U(0x9FB21C651E98DF25)
_M32 = _U(0xFFFFFFFF)


def _sec64(off: int) -> np.uint64:
    return _U(int.from_bytes(_KSECRET[off : off + 8], "little"))


def _sec32(off: int) -> np.uint64:
    return _U(int.from_bytes(_KSECRET[off : off + 4], "little"))


# per-stripe secret words for the long path: stripe i, lane j reads
# secret bytes [8i+8j, 8i+8j+8) (XXH_SECRET_CONSUME_RATE = 8)
_SEC_STRIPE = np.array(
    [[_sec64(8 * i + 8 * j) for j in range(8)] for i in range(16)], dtype=np.uint64
)
_SEC_SCRAMBLE = np.array([_sec64(128 + 8 * j) for j in range(8)], dtype=np.uint64)
# last stripe uses secret offset secretLen - 64 - 7 = 121
_SEC_LAST = np.array([_sec64(121 + 8 * j) for j in range(8)], dtype=np.uint64)
_ACC_INIT = np.array(
    [_P32_3, _P64_1, _P64_2, _P64_3, _P64_4, _P32_2, _P64_5, _P32_1], dtype=np.uint64
)
_SWAP = np.array([1, 0, 3, 2, 5, 4, 7, 6])


def _r64(buf: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Little-endian u64 gather at arbitrary byte offsets."""
    out = buf[off].astype(np.uint64)
    for i in range(1, 8):
        out |= buf[off + i].astype(np.uint64) << _U(8 * i)
    return out


def _r32(buf: np.ndarray, off: np.ndarray) -> np.ndarray:
    out = buf[off].astype(np.uint64)
    for i in range(1, 4):
        out |= buf[off + i].astype(np.uint64) << _U(8 * i)
    return out


def _bswap64(x: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x)
    for i in range(8):
        out |= ((x >> _U(8 * i)) & _U(0xFF)) << _U(8 * (7 - i))
    return out


def _mul128_fold64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """lo64(a*b) ^ hi64(a*b) via 32-bit limbs (numpy has no u128)."""
    alo, ahi = a & _M32, a >> _U(32)
    blo, bhi = b & _M32, b >> _U(32)
    lo_lo = alo * blo
    hi_lo = ahi * blo
    cross = (lo_lo >> _U(32)) + (hi_lo & _M32) + alo * bhi
    upper = (hi_lo >> _U(32)) + (cross >> _U(32)) + ahi * bhi
    lower = (cross << _U(32)) | (lo_lo & _M32)
    return lower ^ upper


def _avalanche64(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U(33))
    h = h * _P64_2
    h = h ^ (h >> _U(29))
    h = h * _P64_3
    return h ^ (h >> _U(32))


def _avalanche3(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U(37))
    h = h * _MX1
    return h ^ (h >> _U(32))


def _rrmxmx(h: np.ndarray, length: np.ndarray) -> np.ndarray:
    h = h ^ (((h << _U(49)) | (h >> _U(15))) ^ ((h << _U(24)) | (h >> _U(40))))
    h = h * _MX2
    h = h ^ ((h >> _U(35)) + length.astype(np.uint64))
    h = h * _MX2
    return h ^ (h >> _U(28))


def _mix16(buf: np.ndarray, off: np.ndarray, soff: int) -> np.ndarray:
    return _mul128_fold64(
        _r64(buf, off) ^ _sec64(soff), _r64(buf, off + 8) ^ _sec64(soff + 8)
    )


_H_EMPTY = None  # computed lazily: avalanche64(sec64(56) ^ sec64(64))

# (stripe, lane) byte offsets within one 1024-byte block / one 64-byte stripe
_BLOCK_OFFS = (
    np.arange(16, dtype=np.int64)[:, None] * 64 + np.arange(8, dtype=np.int64) * 8
)
_LANE_OFFS = np.arange(8, dtype=np.int64) * 8


def _gather_words(buf: np.ndarray, base: np.ndarray, nbytes: int) -> np.ndarray:
    """(k, nbytes//8) little-endian u64 words starting at each byte
    offset in ``base`` — ONE fancy-index gather of the byte matrix and
    a free dtype view (the freshly-gathered matrix is contiguous), vs
    eight shifted gathers through ``_r64``. The win is ~8x fewer index
    operations on the multi-KB long-path reads."""
    mat = buf[base[:, None] + np.arange(nbytes, dtype=np.int64)]
    return mat.view("<u8")


def _hash_long_batch(
    buf: np.ndarray, offs: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """>240-byte path, vectorized ACROSS rows (web pages are mostly in
    this class — the per-row variant measured ~5k rows/s vs ~500k for
    the short classes). Per-row state is the 8-lane accumulator matrix
    (n, 8); rows are sorted by block count so each block iteration
    processes a prefix; a block's accumulator update is a plain sum
    over its 16 stripes (two axis-sums on an (n, 16, 8) gather); the
    inter-block scramble is the only sequential step. Rows are chunked
    to bound the gather tensor at ~32 MB."""
    n = len(offs)
    out = np.empty(n, dtype=np.uint64)
    CH = 4096
    for c0 in range(0, n, CH):
        o_c, l_c = offs[c0 : c0 + CH], lens[c0 : c0 + CH]
        m = len(o_c)
        nb = (l_c - 1) // 1024
        order = np.argsort(-nb, kind="stable")
        o_s, l_s, nb_s = o_c[order], l_c[order], nb[order]
        accs = np.tile(_ACC_INIT, (m, 1))

        for b in range(int(nb_s[0]) if m else 0):
            cnt = int(np.searchsorted(-nb_s, -b, side="left"))
            data = _gather_words(buf, o_s[:cnt] + b * 1024, 1024).reshape(cnt, 16, 8)
            key = data ^ _SEC_STRIPE
            accs[:cnt, _SWAP] += data.sum(axis=1, dtype=np.uint64)
            accs[:cnt] += ((key & _M32) * (key >> _U(32))).sum(
                axis=1, dtype=np.uint64
            )
            a = accs[:cnt]
            a ^= a >> _U(47)
            a ^= _SEC_SCRAMBLE
            a *= _P32_1

        tail_base = o_s + nb_s * 1024
        n_stripes = ((l_s - 1) - nb_s * 1024) // 64
        for t in range(15):
            idx = np.flatnonzero(n_stripes > t)
            if not len(idx):
                break
            data = _gather_words(buf, tail_base[idx] + t * 64, 64)
            key = data ^ _SEC_STRIPE[t]
            accs[np.ix_(idx, _SWAP)] += data
            accs[idx] += (key & _M32) * (key >> _U(32))

        data = _gather_words(buf, o_s + l_s - 64, 64)
        key = data ^ _SEC_LAST
        accs[:, _SWAP] += data
        accs += (key & _M32) * (key >> _U(32))

        res = l_s.astype(np.uint64) * _P64_1
        for i in range(4):
            res += _mul128_fold64(
                accs[:, 2 * i] ^ _sec64(11 + 16 * i),
                accs[:, 2 * i + 1] ^ _sec64(11 + 16 * i + 8),
            )
        chunk_out = np.empty(m, dtype=np.uint64)
        chunk_out[order] = _avalanche3(res)
        out[c0 : c0 + CH] = chunk_out
    return out


def xxh3_64_bytes(values: "list[bytes] | np.ndarray | pd.Series") -> np.ndarray:
    """XXH3-64 (seed 0) of each byte string; returns uint64[n].

    Accepts str (UTF-8 encoded — the reference hashes the line's UTF-8
    bytes), bytes, or bytearray elements.
    """
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    bs = []
    for v in values:
        if isinstance(v, str):
            bs.append(v.encode("utf-8"))
        elif isinstance(v, (bytes, bytearray, memoryview)):
            bs.append(bytes(v))
        else:
            # bytes(int) would silently hash N ZERO bytes (every int of
            # one byte-length collides) and bytes(None) would crash the
            # worker mid-batch — reject loudly instead (r3 review);
            # callers mask nulls and cast keys to string/binary first
            raise TypeError(
                f"xxh3_64_bytes hashes str/bytes values, got {type(v).__name__}"
                " — cast the key column to string (and filter NULLs) first"
            )
    n = len(bs)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in bs), count=n, dtype=np.int64)
    joined = b"".join(bs)
    # one pad byte so vectorized gathers at off+len-k never index past the
    # end for the empty-tail corner (classes guard real reads by length)
    buf = np.frombuffer(joined + b"\0" * 8, dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])

    global _H_EMPTY
    if _H_EMPTY is None:
        _H_EMPTY = _avalanche64(np.array([_sec64(56) ^ _sec64(64)], dtype=np.uint64))[0]

    sel = np.flatnonzero(lens == 0)
    if len(sel):
        out[sel] = _H_EMPTY

    sel = np.flatnonzero((lens >= 1) & (lens <= 3))
    if len(sel):
        o, ln = offs[sel], lens[sel]
        c1 = buf[o].astype(np.uint64)
        c2 = buf[o + (ln >> 1)].astype(np.uint64)
        c3 = buf[o + ln - 1].astype(np.uint64)
        combined = (c1 << _U(16)) | (c2 << _U(24)) | c3 | (ln.astype(np.uint64) << _U(8))
        out[sel] = _avalanche64(combined ^ (_sec32(0) ^ _sec32(4)))

    sel = np.flatnonzero((lens >= 4) & (lens <= 8))
    if len(sel):
        o, ln = offs[sel], lens[sel]
        input64 = _r32(buf, o + ln - 4) + (_r32(buf, o) << _U(32))
        out[sel] = _rrmxmx(input64 ^ (_sec64(8) ^ _sec64(16)), ln)

    sel = np.flatnonzero((lens >= 9) & (lens <= 16))
    if len(sel):
        o, ln = offs[sel], lens[sel]
        lo = _r64(buf, o) ^ (_sec64(24) ^ _sec64(32))
        hi = _r64(buf, o + ln - 8) ^ (_sec64(40) ^ _sec64(48))
        acc = (
            ln.astype(np.uint64) + _bswap64(lo) + hi + _mul128_fold64(lo, hi)
        )
        out[sel] = _avalanche3(acc)

    sel = np.flatnonzero((lens >= 17) & (lens <= 128))
    if len(sel):
        o, ln = offs[sel], lens[sel]
        acc = ln.astype(np.uint64) * _P64_1
        for bound, fwd, bwd, sf, sb in (
            (96, 48, 64, 96, 112),
            (64, 32, 48, 64, 80),
            (32, 16, 32, 32, 48),
        ):
            m = np.flatnonzero(ln > bound)
            if len(m):
                acc[m] += _mix16(buf, o[m] + fwd, sf) + _mix16(
                    buf, o[m] + ln[m] - bwd, sb
                )
        acc += _mix16(buf, o, 0) + _mix16(buf, o + ln - 16, 16)
        out[sel] = _avalanche3(acc)

    sel = np.flatnonzero((lens >= 129) & (lens <= 240))
    if len(sel):
        o, ln = offs[sel], lens[sel]
        acc = ln.astype(np.uint64) * _P64_1
        for i in range(8):
            acc += _mix16(buf, o + 16 * i, 16 * i)
        acc = _avalanche3(acc)
        rounds = ln // 16
        for i in range(8, 15):
            m = np.flatnonzero(rounds > i)
            if len(m):
                # XXH3_MIDSIZE_STARTOFFSET = 3
                acc[m] += _mix16(buf, o[m] + 16 * i, 16 * (i - 8) + 3)
        # XXH3_MIDSIZE_LASTOFFSET = 17 → secret offset 136 - 17 = 119
        acc += _mix16(buf, o + ln - 16, 119)
        out[sel] = _avalanche3(acc)

    sel = np.flatnonzero(lens > 240)
    if len(sel):
        out[sel] = _hash_long_batch(buf, offs[sel], lens[sel])

    return out
