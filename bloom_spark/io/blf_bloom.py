"""Reference Bloom-container (.blf types 0/1) interop.

The reference's Bloom filter is the ``bloomfilter`` crate 1.0.16
(jedisct1/rust-bloom-filter, Cargo.lock-pinned), whose probe scheme is
fully determined by the file payload:

- payload = 4 little-endian u64 SipHash keys (two keyed SipHash-1-3
  hashers) followed by the raw bitmap bytes, MSB-first within each
  byte (bit-vec 0.7 ``to_bytes``) — container_memory_bloom.rs:76-90.
- per value, the crate hashes Rust ``String``'s Hash stream —
  ``utf8(value) || 0xff`` — with each sip hasher:
  ``h0 = sip13_{key0}(stream)``, ``h1 = sip13_{key1}(stream)``; probe
  ``i`` (for i ≥ 2) is ``((h0 + i·h1) mod 2^64) mod
  0xFFFF_FFFF_FFFF_FFC5`` (the crate's ``bloom_hash``); every probe
  indexes ``bit = h % bitmap_bits``.
- geometry: ``new(size, items)`` → m = size·8 bits,
  k = max(1, ceil(m/n·ln2)); ``new_for_fp_rate(items, p)`` →
  size = ceil(n·ln p / (−8·ln²2)) bytes (the crate's
  ``compute_bitmap_size``), same k formula.

Reload quirk, documented and NOT blindly reproduced: the reference's
``load_content`` passes the construction LIMIT as ``from_existing``'s
``k_num`` argument (container_memory_bloom.rs:108-113) — a reloaded
filter would probe with k = limit (e.g. 200,000,000 probes per value
at the default limit), which answers differently from the filter that
wrote the file and is unusably slow. ``read_reference_bloom`` defaults
to the k the WRITER actually used (derived from the header via the
crate's own formula); pass ``k_num="header-limit"`` for bug-parity.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from bloom_spark.siphash import siphash_batch

_PRIME = 0xFFFFFFFFFFFFFFC5  # largest u64 prime — the crate's combiner modulus
_U = np.uint64


def optimal_k_num(bitmap_bits: int, items_count: int) -> int:
    """The crate's k formula: max(1, ceil(m/n · ln 2))."""
    if items_count <= 0:
        return 1
    return max(1, math.ceil(bitmap_bits / items_count * math.log(2)))


def compute_bitmap_size(items_count: int, fp_p: float) -> int:
    """The crate's byte sizing for a target FP rate."""
    log2_2 = math.log(2) ** 2
    return max(1, math.ceil(items_count * math.log(fp_p) / (-8.0 * log2_2)))


def _streams(values) -> list:
    """Rust ``Hash for String``: utf-8 bytes then a 0xff terminator."""
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    out = []
    for v in values:
        if isinstance(v, str):
            out.append(v.encode("utf-8") + b"\xff")
        elif isinstance(v, (bytes, bytearray, memoryview)):
            out.append(bytes(v) + b"\xff")
        else:
            # bytes(int) = N zero bytes (silent collisions), bytes(None)
            # = crash — reject loudly (r3 review)
            raise TypeError(
                f"ReferenceBloom hashes str/bytes values, got {type(v).__name__}"
                " — cast the key column to string (and filter NULLs) first"
            )
    return out


class ReferenceBloom:
    """Probe/build a bloomfilter-crate-compatible filter in numpy.

    This is NOT the library's native Bloom (sketch/bloom.py — seeded,
    mergeable, pow2-m); it exists so artifacts cross the boundary in
    both directions: files the Rust binary wrote probe here, filters
    built here load in the Rust binary.
    """

    def __init__(self, bitmap_bits: int, k_num: int, sip_keys, packed=None):
        self.m = int(bitmap_bits)
        self.k_num = int(k_num)
        # [(k0, k1), (k0, k1)] — the two hashers' keys
        self.sip_keys = [(int(a) & (2**64 - 1), int(b) & (2**64 - 1)) for a, b in sip_keys]
        # bitmap stays PACKED (uint8, MSB-first — the file's own layout):
        # a bool-array unpack is an 8x per-worker residency blowup, and
        # for file-backed filters ``packed`` can be an ``np.memmap`` so
        # every worker on a host shares one page-cached physical copy
        # (r3 advice). Bit j of the filter is bit (7 - j%8) of byte j/8.
        self.packed = (
            packed
            if packed is not None
            else np.zeros((self.m + 7) // 8, dtype=np.uint8)
        )
        self.n_inserted = 0
        # construction items_count (the crate's n in the k formula);
        # written to the header's limit field so a reader re-derives k
        self.items_count: int | None = None
        # construction error rate: set iff built via new_for_fp_rate (or
        # read from a type-1 header) — write_blf uses it to emit
        # BloomLinesAndErrorRate so the Rust binary reconstructs the
        # SAME geometry from (limit, error_rate) on its reload path
        # (container_memory_bloom.rs:118-127)
        self.fp_rate: float | None = None

    # -- constructors (crate parity) ----------------------------------------
    @classmethod
    def new(cls, size_bytes: int, items_count: int, seed: int = 0x42) -> "ReferenceBloom":
        """≙ ``Bloom::new`` with DETERMINISTIC keys derived from ``seed``
        (the crate randomizes via getrandom; determinism is our
        divergence for reproducible runs — the keys still ship in the
        file, so the Rust side reads ours fine)."""
        rng = np.random.default_rng(seed)
        keys = rng.integers(0, 2**64, size=4, dtype=np.uint64)
        f = cls(
            size_bytes * 8,
            optimal_k_num(size_bytes * 8, items_count),
            [(keys[0], keys[1]), (keys[2], keys[3])],
        )
        f.items_count = int(items_count)
        return f

    @classmethod
    def new_for_fp_rate(cls, items_count: int, fp_p: float, seed: int = 0x42) -> "ReferenceBloom":
        f = cls.new(compute_bitmap_size(items_count, fp_p), items_count, seed=seed)
        f.fp_rate = float(fp_p)
        return f

    # -- probe ---------------------------------------------------------------
    def _bit_offsets(self, values) -> np.ndarray:
        """(n, k) bit indices per the crate's ``bloom_hash``."""
        streams = _streams(values)
        h0 = siphash_batch(*self.sip_keys[0], streams, c=1, d=3)
        h1 = siphash_batch(*self.sip_keys[1], streams, c=1, d=3)
        cols = [h0 % _U(self.m), h1 % _U(self.m)]
        for k_i in range(2, self.k_num):
            combined = (h0 + _U(k_i) * h1) % _U(_PRIME)
            cols.append(combined % _U(self.m))
        return np.stack(cols[: self.k_num], axis=1).astype(np.int64)

    def _get_bits(self, idx: np.ndarray) -> np.ndarray:
        """Bit values at ``idx`` straight off the packed bytes:
        ``(packed[i>>3] >> (7-(i&7))) & 1`` — one gather, no unpack."""
        return (
            (self.packed[idx >> 3] >> (7 - (idx & 7)).astype(np.uint8)) & 1
        ).astype(bool)

    def _ensure_writable(self) -> None:
        """File-backed (memmap / frombuffer) bitmaps are read-only probe
        views; copy into private RAM on the first mutation only."""
        if not self.packed.flags.writeable:
            self.packed = np.array(self.packed)

    @staticmethod
    def _scatter_masks(flat_idx: np.ndarray):
        return flat_idx >> 3, (
            np.uint8(0x80) >> (flat_idx & 7).astype(np.uint8)
        )

    def contains(self, values) -> np.ndarray:
        idx = self._bit_offsets(values)
        return self._get_bits(idx).all(axis=1)

    def set(self, values) -> None:
        idx = self._bit_offsets(values)
        self._ensure_writable()
        bytepos, mask = self._scatter_masks(idx.ravel())
        np.bitwise_or.at(self.packed, bytepos, mask)
        self.n_inserted += len(idx)

    def check_and_set(self, values) -> np.ndarray:
        """Per-row found-before-insert with the reference's sequential
        batch semantics (a row is "found" iff every one of its bits was
        set before it — by the filter or by an EARLIER batch row), fully
        vectorized: the first batch row to write each bit is recovered
        with one lexsort + unique over the unseen rows' bit indices, so
        a mostly-unseen batch (fresh build) costs O(n·k log) numpy, not
        an O(n) interpreted loop (r3 advice)."""
        idx = self._bit_offsets(values)
        present = self._get_bits(idx)  # (n, k)
        found = present.all(axis=1)
        out = found.copy()
        todo = np.flatnonzero(~found)
        if len(todo):
            self._ensure_writable()
            k = idx.shape[1]
            rows = np.repeat(todo, k)  # batch position of each element
            flat = idx[todo].ravel()
            order = np.lexsort((rows, flat))
            uniq_bits, first_pos = np.unique(flat[order], return_index=True)
            first_writer = rows[order][first_pos]  # per bit: earliest row
            covered = present[todo].ravel() | (
                first_writer[np.searchsorted(uniq_bits, flat)] < rows
            )
            out[todo] = covered.reshape(len(todo), k).all(axis=1)
            self.n_inserted += int((~out[todo]).sum())
            bytepos, mask = self._scatter_masks(flat)
            np.bitwise_or.at(self.packed, bytepos, mask)
        return out

    # -- payload (sip keys + bitmap, container_memory_bloom.rs:76-113) -------
    def to_payload(self) -> bytes:
        keys = np.array(
            [self.sip_keys[0][0], self.sip_keys[0][1],
             self.sip_keys[1][0], self.sip_keys[1][1]],
            dtype="<u8",
        )
        return keys.tobytes() + self.packed.tobytes()

    @classmethod
    def from_payload(
        cls, payload, k_num: int
    ) -> "ReferenceBloom":
        """Zero-copy: ``payload`` may be bytes OR a uint8 view (e.g. an
        ``np.memmap`` of the file past the header) — the bitmap stays a
        read-only view of it until first mutation."""
        buf = np.frombuffer(payload, dtype=np.uint8) if isinstance(
            payload, (bytes, bytearray, memoryview)
        ) else np.asarray(payload, dtype=np.uint8)
        keys = buf[:32].view("<u8")
        bitmap = buf[32:]
        f = cls(
            len(bitmap) * 8, k_num,
            [(keys[0], keys[1]), (keys[2], keys[3])], packed=bitmap,
        )
        return f
