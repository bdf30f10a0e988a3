"""Vectorized deterministic 64-bit hash families.

The reference uses keyed SipHash-1-3 with *random* per-filter keys
(reference: src/bloom/containers/container_memory_bloom.rs:79-101) and
xxh3_64 (container_memory_xxh.rs:139). Random keys make filters
non-mergeable and non-reproducible, so we deliberately replace them with a
fixed-seed family (documented divergence, SURVEY.md §2.4 H2):

- Spark path: ``F.xxhash64`` (JVM, whole-stage codegen) computes the two
  base hashes h1, h2; Python sees only int64 numpy arrays.
- Local path (unit tests / in-UDF rehash): keyed SipHash via
  ``pd.util.hash_pandas_object`` (C-vectorized) for object dtypes, and a
  splitmix64-style avalanche for numeric dtypes.

k index functions derive from (h1, h2) via Kirsch–Mitzenmacher:
``g_i(x) = h1(x) + i * h2(x) mod m``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# 16-byte SipHash keys for the local (pandas) hasher. Fixed: determinism and
# mergeability require every segment to use the same family.
_HASH_KEY_1 = "bloomspark:hash1"
_HASH_KEY_2 = "bloomspark:hash2"

# Seeds for the numeric-dtype mixers and the JVM second hash.
SEED_H2 = 0x9E3779B97F4A7C15  # golden-ratio constant
_U64 = np.uint64


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public algorithm, Vigna 2015)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _U64(seed & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def hash_series(s: pd.Series, which: int = 1) -> np.ndarray:
    """One 64-bit hash per element of ``s``, vectorized, deterministic.

    ``which`` selects an independent family member (1 or 2).
    """
    if pd.api.types.is_numeric_dtype(s.dtype) and not pd.api.types.is_bool_dtype(
        s.dtype
    ):
        base = s.to_numpy()
        if base.dtype.kind == "f":
            base = base.view(np.uint64) if base.dtype == np.float64 else base.astype(
                np.float64
            ).view(np.uint64)
        else:
            base = base.astype(np.int64).view(np.uint64)
        seed = SEED_H2 if which == 2 else 0xD6E8FEB86659FD93
        return _splitmix64(base, seed)
    key = _HASH_KEY_2 if which == 2 else _HASH_KEY_1
    # pandas' keyed siphash over object dtype is C-vectorized and stable.
    # categorize=False is REQUIRED for purity: with the default
    # categorize=True the hash of an element can depend on the other
    # elements in the series (found by hypothesis via '\x00' vs ''),
    # which would break merge-equivalence across shardings.
    out = pd.util.hash_pandas_object(
        s.astype(object), index=False, hash_key=key, categorize=False
    )
    return out.to_numpy(dtype=np.uint64)


def hash_series_pair(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) for Kirsch–Mitzenmacher double hashing."""
    return hash_series(s, 1), hash_series(s, 2)


def km_indices(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """k bit/bucket indices per element: ``(h1 + i*h2) mod m``.

    Shape (n, k), dtype uint64. Force h2 odd so it is invertible mod 2^64
    (avoids degenerate strides).

    Hot path: when m is a power of two the reduction is a bitmask —
    vectorized uint64 modulo by an arbitrary m is a scalar 64-bit
    division per element in numpy (~10x the cost of everything else in a
    segment build), which is why BloomSketch sizes m to a power of two.
    """
    h1 = h1.astype(np.uint64, copy=False)
    h2 = h2.astype(np.uint64, copy=False) | _U64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        raw = h1[:, None] + i * h2[:, None]
        if m & (m - 1) == 0:
            return raw & _U64(m - 1)
        return raw % _U64(m)


def to_uint64(a: np.ndarray | pd.Series) -> np.ndarray:
    """Reinterpret int64 (e.g. Spark xxhash64 output) as uint64."""
    arr = a.to_numpy() if isinstance(a, pd.Series) else np.asarray(a)
    if arr.dtype == np.uint64:
        return arr
    return arr.astype(np.int64).view(np.uint64)
