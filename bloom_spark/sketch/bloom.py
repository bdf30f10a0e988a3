"""Partitioned-bit-array Bloom filter, OR-mergeable, numpy-vectorized.

Behavioral contract from the reference (kenorb/bloom):
- zero false negatives; FPR ≤ (1 - e^{-kn/m})^k — the crate-constructor
  bound (reference: src/bloom/containers/container_memory_bloom.rs:118-136).
- two constructors mirroring the reference CLI specs:
  ``from_size`` ≙ ``-bls NUM,SIZE`` (m fixed by bytes, k derived) and
  ``from_fpr`` ≙ ``-ble NUM,P`` (m,k derived from target FPR)
  (container_memory_bloom.rs:118-136, src/main.rs:216-265).
- write cap / ``is_full`` ≙ ``-l``/limit semantics
  (container.rs:27, process.rs:107-130).
- ``check_and_set`` fused probe+insert ≙ container.rs:24,29-37 — ours is
  batch-vectorized: exact first-occurrence within the batch, sketch-probe
  across batches.

Deliberate divergence (SURVEY.md §2.4 H2): the reference's random SipHash
keys are replaced by a deterministic Kirsch–Mitzenmacher family over two
seeded 64-bit hashes, which makes independently built segments OR-mergeable
and runs reproducible.
"""

from __future__ import annotations

import base64
import math

import numpy as np
import pandas as pd

from bloom_spark.hashing import hash_series_pair, km_indices, to_uint64
from bloom_spark.sketch.base import Sketch, register_sketch

_U64 = np.uint64


def optimal_m_k(n: int, fpr: float) -> tuple[int, int]:
    """(m bits, k hashes) for target FPR at n items — the textbook formulas
    the bloomfilter crate uses (container_memory_bloom.rs:118-126), with m
    rounded UP to a power of two so index reduction is a bitmask (see
    km_indices). k stays at the optimum for the *requested* m, so the
    realized FPR is ≤ the requested bound (documented deviation; the
    contract is the bound, not the exact crate geometry)."""
    if not 0.0 < fpr < 1.0:
        raise ValueError(f"fpr must be in (0,1), got {fpr}")
    m_opt = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
    k = max(1, round(m_opt / n * math.log(2))) if n > 0 else 1
    m = 1 << (m_opt - 1).bit_length()
    return m, k


def fpr_bound(n: int, m: int, k: int) -> float:
    """(1 - e^{-kn/m})^k — the bound the reference's tests pin."""
    if n == 0:
        return 0.0
    return (1.0 - math.exp(-k * n / m)) ** k


@register_sketch
class BloomSketch(Sketch):
    KIND = "bloom"

    def __init__(self, m_bits: int, k: int, limit: int | None = None):
        if m_bits <= 0 or k <= 0:
            raise ValueError("m_bits and k must be positive")
        self.m = int(m_bits)
        self.k = int(k)
        self.limit = int(limit) if limit is not None else None
        self.n_inserted = 0  # ≙ num_writes (container.rs:30)
        # Sparse mode: a segment holding few keys keeps the raw (h1,h2)
        # pairs (16 B/key) instead of the m-bit array, and promotes to
        # dense once the pairs would outweigh the bitmap. This bounds a
        # segment's transfer cost at min(16·n, m/8) bytes — at 10^12-doc
        # scale partitions are dense; at test scale merges move KBs, not
        # copies of a mostly-zero m-bit array. (Same idea as sparse HLL.)
        self.dense = False
        self.words: np.ndarray | None = None
        self._pairs: list[np.ndarray] = []
        self._n_pairs = 0

    @property
    def _sparse_threshold(self) -> int:
        # densify when 16 bytes/pair ≥ m/8 bytes of bitmap
        return max(1, self.m // 128)

    # Expansion chunk: bounds the (chunk, k) index temporaries to ~10 MB —
    # one-shot expansion of millions of pairs was measured 3.6x slower
    # purely from allocator/bandwidth churn of the (n, k) temps.
    _CHUNK = 65536

    def _ensure_writable(self) -> None:
        # deserialized words are a zero-copy read-only view over the blob
        # (copy-on-write): probe-only uses (broadcast membership) never pay
        # the 100+ MB copy; the first mutation materializes one.
        if self.words is not None and not self.words.flags.writeable:
            self.words = self.words.copy()

    def _scatter(self, h1: np.ndarray, h2: np.ndarray) -> None:
        self._ensure_writable()
        for s in range(0, len(h1), self._CHUNK):
            word, mask = self._index(h1[s : s + self._CHUNK], h2[s : s + self._CHUNK])
            np.bitwise_or.at(self.words, word.ravel(), mask.ravel())

    def densify(self) -> "BloomSketch":
        """Force dense representation (canonical form: two filters over
        the same insert set have identical dense bits regardless of how
        they were built/merged — sparse/dense mode is a transport
        optimization, not a semantic)."""
        self._densify()
        return self

    def _densify(self) -> None:
        if self.dense:
            return
        self.words = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.dense = True
        pairs, self._pairs, self._n_pairs = self._pairs, [], 0
        for p in pairs:
            self._scatter(p[:, 0], p[:, 1])

    def _canonical_pairs(self) -> np.ndarray:
        """Sorted, deduplicated (n,2) uint64 pairs — order-invariant."""
        if not self._pairs:
            return np.zeros((0, 2), dtype=np.uint64)
        allp = np.concatenate(self._pairs, axis=0)
        return np.unique(allp, axis=0)

    # -- constructors (reference CLI parity) --------------------------------
    @classmethod
    def from_fpr(cls, n: int, fpr: float, limit: int | None = None) -> "BloomSketch":
        """≙ ``-ble NUM,ERROR_RATE``."""
        m, k = optimal_m_k(n, fpr)
        return cls(m, k, limit=limit if limit is not None else n)

    @classmethod
    def from_size(
        cls, n: int, size_bytes: int | str, limit: int | None = None
    ) -> "BloomSketch":
        """≙ ``-bls NUM,SIZE``: m fixed by bytes (rounded DOWN to a power
        of two so the filter never exceeds the requested budget and index
        reduction is a bitmask), k derived from m/n. ``size_bytes``
        accepts reference CLI unit strings (``"2Gb"``, ``"100MiB"`` —
        config.parse_size, H6)."""
        from bloom_spark.config import parse_size

        m_req = max(64, parse_size(size_bytes) * 8)
        m = 1 << (m_req.bit_length() - 1)
        k = max(1, round(m / max(1, n) * math.log(2)))
        return cls(m, k, limit=limit if limit is not None else n)

    # -- vectorized core -----------------------------------------------------
    def _index(self, h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = km_indices(to_uint64(h1), to_uint64(h2), self.k, self.m)
        return idx >> _U64(6), _U64(1) << (idx & _U64(63))

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Unconditional insert ≙ ``set`` (container.rs:17). Vectorized:
        sparse mode buffers the raw pairs; dense mode is one scatter-OR
        over the whole batch."""
        if len(h1) == 0:
            return
        if not self.dense:
            self._pairs.append(
                np.stack([to_uint64(h1), to_uint64(h2)], axis=1)
            )
            self._n_pairs += len(h1)
            if self._n_pairs >= self._sparse_threshold:
                self._densify()
        else:
            self._scatter(to_uint64(h1), to_uint64(h2))
        self.n_inserted += len(h1)

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Membership probe ≙ ``check`` (container.rs:20). bool[n]."""
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        self._densify()
        h1 = to_uint64(h1)
        h2 = to_uint64(h2)
        out = np.empty(len(h1), dtype=bool)
        for s in range(0, len(h1), self._CHUNK):
            word, mask = self._index(h1[s : s + self._CHUNK], h2[s : s + self._CHUNK])
            out[s : s + self._CHUNK] = ((self.words[word] & mask) == mask).all(axis=1)
        return out

    def check_and_set_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Fused probe-then-insert ≙ ``check_and_set`` (container.rs:24).

        Returns "was already present" per element. Within the batch,
        duplicate (h1,h2) pairs after the first are reported present
        IFF the key is actually in the filter by then — previously
        present, or the first copy really inserted. A first copy whose
        insert was dropped by the write cap leaves its duplicates
        reported UNSEEN, exactly like the reference's per-line loop
        (full filter → check() only → every copy of an absent key is
        emitted; process.rs:107-130 + README -l 9). No within-batch
        false positives — a strict improvement over sequential
        probing, documented divergence.
        """
        n = len(h1)
        if n == 0:
            return np.zeros(0, dtype=bool)
        pair = np.stack([to_uint64(h1), to_uint64(h2)], axis=1)
        _, first_idx, inverse = np.unique(
            pair, axis=0, return_index=True, return_inverse=True
        )
        inverse = np.asarray(inverse).ravel()
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        found_unique = self.contains_hashes(h1[first_idx], h2[first_idx])
        to_insert = is_first & ~found_unique[inverse]
        if self.limit is not None:
            room = max(0, self.limit - self.n_inserted)
            if room < int(to_insert.sum()):
                keep = np.flatnonzero(to_insert)[:room]
                to_insert = np.zeros(n, dtype=bool)
                to_insert[keep] = True
        # a key is present for NON-first copies iff it was already in the
        # filter or its first copy's insert actually happened
        inserted_unique = np.zeros(len(found_unique), dtype=bool)
        inserted_unique[inverse[to_insert]] = True
        present_after = found_unique | inserted_unique
        found = np.where(is_first, found_unique[inverse], present_after[inverse])
        if to_insert.any():
            self.update_hashes(h1[to_insert], h2[to_insert])
        return found

    # -- value-level convenience (local path; Spark path feeds hashes) ------
    def update(self, values: pd.Series) -> None:
        self.update_hashes(*hash_series_pair(values))

    def contains(self, values: pd.Series) -> np.ndarray:
        return self.contains_hashes(*hash_series_pair(values))

    def check_and_set(self, values: pd.Series) -> np.ndarray:
        return self.check_and_set_hashes(*hash_series_pair(values))

    # -- capacity / metrics (reference M1-M3) --------------------------------
    def is_full(self) -> bool:
        return self.limit is not None and self.n_inserted >= self.limit

    def fill_ratio(self) -> float:
        """True popcount fill (the reference reports writes/bit instead —
        container.rs:33; we report both, SURVEY.md §2.5 M2)."""
        self._densify()
        pop = int(np.bitwise_count(self.words).sum()) if hasattr(np, "bitwise_count") \
            else int(sum(bin(int(w)).count("1") for w in self.words))
        return pop / self.m

    def writes_per_bit(self) -> float:
        """Reference's ``get_usage`` semantic (container.rs:33)."""
        return self.n_inserted / self.m

    def estimated_fpr(self) -> float:
        """Live FPR estimate from actual fill: fill^k."""
        return self.fill_ratio() ** self.k

    def expected_fpr(self) -> float:
        return fpr_bound(self.n_inserted, self.m, self.k)

    # -- merge / serde --------------------------------------------------------
    def merge(self, other: "BloomSketch") -> "BloomSketch":
        if not isinstance(other, BloomSketch):
            raise TypeError("can only merge BloomSketch with BloomSketch")
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError(
                f"incompatible bloom params: ({self.m},{self.k}) vs ({other.m},{other.k})"
            )
        if self.dense and other.dense:
            self._ensure_writable()
            np.bitwise_or(self.words, other.words, out=self.words)
        elif self.dense:
            for p in other._pairs:
                self._scatter(p[:, 0], p[:, 1])
        elif other.dense:
            self._densify()
            np.bitwise_or(self.words, other.words, out=self.words)
        else:
            self._pairs.extend(other._pairs)
            self._n_pairs += other._n_pairs
            # Merges densify at 1/4 of the update-path threshold: in a
            # tree reduce this pushes the k-fold index expansion into the
            # parallel combiner tasks instead of serializing it on the
            # driver's final fold. Deterministic wrt merge order: the
            # final mode depends only on the total pair count.
            if self._n_pairs >= max(1, self._sparse_threshold // 4):
                self._densify()
        self.n_inserted += other.n_inserted
        return self

    def intersect(self, other: "BloomSketch") -> "BloomSketch":
        """Approximate set intersection: bitwise AND of the two filters
        (same (m,k) family required — our deterministic seeded hashes
        make this sound; the reference's random sip keys could not
        support it, SURVEY.md §2.4 H2). Zero false negatives for true
        A∩B members (their k bits are set in both); the false-positive
        rate is bounded by min(FPR_A, FPR_B) plus the classic AND-filter
        excess (elements of A XOR B whose bits happen to survive).
        In-place on self; returns self. The generalization of the
        reference's ``-i`` inverse mode from one filter to an algebra."""
        if not isinstance(other, BloomSketch):
            raise TypeError("can only intersect BloomSketch with BloomSketch")
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError(
                f"incompatible bloom params: ({self.m},{self.k}) vs ({other.m},{other.k})"
            )
        self._densify()
        other._densify()
        self._ensure_writable()
        np.bitwise_and(self.words, other.words, out=self.words)
        self.n_inserted = min(self.n_inserted, other.n_inserted)
        return self

    def params(self) -> dict:
        return {
            "m": self.m,
            "k": self.k,
            "limit": self.limit,
            "n_inserted": self.n_inserted,
            "dense": self.dense,
        }

    def _payload(self) -> bytes:
        if self.dense:
            return self.words.tobytes()
        return self._canonical_pairs().tobytes()

    @classmethod
    def _from_params(cls, params: dict, payload: bytes) -> "BloomSketch":
        s = cls(params["m"], params["k"], limit=params.get("limit"))
        s.n_inserted = int(params.get("n_inserted", 0))
        # blobs written before sparse mode existed carry no "dense" key →
        # they are dense payloads
        if params.get("dense", True):
            s.dense = True
            # zero-copy read-only view; _ensure_writable materializes a
            # copy only if this instance is ever mutated (merge/update)
            words = np.frombuffer(payload, dtype=np.uint64)
            if len(words) != (s.m + 63) // 64:
                raise ValueError("bloom payload size mismatch")
            s.words = words
        else:
            pairs = np.frombuffer(payload, dtype=np.uint64).reshape(-1, 2)
            if len(pairs):
                s._pairs = [pairs.copy()]
                s._n_pairs = len(pairs)
        return s

    def to_b64(self) -> str:
        return base64.b64encode(self.to_bytes()).decode()

    @classmethod
    def from_b64(cls, s: str) -> "BloomSketch":
        return cls.from_bytes(base64.b64decode(s))
