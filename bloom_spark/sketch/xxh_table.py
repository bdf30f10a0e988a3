"""Open-addressing fingerprint table — behavioral port of the reference's
XXH container (reference: src/bloom/containers/container_memory_xxh.rs).

Reference semantics preserved (SURVEY.md §1.3):
- slot = occupied flag + 20-bit fingerprint (key_bits=20,
  container_memory_xxh.rs:217-226); num_slots = size_bytes*8//21 (:225).
- linear probing with num_tries=4 (:226, :86-134).
- asymmetric saturation: ``check`` returns True (assume present) when all
  probed slots are occupied with no match (:132-133); ``set`` silently
  drops the insert in the same situation (:108-109).

Deliberate divergences (documented, SURVEY.md §7):
- storage is (bool occupied[], uint32 fp[]) numpy arrays, not a packed
  21-bit bitvec — behavioral parity, not bit-layout parity.
- slot index is ``hash % num_slots`` instead of the reference's
  f64 ``remap`` (an artifact, SURVEY.md §2.4 H3).
- the reference's double-count of ``num_writes`` in ``set()``
  (container_memory_xxh.rs:65+142) is NOT reproduced; we count once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bloom_spark.hashing import hash_series, to_uint64
from bloom_spark.sketch.base import Sketch, register_sketch

KEY_BITS = 20
SLOT_BITS = 21
NUM_TRIES = 4
_FP_MASK = np.uint64((1 << KEY_BITS) - 1)


@register_sketch
class XXHFingerprintTable(Sketch):
    KIND = "xxhtab"

    def __init__(self, size_bytes: int, limit: int | None = None):
        self.size_bytes = int(size_bytes)
        self.num_slots = max(NUM_TRIES, self.size_bytes * 8 // SLOT_BITS)
        self.limit = int(limit) if limit is not None else None
        self.n_inserted = 0
        self.occupied = np.zeros(self.num_slots, dtype=bool)
        self.fp = np.zeros(self.num_slots, dtype=np.uint32)

    # -- probing ---------------------------------------------------------------
    def _base(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = to_uint64(h)
        return (h % np.uint64(self.num_slots)).astype(np.int64), (
            h & _FP_MASK
        ).astype(np.uint32)

    def contains_hashes(self, h: np.ndarray, _h2: np.ndarray | None = None) -> np.ndarray:
        """≙ find_key: True on fingerprint match OR on all-4-occupied
        saturation (container_memory_xxh.rs:112-134). ``_h2`` accepted for
        the uniform (h1, h2) probe signature and ignored."""
        n = len(h)
        if n == 0:
            return np.zeros(0, dtype=bool)
        slot, fp = self._base(h)
        found = np.zeros(n, dtype=bool)
        all_occupied = np.ones(n, dtype=bool)
        for t in range(NUM_TRIES):
            s = (slot + t) % self.num_slots
            occ = self.occupied[s]
            found |= occ & (self.fp[s] == fp)
            all_occupied &= occ
        return found | all_occupied

    def update_hashes(self, h: np.ndarray, _h2: np.ndarray | None = None) -> None:
        """≙ insert_key: claim first free slot among 4 probes; silently drop
        on saturation (container_memory_xxh.rs:82-110). ``_h2`` ignored."""
        pending = np.flatnonzero(~self.contains_hashes(h))
        slot, fp = self._base(h)
        slot, fp = slot[pending], fp[pending]
        for t in range(NUM_TRIES):
            if len(slot) == 0:
                break
            s = (slot + t) % self.num_slots
            free = ~self.occupied[s]
            cand = np.flatnonzero(free)
            if len(cand):
                # one winner per distinct free slot this round; losers retry
                s_cand = s[cand]
                _, first = np.unique(s_cand, return_index=True)
                win = cand[first]
                self.occupied[s[win]] = True
                self.fp[s[win]] = fp[win]
                self.n_inserted += len(win)
                lose = np.setdiff1d(cand, win, assume_unique=False)
                keep = np.concatenate([np.flatnonzero(~free), lose])
            else:
                keep = np.arange(len(slot))
            slot, fp = slot[keep], fp[keep]

    def check_and_set_hashes(self, h: np.ndarray) -> np.ndarray:
        """≙ check_and_set (container_memory_xxh.rs:156-161)."""
        found = self.contains_hashes(h)
        todo = ~found
        if self.limit is not None and self.n_inserted >= self.limit:
            return found
        if todo.any():
            self.update_hashes(h[todo])
        return found

    # -- value-level convenience ---------------------------------------------------
    def update(self, values: pd.Series) -> None:
        self.update_hashes(hash_series(values, 1))

    def contains(self, values: pd.Series) -> np.ndarray:
        return self.contains_hashes(hash_series(values, 1))

    def check_and_set(self, values: pd.Series) -> np.ndarray:
        return self.check_and_set_hashes(hash_series(values, 1))

    def is_full(self) -> bool:
        return self.limit is not None and self.n_inserted >= self.limit

    # -- merge / serde -----------------------------------------------------------
    def merge(self, other: "XXHFingerprintTable") -> "XXHFingerprintTable":
        """Re-insert the other table's occupied fingerprints; lossy under
        saturation exactly like the reference's own insert path."""
        if (
            not isinstance(other, XXHFingerprintTable)
            or other.num_slots != self.num_slots
        ):
            raise ValueError("incompatible fingerprint-table merge")
        occ = np.flatnonzero(other.occupied)
        if len(occ):
            # occupied slots don't retain the original full hash; re-derive
            # the probe base from the slot position (fingerprint preserved).
            slot = occ.astype(np.int64)
            fp = other.fp[occ]
            for t in range(NUM_TRIES):
                if len(slot) == 0:
                    break
                s = (slot + t) % self.num_slots
                dup = self.occupied[s] & (self.fp[s] == fp)
                free = ~self.occupied[s]
                cand = np.flatnonzero(free & ~dup)
                if len(cand):
                    s_cand = s[cand]
                    _, first = np.unique(s_cand, return_index=True)
                    win = cand[first]
                    self.occupied[s[win]] = True
                    self.fp[s[win]] = fp[win]
                    self.n_inserted += len(win)
                    lose = np.setdiff1d(cand, win)
                    keep = np.concatenate([np.flatnonzero(~free & ~dup), lose])
                else:
                    keep = np.flatnonzero(~dup & ~free)
                slot, fp = slot[keep], fp[keep]
        return self

    def params(self) -> dict:
        return {
            "size_bytes": self.size_bytes,
            "limit": self.limit,
            "n_inserted": self.n_inserted,
        }

    def _payload(self) -> bytes:
        return np.packbits(self.occupied).tobytes() + self.fp.tobytes()

    @classmethod
    def _from_params(cls, params: dict, payload: bytes) -> "XXHFingerprintTable":
        s = cls(params["size_bytes"], limit=params.get("limit"))
        s.n_inserted = int(params.get("n_inserted", 0))
        nbits = (s.num_slots + 7) // 8
        s.occupied = np.unpackbits(
            np.frombuffer(payload[:nbits], dtype=np.uint8), count=s.num_slots
        ).astype(bool)
        s.fp = np.frombuffer(payload[nbits:], dtype=np.uint32).copy()
        return s
