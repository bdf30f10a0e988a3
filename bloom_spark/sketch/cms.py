"""Count-min sketch (d×w counter matrix, +-merge), numpy-vectorized.

Not in the reference; required by BASELINE.json:north_rule. Public
Cormode–Muthukrishnan 2005 construction: overestimate ≤ εN with
probability ≥ 1-δ for w = ceil(e/ε), d = ceil(ln(1/δ)). Row indices come
from the same Kirsch–Mitzenmacher family as the Bloom filter.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from bloom_spark.hashing import hash_series_pair, km_indices, to_uint64
from bloom_spark.sketch.base import Sketch, register_sketch


@register_sketch
class CountMinSketch(Sketch):
    KIND = "cms"

    def __init__(self, width: int, depth: int):
        if width <= 0 or depth <= 0:
            raise ValueError("width and depth must be positive")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0  # N = sum of all counts added

    @classmethod
    def from_error(cls, eps: float, delta: float) -> "CountMinSketch":
        """w=⌈e/ε⌉, d=⌈ln(1/δ)⌉."""
        return cls(int(math.ceil(math.e / eps)), int(math.ceil(math.log(1.0 / delta))))

    # -- vectorized core ----------------------------------------------------
    def _indices(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (n, d) bucket indices
        return km_indices(to_uint64(h1), to_uint64(h2), self.depth, self.width)

    def update_hashes(
        self, h1: np.ndarray, h2: np.ndarray, counts: np.ndarray | None = None
    ) -> None:
        n = len(h1)
        if n == 0:
            return
        counts = np.ones(n, dtype=np.int64) if counts is None else np.asarray(
            counts, dtype=np.int64
        )
        idx = self._indices(h1, h2)
        rows = np.broadcast_to(np.arange(self.depth)[None, :], idx.shape)
        np.add.at(
            self.table,
            (rows.ravel(), idx.astype(np.int64).ravel()),
            np.repeat(counts, self.depth),
        )
        self.total += int(counts.sum())

    def query_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._indices(h1, h2).astype(np.int64)
        rows = np.arange(self.depth)[None, :]
        return self.table[rows, idx].min(axis=1)

    # -- value-level convenience ----------------------------------------------
    def update(self, values: pd.Series, counts: np.ndarray | None = None) -> None:
        h1, h2 = hash_series_pair(values)
        self.update_hashes(h1, h2, counts)

    def query(self, values: pd.Series) -> np.ndarray:
        return self.query_hashes(*hash_series_pair(values))

    def error_bound(self) -> float:
        """εN additive overestimate bound (w.p. ≥ 1-δ)."""
        return math.e / self.width * self.total

    # -- merge / serde ------------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (
            not isinstance(other, CountMinSketch)
            or (other.width, other.depth) != (self.width, self.depth)
        ):
            raise ValueError("incompatible CMS merge")
        self.table += other.table
        self.total += other.total
        return self

    def params(self) -> dict:
        return {"width": self.width, "depth": self.depth, "total": self.total}

    def _payload(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def _from_params(cls, params: dict, payload: bytes) -> "CountMinSketch":
        s = cls(params["width"], params["depth"])
        s.total = int(params.get("total", 0))
        table = np.frombuffer(payload, dtype=np.int64).reshape(s.depth, s.width)
        s.table = table.copy()
        return s
