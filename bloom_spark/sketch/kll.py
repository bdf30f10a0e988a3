"""KLL quantile sketch (compactor hierarchy, merge-able), numpy-vectorized.

Not in the reference; required by BASELINE.json:north_rule. Public
Karnin–Lang–Liberty 2016 construction: level h holds items of weight 2^h;
an over-capacity level is sorted and every other item (random offset) is
promoted. Normalized rank error is O(1/k); for k=200 the empirically
established bound (Apache DataSketches docs) is ≈1.65% single-sided.

Randomness is a deterministic counter-based PCG stream seeded from
``seed`` so runs are reproducible; merge order may legally change the
*exact* items kept, but estimates stay within the rank-error bound
(property-tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bloom_spark.sketch.base import Sketch, _ser_bound, register_sketch

_MIN_CAP = 8


def _cap(level: int, num_levels: int, k: int) -> int:
    """Capacity of ``level`` given ``num_levels`` total: k*(2/3)^(top-level)."""
    depth = num_levels - level - 1
    return max(_MIN_CAP, int(np.ceil(k * (2.0 / 3.0) ** depth)))


@register_sketch
class KLLSketch(Sketch):
    KIND = "kll"

    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self._rng_counter = 0
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.min_value = np.inf
        self.max_value = -np.inf

    # -- update -----------------------------------------------------------------
    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.min_value = min(self.min_value, float(v.min()))
        self.max_value = max(self.max_value, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def update(self, values: pd.Series) -> None:
        self.update_values(values.to_numpy(dtype=np.float64, na_value=np.nan))

    # -- compaction -----------------------------------------------------------
    def _total_cap(self) -> int:
        H = len(self.levels)
        return sum(_cap(h, H, self.k) for h in range(H))

    def _compress(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._total_cap():
            H = len(self.levels)
            h = next(
                (
                    i
                    for i in range(H)
                    if len(self.levels[i]) > _cap(i, H, self.k)
                ),
                None,
            )
            if h is None:
                break
            lv = np.sort(self.levels[h])
            # deterministic counter-based coin for the compaction offset
            rng = np.random.default_rng((self.seed, self._rng_counter))
            self._rng_counter += 1
            off = int(rng.integers(0, 2))
            promoted = lv[off::2]
            self.levels[h] = np.empty(0, dtype=np.float64)
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # -- queries ----------------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), 1 << h, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float | np.ndarray) -> float | np.ndarray:
        """Value at normalized rank q ∈ [0,1] (inclusive/lower style)."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.n == 0:
            out = np.full(len(qs), np.nan)
            return out[0] if np.isscalar(q) else out
        v, w = self._weighted()
        cum = np.cumsum(w)
        targets = np.clip(qs, 0.0, 1.0) * cum[-1]
        pos = np.searchsorted(cum, targets, side="left")
        pos = np.minimum(pos, len(v) - 1)
        out = v[pos]
        out[qs <= 0.0] = self.min_value
        out[qs >= 1.0] = self.max_value
        return float(out[0]) if np.isscalar(q) else out

    def rank(self, value: float) -> float:
        """Normalized rank of ``value`` (fraction of mass ≤ value)."""
        if self.n == 0:
            return float("nan")
        v, w = self._weighted()
        return float(w[v <= value].sum() / w.sum())

    def rank_error(self) -> float:
        """Approximate single-sided normalized rank error (~2.6/k·1.27 ≈
        the DataSketches empirical constant scaled from k=200→1.65%)."""
        return 1.65e-2 * 200.0 / self.k

    # -- merge / serde -------------------------------------------------------------
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if not isinstance(other, KLLSketch) or other.k != self.k:
            raise ValueError("incompatible KLL merge")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self.min_value = min(self.min_value, other.min_value)
        self.max_value = max(self.max_value, other.max_value)
        # mix the rng streams so repeated merges don't reuse coin flips
        self._rng_counter = self._rng_counter + other._rng_counter + 1
        self._compress()
        return self

    def params(self) -> dict:
        return {
            "k": self.k,
            "seed": self.seed,
            "rng_counter": self._rng_counter,
            "n": self.n,
            # infinities are JSON-unsafe but must survive serde with
            # their SIGN: a real -inf min serialized as None used to
            # round-trip as +inf (r3 review). Strings "inf"/"-inf" parse
            # back via float(); None stays readable as the legacy empty
            # sentinel.
            "min": _ser_bound(self.min_value),
            "max": _ser_bound(self.max_value),
            "level_sizes": [len(lv) for lv in self.levels],
        }

    def _payload(self) -> bytes:
        if not any(len(lv) for lv in self.levels):
            return b""
        return np.concatenate([lv for lv in self.levels]).tobytes()

    @classmethod
    def _from_params(cls, params: dict, payload: bytes) -> "KLLSketch":
        s = cls(params["k"], seed=params.get("seed", 42))
        s._rng_counter = int(params.get("rng_counter", 0))
        s.n = int(params["n"])
        s.min_value = np.inf if params["min"] is None else float(params["min"])
        s.max_value = -np.inf if params["max"] is None else float(params["max"])
        # (float() accepts the "inf"/"-inf" strings _ser_bound writes)
        sizes = params["level_sizes"]
        flat = np.frombuffer(payload, dtype=np.float64)
        s.levels, off = [], 0
        for sz in sizes:
            s.levels.append(flat[off : off + sz].copy())
            off += sz
        if not s.levels:
            s.levels = [np.empty(0, dtype=np.float64)]
        return s
