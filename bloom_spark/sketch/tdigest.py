"""t-digest quantile sketch (merging-digest variant), numpy-vectorized.

Not in the reference; required by BASELINE.json:north_rule. Public Dunning &
Ertl algorithm: centroids sized by the k1 scale function
k(q) = (δ/2π)·asin(2q−1), so tails get fine resolution. Fully
deterministic (no rng): batches are sorted and greedily re-compressed.
t-digest is order-sensitive by design; merge-order tests assert estimate
stability within ε rather than bit equality (SURVEY.md §5.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bloom_spark.sketch.base import Sketch, _ser_bound, register_sketch


@register_sketch
class TDigest(Sketch):
    KIND = "tdigest"

    def __init__(self, compression: float = 200.0):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.min_value = np.inf
        self.max_value = -np.inf

    # -- scale function ---------------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.compression / (2.0 * np.pi) * np.arcsin(
            np.clip(2.0 * q - 1.0, -1.0, 1.0)
        )

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Greedy left-to-right merge of (sorted-by-mean) centroids under
        the k1 size limit."""
        if len(means) == 0:
            self.means = means
            self.weights = weights
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m: list[float] = [float(means[0])]
        out_w: list[float] = [float(weights[0])]
        w_so_far = 0.0
        k_lo = float(self._k(np.array([0.0]))[0])
        for i in range(1, len(means)):
            w = float(weights[i])
            q_hi = (w_so_far + out_w[-1] + w) / total
            if float(self._k(np.array([q_hi]))[0]) - k_lo <= 1.0:
                tot = out_w[-1] + w
                out_m[-1] += (float(means[i]) - out_m[-1]) * w / tot
                out_w[-1] = tot
            else:
                w_so_far += out_w[-1]
                k_lo = float(self._k(np.array([w_so_far / total]))[0])
                out_m.append(float(means[i]))
                out_w.append(w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- update -----------------------------------------------------------------
    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.min_value = min(self.min_value, float(v.min()))
        self.max_value = max(self.max_value, float(v.max()))
        # pre-aggregate duplicates within the batch (cheap and exact)
        uniq, counts = np.unique(v, return_counts=True)
        self._compress(
            np.concatenate([self.means, uniq]),
            np.concatenate([self.weights, counts.astype(np.float64)]),
        )

    def update(self, values: pd.Series) -> None:
        self.update_values(values.to_numpy(dtype=np.float64, na_value=np.nan))

    # -- queries ------------------------------------------------------------------
    def quantile(self, q: float | np.ndarray) -> float | np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if np.isscalar(q) else out
        w = self.weights
        total = w.sum()
        # centroid "centers" in cumulative-weight space
        centers = np.cumsum(w) - w / 2.0
        targets = np.clip(qs, 0.0, 1.0) * total
        out = np.interp(targets, centers, self.means)
        out[targets <= w[0] / 2.0] = (
            self.min_value if np.isfinite(self.min_value) else self.means[0]
        )
        out[targets >= total - w[-1] / 2.0] = (
            self.max_value if np.isfinite(self.max_value) else self.means[-1]
        )
        return float(out[0]) if np.isscalar(q) else out

    def rank(self, value: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        w = self.weights
        centers = np.cumsum(w) - w / 2.0
        r = np.interp(value, self.means, centers, left=0.0, right=w.sum())
        return float(r / w.sum())

    # -- merge / serde --------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if not isinstance(other, TDigest) or other.compression != self.compression:
            raise ValueError("incompatible t-digest merge")
        self.n += other.n
        self.min_value = min(self.min_value, other.min_value)
        self.max_value = max(self.max_value, other.max_value)
        self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    def params(self) -> dict:
        return {
            "compression": self.compression,
            "n": self.n,
            # infinities are JSON-unsafe but must survive serde with
            # their SIGN: a real -inf min serialized as None used to
            # round-trip as +inf (r3 review). Strings "inf"/"-inf" parse
            # back via float(); None stays readable as the legacy empty
            # sentinel.
            "min": _ser_bound(self.min_value),
            "max": _ser_bound(self.max_value),
            "n_centroids": len(self.means),
        }

    def _payload(self) -> bytes:
        return self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def _from_params(cls, params: dict, payload: bytes) -> "TDigest":
        s = cls(params["compression"])
        s.n = float(params["n"])
        s.min_value = np.inf if params["min"] is None else float(params["min"])
        s.max_value = -np.inf if params["max"] is None else float(params["max"])
        # (float() accepts the "inf"/"-inf" strings _ser_bound writes)
        nc = int(params["n_centroids"])
        flat = np.frombuffer(payload, dtype=np.float64)
        s.means = flat[:nc].copy()
        s.weights = flat[nc : 2 * nc].copy()
        return s
