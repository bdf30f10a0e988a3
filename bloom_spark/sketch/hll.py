"""HyperLogLog (dense, 2^p registers, max-merge), numpy-vectorized.

Not in the reference (a dedup CLI); required by BASELINE.json:north_rule.
Implements the public Flajolet et al. 2007 estimator with the standard
small-range linear-counting correction; 64-bit hashing removes the need
for the large-range correction. Relative error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from bloom_spark.hashing import hash_series, to_uint64
from bloom_spark.sketch.base import Sketch, register_sketch

_U64 = np.uint64


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (branchless halving)."""
    n = np.full(w.shape, 64, dtype=np.int64)
    x = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (_U64(1) << _U64(shift))
        n[big] -= shift
        x[big] >>= _U64(shift)
    n[w != 0] -= 1  # n is now clz (64 - bit_length)
    return n


@register_sketch
class HyperLogLog(Sketch):
    KIND = "hll"

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4,18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # -- update ---------------------------------------------------------------
    def update_hashes(self, h: np.ndarray, _h2: np.ndarray | None = None) -> None:
        """Consume uint64 hashes: top p bits → register index, rank of the
        remaining 64-p bits → register value (max). ``_h2`` is accepted for
        a uniform (h1, h2) feed signature and ignored (HLL needs one hash).
        """
        if len(h) == 0:
            return
        h = to_uint64(h)
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        rest = (h << _U64(self.p)).astype(np.uint64)  # wraps: low bits at MSB
        rho = np.minimum(_clz64(rest) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def update(self, values: pd.Series) -> None:
        self.update_hashes(hash_series(values, 1))

    # -- estimate ---------------------------------------------------------------
    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / float(np.sum(np.ldexp(1.0, -self.registers.astype(np.int64))))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)  # linear counting
        return raw

    def std_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # -- merge / serde -----------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if not isinstance(other, HyperLogLog) or other.p != self.p:
            raise ValueError("incompatible HLL merge")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def params(self) -> dict:
        return {"p": self.p}

    def _payload(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def _from_params(cls, params: dict, payload: bytes) -> "HyperLogLog":
        s = cls(params["p"])
        regs = np.frombuffer(payload, dtype=np.uint8)
        if len(regs) != s.m:
            raise ValueError("hll payload size mismatch")
        s.registers = regs.copy()
        return s
