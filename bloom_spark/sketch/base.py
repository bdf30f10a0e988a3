"""Sketch ABC + binary envelope.

The reference persists containers as a 128-byte header (magic, type, size,
limit, error_rate, num_writes, max_writes, zero padding) + payload
(reference: src/bloom/containers/container.rs:12,53-88,113-170). Our
envelope carries the same information generalized: a fixed magic, a kind
tag, a JSON params block (sizes, seeds, counters) and a raw payload.
Sketches travel between executors and the driver as these blobs
(BinaryType), so every operation that matters at scale — per-partition
build, tree merge, broadcast probe, checkpoint/resume — is defined on
bytes.
"""

from __future__ import annotations

import json
import struct
from abc import ABC, abstractmethod
from typing import ClassVar

MAGIC = 0xB5509910  # ours; reference magic is 0xB1008811 (container.rs:12)
_HEADER = struct.Struct(">I8sI")  # magic, kind (8 bytes, padded), params length

_REGISTRY: dict[str, type["Sketch"]] = {}


def _ser_bound(v: float):
    """JSON-safe min/max bound: infinities become signed strings (a real
    -inf serialized as None used to round-trip as +inf — r3 review);
    ``float()`` parses them back, and None stays the legacy empty
    sentinel on read."""
    import math

    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    return float(v)


def register_sketch(cls: type["Sketch"]) -> type["Sketch"]:
    _REGISTRY[cls.KIND] = cls
    return cls


class Sketch(ABC):
    """A mergeable approximate data structure.

    Contract (SURVEY.md §2.3, BASELINE.json north_rule):
    - ``merge`` is associative and commutative (property-tested under
      arbitrary merge orderings).
    - ``to_bytes``/``from_bytes`` round-trip exactly.
    - updates consume *precomputed* uint64 hash arrays (or raw numpy values
      for value sketches), never per-row Python.
    """

    KIND: ClassVar[str] = "?"

    # -- construction / identity -------------------------------------------
    @abstractmethod
    def params(self) -> dict:
        """JSON-serializable construction params + counters."""

    @classmethod
    @abstractmethod
    def _from_params(cls, params: dict, payload: bytes) -> "Sketch":
        ...

    @abstractmethod
    def _payload(self) -> bytes:
        ...

    # -- core ops ------------------------------------------------------------
    @abstractmethod
    def merge(self, other: "Sketch") -> "Sketch":
        """Merge ``other`` into self (in place) and return self."""

    # -- envelope -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        params = json.dumps(self.params(), separators=(",", ":")).encode()
        kind = self.KIND.encode()[:8].ljust(8, b"\0")
        return _HEADER.pack(MAGIC, kind, len(params)) + params + self._payload()

    @classmethod
    def from_bytes(cls, blob) -> "Sketch":
        """Accepts any buffer (bytes, memoryview, numpy uint8 array —
        e.g. an ``np.memmap`` of a filter file): the payload is sliced
        zero-copy, so a memory-mapped 100+ MB filter deserializes
        without materializing a private copy per worker."""
        if not isinstance(blob, (bytes, bytearray, memoryview)):
            blob = memoryview(blob)
        magic, kind_raw, plen = _HEADER.unpack_from(blob, 0)
        if magic != MAGIC:
            raise ValueError(f"bad sketch magic: {magic:#x}")
        kind = kind_raw.rstrip(b"\0").decode()
        off = _HEADER.size
        params = json.loads(bytes(blob[off : off + plen]))
        payload = blob[off + plen :]
        if cls is Sketch and kind not in _REGISTRY:
            # lazy-populate the registry: a fresh UDF worker process may
            # deserialize a kind whose module it never imported
            import importlib

            for mod in ("bloom_spark.sketch", "bloom_spark.ops.cascade"):
                importlib.import_module(mod)
        target = _REGISTRY[kind] if cls is Sketch else cls
        if cls is not Sketch and kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} sketch, got {kind}")
        return target._from_params(params, payload)


def sketch_from_bytes(blob: bytes) -> Sketch:
    """Deserialize any registered sketch kind from its envelope."""
    return Sketch.from_bytes(blob)


def merge_blobs(blobs: list[bytes]) -> bytes:
    """Merge a list of serialized sketches of one kind into one blob."""
    it = iter(blobs)
    acc = sketch_from_bytes(next(it))
    for b in it:
        acc.merge(sketch_from_bytes(b))
    return acc.to_bytes()
