"""Multi-filter cascade — reference T6/T4 parity.

The reference CLI accepts N filter files with 0, 1, or N construction
specs (``-xls/-bls/-ble``); any other count is an error
(src/main.rs:327-330). Zero specs build default XXH containers
("2Gb"/"200M", src/main.rs:332-347). Per line, write mode first advances
the writable index past full containers (process.rs:107-130), then
membership is an OR over ALL containers with early exit on the first
hit, inserting into the writable one (process.rs:134-180) — so sealed
(full) generations keep filtering while new keys land in the open
generation. The README ``-l 9`` example pins the observable contract:
once every container is full, unique lines keep being emitted
(README.md:39-41).

Quirk faithfully documented, not reproduced: with 1 spec and N>1 files
the reference's construction loop iterates the SPECS, creating a single
container for the first file only (src/main.rs:349-366). We implement
the validated intent — one spec broadcasts to every file.

Second documented divergence (write ordering, process.rs:134-180): the
reference's per-line loop check_and_sets the WRITABLE container the
moment the iteration reaches it — so a key present only in a LATER
container (possible when resuming from multiple pre-built filter
files) is reported found AND still physically inserted into the
writable one, burning a write. We probe ALL members first and insert
only keys found nowhere: same emitted output for every input, but our
capacity counters don't double-count such keys (the saner accounting;
divergence matters only for resumed multi-file runs with pre-populated
later generations).

``SketchCascade`` is itself a :class:`Sketch` (envelope = the member
envelopes concatenated), so the broadcast probe path
(``ops.build.membership_udf`` / ``ops.dedup.dedup_against_filter``)
works on a cascade unchanged — the executor-side probe is the same OR
the reference computes.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd  # module-global: pandas_udf type hints resolve here

from bloom_spark.config import DEFAULT_LIMIT, DEFAULT_SIZE, parse_size
from bloom_spark.hashing import to_uint64
from bloom_spark.sketch.base import Sketch, register_sketch, sketch_from_bytes
from bloom_spark.sketch.bloom import BloomSketch
from bloom_spark.sketch.xxh_table import XXHFingerprintTable

_LEN = struct.Struct("<Q")


def build_from_spec(spec: dict) -> Sketch:
    """One construction spec → one empty sketch. Spec mirrors the CLI
    (src/main.rs:26-40): ``{"type": "xls", "limit": ..., "size": ...}``,
    ``{"type": "bls", "limit": ..., "size": ...}`` or
    ``{"type": "ble", "limit": ..., "error_rate": ...}``; limit/size
    accept unit strings (config.parse_size)."""
    t = spec["type"]
    limit = parse_size(spec.get("limit", DEFAULT_LIMIT))
    if t == "xls":
        return XXHFingerprintTable(spec.get("size", DEFAULT_SIZE), limit=limit)
    if t == "bls":
        return BloomSketch.from_size(limit, spec.get("size", DEFAULT_SIZE), limit=limit)
    if t == "ble":
        return BloomSketch.from_fpr(limit, float(spec["error_rate"]), limit=limit)
    raise ValueError(f"unknown construction type {t!r} (expected xls/bls/ble)")


def pair_specs(n_filters: int, specs: list[dict]) -> list[dict]:
    """0/1/N spec-to-filter pairing with the reference's validation
    (src/main.rs:327-347): 0 specs → reference defaults for every
    filter; 1 spec → broadcast; N specs → one each; else error."""
    if n_filters < 1:
        raise ValueError("cascade needs at least one filter")
    if not specs:
        return [{"type": "xls", "limit": DEFAULT_LIMIT, "size": DEFAULT_SIZE}] * n_filters
    if len(specs) == 1:
        return list(specs) * n_filters
    if len(specs) == n_filters:
        return list(specs)
    raise ValueError(
        "number of filter specs should be exactly zero or one or match the "
        f"number of filters ({len(specs)} specs for {n_filters} filters)"
    )


@register_sketch
class SketchCascade(Sketch):
    """Ordered chain of member sketches: probe = OR over all, writes go
    to the first non-full member (generational advance)."""

    KIND = "cascade"

    def __init__(self, members: list[Sketch]):
        if not members:
            raise ValueError("cascade needs at least one member")
        self.members = list(members)

    @classmethod
    def from_specs(cls, n_filters: int, specs: list[dict]) -> "SketchCascade":
        return cls([build_from_spec(s) for s in pair_specs(n_filters, specs)])

    # -- probe / insert ------------------------------------------------------
    @property
    def writable_index(self) -> int | None:
        """First non-full member (≙ process.rs:107-130), None if all full."""
        for i, m in enumerate(self.members):
            if not m.is_full():
                return i
        return None

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> np.ndarray:
        """OR over all members with early exit once every row hit
        (≙ the per-line loop's `break`, process.rs:163-171)."""
        found = np.zeros(len(h1), dtype=bool)
        for m in self.members:
            todo = ~found
            if not todo.any():
                break
            found[todo] = m.contains_hashes(h1[todo], None if h2 is None else h2[todo])
        return found

    def check_and_set_hashes(
        self, h1: np.ndarray, h2: np.ndarray | None = None
    ) -> np.ndarray:
        """Probe all; insert unseen keys into the first non-full member,
        spilling overflow to later generations as members fill. When
        every member is full, unseen keys are reported unseen and NOT
        inserted — the README ``-l 9`` contract (uniques keep flowing).

        Duplicate keys WITHIN the batch after the first occurrence are
        reported present IFF the key is in the cascade by then —
        previously present, or the first copy actually inserted into
        some member. With every member full, ALL copies of an absent
        key report unseen and flow through, exactly the reference's
        per-line loop degraded to check() (README -l 9); duplicates are
        never re-inserted (that would double-consume member capacity)."""
        n = len(h1)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if h2 is None:
            _, first_idx, inverse = np.unique(
                to_uint64(h1), return_index=True, return_inverse=True
            )
        else:
            pair = np.stack([to_uint64(h1), to_uint64(h2)], axis=1)
            _, first_idx, inverse = np.unique(
                pair, axis=0, return_index=True, return_inverse=True
            )
        inverse = np.asarray(inverse).ravel()
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        found_unique = self.contains_hashes(
            h1[first_idx], None if h2 is None else h2[first_idx]
        )
        pending = np.flatnonzero(is_first & ~found_unique[inverse])
        n_pending = len(pending)
        inserted = np.zeros(n, dtype=bool)
        for m in self.members:
            if len(pending) == 0:
                break
            if m.is_full():
                continue
            room = len(pending)
            if m.limit is not None:
                room = min(room, max(0, m.limit - m.n_inserted))
            take, pending = pending[:room], pending[room:]
            if len(take):
                m.update_hashes(h1[take], None if h2 is None else h2[take])
                inserted[take] = True
        inserted_unique = np.zeros(len(found_unique), dtype=bool)
        inserted_unique[inverse[inserted]] = True
        present_after = found_unique | inserted_unique
        found = np.where(is_first, found_unique[inverse], present_after[inverse])
        if len(pending):
            # ≙ the reference's per-line warnings, silenceable via -sw
            # (session.silence_warnings)
            from bloom_spark.session import LOGGER

            LOGGER.warning(
                "cascade full: %d/%d unique keys passed through unfiltered",
                len(pending), n_pending,
            )
        return found

    def is_full(self) -> bool:
        return self.writable_index is None

    @property
    def n_inserted(self) -> int:
        return sum(m.n_inserted for m in self.members)

    # -- value-level convenience --------------------------------------------
    def update(self, values) -> None:
        from bloom_spark.hashing import hash_series_pair

        h1, h2 = hash_series_pair(values)
        self.check_and_set_hashes(h1, h2)

    def contains(self, values) -> np.ndarray:
        from bloom_spark.hashing import hash_series_pair

        return self.contains_hashes(*hash_series_pair(values))

    # -- Sketch plumbing -----------------------------------------------------
    def merge(self, other: "Sketch") -> "Sketch":
        raise TypeError(
            "a cascade is an ordered driver-side chain, not a mergeable "
            "segment; merge its members individually"
        )

    def params(self) -> dict:
        return {"n_members": len(self.members)}

    def _payload(self) -> bytes:
        out = []
        for m in self.members:
            blob = m.to_bytes()
            out.append(_LEN.pack(len(blob)))
            out.append(blob)
        return b"".join(out)

    @classmethod
    def _from_params(cls, params: dict, payload: bytes) -> "SketchCascade":
        members, off = [], 0
        for _ in range(int(params["n_members"])):
            (n,) = _LEN.unpack_from(payload, off)
            off += _LEN.size
            members.append(sketch_from_bytes(payload[off : off + n]))
            off += n
        return cls(members)


# ------------------------------------------------------------- M5 traces

_TRACE_CACHE: dict = {}


def trace_members(spark, df, cols: list[str], cascade: "SketchCascade"):
    """M5 ≙ the reference's ``-d``/``-di`` per-record debug traces
    (process.rs:111-176) — re-expressed as DATA instead of stderr
    lines: per input record, which container (if any) holds the key,
    whether it is found, and which generation a write-mode insert would
    land in. At scale a trace TABLE is the usable form (joinable,
    filterable, writable to parquet); eprintln-per-line is not.

    Returns ``df`` plus ``found boolean``, ``container int`` (index of
    the first member containing the key, -1 when absent — the
    iteration order the reference walks), ``writable int`` (current
    writable generation, -1 when all full). Read-only probe: the trace
    does not mutate the cascade (the reference's write-mode trace
    interleaves inserts; reproduce outcomes by tracing before a
    ``check_and_set_hashes`` pass)."""
    import uuid

    from pyspark.sql import functions as F

    from bloom_spark.ops.build import H1_COL, H2_COL, with_hash_columns

    token = uuid.uuid4().hex
    blob_bc = spark.sparkContext.broadcast(cascade.to_bytes())
    w = cascade.writable_index

    @F.pandas_udf("struct<found:boolean, container:int, writable:int>")
    def trace(h1: pd.Series, h2: pd.Series) -> pd.DataFrame:
        from bloom_spark.hashing import to_uint64
        from bloom_spark.sketch.base import sketch_from_bytes as sfb

        from bloom_spark.ops.build import _cache_put

        c = _TRACE_CACHE.get(token)
        if c is None:
            c = sfb(blob_bc.value)
            # bounded FIFO: tokens are per-call — an unbounded dict
            # would leak one full cascade per trace_members call in
            # every worker (r3 review)
            _cache_put(_TRACE_CACHE, token, c, cap=4)
        n = len(h1)
        h1v, h2v = to_uint64(h1), to_uint64(h2)
        cont = np.full(n, -1, dtype=np.int32)
        pending = np.ones(n, dtype=bool)
        for i, m in enumerate(c.members):
            if not pending.any():
                break
            idx = np.flatnonzero(pending)
            hit = m.contains_hashes(h1v[idx], h2v[idx])
            cont[idx[hit]] = i
            pending[idx[hit]] = False
        return pd.DataFrame(
            {
                "found": cont >= 0,
                "container": cont,
                "writable": np.full(n, -1 if w is None else w, dtype=np.int32),
            }
        )

    hashed = with_hash_columns(df, cols)
    return (
        hashed.withColumn("__tr", trace(F.col(H1_COL), F.col(H2_COL)))
        .select(
            *df.columns,
            F.col("__tr.found").alias("found"),
            F.col("__tr.container").alias("container"),
            F.col("__tr.writable").alias("writable"),
        )
    )
