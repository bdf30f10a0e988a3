"""Reference ``.blf`` filter-file interop (S7).

File layout, byte-for-byte from the reference (src/bloom/containers/
container.rs:12,53-88,113-170):

    offset  size  field
    0       4     magic 0xB1008811, big-endian u32
    4       1     construction type u8: 0=BloomLinesAndSize,
                  1=BloomLinesAndErrorRate, 2=XXHLimitAndSize
                  (enum order: src/main.rs:31-40)
    5       8     size (bytes), little-endian u64
    13      8     limit (max lines), little-endian u64
    21      8     error_rate, little-endian f64
    29      8     num_writes, little-endian u64
    37      8     max_writes, little-endian u64
    45      83    zero padding (header aligned to 128 bytes)
    128     —     payload

XXH payload (container_memory_xxh.rs:199-211): the raw ``bit_vec``
bytes — bit j of the table is bit (7 - j%8) of byte j/8 (bit_vec's
``to_bytes`` is MSB-first within each byte, ≙ numpy ``packbits``
bitorder='big'). Slot i spans table bits [i*21, i*21+20]: bit i*21 is
the occupied flag; the 20 key bits follow LSB-FIRST (key bit k → table
bit i*21+1+k — set_bit_vec_slice, container_memory_xxh.rs:43-48).

What interops:
- XXH tables (type 2) are key-free — ``read_blf`` recovers the slot
  table bit-exactly into an :class:`XXHFingerprintTable` with the
  reference's f64-remap slot indexing (``remap_slots=True``) AND the
  reference's true value hash: ``bloom_spark.xxh3.xxh3_64_bytes``
  (bit-exact vs libxxhash/xxhash-rust 0.8) is installed as the
  table's ``hash_fn``, so ``contains(lines)`` on a file written by
  the actual Rust binary answers exactly what the binary would
  (container_memory_xxh.rs:21-28,139). The loaded table is PROBE-ONLY
  (no raw hashes → ``merge`` refuses, see sketch/xxh_table.py).
  Symmetrically, :func:`write_blf` of a table built with
  ``reference_xxh_table()`` produces a file the Rust binary reads.
  ``blf_membership_udf`` is the Spark probe path (value → bool).
- Bloom files (types 0/1) persist two RANDOM SipHash-1-3 keys inside
  the payload (container_memory_bloom.rs:79-85); ``read_blf``
  dispatches them to :mod:`bloom_spark.io.blf_bloom` which probes via
  a vectorized keyed SipHash-1-3 (the bloomfilter crate's scheme).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd  # module-global: pandas_udf type hints resolve here

from bloom_spark.sketch.xxh_table import KEY_BITS, SLOT_BITS, XXHFingerprintTable

MAGIC = 0xB1008811
HEADER_LEN = 128
CT_BLOOM_LINES_AND_SIZE = 0
CT_BLOOM_LINES_AND_ERROR_RATE = 1
CT_XXH_LIMIT_AND_SIZE = 2

_HEAD = struct.Struct(">I")  # magic
_FIELDS = struct.Struct("<BQQdQQ")  # type, size, limit, error_rate, writes, max


def read_header(blob: bytes) -> dict:
    """Parse the 128-byte header → dict of its fields."""
    if len(blob) < HEADER_LEN:
        raise ValueError("truncated .blf file (header is 128 bytes)")
    (magic,) = _HEAD.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError(f"not a bloom filter file (magic {magic:#x})")
    ctype, size, limit, error_rate, num_writes, max_writes = _FIELDS.unpack_from(
        blob, 4
    )
    return {
        "construction_type": ctype,
        "size": size,
        "limit": limit,
        "error_rate": error_rate,
        "num_writes": num_writes,
        "max_writes": max_writes,
    }


def read_blf(path: str, k_num: int | str = "derived"):
    """Load a reference filter file (reference ``from_file``,
    container.rs:113-170: CLI params are overridden by the header).

    Type 2 (XXH) → probe-only :class:`XXHFingerprintTable` with the
    true reference hash (xxh3_64) installed; types 0/1 (Bloom) →
    :class:`bloom_spark.io.blf_bloom.ReferenceBloom` probing with the
    persisted SipHash-1-3 keys. Both expose ``contains(values)``.

    ``k_num`` (Bloom types only): ``"derived"`` (default) re-derives
    the k the WRITER used from the header via the crate's own formula;
    ``"header-limit"`` reproduces the reference's reload quirk of
    passing the limit as k (see blf_bloom module docstring); an int
    forces an explicit k.
    """
    import os

    with open(path, "rb") as f:
        head = f.read(HEADER_LEN)
    hdr = read_header(head)
    ct = hdr["construction_type"]
    if ct in (CT_BLOOM_LINES_AND_SIZE, CT_BLOOM_LINES_AND_ERROR_RATE):
        from bloom_spark.io.blf_bloom import ReferenceBloom, optimal_k_num

        # memory-map the payload (keys + packed bitmap): the filter
        # probes the PACKED bytes in place, so per-worker residency is
        # ~file size and the OS page cache shares one physical copy
        # across every worker on the host (r3 advice — the old path
        # read the blob AND unpacked to bool, an 8x private expansion)
        payload = np.memmap(
            path, dtype=np.uint8, mode="r", offset=HEADER_LEN
        )
        bitmap_bits = (len(payload) - 32) * 8
        if k_num == "derived":
            k = optimal_k_num(bitmap_bits, hdr["limit"])
        elif k_num == "header-limit":
            k = int(hdr["limit"])
        else:
            k = int(k_num)
        filt = ReferenceBloom.from_payload(payload, k)
        filt.n_inserted = int(hdr["num_writes"])
        # preserve the construction limit so a read→write round trip
        # keeps the header's limit (and thus the derived k) stable — a
        # partially-filled filter re-written with limit=n_inserted would
        # re-derive a wildly wrong k on the next read (r3 review)
        filt.items_count = int(hdr["limit"]) or None
        if ct == CT_BLOOM_LINES_AND_ERROR_RATE:
            # keep the construction rate so read→write round trips stay
            # type 1 (write_blf re-checks geometry against it)
            filt.fp_rate = hdr["error_rate"] or None
        return filt
    if ct != CT_XXH_LIMIT_AND_SIZE:
        raise ValueError(f"unknown construction type {ct}")
    table = XXHFingerprintTable(
        hdr["size"], limit=hdr["max_writes"] or None, remap_slots=True
    )
    # the XXH slot table is re-packed into the in-RAM uint32 slot array
    # anyway, so a transient full read (not memmap) is fine here
    bits = np.unpackbits(
        np.fromfile(path, dtype=np.uint8, offset=HEADER_LEN), bitorder="big"
    )
    need = table.num_slots * SLOT_BITS
    if len(bits) < need:
        raise ValueError("payload shorter than num_slots*21 bits")
    base = np.arange(table.num_slots, dtype=np.int64) * SLOT_BITS
    table.occupied = bits[base].astype(bool)
    fp = np.zeros(table.num_slots, dtype=np.uint32)
    for k in range(KEY_BITS):  # key bits are LSB-first after the flag
        fp |= bits[base + 1 + k].astype(np.uint32) << np.uint32(k)
    table.fp = fp
    table.n_inserted = int(hdr["num_writes"])
    table.replayable = False  # raw hashes are not in the file
    # reference-written files hashed every line with xxh3_64; install the
    # bit-exact numpy implementation so value-level probes answer exactly
    # what the Rust binary would (container_memory_xxh.rs:139)
    from bloom_spark.xxh3 import xxh3_64_bytes

    table.hash_fn = xxh3_64_bytes
    return table


def reference_xxh_table(
    size_bytes: int | str, limit: int | None = None
) -> XXHFingerprintTable:
    """An :class:`XXHFingerprintTable` configured for FULL reference
    parity: f64-remap slot indexing AND true xxh3_64 value hashing —
    inserts land in exactly the slots the Rust binary would use, so
    :func:`write_blf` of this table produces a file the binary probes
    identically (migration in the write direction)."""
    from bloom_spark.xxh3 import xxh3_64_bytes

    t = XXHFingerprintTable(size_bytes, limit=limit, remap_slots=True)
    t.hash_fn = xxh3_64_bytes
    return t


def write_blf(path: str, table, allow_foreign_hash: bool = False) -> None:
    """Write a filter in the reference's exact file layout (≙ ``save``,
    container.rs:53-88). Accepts an :class:`XXHFingerprintTable`
    (type 2, container_memory_xxh.rs:199-203) or a
    :class:`~bloom_spark.io.blf_bloom.ReferenceBloom` (type 0,
    sip keys + bitmap payload, container_memory_bloom.rs:76-90).

    The ``.blf`` layout carries NO hash-family tag: a type-2 file is
    only meaningful if its slots were placed by the reference pipeline
    (xxh3_64 values + f64-remap indexing — ``reference_xxh_table``).
    Writing a native-family table would produce a file that BOTH the
    Rust binary and ``read_blf`` (which installs xxh3 on load) silently
    mis-probe — near-total false negatives (r3 review) — so it is
    refused unless ``allow_foreign_hash=True`` (then the caller owns
    re-attaching the right ``hash_fn`` after ``read_blf``)."""
    from bloom_spark.io.blf_bloom import ReferenceBloom

    if isinstance(table, ReferenceBloom):
        limit = table.items_count or table.n_inserted
        # construction-faithful type: a filter built for an error rate is
        # written as BloomLinesAndErrorRate (type 1) with the rate in the
        # header — the Rust binary's reload reconstructs geometry from
        # (limit, error_rate) via the crate's compute_bitmap_size
        # (container_memory_bloom.rs:118-127), so the written size MUST
        # equal that formula's output or the binary mis-probes; a
        # size-constructed filter stays type 0. Both payloads are
        # identical (4 sip keys + MSB-first bitmap).
        if table.fp_rate is not None:
            from bloom_spark.io.blf_bloom import compute_bitmap_size

            want = compute_bitmap_size(limit, table.fp_rate)
            if want != table.m // 8:
                raise ValueError(
                    f"fp_rate/limit imply {want} bytes but bitmap is "
                    f"{table.m // 8} — refusing to write a type-1 file "
                    "the reference would reconstruct with different "
                    "geometry"
                )
            ctype, error_rate = CT_BLOOM_LINES_AND_ERROR_RATE, float(table.fp_rate)
        else:
            ctype, error_rate = CT_BLOOM_LINES_AND_SIZE, 0.0
        header = _HEAD.pack(MAGIC) + _FIELDS.pack(
            ctype,
            table.m // 8,
            limit,
            error_rate,
            table.n_inserted,
            limit,
        )
        with open(path, "wb") as f:
            f.write(header.ljust(HEADER_LEN, b"\0"))
            f.write(table.to_payload())
        return
    from bloom_spark.xxh3 import xxh3_64_bytes

    if not allow_foreign_hash and (
        table.hash_fn is not xxh3_64_bytes or not table.remap_slots
    ):
        raise ValueError(
            "refusing to write a .blf from a table not built with the "
            "reference hash pipeline (xxh3_64 + remap slots): the file "
            "format has no hash-family tag, so it would silently "
            "mis-probe everywhere. Build via reference_xxh_table(), or "
            "pass allow_foreign_hash=True and manage hash_fn yourself."
        )
    header = _HEAD.pack(MAGIC) + _FIELDS.pack(
        CT_XXH_LIMIT_AND_SIZE,
        table.size_bytes,
        table.limit or 0,
        0.0,
        table.n_inserted,
        table.limit or 0,
    )
    header = header.ljust(HEADER_LEN, b"\0")
    nbits = table.size_bytes * 8  # BitVec::from_elem(size*8)
    bits = np.zeros(nbits, dtype=np.uint8)
    base = np.arange(table.num_slots, dtype=np.int64) * SLOT_BITS
    bits[base] = table.occupied
    for k in range(KEY_BITS):
        bits[base + 1 + k] = (table.fp >> np.uint32(k)) & np.uint32(1)
    with open(path, "wb") as f:
        f.write(header)
        f.write(np.packbits(bits, bitorder="big").tobytes())


_BLF_WORKER_CACHE: dict = {}


def _blf_cached(path: str):
    """Per-worker filter cache keyed by (path, mtime, size) so a file
    REWRITTEN at the same path in a long session is re-read instead of
    probed stale (r3 review); superseded versions are evicted."""
    import os

    from bloom_spark.ops.build import _cache_put

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    filt = _BLF_WORKER_CACHE.get(key)
    if filt is None:
        for k in [k for k in _BLF_WORKER_CACHE if k[0] == path]:
            del _BLF_WORKER_CACHE[k]
        filt = read_blf(path)
        # FIFO cap like the sibling probe caches: distinct .blf paths in
        # a long session must not accumulate one resident filter each
        # per worker forever (r3 advice)
        _cache_put(_BLF_WORKER_CACHE, key, filt)
    return filt


def blf_membership_udf(path: str):
    """A pandas UDF ``(value: string) -> bool`` probing a reference
    ``.blf`` file — the Spark-side migration path for artifacts written
    by the actual Rust binary (both container families).

    Unlike the native probe (``ops.build.membership_udf``, which ships
    16 B/row of JVM-computed hashes), this must move the VALUE bytes to
    Python: the reference's hashes (xxh3_64 / keyed SipHash-1-3) are
    not Catalyst expressions. Both hash implementations are vectorized
    numpy over the Arrow batch; the file is loaded once per worker and
    shared via the OS page cache. Use for interop/migration; prefer the
    native path for greenfield filters.
    """
    from pyspark.sql import functions as F

    @F.pandas_udf("boolean")
    def probe(values: pd.Series) -> pd.Series:
        filt = _blf_cached(path)
        # NULL keys are never members (the reference has no NULL concept
        # — its record is a line; an anti-filter therefore emits them,
        # matching the invalid-row passthrough posture). Hashing them
        # would crash the worker (r3 review).
        mask = values.notna().to_numpy()
        out = np.zeros(len(values), dtype=bool)
        if mask.any():
            out[mask] = np.asarray(filt.contains(values[mask]), dtype=bool)
        return pd.Series(out)

    return probe
