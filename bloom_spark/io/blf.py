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

What interops and what cannot:
- XXH tables (type 2) are key-free — ``read_blf`` recovers the slot
  table bit-exactly into an :class:`XXHFingerprintTable` with the
  reference's f64-remap slot indexing (``remap_slots=True``). The
  loaded table is PROBE-ONLY (no raw hashes → ``merge`` refuses,
  see sketch/xxh_table.py). Probing a file written by the actual Rust
  binary additionally requires xxh3_64 of the probed value — not
  shipped in this environment; pass a vectorized ``hash_fn`` to
  :meth:`XXHFingerprintTable.contains`-style helpers if you have one.
  Files round-trip through :func:`write_blf` probe with our hash
  family unchanged.
- Bloom files (types 0/1) persist two RANDOM SipHash-1-3 keys inside
  the payload (container_memory_bloom.rs:79-85): membership cannot be
  evaluated without a SipHash-1-3 implementation keyed by them, so
  ``read_blf`` refuses these with an explanatory error (documented
  non-goal, SURVEY.md §2.4 H2).
"""

from __future__ import annotations

import struct

import numpy as np

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


def read_blf(path: str) -> XXHFingerprintTable:
    """Load a reference XXH container file into a probe-only
    :class:`XXHFingerprintTable` (reference ``from_file``,
    container.rs:113-170: CLI params are overridden by the header)."""
    with open(path, "rb") as f:
        blob = f.read()
    hdr = read_header(blob)
    ct = hdr["construction_type"]
    if ct in (CT_BLOOM_LINES_AND_SIZE, CT_BLOOM_LINES_AND_ERROR_RATE):
        raise ValueError(
            "reference Bloom container files persist filter-specific random "
            "SipHash-1-3 keys (container_memory_bloom.rs:79-85) and cannot "
            "be probed without a keyed SipHash implementation; only XXH "
            "containers (key-free) interop"
        )
    if ct != CT_XXH_LIMIT_AND_SIZE:
        raise ValueError(f"unknown construction type {ct}")
    table = XXHFingerprintTable(
        hdr["size"], limit=hdr["max_writes"] or None, remap_slots=True
    )
    bits = np.unpackbits(
        np.frombuffer(blob, dtype=np.uint8, offset=HEADER_LEN), bitorder="big"
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
    return table


def write_blf(path: str, table: XXHFingerprintTable) -> None:
    """Write an :class:`XXHFingerprintTable` in the reference's exact
    file layout (fixture writer for round-trip tests; ≙ ``save``,
    container.rs:53-88 + container_memory_xxh.rs:199-203)."""
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
