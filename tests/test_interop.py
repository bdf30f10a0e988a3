"""Reference hash interop: numpy XXH3-64 and keyed SipHash-1-3.

The reference binary hashes lines with xxh3_64 (container_memory_xxh.rs:139)
and probes its Bloom containers with two keyed SipHash-1-3 hashers from
the bloomfilter crate (container_memory_bloom.rs:79-113). Both are public
algorithms reimplemented from scratch in numpy; these tests pin them to
external ground truth:

- XXH3-64 against ``libxxhash`` via ctypes (the frozen v0.8 algorithm —
  exactly what xxhash-rust 0.8.x implements), every length class.
- SipHash core against the published SipHash-2-4 paper vectors (same
  round function as 1-3).
"""

from __future__ import annotations

import ctypes
import random

import numpy as np
import pandas as pd
import pytest

from bloom_spark.siphash import siphash_batch, siphash_scalar
from bloom_spark.xxh3 import xxh3_64_bytes


def _libxxhash():
    try:
        lib = ctypes.CDLL("libxxhash.so.0")
    except OSError:
        return None
    lib.XXH3_64bits.restype = ctypes.c_uint64
    lib.XXH3_64bits.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    return lib


class TestXXH3:
    def test_known_empty_vector(self):
        # the widely published XXH3_64bits("") value — independent of
        # the ctypes oracle below
        assert int(xxh3_64_bytes([b""])[0]) == 0x2D06800538D394C2

    def test_bit_exact_vs_libxxhash_all_length_classes(self):
        lib = _libxxhash()
        if lib is None:
            pytest.skip("libxxhash not present")
        rng = random.Random(42)
        lens = list(range(0, 300)) + [
            511, 512, 513, 1023, 1024, 1025, 2047, 2048, 2049, 5000, 10240
        ]
        cases = [bytes(rng.randrange(256) for _ in range(L)) for L in lens]
        got = xxh3_64_bytes(cases)
        want = [lib.XXH3_64bits(b, len(b)) for b in cases]
        assert [int(g) for g in got] == want

    def test_str_hashes_utf8_bytes(self):
        s = "héllo wörld"
        assert int(xxh3_64_bytes([s])[0]) == int(
            xxh3_64_bytes([s.encode("utf-8")])[0]
        )


class TestSipHash:
    # First 9 published SipHash-2-4 reference vectors (Aumasson &
    # Bernstein, vectors.h of the reference implementation): key
    # 000102...0f, message 00,01,...,len-1. Same round function as the
    # 1-3 variant the bloomfilter crate uses.
    K0, K1 = 0x0706050403020100, 0x0F0E0D0C0B0A0908
    VECTORS = [
        "726fdb47dd0e0e31", "74f839c593dc67fd", "0d6c8009d9a94f5a",
        "85676696d7fb7e2d", "cf2794e0277187b7", "18765564cd99a68d",
        "cbc9466e58fee3ce", "ab0200f58b01d137", "93f5f5799a932462",
    ]

    def test_published_24_vectors(self):
        for length, want in enumerate(self.VECTORS):
            got = siphash_scalar(self.K0, self.K1, bytes(range(length)), c=2, d=4)
            assert got == int(want, 16), length

    def test_batch_matches_scalar_13(self):
        rng = random.Random(1)
        streams = [
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
            for _ in range(500)
        ]
        batch = siphash_batch(self.K0, self.K1, streams, c=1, d=3)
        # scalar path hashes one-element batches — different slicing /
        # sort order through the vectorized loop
        for s, got in zip(streams, batch):
            assert int(got) == siphash_scalar(self.K0, self.K1, s, c=1, d=3)


class TestReferenceBloomInterop:
    def test_geometry_formulas(self):
        from bloom_spark.io.blf_bloom import compute_bitmap_size, optimal_k_num

        # crate formulas: k = max(1, ceil(m/n ln2));
        # bytes = ceil(n ln p / (-8 ln^2 2))
        assert compute_bitmap_size(1000, 1e-6) == 3595
        assert optimal_k_num(3595 * 8, 1000) == 20  # ≈ -log2(1e-6)

    def test_probe_scheme_snapshot(self):
        """Pin the full probe pipeline (sip13 of utf8||0xff, combiner
        mod the u64 prime, bit = h % m) against a hand-computed
        snapshot so refactors can't silently change the family."""
        from bloom_spark.io.blf_bloom import _PRIME, ReferenceBloom

        f = ReferenceBloom(bitmap_bits=1 << 20, k_num=5,
                           sip_keys=[(11, 22), (33, 44)])
        idx = f._bit_offsets(pd.Series(["doc"]))[0]
        stream = b"doc\xff"
        h0 = siphash_scalar(11, 22, stream, c=1, d=3)
        h1 = siphash_scalar(33, 44, stream, c=1, d=3)
        want = [h0 % (1 << 20), h1 % (1 << 20)] + [
            ((h0 + i * h1) % 2**64) % _PRIME % (1 << 20) for i in (2, 3, 4)
        ]
        assert idx.tolist() == want

    def test_payload_roundtrip_and_fpr(self):
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new_for_fp_rate(2000, 1e-4)
        vals = pd.Series([f"line-{i}" for i in range(2000)])
        f.set(vals)
        back = ReferenceBloom.from_payload(f.to_payload(), f.k_num)
        assert back.contains(vals).all()
        fresh = pd.Series([f"other-{i}" for i in range(5000)])
        assert back.contains(fresh).mean() < 1e-3  # ~1e-4 target

    def test_check_and_set_first_wins(self):
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new(4096, 100)
        out = f.check_and_set(pd.Series(["a", "b", "a"]))
        assert out.tolist() == [False, False, True]


class TestR3ReviewRegressions:
    def test_bloom_blf_rewrite_keeps_k(self, tmp_path):
        """r3 review: read→write of a PARTIALLY-filled Bloom .blf must
        preserve the header limit; writing n_inserted as limit made the
        next read derive a wildly wrong k (20→997) and lose every
        member."""
        from bloom_spark.io.blf import read_blf, write_blf
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new_for_fp_rate(100_000, 1e-6)
        vals = pd.Series([f"v{i}" for i in range(2000)])  # partial fill
        f.set(vals)
        p1, p2 = str(tmp_path / "a.blf"), str(tmp_path / "b.blf")
        write_blf(p1, f)
        back = read_blf(p1)
        write_blf(p2, back)  # round trip through a read filter
        again = read_blf(p2)
        assert again.k_num == f.k_num
        assert again.contains(vals).all()

    def test_write_blf_refuses_native_hash_family(self, tmp_path):
        """r3 review: the layout has no hash-family tag — a native-hash
        table written to .blf silently mis-probes everywhere (binary
        AND read_blf). Must refuse unless explicitly overridden."""
        from bloom_spark.io.blf import write_blf
        from bloom_spark.sketch import XXHFingerprintTable

        t = XXHFingerprintTable("32Kb", remap_slots=True)  # native hash_fn
        t.update(pd.Series(["a", "b"]))
        with pytest.raises(ValueError, match="hash-family|reference hash"):
            write_blf(str(tmp_path / "x.blf"), t)
        write_blf(str(tmp_path / "x.blf"), t, allow_foreign_hash=True)

    def test_hashers_reject_non_string_keys(self):
        """r3 review: bytes(int) = N zero bytes → silent per-length
        collisions; bytes(None) → worker crash. Reject loudly."""
        from bloom_spark.io.blf_bloom import ReferenceBloom

        with pytest.raises(TypeError, match="cast the key column"):
            xxh3_64_bytes([5])
        f = ReferenceBloom.new(1024, 10)
        with pytest.raises(TypeError, match="cast the key column"):
            f.contains(pd.Series([None]))

    def test_blf_probe_null_keys_are_not_members(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from bloom_spark.io.blf import blf_membership_udf, reference_xxh_table, write_blf

        t = reference_xxh_table("32Kb", limit=1000)
        t.update(pd.Series(["hit"]))
        path = str(tmp_path / "n.blf")
        write_blf(path, t)
        df = spark.createDataFrame(
            [("hit",), (None,), ("miss",)], "text string"
        )
        probe = blf_membership_udf(path)
        got = {
            r["text"]: r["m"]
            for r in df.withColumn("m", probe(F.col("text"))).collect()
        }
        assert got == {"hit": True, None: False, "miss": False}

    def test_worker_cache_put_is_bounded(self):
        from bloom_spark.ops.build import _cache_put

        cache: dict = {}
        for i in range(50):
            _cache_put(cache, f"tok{i}", i, cap=8)
        assert len(cache) == 8
        assert "tok49" in cache and "tok0" not in cache


class TestBlfSparkProbe:
    def test_blf_membership_udf_anti_join(self, spark, tmp_path):
        """Spark-side migration probe of a reference-layout file built
        with the TRUE reference hash (xxh3): filter documents against a
        .blf exactly as the Rust binary would answer."""
        import pyspark.sql.functions as F

        from bloom_spark.io.blf import blf_membership_udf, reference_xxh_table, write_blf

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        member_rows = docs.where("doc_id % 20 = 0").select("text").collect()
        t = reference_xxh_table("64Kb", limit=10_000)
        t.update(pd.Series([r["text"] for r in member_rows]))
        path = str(tmp_path / "ref.blf")
        write_blf(path, t)

        probe = blf_membership_udf(path)
        out = docs.withColumn("member", probe(F.col("text")))
        hits = out.where("member").select("doc_id").collect()
        want = {r["doc_id"] for r in docs.where("doc_id % 20 = 0").collect()}
        got = {r["doc_id"] for r in hits}
        assert want <= got                      # zero false negatives
        assert len(got - want) <= 3             # 20-bit fp + low fill

    def test_blf_membership_udf_bloom_family(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from bloom_spark.io.blf import blf_membership_udf, write_blf
        from bloom_spark.io.blf_bloom import ReferenceBloom

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        members = [r["text"] for r in docs.where("doc_id % 5 = 0").select("text").collect()]
        f = ReferenceBloom.new_for_fp_rate(max(len(members), 1), 1e-9)
        f.set(pd.Series(members))
        path = str(tmp_path / "refbloom.blf")
        write_blf(path, f)

        probe = blf_membership_udf(path)
        got = {
            r["doc_id"]
            for r in docs.withColumn("m", probe(F.col("text"))).where("m").collect()
        }
        want = {r["doc_id"] for r in docs.where("doc_id % 5 = 0").collect()}
        assert got == want


class TestR4PackedBitmap:
    """r3 advice: ReferenceBloom keeps the bitmap PACKED (uint8, the
    file's own MSB-first layout) and probes it with bit arithmetic —
    file-backed filters stay ~file-size resident per worker instead of
    8x-unpacked bool arrays — and check_and_set is vectorized. Pin the
    new paths against literal sequential replays and the on-disk file."""

    def test_check_and_set_matches_sequential_reference(self):
        import random as _random

        from bloom_spark.io.blf_bloom import ReferenceBloom

        rng = _random.Random(7)
        kw = dict(bitmap_bits=256, k_num=4, sip_keys=[(1, 2), (3, 4)])
        fast = ReferenceBloom(**kw)
        slow = ReferenceBloom(**kw)
        for _ in range(6):
            batch = pd.Series([f"k{rng.randrange(60)}" for _ in range(40)])
            got = fast.check_and_set(batch)
            # literal sequential oracle: per row, all-bits-set -> found,
            # else write the row's bits (the pre-vectorization loop)
            bits = np.unpackbits(slow.packed, bitorder="big").astype(bool)
            want = []
            for row in slow._bit_offsets(batch):
                if bits[row].all():
                    want.append(True)
                else:
                    bits[row] = True
                    slow.n_inserted += 1
                    want.append(False)
            slow.packed = np.packbits(bits, bitorder="big")
            assert got.tolist() == want
            assert fast.n_inserted == slow.n_inserted
            assert np.array_equal(fast.packed, slow.packed)

    def test_set_contains_packed_parity(self):
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new_for_fp_rate(500, 1e-6)
        vals = pd.Series([f"v{i}" for i in range(500)])
        f.set(vals)
        assert f.packed.dtype == np.uint8
        assert len(f.packed) == (f.m + 7) // 8
        assert f.contains(vals).all()
        # bit j of the filter is bit (7 - j%8) of byte j/8 (file layout)
        idx = f._bit_offsets(vals[:50])
        flat = idx.ravel()
        assert (
            (f.packed[flat >> 3] >> (7 - (flat & 7)).astype(np.uint8)) & 1
        ).all()

    def test_file_backed_probe_is_readonly_view_and_copies_on_write(
        self, tmp_path
    ):
        from bloom_spark.io.blf import read_blf, write_blf
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new_for_fp_rate(1000, 1e-6)
        vals = pd.Series([f"m{i}" for i in range(1000)])
        f.set(vals)
        p = str(tmp_path / "m.blf")
        write_blf(p, f)
        back = read_blf(p)
        # probe view: packed, read-only, backed by the mapped file (no
        # private unpacked copy)
        assert back.packed.dtype == np.uint8
        assert not back.packed.flags.writeable
        b = back.packed
        while b is not None and not isinstance(b, np.memmap):
            b = b.base
        assert isinstance(b, np.memmap)
        assert back.contains(vals).all()
        before = open(p, "rb").read()
        back.set(pd.Series(["new-key"]))  # must copy, not write the map
        assert bool(back.contains(pd.Series(["new-key"]))[0])
        assert open(p, "rb").read() == before


class TestBloomErrorRateConstruction:
    """r4: symmetric type-1 (BloomLinesAndErrorRate) interop — the Rust
    binary reconstructs a type-1 file's geometry from (limit,
    error_rate) alone (container_memory_bloom.rs:118-127), so our
    writer must emit that type for fp-rate-built filters and the header
    must satisfy the crate's size formula exactly."""

    def test_fp_rate_filter_writes_type1_and_round_trips(self, tmp_path):
        from bloom_spark.io.blf import (
            CT_BLOOM_LINES_AND_ERROR_RATE,
            HEADER_LEN,
            read_blf,
            read_header,
            write_blf,
        )
        from bloom_spark.io.blf_bloom import (
            ReferenceBloom,
            compute_bitmap_size,
        )

        f = ReferenceBloom.new_for_fp_rate(3000, 1e-5)
        vals = pd.Series([f"w{i}" for i in range(3000)])
        f.set(vals)
        p = str(tmp_path / "rate.blf")
        write_blf(p, f)
        hdr = read_header(open(p, "rb").read(HEADER_LEN))
        assert hdr["construction_type"] == CT_BLOOM_LINES_AND_ERROR_RATE
        assert hdr["error_rate"] == 1e-5
        assert hdr["limit"] == 3000
        # the crate's reload derives geometry from (limit, error_rate):
        # header size must equal its formula's output
        assert hdr["size"] == compute_bitmap_size(3000, 1e-5)
        back = read_blf(p)
        assert back.fp_rate == 1e-5
        assert back.k_num == f.k_num
        assert back.contains(vals).all()
        # read -> write stays type 1 with identical header geometry
        p2 = str(tmp_path / "rate2.blf")
        write_blf(p2, back)
        hdr2 = read_header(open(p2, "rb").read(HEADER_LEN))
        assert hdr2 == hdr
        assert read_blf(p2).contains(vals).all()

    def test_size_filter_stays_type0(self, tmp_path):
        from bloom_spark.io.blf import (
            CT_BLOOM_LINES_AND_SIZE,
            HEADER_LEN,
            read_header,
            write_blf,
        )
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new(4096, 1000)
        f.set(pd.Series(["only"]))
        p = str(tmp_path / "size.blf")
        write_blf(p, f)
        hdr = read_header(open(p, "rb").read(HEADER_LEN))
        assert hdr["construction_type"] == CT_BLOOM_LINES_AND_SIZE
        assert hdr["error_rate"] == 0.0

    def test_inconsistent_geometry_refused(self, tmp_path):
        from bloom_spark.io.blf import write_blf
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new(4096, 1000)  # size-constructed bitmap
        f.fp_rate = 1e-9  # claimed rate does NOT match 4096 bytes
        with pytest.raises(ValueError, match="geometry"):
            write_blf(str(tmp_path / "bad.blf"), f)
