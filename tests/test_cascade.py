"""T6 multi-filter cascade + H6 parse_size + S7 .blf interop + F5 -sw.

Reference parity pinned here:
- spec pairing 0/1/N with mismatch error (src/main.rs:327-347)
- generational writes: first non-full container takes inserts; probes
  OR over all (src/bloom/process.rs:95-180)
- README ``-l 9`` contract: with every container full, unique lines
  keep flowing (README.md:39-41)
- parse-size units: decimal K/M/G, binary KiB/MiB/GiB
  (src/main.rs:182-191,339-342)
- 128-byte .blf header layout + XXH bitvec payload
  (src/bloom/containers/container.rs:12,53-88,113-170)
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pytest

from bloom_spark.config import parse_size
from bloom_spark.hashing import hash_series_pair
from bloom_spark.ops.cascade import SketchCascade, pair_specs
from bloom_spark.sketch import BloomSketch, XXHFingerprintTable, sketch_from_bytes


def _strings(prefix: str, n: int) -> pd.Series:
    return pd.Series([f"{prefix}-{i}" for i in range(n)])


# ------------------------------------------------------------- parse_size
class TestParseSize:
    @pytest.mark.parametrize(
        "s,expect",
        [
            ("2Gb", 2_000_000_000),      # the reference default size
            ("200M", 200_000_000),       # the reference default limit
            ("10K", 10_000),
            ("100MiB", 104_857_600),
            ("1KiB", 1024),
            ("1.5K", 1500),
            ("7", 7),
            (42, 42),
            ("2 GB", 2_000_000_000),
            ("2gb", 2_000_000_000),
        ],
    )
    def test_units(self, s, expect):
        assert parse_size(s) == expect

    @pytest.mark.parametrize("bad", ["", "x", "12Q", "iB", "1.2.3K"])
    def test_rejects(self, bad):
        with pytest.raises(ValueError):
            parse_size(bad)

    def test_wired_into_constructors(self):
        assert XXHFingerprintTable("2Kb").size_bytes == 2000
        assert BloomSketch.from_size(100, "1KiB").m == 8192


# ------------------------------------------------------------- pairing
class TestSpecPairing:
    def test_zero_specs_defaults(self):
        specs = pair_specs(3, [])
        assert len(specs) == 3
        assert all(s["type"] == "xls" and s["size"] == "2Gb" for s in specs)

    def test_one_spec_broadcasts(self):
        specs = pair_specs(3, [{"type": "ble", "limit": 10, "error_rate": 0.01}])
        assert len(specs) == 3 and all(s["type"] == "ble" for s in specs)

    def test_n_specs_one_each(self):
        two = [{"type": "xls", "limit": 1, "size": "1K"},
               {"type": "ble", "limit": 2, "error_rate": 0.5}]
        assert pair_specs(2, two) == two

    def test_mismatch_errors(self):
        with pytest.raises(ValueError, match="zero or one or match"):
            pair_specs(3, [{"type": "xls"}, {"type": "xls"}])


# ------------------------------------------------------------- cascade
class TestCascade:
    def test_generational_overflow(self):
        """Cap gen0 at 9 writes: later uniques must land in gen1 and ALL
        uniques are reported unseen exactly once (≙ README -l 9)."""
        gen0 = BloomSketch.from_fpr(100, 1e-9, limit=9)
        gen1 = BloomSketch.from_fpr(100, 1e-9, limit=100)
        c = SketchCascade([gen0, gen1])
        vals = _strings("v", 30)
        h1, h2 = hash_series_pair(vals)
        seen_first = c.check_and_set_hashes(h1, h2)
        assert not seen_first.any()          # every unique emitted once
        assert gen0.n_inserted == 9          # sealed at its cap
        assert gen1.n_inserted == 21         # overflow advanced a generation
        assert c.writable_index == 1
        # second pass: everything is a member of SOME generation
        assert c.check_and_set_hashes(h1, h2).all()

    def test_intra_batch_duplicates_reported_found_once(self):
        """ADVICE r2 (high): pending came from one upfront contains pass,
        so duplicate keys in one batch were ALL reported fresh, inserted,
        and double-consumed member capacity. The reference's per-line loop
        sees the first copy's insert before probing the second."""
        gen0 = BloomSketch.from_fpr(100, 1e-9, limit=3)
        gen1 = BloomSketch.from_fpr(100, 1e-9, limit=100)
        c = SketchCascade([gen0, gen1])
        vals = pd.Series(["a", "b", "a", "a", "c", "b"])
        h1, h2 = hash_series_pair(vals)
        seen = c.check_and_set_hashes(h1, h2)
        assert seen.tolist() == [False, False, True, True, False, True]
        # 3 distinct keys = 3 writes total; gen0 has room for all of them
        assert gen0.n_inserted == 3 and gen1.n_inserted == 0
        # an XXH member behaves identically through the cascade (h2=None)
        cx = SketchCascade([XXHFingerprintTable(64 * 1024, limit=100)])
        seen_x = cx.check_and_set_hashes(h1)
        assert seen_x.tolist() == [False, False, True, True, False, True]
        assert cx.n_inserted == 3

    def test_full_cascade_duplicates_all_flow(self):
        """r3 review: with every member full nothing is inserted, so BOTH
        copies of an absent key must report unseen (the reference's loop
        degrades to check() — it would emit both); reporting the second
        copy present silently dropped rows."""
        c = SketchCascade([BloomSketch.from_fpr(64, 1e-9, limit=1)])
        c.check_and_set_hashes(*hash_series_pair(_strings("seed", 1)))
        assert c.is_full()
        h1, h2 = hash_series_pair(pd.Series(["k", "k", "j", "k"]))
        seen = c.check_and_set_hashes(h1, h2)
        assert seen.tolist() == [False, False, False, False]
        # partial room: first unseen key inserted, its dup found; the
        # overflow key (no member left) and its dup stay unseen
        c2 = SketchCascade([BloomSketch.from_fpr(64, 1e-9, limit=1)])
        g1, g2 = hash_series_pair(pd.Series(["a", "b", "a", "b"]))
        seen2 = c2.check_and_set_hashes(g1, g2)
        assert seen2.tolist() == [False, False, True, False]

    def test_all_full_uniques_still_flow(self, caplog):
        c = SketchCascade([BloomSketch.from_fpr(64, 1e-9, limit=4)])
        h1, h2 = hash_series_pair(_strings("a", 4))
        c.check_and_set_hashes(h1, h2)
        assert c.is_full()
        g1, g2 = hash_series_pair(_strings("fresh", 10))
        with caplog.at_level(logging.WARNING, logger="bloom_spark"):
            seen = c.check_and_set_hashes(g1, g2)
        assert not seen.any()                # uniques keep flowing unfiltered
        assert any("cascade full" in r.message for r in caplog.records)

    def test_silence_warnings_suppresses(self, caplog):
        from bloom_spark.session import silence_warnings

        c = SketchCascade([BloomSketch.from_fpr(64, 1e-9, limit=1)])
        h1, h2 = hash_series_pair(_strings("x", 5))
        silence_warnings(True)
        try:
            # capture at the ROOT (no logger override): the bloom_spark
            # logger's ERROR level must drop the warning before it
            # propagates — that is what -sw silences
            with caplog.at_level(logging.DEBUG):
                c.check_and_set_hashes(h1, h2)
            assert not any("cascade full" in r.message for r in caplog.records)
        finally:
            silence_warnings(False)
        with caplog.at_level(logging.WARNING, logger="bloom_spark"):
            g1, g2 = hash_series_pair(_strings("y", 5))
            c.check_and_set_hashes(g1, g2)
        assert any("cascade full" in r.message for r in caplog.records)

    def test_mixed_members_and_serde(self):
        c = SketchCascade(
            [XXHFingerprintTable("64Kb", limit=50), BloomSketch.from_fpr(100, 1e-9)]
        )
        va, vb = _strings("a", 40), _strings("b", 40)
        ha = hash_series_pair(va)
        hb = hash_series_pair(vb)
        c.check_and_set_hashes(*ha)
        c.check_and_set_hashes(*hb)
        back = sketch_from_bytes(c.to_bytes())
        assert isinstance(back, SketchCascade)
        assert back.contains_hashes(*ha).all()
        assert back.contains_hashes(*hb).all()
        probe = hash_series_pair(_strings("zz", 50))
        assert not back.contains_hashes(*probe).any()


# ------------------------------------------------------------- .blf files
class TestBlfInterop:
    def test_header_roundtrip_and_probe(self, tmp_path):
        """Full write-direction parity: a table built with the
        reference's slot indexing AND its true xxh3_64 value hash,
        persisted in the reference layout, probes identically after a
        byte round-trip."""
        from bloom_spark.io.blf import read_blf, read_header, reference_xxh_table, write_blf

        t = reference_xxh_table("32Kb", limit=5000)
        vals = _strings("k", 2000)
        t.update(vals)
        path = str(tmp_path / "f.blf")
        write_blf(path, t)
        raw = open(path, "rb").read()
        hdr = read_header(raw)
        assert hdr["construction_type"] == 2      # XXHLimitAndSize
        assert hdr["size"] == 32_000
        assert hdr["num_writes"] == t.n_inserted
        assert len(raw) == 128 + 32_000           # header + full bitvec

        back = read_blf(path)
        # slot table recovered bit-exactly
        assert (back.occupied == t.occupied).all()
        assert (back.fp == t.fp).all()
        assert back.remap_slots and not back.replayable
        # read_blf installs the reference's xxh3_64 as the value hash:
        # probes answer exactly what the Rust binary would
        assert back.hash_fn is not None
        assert (back.contains(vals) == t.contains(vals)).all()
        assert back.contains(vals).all()

    def test_bloom_blf_roundtrip(self, tmp_path):
        """Types 0/1 interop via persisted SipHash-1-3 keys (the
        bloomfilter crate's scheme, container_memory_bloom.rs:76-113)."""
        from bloom_spark.io.blf import read_blf, read_header, write_blf
        from bloom_spark.io.blf_bloom import ReferenceBloom

        f = ReferenceBloom.new_for_fp_rate(1000, 1e-6)
        vals = _strings("m", 1000)
        f.set(vals)
        path = str(tmp_path / "b.blf")
        write_blf(path, f)
        # r4: fp-rate-built filters persist their construction (type 1,
        # rate in the header) so the Rust reload derives the same
        # geometry; size-built filters still write type 0
        assert read_header(open(path, "rb").read())["construction_type"] == 1

        back = read_blf(path)
        assert isinstance(back, ReferenceBloom)
        assert back.m == f.m and back.sip_keys == f.sip_keys
        assert back.contains(vals).all()          # zero false negatives
        fresh = _strings("zz", 2000)
        assert back.contains(fresh).sum() <= 2    # ~1e-6 FPR
        # the reload quirk (k = limit) is reproducible on request
        quirk = read_blf(path, k_num="header-limit")
        assert quirk.k_num == f.n_inserted

    def test_bad_magic_refused(self, tmp_path):
        from bloom_spark.io.blf import read_blf

        path = tmp_path / "x.blf"
        path.write_bytes(b"\0" * 256)
        with pytest.raises(ValueError, match="magic"):
            read_blf(str(path))
