"""Pure numpy/pandas sketch tests — no Spark. Mirrors SURVEY.md §5.2-5.4."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bloom_spark.sketch import (
    BloomSketch,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    Sketch,
    TDigest,
    XXHFingerprintTable,
    fpr_bound,
    sketch_from_bytes,
)


def _strings(prefix: str, n: int) -> pd.Series:
    return pd.Series([f"{prefix}-{i}" for i in range(n)])


# ---------------------------------------------------------------- Bloom


class TestBloom:
    def test_zero_false_negatives(self):
        s = BloomSketch.from_fpr(10_000, 0.01)
        vals = _strings("in", 10_000)
        s.update(vals)
        assert s.contains(vals).all()

    @pytest.mark.parametrize("n,p", [(1_000, 0.1), (100_000, 0.01), (1_000, 0.001)])
    def test_fpr_within_bound(self, n, p):
        s = BloomSketch.from_fpr(n, p)
        s.update(_strings("in", n))
        probe = _strings("out", max(n, 20_000))
        measured = s.contains(probe).mean()
        bound = fpr_bound(n, s.m, s.k)
        assert measured <= max(bound * 2.0, 5.0 / len(probe)), (measured, bound)

    def test_from_size_formula(self):
        # -bls NUM,SIZE: m fixed by bytes, k derived (SURVEY §1.3)
        s = BloomSketch.from_size(1_000, 4096)
        assert s.m == 4096 * 8
        assert s.k == round(s.m / 1000 * np.log(2))

    def test_check_and_set_contract(self):
        # probe-then-insert: first call False, second True
        # (reference container.rs:228-241 unit test)
        s = BloomSketch.from_fpr(1_000, 0.001)
        v = pd.Series(["hello"])
        assert not s.check_and_set(v)[0]
        assert s.check_and_set(v)[0]

    def test_check_and_set_first_wins_within_batch(self):
        s = BloomSketch.from_fpr(1_000, 0.001)
        v = pd.Series(["a", "b", "a", "c", "b", "a"])
        found = s.check_and_set(v)
        assert list(found) == [False, False, True, False, True, True]

    def test_write_limit_reads_continue(self):
        # ≙ -l cap: inserts stop at limit, probes keep working
        # (reference process.rs:107-130, README.md:39-41)
        s = BloomSketch.from_fpr(100, 0.001, limit=5)
        found = s.check_and_set(_strings("x", 10))
        assert not found.any()  # all 10 unique → none "found"
        assert s.n_inserted == 5 and s.is_full()
        # the 5 stored are found; the 5 dropped are not
        assert s.contains(_strings("x", 5)).all()

    def test_capped_first_copy_leaves_duplicates_unseen(self):
        """r3 review: a first copy dropped by the write cap was never
        inserted, so its within-batch duplicates must report unseen too
        (the reference's full filter emits every copy of an absent key)."""
        b = BloomSketch.from_fpr(100, 1e-9, limit=1)
        seen = b.check_and_set(pd.Series(["a", "b", "a", "b"]))
        # room for one insert: "a" inserted (dup found); "b" capped out
        assert seen.tolist() == [False, False, True, False]

    def test_merge_or_and_roundtrip(self):
        a = BloomSketch.from_fpr(2_000, 0.01)
        b = BloomSketch.from_fpr(2_000, 0.01)
        va, vb = _strings("a", 500), _strings("b", 500)
        a.update(va)
        b.update(vb)
        merged = BloomSketch.from_bytes(a.to_bytes()).merge(
            BloomSketch.from_bytes(b.to_bytes())
        )
        assert merged.contains(va).all() and merged.contains(vb).all()
        assert merged.n_inserted == 1000

    def test_merge_order_invariance_bitwise(self):
        segs = []
        for i in range(8):
            s = BloomSketch.from_fpr(5_000, 0.01)
            s.update(_strings(f"seg{i}", 300))
            segs.append(s.to_bytes())
        rng = np.random.default_rng(7)

        def merge_perm(perm):
            acc = BloomSketch.from_bytes(segs[perm[0]])
            for j in perm[1:]:
                acc.merge(BloomSketch.from_bytes(segs[j]))
            return acc.words.tobytes()

        ref = merge_perm(list(range(8)))
        for _ in range(5):
            assert merge_perm(list(rng.permutation(8))) == ref

    def test_incompatible_merge_raises(self):
        with pytest.raises(ValueError):
            BloomSketch(128, 3).merge(BloomSketch(256, 3))

    def test_envelope_kind_dispatch(self):
        s = BloomSketch.from_fpr(100, 0.1)
        s.update(_strings("x", 10))
        back = sketch_from_bytes(s.to_bytes())
        assert isinstance(back, BloomSketch)
        assert back.contains(_strings("x", 10)).all()


# ---------------------------------------------------------------- HLL


class TestHLL:
    @pytest.mark.parametrize("p", [12, 14])
    @pytest.mark.parametrize("n", [1_000, 50_000])
    def test_error_bound(self, p, n):
        h = HyperLogLog(p)
        h.update(_strings("u", n))
        rel = abs(h.estimate() - n) / n
        assert rel < 4 * h.std_error(), (h.estimate(), n)

    def test_merge_max_and_invariance(self):
        parts = []
        for i in range(6):
            h = HyperLogLog(12)
            h.update(_strings(f"p{i}", 2_000))
            parts.append(h.to_bytes())
        whole = HyperLogLog(12)
        whole.update(pd.concat([_strings(f"p{i}", 2_000) for i in range(6)]))
        rng = np.random.default_rng(3)
        est = None
        for _ in range(4):
            acc = HyperLogLog.from_bytes(parts[0])
            for j in rng.permutation(np.arange(1, 6)):
                acc.merge(HyperLogLog.from_bytes(parts[j]))
            e = acc.estimate()
            assert est is None or e == est  # max-merge → identical estimate
            est = e
        assert est == whole.estimate()  # distributed == single-pass

    def test_small_range_linear_counting(self):
        h = HyperLogLog(14)
        h.update(_strings("x", 50))
        assert abs(h.estimate() - 50) <= 2


# ---------------------------------------------------------------- CMS


class TestCMS:
    def test_exact_when_wide(self):
        c = CountMinSketch(width=1 << 16, depth=5)
        keys = pd.Series(["a"] * 100 + ["b"] * 7 + ["c"] * 1)
        c.update(keys)
        got = c.query(pd.Series(["a", "b", "c", "zzz"]))
        assert list(got) == [100, 7, 1, 0]

    def test_overestimate_only_and_bound(self):
        c = CountMinSketch.from_error(eps=0.01, delta=0.01)
        rng = np.random.default_rng(11)
        # zipf-ish frequencies
        keys = pd.Series([f"k{int(z)}" for z in rng.zipf(1.5, 20_000)])
        exact = keys.value_counts()
        c.update(keys)
        got = c.query(pd.Series(exact.index))
        assert (got >= exact.to_numpy()).all()  # never underestimates
        assert (got - exact.to_numpy() <= c.error_bound()).mean() > 0.99

    def test_merge_additive_invariance(self):
        a, b = CountMinSketch(1024, 4), CountMinSketch(1024, 4)
        a.update(pd.Series(["x"] * 5))
        b.update(pd.Series(["x"] * 3 + ["y"] * 2))
        ab = CountMinSketch.from_bytes(a.to_bytes()).merge(b)
        ba = CountMinSketch.from_bytes(b.to_bytes()).merge(a)
        assert (ab.table == ba.table).all()
        assert ab.query(pd.Series(["x", "y"])).tolist() == [8, 2]

    def test_weighted_update(self):
        c = CountMinSketch(1024, 4)
        c.update(pd.Series(["a", "b"]), counts=np.array([10, 20]))
        assert c.query(pd.Series(["a", "b"])).tolist() == [10, 20]
        assert c.total == 30


# ---------------------------------------------------------------- KLL


class TestKLL:
    def test_exact_when_small(self):
        k = KLLSketch(k=200)
        vals = np.arange(100, dtype=np.float64)
        k.update_values(vals)
        assert k.quantile(0.0) == 0.0
        assert k.quantile(1.0) == 99.0
        assert abs(k.quantile(0.5) - 50.0) <= 1.0

    @pytest.mark.parametrize("dist", ["uniform", "lognormal"])
    def test_rank_error_bound(self, dist):
        rng = np.random.default_rng(5)
        n = 200_000
        data = rng.uniform(0, 1, n) if dist == "uniform" else rng.lognormal(0, 2, n)
        k = KLLSketch(k=200)
        for chunk in np.array_split(data, 20):
            k.update_values(chunk)
        assert k.n == n
        srt = np.sort(data)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            est = k.quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / n
            assert abs(true_rank - q) <= 3 * k.rank_error(), (q, true_rank)

    def test_merge_within_bound(self):
        rng = np.random.default_rng(9)
        data = rng.normal(0, 1, 100_000)
        parts = []
        for chunk in np.array_split(data, 8):
            s = KLLSketch(k=200)
            s.update_values(chunk)
            parts.append(s.to_bytes())
        acc = KLLSketch.from_bytes(parts[0])
        for b in parts[1:]:
            acc.merge(KLLSketch.from_bytes(b))
        srt = np.sort(data)
        for q in (0.1, 0.5, 0.9):
            est = acc.quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / len(data)
            assert abs(true_rank - q) <= 4 * acc.rank_error()

    def test_roundtrip(self):
        s = KLLSketch(k=64)
        s.update_values(np.arange(10_000, dtype=np.float64))
        back = KLLSketch.from_bytes(s.to_bytes())
        assert back.n == s.n
        assert back.quantile(0.5) == s.quantile(0.5)


# ---------------------------------------------------------------- t-digest


class TestTDigest:
    def test_exact_extremes(self):
        t = TDigest(200)
        t.update_values(np.arange(1000, dtype=np.float64))
        assert t.quantile(0.0) == 0.0
        assert t.quantile(1.0) == 999.0

    def test_quantile_accuracy(self):
        rng = np.random.default_rng(1)
        data = rng.normal(0, 1, 100_000)
        t = TDigest(200)
        for chunk in np.array_split(data, 10):
            t.update_values(chunk)
        srt = np.sort(data)
        for q in (0.001, 0.01, 0.5, 0.99, 0.999):
            est = t.quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / len(data)
            # t-digest: tight at tails, ~1% at the median for δ=200
            tol = 0.012 if 0.1 < q < 0.9 else 0.005
            assert abs(true_rank - q) <= tol, (q, true_rank)

    def test_merge_stability(self):
        rng = np.random.default_rng(2)
        data = rng.exponential(1.0, 50_000)
        parts = []
        for chunk in np.array_split(data, 8):
            t = TDigest(200)
            t.update_values(chunk)
            parts.append(t.to_bytes())
        perm_est = []
        for perm in (range(8), reversed(range(8))):
            acc = None
            for j in perm:
                d = TDigest.from_bytes(parts[j])
                acc = d if acc is None else acc.merge(d)
            perm_est.append(acc.quantile(0.5))
        true_med = np.median(data)
        for e in perm_est:
            assert abs(e - true_med) / true_med < 0.02

    def test_roundtrip(self):
        t = TDigest(100)
        t.update_values(np.arange(5000, dtype=np.float64))
        back = TDigest.from_bytes(t.to_bytes())
        assert back.quantile(0.25) == t.quantile(0.25)
        assert back.n == t.n


class TestBloomIntersect:
    def test_intersection_members_always_found(self):
        a = BloomSketch.from_fpr(10_000, 1e-6)
        b = BloomSketch.from_fpr(10_000, 1e-6)
        both = _strings("both", 1_000)
        a.update(_strings("a", 4_000))
        a.update(both)
        b.update(_strings("b", 4_000))
        b.update(both)
        inter = BloomSketch.from_bytes(a.to_bytes()).intersect(b)
        assert inter.contains(both).all()  # zero FN on true A∩B
        # A-only / B-only members are (almost surely) rejected
        assert inter.contains(_strings("a", 4_000)).sum() <= 4
        assert inter.contains(_strings("b", 4_000)).sum() <= 4
        assert not inter.contains(_strings("zz", 2_000)).any()

    def test_incompatible_params_refused(self):
        with pytest.raises(ValueError, match="incompatible"):
            BloomSketch(1 << 12, 5).intersect(BloomSketch(1 << 13, 5))


# ---------------------------------------------------------------- XXH table


class TestXXHTable:
    def test_set_check_contract(self):
        t = XXHFingerprintTable(size_bytes=64 * 1024)
        v = pd.Series(["hello"])
        assert not t.check_and_set(v)[0]
        assert t.check_and_set(v)[0]

    def test_check_and_set_first_wins_within_batch(self):
        # ADVICE r2 (high): found was computed once before any insert, so
        # two equal hashes in ONE batch both reported unseen — an XXH-backed
        # dedup emitted intra-batch duplicates. Mirror BloomSketch: only the
        # first occurrence is unseen.
        t = XXHFingerprintTable(size_bytes=64 * 1024)
        v = pd.Series(["x", "y", "x", "x", "y", "z"])
        out = t.check_and_set(v)
        assert out.tolist() == [False, False, True, True, True, False]
        # and the duplicates consumed no extra slots
        assert t.n_inserted == 3

    def test_full_table_duplicates_stay_unseen(self):
        """r3 review: at the write cap the table degrades to pure check —
        duplicates of an absent key must ALL report unseen (nothing was
        inserted), not be masked present by the intra-batch dedup."""
        t = XXHFingerprintTable(size_bytes=64 * 1024, limit=1)
        t.update(pd.Series(["seed"]))
        assert t.is_full()
        out = t.check_and_set(pd.Series(["k", "k", "seed"]))
        assert out.tolist() == [False, False, True]

    def test_write_cap_trims_within_batch_exactly(self):
        """r3 advice: the cap was enforced at batch granularity (once
        below the limit a whole batch's unseen keys were inserted,
        overshooting by up to a batch); now room = limit - n_inserted
        trims the todo set in batch order like BloomSketch, and a
        TRIMMED first copy leaves its later duplicates unseen while an
        attempted one answers present for them."""
        t = XXHFingerprintTable(size_bytes=64 * 1024, limit=2)
        out = t.check_and_set(pd.Series(["a", "b", "c", "c", "b", "d"]))
        # room=2: a,b attempted; c,d trimmed; dup-of-b present (its
        # first copy really inserted), dup-of-c unseen (first copy cut)
        assert out.tolist() == [False, False, False, False, True, False]
        assert t.n_inserted == 2
        assert t.contains(pd.Series(["a", "b"])).all()
        assert not t.contains(pd.Series(["c", "d"])).any()
        # saturated-at-cap: later batches degrade to pure check
        out2 = t.check_and_set(pd.Series(["d", "d"]))
        assert out2.tolist() == [False, False]

    def test_dedup_no_false_negatives_when_roomy(self):
        t = XXHFingerprintTable(size_bytes=1 << 20)
        vals = _strings("v", 5_000)
        t.update(vals)
        assert t.contains(vals).all()

    def test_saturation_asymmetry(self):
        # tiny table: check errs toward present, set silently drops
        # (container_memory_xxh.rs:108-109 vs :132-133)
        t = XXHFingerprintTable(size_bytes=16)  # ~6 slots
        t.update(_strings("a", 50))
        assert t.n_inserted <= t.num_slots
        assert t.contains(_strings("zz", 20)).all()  # saturated → all "found"

    def test_roundtrip_and_merge(self):
        a = XXHFingerprintTable(size_bytes=1 << 16)
        b = XXHFingerprintTable(size_bytes=1 << 16)
        va, vb = _strings("a", 200), _strings("b", 200)
        a.update(va)
        b.update(vb)
        m = XXHFingerprintTable.from_bytes(a.to_bytes()).merge(b)
        assert m.contains(va).all() and m.contains(vb).all()

    @pytest.mark.parametrize("n_segments", [2, 8])
    def test_merged_segments_no_false_negatives_at_high_fill(self, n_segments):
        """VERDICT r1 'What's wrong #1': a merge that re-probed from the
        occupied SLOT index (instead of the key's true hash base) lost
        linearly-displaced fingerprints at realistic fill. Build a ~60%-full
        table as N serialized+merged segments and require every inserted key
        to still be found — and the same for a single-shot build."""
        size = 1 << 14  # 6241 slots
        total = XXHFingerprintTable(size).num_slots * 6 // 10
        vals = _strings("k", total)
        single = XXHFingerprintTable(size)
        single.update(vals)
        assert single.contains(vals).all(), "single-shot build lost keys"

        segs = []
        for i in range(n_segments):
            t = XXHFingerprintTable(size)
            t.update(vals[i::n_segments])
            # round-trip through the envelope: data-path merges consume
            # deserialized blobs (ops/build.py merge_segments)
            segs.append(XXHFingerprintTable.from_bytes(t.to_bytes()))
        merged = segs[0]
        for t in segs[1:]:
            merged.merge(t)
        assert merged.contains(vals).all(), "distributed merge lost keys"
        # and the round-trip of the merged table keeps the property
        back = XXHFingerprintTable.from_bytes(merged.to_bytes())
        assert back.contains(vals).all()

    def test_replay_history_consolidates(self):
        """VERDICT r2 #4: the replayable hash history must stay bounded
        by the DISTINCT attempted keys (amortized np.unique
        consolidation), not grow per batch/merge."""
        t = XXHFingerprintTable(size_bytes=1 << 21)  # ~800k slots
        n, step = 200_000, 4_000
        h = np.random.default_rng(3).integers(
            0, 2**64, size=n, dtype=np.uint64
        )
        for i in range(0, n, step):
            t.update_hashes(h[i : i + step])
        total_recorded = sum(len(c) for c in t._hash_chunks)
        assert total_recorded <= 2 * n  # duplicate overhead bounded at 2x
        assert len(t._hash_chunks) <= 35  # not one chunk per batch (50)
        # the recorded set covers every key except the few a saturated
        # probe window already answered True for (documented semantics)
        assert len(t._all_hashes()) >= int(n * 0.95)
        # the invariant that matters: zero false negatives after replay
        back = XXHFingerprintTable.from_bytes(t.to_bytes())
        assert back.contains_hashes(h).all()

        # overlapping merges consolidate too: 4 segments sharing the
        # same 60k keys
        segs = []
        for _ in range(4):
            s = XXHFingerprintTable(size_bytes=1 << 21)
            s.update_hashes(h[:60_000])
            segs.append(s)
        m = segs[0]
        for s in segs[1:]:
            m.merge(s)
        assert sum(len(c) for c in m._hash_chunks) <= 2 * 60_000 + (1 << 16)
        assert m.contains_hashes(h[:60_000]).all()

    def test_replay_cap_refuses_loudly_and_cleanly(self):
        """r3 verdict #8: the mergeable replay history is O(distinct
        keys) (8 B/key) — past max_replay_keys the update must FAIL
        with a message pointing at BloomSketch, leaving the table state
        untouched by the offending batch, and the cap must survive
        serde."""
        t = XXHFingerprintTable(size_bytes=1 << 20, max_replay_keys=100)
        ok = _strings("ok", 80)
        t.update(ok)
        with pytest.raises(ValueError, match="BloomSketch"):
            t.update(_strings("over", 200))
        # the refused batch left no trace: members intact, nothing from
        # the over-cap batch inserted, history still within cap
        assert t.contains(ok).all()
        assert not t.contains(_strings("over", 200)).any()
        assert t._n_recorded <= 100
        # near-cap batches that CONSOLIDATE under the cap still work
        t.update(ok)  # pure duplicates: distinct count unchanged
        assert t.contains(ok).all()
        # cap survives a round-trip
        back = XXHFingerprintTable.from_bytes(t.to_bytes())
        assert back.max_replay_keys == 100
        with pytest.raises(ValueError, match="max_replay_keys"):
            back.update(_strings("over", 200))
        # opt-out accepts the growth explicitly
        u = XXHFingerprintTable(size_bytes=1 << 20, max_replay_keys=None)
        u.update(_strings("big", 5000))
        assert u.contains(_strings("big", 5000)).all()

    def test_probe_only_table_refuses_merge(self):
        a = XXHFingerprintTable(size_bytes=1 << 14)
        a.update(_strings("a", 100))
        a.replayable = False  # what a slot-only payload (.blf) load yields
        b = XXHFingerprintTable(size_bytes=1 << 14)
        b.update(_strings("b", 100))
        with pytest.raises(ValueError, match="probe-only"):
            b.merge(a)


# ---------------------------------------------------------------- envelope


def test_unknown_magic_rejected():
    with pytest.raises(ValueError):
        Sketch.from_bytes(b"\x00" * 64)


def test_infinite_bounds_survive_serde():
    """r3 review: a real -inf min (or +inf max) serialized as the None
    empty-sentinel round-tripped with FLIPPED sign; signed string forms
    must preserve it."""
    k = KLLSketch(200)
    k.update_values(np.array([-np.inf, 1.0, 2.0]))
    back = KLLSketch.from_bytes(k.to_bytes())
    assert back.min_value == -np.inf
    assert float(back.quantile(0.0)) == -np.inf
    t = TDigest(100)
    t.update_values(np.array([np.inf, 1.0]))
    assert TDigest.from_bytes(t.to_bytes()).max_value == np.inf
