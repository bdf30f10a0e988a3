"""Hypothesis property tests for the sketch core (SURVEY.md §5.2-5.3).

No SparkSession — these pin the algebraic contracts every distributed
path relies on: zero false negatives, serialization round-trips, and
merge associativity/commutativity under arbitrary orderings/shardings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bloom_spark.sketch import BloomSketch, CountMinSketch, HyperLogLog
from bloom_spark.sketch.base import sketch_from_bytes

keys = st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=300)


@settings(max_examples=40, deadline=None)
@given(keys=keys, fpr=st.sampled_from([1e-2, 1e-4, 1e-6]))
def test_bloom_never_false_negative(keys, fpr):
    s = BloomSketch.from_fpr(max(len(keys), 16), fpr)
    s.update(pd.Series(keys))
    assert s.contains(pd.Series(keys)).all()


@settings(max_examples=30, deadline=None)
@given(keys=keys, n_shards=st.integers(2, 6), seed=st.integers(0, 2**31))
def test_bloom_sharded_merge_equals_single(keys, n_shards, seed):
    """Arbitrary sharding + arbitrary merge order ≡ single-filter build
    (canonical dense form)."""
    single = BloomSketch.from_fpr(512, 1e-4)
    single.update(pd.Series(keys))

    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_shards, len(keys))
    blobs = []
    for g in range(n_shards):
        part = [k for k, a in zip(keys, assign) if a == g]
        sh = BloomSketch.from_fpr(512, 1e-4)
        if part:
            sh.update(pd.Series(part))
        blobs.append(sh.to_bytes())
    order = rng.permutation(n_shards)
    acc = sketch_from_bytes(blobs[order[0]])
    for i in order[1:]:
        acc.merge(sketch_from_bytes(blobs[i]))
    assert acc.densify().words.tobytes() == single.densify().words.tobytes()
    assert acc.n_inserted == single.n_inserted


@settings(max_examples=30, deadline=None)
@given(keys=keys)
def test_bloom_roundtrip_preserves_semantics(keys):
    s = BloomSketch.from_fpr(max(len(keys), 16), 1e-4)
    s.update(pd.Series(keys))
    blob = s.to_bytes()
    back = sketch_from_bytes(blob)
    # byte equality checked BEFORE probing: contains() densifies, which
    # legitimately changes the transport encoding
    assert back.to_bytes() == blob
    assert back.contains(pd.Series(keys)).all()


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(st.integers(0, 500), min_size=1, max_size=500),
    seed=st.integers(0, 2**31),
)
def test_cms_overestimates_only_and_merge_commutes(vals, seed):
    series = pd.Series([f"k{v}" for v in vals])
    exact = series.value_counts()
    one = CountMinSketch(1 << 12, 4)
    one.update(series)
    est = one.query(pd.Series(exact.index))
    assert (est >= exact.to_numpy()).all()  # CMS never underestimates

    rng = np.random.default_rng(seed)
    assign = rng.integers(0, 3, len(series))
    parts = []
    for g in range(3):
        c = CountMinSketch(1 << 12, 4)
        sub = series[assign == g]
        if len(sub):
            c.update(sub)
        parts.append(c)
    ab = sketch_from_bytes(parts[0].to_bytes()).merge(parts[1]).merge(parts[2])
    ba = sketch_from_bytes(parts[2].to_bytes()).merge(parts[0]).merge(parts[1])
    assert ab.to_bytes() == ba.to_bytes()
    assert ab.to_bytes() == one.to_bytes()  # +-merge is exact


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(100, 3000),
    n_shards=st.integers(2, 5),
    seed=st.integers(0, 2**31),
)
def test_hll_merge_order_invariant_and_bounded(n, n_shards, seed):
    vals = pd.Series([f"user-{i}" for i in range(n)])
    single = HyperLogLog(12)
    single.update(vals)

    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_shards, n)
    blobs = []
    for g in range(n_shards):
        h = HyperLogLog(12)
        sub = vals[assign == g]
        if len(sub):
            h.update(sub)
        blobs.append(h.to_bytes())
    order = rng.permutation(n_shards)
    acc = sketch_from_bytes(blobs[order[0]])
    for i in order[1:]:
        acc.merge(sketch_from_bytes(blobs[i]))
    # register-max merge: sharded build == single build, bit for bit
    assert acc.to_bytes() == single.to_bytes()
    # published bound: ~1.04/sqrt(2^p), generous 5x slack for small n
    assert abs(acc.estimate() - n) / n < 5 * 1.04 / np.sqrt(2**12)


# --------------------------------------------------------------- parse_size
@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(0, 10**9),
    unit=st.sampled_from(["", "K", "M", "G", "T", "KiB", "MiB", "GiB"]),
    case=st.sampled_from([str.lower, str.upper, lambda s: s]),
    suffix=st.sampled_from(["", "b", "B"]),
    pad=st.sampled_from(["", " ", "  "]),
)
def test_parse_size_units_property(n, unit, case, suffix, pad):
    from bloom_spark.config import parse_size

    mult = {"": 1, "K": 10**3, "M": 10**6, "G": 10**9, "T": 10**12,
            "KiB": 2**10, "MiB": 2**20, "GiB": 2**30}[unit]
    if unit.endswith("iB") and suffix:
        return  # "KiBb" is not a unit
    u = case(unit)
    if unit.endswith("iB"):
        s = f"{n}{pad}{u}"
    else:
        s = f"{n}{pad}{u}{suffix}"
    assert parse_size(s) == n * mult


@settings(max_examples=25, deadline=None)
@given(
    keys=st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=200),
    n_shards=st.integers(2, 5),
    seed=st.integers(0, 2**31),
)
def test_xxh_table_sharded_merge_never_false_negative(keys, n_shards, seed):
    """Any sharding + serde round-trips + merges of fingerprint-table
    segments keep every attempted key answering True (the round-2
    true-base replay contract)."""
    from bloom_spark.sketch import XXHFingerprintTable

    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_shards, len(keys))
    segs = []
    for g in range(n_shards):
        t = XXHFingerprintTable(1 << 12)  # small → realistic contention
        shard = [k for k, a in zip(keys, assign) if a == g]
        if shard:
            t.update(pd.Series(shard))
        segs.append(sketch_from_bytes(t.to_bytes()))
    merged = segs[0]
    for t in segs[1:]:
        merged = merged.merge(t)
    back = sketch_from_bytes(merged.to_bytes())
    assert back.contains(pd.Series(keys)).all()
