"""Sharded filter artifact: build + probe a global filter as S
independent shard FILES — no driver fold, no single-file write.

Why (VERDICT r2): the single-artifact path (build_sketch →
treeAggregate → driver writes one file) carries a measured serial term
∝ m — the driver's final fold plus the filter materialization (~18 s at
m=2^30, doubling with m) — which capped the filter-job N→4N scaling at
0.679. Sharding deletes the term entirely:

- each key belongs to shard ``pmod(h1, S)``; one exchange routes keys
  so every shard's keys land in exactly one task;
- that task builds the shard filter (sized expected_n/S·2, so TOTAL
  memory ≈ one global filter) and writes ``shard_{s}.sk`` itself —
  builds and writes run in parallel on executors, the driver only
  collects an S-row manifest;
- probes memory-map only the shard file each key routes to: the OS
  page cache shares one physical copy per host, and no single mapping
  exceeds m/S bits — filters far beyond driver (or executor) memory
  stay probeable.

On a cluster, ``out_dir`` is shared storage (the same place the
single-file artifact went); in local mode it is a directory. Writes go
through a temp file + atomic rename so a re-executed task (retry,
speculation) can never leave a torn shard.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from bloom_spark.hashing import to_uint64
from bloom_spark.ops.build import H1_COL, H2_COL, with_hash_columns
from bloom_spark.sketch import BloomSketch
from bloom_spark.sketch.base import sketch_from_bytes

MANIFEST = "manifest.json"

_MANIFEST_SCHEMA = "shard long, n_rows long, n_bytes long"

# build-side accumulation granularity: hashes are buffered to this many
# rows before one argsort + per-shard scatter (one update_hashes call per
# shard per flush). Bounds task memory at FLUSH_ROWS x 16 B regardless of
# partition size; module-level so tests can pin multi-flush behavior.
FLUSH_ROWS = 2_000_000


def shard_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard_{shard:05d}.sk")


def build_sharded_bloom(
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    n_shards: int,
    expected_n: int,
    fpr: float = 1e-6,
) -> dict:
    """Build the sharded artifact; returns (and writes) the manifest.

    One exchange (repartition on the shard id), then every task folds
    its shards' hashes into per-shard BloomSketches and writes them
    directly. Per-shard capacity is ``expected_n/S · 2`` (2x slack for
    hash imbalance — the same sizing the single-pass dedup uses), so
    the union of shards costs ≈ one global filter.
    """
    os.makedirs(out_dir, exist_ok=True)
    flush_rows = FLUSH_ROWS  # captured at call time so tests can pin it
    n_part = max(4096, -(-int(expected_n) // n_shards) * 2)
    # the shard id is NOT materialized as a shuffle column: the exchange
    # partitions on the pmod expression directly (16 B/row on the wire
    # instead of 24) and the worker recomputes it from h1 — bit-identical
    # to the probe side's routing (int64 % positive == pmod)
    hashed = (
        with_hash_columns(df, cols)
        .select(H1_COL, H2_COL)
        .repartition(n_shards, F.pmod(F.col(H1_COL), F.lit(n_shards)))
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[int, BloomSketch] = {}
        counts: dict[int, int] = {}
        # accumulate Arrow batches and flush every FLUSH_ROWS rows: one
        # argsort + one scatter per shard per flush, instead of a pandas
        # groupby + up to n_shards tiny update_hashes calls per 10k-row
        # batch — the 100 TB-safe shape.
        acc1: list[np.ndarray] = []
        acc2: list[np.ndarray] = []
        acc_n = 0

        def flush() -> None:
            nonlocal acc1, acc2, acc_n
            if not acc_n:
                return
            h1 = np.concatenate(acc1)
            h2 = np.concatenate(acc2)
            acc1, acc2, acc_n = [], [], 0
            shards = h1.view(np.int64) % n_shards  # == pmod (int64 % pos ≥ 0)
            order = np.argsort(shards, kind="stable")
            ss = shards[order]
            bounds = np.flatnonzero(np.diff(ss)) + 1
            for seg in np.split(order, bounds):
                s = int(shards[seg[0]])
                sk = sketches.get(s)
                if sk is None:
                    sk = sketches[s] = BloomSketch.from_fpr(n_part, fpr, limit=None)
                    counts[s] = 0
                sk.update_hashes(h1[seg], h2[seg])
                counts[s] += len(seg)

        for pdf in batches:
            if not len(pdf):
                continue
            acc1.append(to_uint64(pdf[H1_COL]))
            acc2.append(to_uint64(pdf[H2_COL]))
            acc_n += len(pdf)
            if acc_n >= flush_rows:
                flush()
        flush()
        rows = {"shard": [], "n_rows": [], "n_bytes": []}
        for s, sk in sketches.items():
            blob = sk.densify().to_bytes()
            tmp = shard_path(out_dir, int(s)) + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, shard_path(out_dir, int(s)))
            rows["shard"].append(int(s))
            rows["n_rows"].append(counts[s])
            rows["n_bytes"].append(len(blob))
        if rows["shard"]:
            yield pd.DataFrame(rows)

    entries = hashed.mapInPandas(build, _MANIFEST_SCHEMA).collect()
    manifest = {
        "n_shards": int(n_shards),
        "fpr": float(fpr),
        "expected_n": int(expected_n),
        "per_shard_capacity": int(n_part),
        "shards": sorted(
            ({"shard": r["shard"], "n_rows": r["n_rows"], "n_bytes": r["n_bytes"]}
             for r in entries),
            key=lambda e: e["shard"],
        ),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


_WORKER_SHARD_CACHE: dict = {}


def sharded_membership_udf(out_dir: str):
    """A pandas UDF ``(h1, h2) -> bool`` probing the sharded artifact.

    Per batch: route each row to ``pmod(h1, S)`` (the build's shard
    function), group rows by shard, probe each touched shard's
    memory-mapped filter. A shard whose file is absent (no keys ever
    routed there) answers False. Worker-cached per (dir, shard).
    """
    with open(os.path.join(out_dir, MANIFEST)) as f:
        n_shards = int(json.load(f)["n_shards"])

    def _shard_cached(s: int):
        """Keyed by (dir, shard, mtime, size): a shard REWRITTEN at the
        same path (artifact rebuilt in the same session) is re-mapped
        instead of probed stale, and a shard that was absent earlier is
        re-checked with a plain stat each batch — never cached as
        permanently absent (r3 review)."""
        path = shard_path(out_dir, s)
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return None  # no keys ever routed here → nothing is a member
        key = (out_dir, s, st.st_mtime_ns, st.st_size)
        sk = _WORKER_SHARD_CACHE.get(key)
        if sk is None:
            for k in [k for k in _WORKER_SHARD_CACHE if k[:2] == (out_dir, s)]:
                del _WORKER_SHARD_CACHE[k]
            buf = np.memmap(path, dtype=np.uint8, mode="r")
            sk = sketch_from_bytes(buf)
            _WORKER_SHARD_CACHE[key] = sk
        return sk

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        n = len(h1)
        out = np.zeros(n, dtype=bool)
        if n == 0:  # empty Arrow batch: np.split would yield one empty
            return pd.Series(out)  # segment and seg[0] would raise
        h1v = h1.to_numpy(dtype=np.int64)
        h2v = to_uint64(h2)
        shards = h1v % n_shards  # == pmod: numpy int64 % positive ≥ 0
        order = np.argsort(shards, kind="stable")
        sorted_shards = shards[order]
        bounds = np.flatnonzero(np.diff(sorted_shards)) + 1
        for seg in np.split(order, bounds):
            sk = _shard_cached(int(shards[seg[0]]))
            if sk is not None:
                out[seg] = sk.contains_hashes(to_uint64(h1v[seg]), h2v[seg])
        return pd.Series(out)

    return probe


def is_sharded_artifact(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, MANIFEST))
