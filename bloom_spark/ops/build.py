"""Distributed sketch build: per-partition segments → tree merge.

The Spark realization of the reference's single-threaded build loop
(reference: src/bloom/process.rs:42-79): each executor streams Arrow
batches of *precomputed JVM hashes* through ``mapInPandas``, folds them
into one sketch segment per partition, and emits the segment as a binary
blob row. Segments are then merged associatively — ``treeAggregate`` over
blobs (depth log(P)), so no task ever holds more than two blobs.

Scale notes (the parts that matter at 10^12 rows / 1000 executors):
- hashing happens JVM-side (``F.xxhash64``) inside whole-stage codegen;
  Python sees two int64 columns only → the Arrow transfer is 16 B/row
  regardless of how wide the input text is.
- ``select`` before ``mapInPandas`` prunes every other column at the
  parquet scan (check ``ReadSchema`` in ``.explain``).
- one segment per input partition; skewed inputs should be salted first
  (``salted_repartition``) so no segment saturates (≙ the reference's
  ``is_full`` cap, process.rs:107-130).
"""

from __future__ import annotations

import uuid
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_spark.hashing import to_uint64
from bloom_spark.sketch.base import Sketch, sketch_from_bytes

H1_COL = "__bs_h1"
H2_COL = "__bs_h2"

# Second-hash domain separator: prefixing a literal changes every xxhash64
# state transition, giving an (empirically) independent family member.
_H2_SALT = "bloomspark/h2"

SEGMENT_SCHEMA = "segment_id long, n_rows long, sketch binary"


def with_hash_columns(
    df: DataFrame, cols: list[str], h1: str = H1_COL, h2: str = H2_COL
) -> DataFrame:
    """Add the (h1, h2) int64 hash columns, computed JVM-side.

    Multi-column keys hash the column tuple (xxhash64 chains its inputs).
    """
    cs = [F.col(c) for c in cols]
    return df.withColumn(h1, F.xxhash64(*cs)).withColumn(
        h2, F.xxhash64(F.lit(_H2_SALT), *cs)
    )


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, salts: int = 8,
    unique_col: str | None = None,
) -> DataFrame:
    """Spread a skewed key over ``salts`` sub-keys before a build/agg.

    ≙ SURVEY.md §4 skew handling: composing the partition key with a
    ROW-dependent salt caps any single key's share of a partition at
    ~1/salts. (The salt must not be a function of the key alone — that
    maps every row of the hot key to the same (key, salt) pair and
    changes nothing; caught by TestSkewHandling.)

    The salt must also be DETERMINISTIC under task retry: repartitioning
    on a nondeterministic column (rand(), monotonically_increasing_id())
    can drop or duplicate rows when Spark recomputes a subset of map
    tasks after a fetch failure — silent row loss in a Bloom build would
    break the zero-false-negative contract at cluster scale. The salt is
    therefore a hash of ``unique_col`` when given (e.g. a row id /
    url), else of the full row; rows that are bit-identical across every
    column share a salt, which is harmless for dedup workloads (they are
    duplicates) but means callers with massive exact-duplicate payloads
    should pass a ``unique_col``.
    """
    salt_src = [F.col(unique_col)] if unique_col else [F.col(c) for c in df.columns]
    salt = F.pmod(F.xxhash64(F.lit("salt"), *salt_src), F.lit(salts))
    return df.repartition(num_partitions, F.col(key), salt)


def _build_segments_map(
    factory: Callable[[], Sketch], feed: Callable[[Sketch, pd.DataFrame], int]
):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketch = factory()
        n = 0
        for pdf in batches:
            n += feed(sketch, pdf)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        yield pd.DataFrame(
            {
                "segment_id": [pid],
                "n_rows": [n],
                "sketch": [sketch.to_bytes()],
            }
        )

    return fn


def _feed_hashes(sketch: Sketch, pdf: pd.DataFrame) -> int:
    sketch.update_hashes(to_uint64(pdf[H1_COL]), to_uint64(pdf[H2_COL]))
    return len(pdf)


def _feed_hashes_weighted(sketch, pdf: pd.DataFrame) -> int:
    counts = pdf["__bs_weight"].to_numpy(dtype=np.int64)
    sketch.update_hashes(to_uint64(pdf[H1_COL]), to_uint64(pdf[H2_COL]), counts)
    return len(pdf)


def _feed_values(sketch: Sketch, pdf: pd.DataFrame) -> int:
    sketch.update_values(pdf["__bs_value"].to_numpy(dtype=np.float64))
    return len(pdf)


def build_segments(
    df: DataFrame,
    cols: list[str],
    factory: Callable[[], Sketch],
    value_col: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """DataFrame of per-partition sketch segments (SEGMENT_SCHEMA).

    ``cols`` — key columns for hash sketches (bloom/hll/cms/xxhtab);
    ``value_col`` — numeric column for value sketches (kll/tdigest);
    ``weight_col`` — optional count column (CMS weighted updates).
    """
    if value_col is not None:
        src = df.select(F.col(value_col).cast("double").alias("__bs_value")).where(
            F.col("__bs_value").isNotNull()
        )
        feed = _feed_values
    elif weight_col is not None:
        src = with_hash_columns(df, cols).select(
            H1_COL, H2_COL, F.col(weight_col).cast("long").alias("__bs_weight")
        )
        feed = _feed_hashes_weighted
    else:
        src = with_hash_columns(df, cols).select(H1_COL, H2_COL)
        feed = _feed_hashes
    return src.mapInPandas(_build_segments_map(factory, feed), SEGMENT_SCHEMA)


def merge_segments(
    segments: DataFrame, depth: int = 2, n_segments: int | None = None
) -> tuple[Sketch, int]:
    """Tree-reduce segment blobs → (global sketch, total rows consumed).

    ``treeAggregate`` over the blobs: partition-level folds, then
    log-depth executor-side combining; the driver folds only the last
    ``~P^(1/depth)`` partials (≙ the reference's container chain
    collapsed by OR — SURVEY.md §2.3 T4). With sparse segments the
    combiner tasks perform the k-fold bit expansion in parallel.
    The tree depth is chosen so the driver's final single-threaded fold
    pulls only ~4 partials (treeAggregate's per-level fan-in is
    ``P^(1/depth)``): with a 10^9-key filter a dense partial is >100 MB,
    and unpickling ~P^(1/2) of them on the driver was measured as THE
    serial Amdahl term of the whole build (pull of 11×134 MB ≈ half the
    merge wall time at 50M rows). Extra tree levels run as parallel
    executor tasks instead. (An applyInPandas groupBy fan-in was
    benchmarked ~3x slower still — shuffling dense intermediate blobs
    through a full exchange costs more than the treeAggregate path.)
    """
    import math

    if n_segments is None:
        # known without running a job: one segment row per input partition
        n_segments = segments.rdd.getNumPartitions()
    if n_segments and n_segments > 16:
        depth = max(depth, math.ceil(math.log(n_segments, 4)))

    def seq(acc, row):
        s = sketch_from_bytes(bytes(row.sketch))
        n = int(row.n_rows)
        if acc is None:
            return (s, n)
        return (acc[0].merge(s), acc[1] + n)

    def comb(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return (a[0].merge(b[0]), a[1] + b[1])

    out = segments.rdd.treeAggregate(None, seq, comb, depth=depth)
    if out is None:
        raise ValueError("no segments to merge (empty input)")
    return out


def build_sketch(
    df: DataFrame,
    cols: list[str],
    factory: Callable[[], Sketch],
    value_col: str | None = None,
    weight_col: str | None = None,
    num_partitions: int | None = None,
    salt_key: str | None = None,
) -> tuple[Sketch, int]:
    """End-to-end: hash → per-partition segments → tree merge → one sketch."""
    if salt_key is not None and num_partitions is not None:
        df = salted_repartition(df, salt_key, num_partitions)
    elif num_partitions is not None:
        df = df.repartition(num_partitions)
    segs = build_segments(df, cols, factory, value_col=value_col, weight_col=weight_col)
    # one segment row per input partition — known without running a job
    return merge_segments(segs, n_segments=df.rdd.getNumPartitions())


# ----------------------------------------------------------------- broadcast probe

_WORKER_SKETCH_CACHE: dict = {}


def _cache_put(cache: dict, key, value, cap: int = 8) -> None:
    """Insert with FIFO eviction: per-call broadcast tokens are fresh
    keys no later call can hit, so an unbounded dict would leak one
    deserialized sketch per probe-UDF construction in every worker for
    the session's lifetime (r3 review)."""
    cache[key] = value
    while len(cache) > cap:
        cache.pop(next(iter(cache)))


def membership_udf(spark: SparkSession, sketch: Sketch):
    """A pandas UDF ``(h1, h2) -> bool`` probing a broadcast global sketch.

    The serialized sketch ships once per executor (Spark broadcast);
    deserialization is cached per worker process keyed by a fresh token,
    so each Arrow batch pays numpy probe cost only.
    """
    token = uuid.uuid4().hex
    blob_bc = spark.sparkContext.broadcast(sketch.to_bytes())

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        s = _WORKER_SKETCH_CACHE.get(token)
        if s is None:
            s = sketch_from_bytes(blob_bc.value)
            _cache_put(_WORKER_SKETCH_CACHE, token, s)
        res = s.contains_hashes(to_uint64(h1), to_uint64(h2))
        return pd.Series(res)

    return probe


def membership_udf_from_path(path: str):
    """A pandas UDF ``(h1, h2) -> bool`` probing a filter FILE via
    ``np.memmap`` — the sharedstorage probe path.

    vs the broadcast variant: no driver→JVM transfer of the blob, no
    per-worker private copy — each worker memory-maps the file
    (zero-copy deserialization, Sketch.from_bytes on the mapped buffer)
    and the OS page cache shares one physical copy across every worker
    on the host. This is also how a cluster probes a filter bigger than
    driver memory: the artifact lives on shared storage (the
    SketchCheckpoint ``sketches/`` dir), executors map what they touch.
    ``path`` must be visible to every executor (shared FS / mount).
    """

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        import os

        # key by (path, mtime, size): a filter REWRITTEN at the same
        # path in a long session must be re-mapped, not probed stale
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
        s = _WORKER_SKETCH_CACHE.get(key)
        if s is None:
            for k in [
                k for k in _WORKER_SKETCH_CACHE
                if isinstance(k, tuple) and k[0] == path
            ]:
                del _WORKER_SKETCH_CACHE[k]
            buf = np.memmap(path, dtype=np.uint8, mode="r")
            s = sketch_from_bytes(buf)
            _cache_put(_WORKER_SKETCH_CACHE, key, s)
        res = s.contains_hashes(to_uint64(h1), to_uint64(h2))
        return pd.Series(res)

    return probe
