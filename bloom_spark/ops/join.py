"""Sketch-accelerated joins — Bloom pre-filtering of the probe side.

The reference's filter workflow (build a ``.blf`` over stream A, then
anti/semi-filter stream B against it — SURVEY.md §3.2, reference
``main.rs:281`` ``-i`` semi mode) generalizes to JOINS: distill the
build side's join keys into a fixed-size Bloom filter and kill
probe-side rows that cannot possibly match BEFORE the join's shuffle.

Why this matters at 100 TB: a big-big join shuffles BOTH sides on the
key. When the build side is selective (e.g. a filtered dimension or
yesterday's-crawl key set), most probe rows match nothing — yet a plain
join still pays full shuffle write + network for them. A Bloom
pre-filter removes ``(1 - selectivity - fpr)`` of the probe side at
scan time, for a fixed-size artifact that broadcasts (in-memory
sketch) or memory-maps per worker (saved filter file / sharded
artifact — ``ops.sharded``), independent of probe-side size.

Spark's AQE has a runtime row-level bloom-join for a single query; this
operator makes the same idea a PERSISTENT, cross-job primitive: build
once, save the filter, pre-filter every downstream join against the
same key set (the reference's build-once/probe-many EP-B/EP-C shape).

Exactness: a Bloom filter has zero false negatives, so no matching row
is ever dropped. False positives merely pass extra rows into the real
join, which discards them — results are EXACT for every supported join
type; ``fpr`` only tunes how much probe-side reduction you get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_spark.ops.build import build_sketch
from bloom_spark.ops.dedup import IS_DUP_COL, mark_members
from bloom_spark.sketch import BloomSketch, Sketch

_SUPPORTED = {"inner", "left_semi", "left_anti", "left_outer"}


def bloom_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    fpr: float = 1e-6,
    expected_n: int | None = None,
    sketch: Sketch | str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Join ``left`` with ``right`` on equi-key ``on``, Bloom-pre-filtering
    the LEFT (probe) side against the RIGHT (build) side's keys.

    ``sketch`` — reuse a prebuilt filter: an in-memory Sketch, a saved
    filter-file path (mmap per worker), or a sharded-artifact directory
    (``ops.sharded``). ``None`` builds one from ``right[on]`` here
    (one pass over the build side, tree-merged — ``ops.build``).

    Plan shape: probe-side scan → JVM xxhash64 → vectorized membership
    probe (Arrow batches, no shuffle) → the real join runs only on
    surviving rows. The join itself is whatever Catalyst picks
    (broadcast if the build side is small enough, else sort-merge on
    the reduced input); non-members never reach the exchange.

    - ``inner`` / ``left_semi``: non-members cannot match → drop them,
      join the survivors. Exact.
    - ``left_anti``: non-members are DEFINITE anti-rows (zero false
      negatives) and skip the join entirely; only maybe-members pay the
      anti join. Exact, and the shuffle shrinks to ~selectivity+fpr of
      the probe side.
    - ``left_outer``: maybe-members take the real outer join;
      non-members are null-extended against an empty build side (a
      broadcast of 0 rows — schema-correct null padding with no data
      movement). Exact.
    """
    if how not in _SUPPORTED:
        raise ValueError(
            f"bloom_join supports {sorted(_SUPPORTED)}, got {how!r}; "
            "for right/full joins swap the sides or fall back to df.join"
        )
    if sketch is None:
        if expected_n is None:
            # one cheap pass; at cluster scale callers pass expected_n
            # (or a prebuilt artifact) to keep this single-pass
            expected_n = max(right.count(), 1)
        sketch, _ = build_sketch(
            right,
            on,
            lambda: BloomSketch.from_fpr(expected_n, fpr),
            num_partitions=num_partitions,
        )

    marked = mark_members(spark, left, on, sketch)
    maybe = marked.where(F.col(IS_DUP_COL)).drop(IS_DUP_COL)
    misses = marked.where(~F.col(IS_DUP_COL)).drop(IS_DUP_COL)

    if how in ("inner", "left_semi"):
        return maybe.join(right, on, how)
    if how == "left_anti":
        return misses.unionByName(maybe.join(right, on, "left_anti"))
    # left_outer: null-extend definite misses against an empty (hence
    # broadcast, shuffle-free) build side so their schema matches
    matched = maybe.join(right, on, "left_outer")
    padded = misses.join(F.broadcast(right.limit(0)), on, "left_outer")
    return matched.unionByName(padded)
