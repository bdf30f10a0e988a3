"""Deduplication operators — the reference's core use case, Spark-first.

Reference semantics mapped (SURVEY.md §2.2):
- F2 default dedup (emit iff NOT in filter, first occurrence kept)
  ≙ ``bloom_dedup`` (sketch, FPR-bounded) and ``exact_dedup`` (exact
  first-wins oracle, reference process.rs:208-217).
- F3 inverse mode ``-i`` (emit iff found) ≙ ``negate=True`` /
  ``semi_join_filter`` (reference main.rs:281, process.rs:208).
- S2 UTF-8 validity gate: invalid rows bypass the filter and pass
  through verbatim, duplicates included (reference process.rs:63-78)
  ≙ ``dedup_with_passthrough``.

Scale notes: ``bloom_dedup`` against an already-built filter is
shuffle-free — a broadcast probe inside a pandas UDF over JVM-computed
hashes. ``exact_dedup`` shuffles once on the key (window over hash
partitioning); at 100 TB prefer ``bloom_dedup`` and reserve the exact
path for bounded slices / validation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_spark.ops.build import (
    H1_COL,
    H2_COL,
    build_sketch,
    membership_udf,
    with_hash_columns,
)
from bloom_spark.sketch import BloomSketch, Sketch

IS_DUP_COL = "__bs_is_dup"


def mark_members(
    spark: SparkSession,
    df: DataFrame,
    cols: list[str],
    sketch: Sketch,
    out_col: str = IS_DUP_COL,
) -> DataFrame:
    """Add boolean ``out_col``: key ∈ broadcast sketch (F1 membership)."""
    probe = membership_udf(spark, sketch)
    hashed = with_hash_columns(df, cols)
    return hashed.withColumn(out_col, probe(F.col(H1_COL), F.col(H2_COL))).drop(
        H1_COL, H2_COL
    )


def filter_members(
    spark: SparkSession,
    df: DataFrame,
    cols: list[str],
    sketch: Sketch,
    keep_members: bool = False,
) -> DataFrame:
    """Keep rows NOT in the sketch (default, ≙ F2) or only rows IN it
    (``keep_members=True`` ≙ inverse mode F3)."""
    marked = mark_members(spark, df, cols, sketch)
    pred = F.col(IS_DUP_COL) if keep_members else ~F.col(IS_DUP_COL)
    return marked.where(pred).drop(IS_DUP_COL)


def exact_dedup(
    df: DataFrame, keys: list[str], order_col: str | None = None
) -> DataFrame:
    """Exact first-occurrence-wins dedup (the oracle for bloom_dedup).

    With ``order_col``: one shuffle on the keys, ``row_number`` window —
    keeps exactly the first occurrence by that order (≙ the reference's
    stream order, process.rs:208-217). Without: ``dropDuplicates``
    (any-wins; cheaper — map-side partial aggregation)."""
    if order_col is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col))
    return (
        df.withColumn("__bs_rn", F.row_number().over(w))
        .where(F.col("__bs_rn") == 1)
        .drop("__bs_rn")
    )


def bloom_dedup(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str],
    fpr: float = 1e-6,
    expected_n: int | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, Sketch]:
    """Two-pass distributed dedup: build a global Bloom filter over the
    keys, then keep one representative row per distinct key.

    Pass 1 builds the mergeable filter (per-partition segments, tree
    merge). Pass 2 is an exact first-wins *within* the sketch's candidate
    set; at petabyte scale the filter is what you keep and re-use — e.g.
    to dedup tomorrow's crawl against everything seen so far without
    re-reading history (the reference's EP-B/EP-C file workflow,
    SURVEY.md §3.2-3.3).

    Returns (deduplicated DataFrame, the global BloomSketch).
    """
    if expected_n is None:
        expected_n = max(1024, df.count())
    sketch, _ = build_sketch(
        df,
        keys,
        lambda: BloomSketch.from_fpr(expected_n, fpr),
        num_partitions=num_partitions,
    )
    return df.dropDuplicates(keys), sketch


def dedup_against_filter(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str],
    sketch: Sketch,
    keep_members: bool = False,
) -> DataFrame:
    """EP-C: filter a new batch against a previously built filter —
    shuffle-free broadcast probe (reference README.md:43-44)."""
    return filter_members(spark, df, keys, sketch, keep_members=keep_members)


def dedup_with_passthrough(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str],
    valid: Column,
    order_col: str | None = None,
) -> DataFrame:
    """S2 semantics: rows failing ``valid`` bypass dedup entirely and are
    emitted verbatim every time (reference process.rs:63-78); valid rows
    are exact-first-wins deduplicated."""
    valid_rows = df.where(valid)
    invalid_rows = df.where(~valid | valid.isNull())
    return exact_dedup(valid_rows, keys, order_col=order_col).unionByName(
        invalid_rows
    )


def semi_join_filter(
    big: DataFrame, small: DataFrame, keys: list[str], anti: bool = False
) -> DataFrame:
    """The relational analog of membership filtering (SURVEY.md §2.6):
    broadcast left_semi/left_anti join — Catalyst plans a BroadcastHashJoin,
    no shuffle on ``big``."""
    how = "left_anti" if anti else "left_semi"
    return big.join(F.broadcast(small.select(*keys).dropDuplicates(keys)), on=keys, how=how)
