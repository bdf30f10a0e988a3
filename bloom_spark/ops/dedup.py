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

Scale notes: ``bloom_dedup`` is a single pass — one shuffle on the key
hash, then per-partition ``check_and_set`` in bounded (filter-sized)
memory. ``dedup_against_filter`` (probing an already-built filter) is
shuffle-free — a broadcast probe inside a pandas UDF over JVM-computed
hashes. ``exact_dedup`` shuffles once on the key but holds per-key state
(window / hash aggregate); at 100 TB prefer the sketch paths and reserve
the exact path for bounded slices / validation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_spark.ops.build import (
    H1_COL,
    H2_COL,
    membership_udf,
    with_hash_columns,
)
from bloom_spark.sketch import BloomSketch, Sketch

IS_DUP_COL = "__bs_is_dup"


def mark_members(
    spark: SparkSession,
    df: DataFrame,
    cols: list[str],
    sketch: Sketch | str,
    out_col: str = IS_DUP_COL,
) -> DataFrame:
    """Add boolean ``out_col``: key ∈ sketch (F1 membership).

    ``sketch`` is an in-memory Sketch (shipped by broadcast), a PATH to
    a saved filter file on executor-visible storage (memory-mapped per
    worker — zero-copy, no broadcast; the probe path for filters at or
    beyond driver memory), or a sharded-artifact DIRECTORY
    (ops.sharded — per-shard mmap, the 10^12-key artifact shape)."""
    if isinstance(sketch, str):
        from bloom_spark.ops.build import membership_udf_from_path
        from bloom_spark.ops.sharded import is_sharded_artifact, sharded_membership_udf

        if is_sharded_artifact(sketch):
            probe = sharded_membership_udf(sketch)
        else:
            probe = membership_udf_from_path(sketch)
    else:
        probe = membership_udf(spark, sketch)
    hashed = with_hash_columns(df, cols)
    return hashed.withColumn(out_col, probe(F.col(H1_COL), F.col(H2_COL))).drop(
        H1_COL, H2_COL
    )


def filter_members(
    spark: SparkSession,
    df: DataFrame,
    cols: list[str],
    sketch: Sketch | str,
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
    order_col: str | None = None,
) -> DataFrame:
    """Single-pass sketch-routed dedup — the reference's EP-A pipeline
    (stream → ``check_and_set`` → emit if fresh, process.rs:134-180)
    distributed by key co-partitioning.

    Shape: hash the keys JVM-side → ``repartition`` on the key hash (the
    ONE shuffle; same key ⇒ same partition, so duplicates can never
    straddle filters) → per-partition ``BloomSketch.check_and_set`` over
    the Arrow batches → emit rows whose key was not yet seen. With
    ``order_col`` the partition is sorted first (``sortWithinPartitions``
    — no extra shuffle), giving exact first-occurrence-wins in that
    order, ≙ the reference's stream order.

    Memory per task is the filter (m bits for ``expected_n`` keys at
    ``fpr``), NOT the partition's distinct-key set — that is the entire
    point of the sketch vs ``dropDuplicates`` at 10^12 rows. The
    documented cost: a unique key can be falsely "seen" and dropped with
    probability ≤ fpr (the reference CLI drops such lines identically).

    ``expected_n`` is the filter capacity (≙ the reference's NUM in
    ``-bls/-ble``; its no-args default is 200M lines, main.rs:339-342).
    It must be supplied — sizing a Bloom filter needs a capacity, and a
    silent ``df.count()`` here would add a full extra pass over the
    input (flagged in round-1 review).

    Returns the surviving rows only. For the reusable filter artifact
    (EP-B), run :func:`build_sketch` — over these survivors if you want
    it sized to distinct keys — and probe new batches with
    :func:`dedup_against_filter` (EP-C).
    """
    if expected_n is None:
        raise ValueError(
            "bloom_dedup needs expected_n (filter capacity, ≙ the reference "
            "CLI's NUM; its default pipeline uses 200_000_000)"
        )
    hashed = with_hash_columns(df, keys)
    p = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    hashed = hashed.repartition(p, F.col(H1_COL))
    if order_col is not None:
        hashed = hashed.sortWithinPartitions(order_col)
    out_cols = df.columns
    schema = hashed.drop(H1_COL, H2_COL).schema
    # The filter is SHARDED: each partition owns a disjoint key range
    # (hash co-partitioning), so its filter only needs capacity for its
    # share (2x slack for hash imbalance). Total filter memory across
    # the cluster ≈ one global filter; per-task memory = m/p bits. A
    # single global-capacity filter per task would multiply memory by p
    # — the difference between feasible and not at 10^12 keys.
    n_part = max(4096, -(-int(expected_n) // p) * 2)

    def fresh_rows(batches):
        from bloom_spark.hashing import to_uint64

        sketch = BloomSketch.from_fpr(n_part, fpr, limit=expected_n)
        for pdf in batches:
            seen = sketch.check_and_set_hashes(
                to_uint64(pdf[H1_COL]), to_uint64(pdf[H2_COL])
            )
            fresh = pdf.loc[~seen, out_cols]
            if len(fresh):
                yield fresh

    return hashed.mapInPandas(fresh_rows, schema)


def line_dedup(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    id_col: str,
    fpr: float = 1e-9,
    expected_n: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dedup at the reference's ACTUAL record granularity — one text
    LINE (``read_until(b'\\n')``, reference src/bloom/process.rs:44-60;
    its e2e test dedups lines, tests/integration_tests.rs:4-38).

    ``posexplode(split(text, '\\n'))`` JVM-side, then the single-pass
    sketch dedup (:func:`bloom_dedup`) keyed on the line with stream
    order ``struct(id, line_no)`` — first occurrence in document order
    wins, exactly the reference's stdin loop semantics. The struct sort
    key is overflow-free at any id scale (the previous arithmetic
    ``id*lines_per_doc + line_no`` key overflowed int64 for
    id ≥ ~9.2e12 at 1M lines/doc — real at crawl-archive id spaces,
    VERDICT r2 #5). Returns one row per distinct line: (``line``,
    ``line_no``, ``id_col``, plus ``__ord`` the struct
    first-occurrence key (fields ``doc``, ``line``)).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).withColumn(
        "__ord",
        F.struct(F.col(id_col).alias("doc"), F.col("line_no").alias("line")),
    )
    return bloom_dedup(
        spark, lines, ["line"],
        fpr=fpr, expected_n=expected_n,
        num_partitions=num_partitions, order_col="__ord",
    )


def dedup_against_filter(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str],
    sketch: Sketch | str,
    keep_members: bool = False,
) -> DataFrame:
    """EP-C: filter a new batch against a previously built filter —
    shuffle-free probe (broadcast, or memory-mapped when given a saved
    filter path; reference README.md:43-44)."""
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
