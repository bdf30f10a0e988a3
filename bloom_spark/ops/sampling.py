"""Deterministic distributed sampling — bottom-k (min-hash) sketches.

A training-data pipeline constantly needs reproducible samples: "5k
docs per language for eval", "1% of each host for inspection". Naive
``ORDER BY rand() LIMIT k`` is non-deterministic, not mergeable, and a
global sort. The bottom-k sketch fixes all three: rank every row by a
DETERMINISTIC hash of its identity and keep the k smallest ranks per
group. Because ``bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))``,
the sample is a mergeable sketch in exactly the sense of the library's
Bloom/HLL/KLL family — per-partition partials combine associatively,
so it distributes with ONE shuffle whose volume is bounded by
``P · groups · k`` rows, not the table size.

The same property makes samples STABLE under re-partitioning, retries,
and incremental appends (a new batch can only displace old members by
hash order — Broder's min-wise sampling argument, the MinHash
foundation already used by ``ops.neardup``), and CONSISTENT across
tables: two tables sampled by the same key hash keep matching keys,
so samples stay join-able.

Scale shape: a pandas ``mapInPandas`` pre-trim keeps only the k
smallest ranks per group within each input partition (the partial
sketch — provably a superset of every group's global bottom-k), then
one window ranks the ≤ P·G·k survivors. The unavoidable shuffle moves
the trimmed candidates only.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RANK_COL = "__bs_rank"


def hash_rank(cols: list[str]) -> Column:
    """Production rank: xxhash64 over the identity columns (JVM-side,
    whole-stage codegen). Any deterministic int64 expression works —
    oracle replays pass an arithmetic rank instead (DuckDB has no
    xxhash64)."""
    return F.xxhash64(*[F.col(c) for c in cols])


def bottom_k_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    rank: Column | None = None,
    id_cols: list[str] | None = None,
    pre_trim: bool = True,
    rank_cast: str = "long",
) -> DataFrame:
    """Keep the ``k`` rows with the smallest rank per group — a
    deterministic, mergeable, join-consistent per-group sample.

    ``rank`` — deterministic ordering expression (default:
    ``hash_rank(id_cols)``). ``id_cols`` also break rank ties so the
    result is unique regardless of physical row order.

    ``pre_trim`` — per-partition bottom-k partial sketch before the
    shuffle (the map-side combine). Correct because a row outside its
    partition's per-group bottom-k has ≥ k smaller-ranked rows in that
    group already, so it cannot be in the global bottom-k. Trim cost is
    a vectorized pandas sort per Arrow batch; shuffle volume drops from
    n rows to ≤ partitions · groups · k.

    A caller-supplied ``rank`` needs ``id_cols`` too: both the pre-trim
    head(k) and the final row_number break rank TIES by physical row
    order, so without a tiebreaker the sample composition would vary
    across runs/partitionings despite the stability contract (ADVICE
    r4). Pass ``id_cols=[]`` explicitly to assert the rank is tie-free.
    """
    if rank is None:
        if not id_cols:
            raise ValueError("need rank= or id_cols= for a deterministic sample")
        rank = hash_rank(id_cols)
    elif id_cols is None:
        raise ValueError(
            "bottom_k_sample with a caller-supplied rank needs id_cols= to "
            "break rank ties deterministically (pass id_cols=[] only if "
            "the rank is provably tie-free)"
        )
    tie = [F.col(c) for c in (id_cols or [])]
    # rank_cast="double" for real-valued ranks (weighted sampling);
    # the default long keeps hash ranks bit-exact
    ranked = df.withColumn(RANK_COL, rank.cast(rank_cast))

    if pre_trim:
        schema = ranked.schema
        gcols = list(group_cols)
        sort_cols = [RANK_COL] + (id_cols or [])

        def trim(batches: Iterator) -> Iterator:
            import pandas as pd

            # fold batch-by-batch so worker memory is O(batch + groups·k),
            # never the whole partition: carry the running per-group
            # bottom-k and re-trim as each Arrow batch arrives
            carry = None
            for b in batches:
                cur = (
                    b
                    if carry is None
                    else pd.concat([carry, b], ignore_index=True)
                )
                cur = cur.sort_values(sort_cols, kind="mergesort")
                # dropna=False: Spark's window partitionBy treats NULL as
                # a group; pandas' default would silently drop every
                # null-keyed row from the partial and the final sample
                carry = cur.groupby(gcols, sort=False, dropna=False).head(k)
            if carry is not None:
                yield carry

        ranked = ranked.mapInPandas(trim, schema)

    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col(RANK_COL), *tie
    )
    return (
        ranked.withColumn("__bs_rn", F.row_number().over(w))
        .where(F.col("__bs_rn") <= k)
        .drop("__bs_rn", RANK_COL)
    )


def uniform01(cols: list[str]) -> Column:
    """Deterministic uniform in (0, 1) from the identity hash: the low
    53 bits of xxhash64 (exact in a double), offset by 0.5 so the value
    is never exactly 0 (whose -ln would be inf)."""
    mask = (1 << 53) - 1
    return F.expr(
        f"((xxhash64({', '.join(cols)}) & {mask}) + 0.5d) / {float(1 << 53)}d"
    )


def weighted_bottom_k_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    weight_col: str,
    u: Column | None = None,
    id_cols: list[str] | None = None,
    pre_trim: bool = True,
) -> DataFrame:
    """Weighted sample WITHOUT replacement, k per group, deterministic
    and mergeable — Efraimidis & Spirakis 2006 (public): give each row
    the key ``-ln(u)/w`` for a uniform ``u`` in (0,1) and keep the k
    SMALLEST keys; the selection distribution equals sequential
    weighted draws without replacement. With ``u`` a deterministic hash
    of the row identity (:func:`uniform01`) the sample inherits every
    bottom-k property: stable under repartition/retries, mergeable
    (``bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))`` holds for
    any fixed per-row key), incremental-append friendly.

    Rows with NULL or non-positive weight never enter the sample (their
    key is +inf semantically; implemented by filtering — the reference
    distribution is undefined there). Use ``weight_col`` = a quality
    score to oversample high-quality docs, document length for
    char-budget sampling, etc.
    """
    if u is None:
        if not id_cols:
            raise ValueError(
                "need u= or id_cols= for a deterministic weighted sample"
            )
        u = uniform01(id_cols)
    w = F.col(weight_col).cast("double")
    key = -F.log(u) / w
    return bottom_k_sample(
        df.where(w.isNotNull() & (w > 0)),
        group_cols,
        k,
        rank=key,
        id_cols=id_cols,
        pre_trim=pre_trim,
        rank_cast="double",
    )
