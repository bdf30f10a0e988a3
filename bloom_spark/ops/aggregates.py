"""Sketch-powered aggregations beyond plain membership.

Two canonical applications of the north-rule sketch family
(BASELINE.json: "HLL, count-min, t-digest, KLL, Bloom ... as mergeable
UDAFs"):

- **Heavy hitters** (count-min's textbook use): find the k most
  frequent keys without shuffling every distinct key. Candidates come
  from per-partition local top-m lists (a global heavy hitter is
  necessarily a local heavy hitter in at least one partition for any
  m ≥ k under hash partitioning of rows — the standard SpaceSaving-style
  argument; m defaults to a generous multiple of k), frequencies from
  one distributed CMS build. Only P·m candidate rows ever leave the
  executors.

- **Grouped value sketches** (the per-group UDAF shape): one KLL or
  t-digest per group via ``applyInPandas`` — the distributed analog of
  ``SELECT group, percentile(value, q) GROUP BY group`` in bounded
  memory per group, with mergeable per-group state (re-aggregatable
  across days/runs by sketch merge rather than re-reading raw data).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_spark.hashing import to_uint64
from bloom_spark.ops.build import H1_COL, H2_COL, build_sketch, with_hash_columns
from bloom_spark.sketch import CountMinSketch, Sketch
from bloom_spark.sketch.base import sketch_from_bytes


def cms_heavy_hitters(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    k: int,
    width: int = 1 << 16,
    depth: int = 5,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """Top-``k`` keys by (CMS-estimated) frequency.

    Pass 1: distributed CMS build (per-partition segments, tree merge).
    Pass 2: per-partition exact local counts, each partition emits its
    top-``candidates_per_partition`` keys only (mapInPandas — no
    all-distinct-keys shuffle); the union is the candidate set.
    Frequencies for candidates are read from the CMS (point queries,
    upper-bound estimates, exact when width ≫ #distinct keys) and the
    global top-k is cut with a deterministic (cnt desc, key asc) order.

    Returns a DataFrame (``key_col``, ``cnt``) of ≤ k rows.
    """
    m = candidates_per_partition or max(4 * k, 64)
    cms, _ = build_sketch(df, [key_col], lambda: CountMinSketch(width, depth))

    # candidates keep the key's ORIGINAL Spark type: the CMS point query
    # re-hashes them with the same xxhash64 the build used, and
    # xxhash64(long) ≠ xxhash64(string-of-long)
    src = df.select(key_col)
    key_schema = src.schema

    def local_top(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        if top:
            yield pd.DataFrame({key_col: [t[0] for t in top]})

    cand = src.mapInPandas(local_top, key_schema).distinct()
    cand_keys = with_hash_columns(cand, [key_col]).toPandas()
    out_schema = f"{key_col} {key_schema[0].dataType.simpleString()}, cnt long"
    if len(cand_keys) == 0:
        return spark.createDataFrame([], out_schema)
    est = cms.query_hashes(
        to_uint64(cand_keys[H1_COL]), to_uint64(cand_keys[H2_COL])
    )
    rows = sorted(
        zip(cand_keys[key_col].tolist(), (int(e) for e in est)),
        key=lambda kv: (-kv[1], kv[0]),
    )[:k]
    return spark.createDataFrame(rows, out_schema)


GROUP_SKETCH_SCHEMA = "group string, n_rows long, sketch binary"


def grouped_value_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    factory: Callable[[], Sketch],
) -> DataFrame:
    """One value sketch per group: (group, n_rows, sketch blob).

    ``applyInPandas`` over ``groupBy(group_col)`` — each group's rows
    stream through one Python worker which folds them into a single
    sketch (vectorized ``update_values``). Groups are independent, so
    this scales with #groups across executors; per-group state is the
    sketch (bounded), not the group's rows. The emitted blobs are
    ordinary envelopes: re-aggregate across runs with ``merge``.
    """
    src = df.select(
        F.col(group_col).cast("string").alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    ).where(F.col("__v").isNotNull())

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        s = factory()
        s.update_values(pdf["__v"].to_numpy(dtype="float64"))
        return pd.DataFrame(
            {
                "group": [pdf["__g"].iloc[0]],
                "n_rows": [len(pdf)],
                "sketch": [s.to_bytes()],
            }
        )

    return src.groupBy("__g").applyInPandas(fold, GROUP_SKETCH_SCHEMA)


def grouped_quantiles(
    spark: SparkSession,
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    factory: Callable[[], Sketch],
) -> DataFrame:
    """Per-group quantile estimates: (group, q, value) for each q in
    ``qs``, from one value sketch per group.

    Fully distributed end to end: the per-group sketch rows stay on
    executors and a second ``mapInPandas`` decodes each blob and emits
    its quantile rows — nothing is collected to the driver, so millions
    of groups are fine (the round-1 pattern of collecting blobs to the
    driver would bottleneck there)."""
    qlist = [float(q) for q in qs]
    segs = grouped_value_sketch(df, group_col, value_col, factory)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        qarr = np.asarray(qlist, dtype=np.float64)
        for pdf in batches:
            out = {"group": [], "q": [], "value": []}
            for g, blob in zip(pdf["group"], pdf["sketch"]):
                vals = sketch_from_bytes(bytes(blob)).quantile(qarr)
                out["group"].extend([g] * len(qlist))
                out["q"].extend(qlist)
                out["value"].extend(float(v) for v in vals)
            if out["group"]:
                yield pd.DataFrame(out)

    return segs.mapInPandas(expand, "group string, q double, value double")
