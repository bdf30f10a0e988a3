"""Sketch-powered aggregations: heavy hitters + grouped quantiles."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from bloom_spark.ops.aggregates import (
    cms_heavy_hitters,
    grouped_quantiles,
    grouped_value_sketch,
)
from bloom_spark.sketch import KLLSketch, TDigest
from bloom_spark.sketch.base import sketch_from_bytes

SF = "/root/testdata/sf0.01"


def test_heavy_hitters_match_exact_topk(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    got = [
        (r["user_id"], r["cnt"])
        for r in cms_heavy_hitters(spark, events, "user_id", k=10).collect()
    ]
    exact = (
        events.groupBy("user_id").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        .limit(10)
        .collect()
    )
    assert got == [(r["user_id"], r["cnt"]) for r in exact]


def test_heavy_hitters_skewed_synthetic(spark):
    """One key carries 50% of rows — it must rank first with its exact
    count (CMS width ≫ distinct keys)."""
    df = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 500))
        .alias("key")
    ).repartition(8)
    top = cms_heavy_hitters(spark, df, "key", k=3).collect()
    assert top[0]["key"] == "hot" and top[0]["cnt"] == 10_000


def test_grouped_value_sketch_blobs_merge(spark):
    """Per-group sketches are ordinary envelopes: merging two runs'
    blobs for a group ≍ one sketch over the union."""
    events = spark.read.parquet(f"{SF}/events.parquet")
    a = events.where("event_id % 2 = 0")
    b = events.where("event_id % 2 = 1")
    one = {
        r["group"]: r["sketch"]
        for r in grouped_value_sketch(
            events, "event_type", "value", lambda: TDigest(200)
        ).collect()
    }
    ga = grouped_value_sketch(a, "event_type", "value", lambda: TDigest(200)).collect()
    gb = {
        r["group"]: r["sketch"]
        for r in grouped_value_sketch(
            b, "event_type", "value", lambda: TDigest(200)
        ).collect()
    }
    for r in ga:
        merged = sketch_from_bytes(bytes(r["sketch"])).merge(
            sketch_from_bytes(bytes(gb[r["group"]]))
        )
        full = sketch_from_bytes(bytes(one[r["group"]]))
        m50 = float(merged.quantile(np.array([0.5]))[0])
        f50 = float(full.quantile(np.array([0.5]))[0])
        assert abs(m50 - f50) <= 0.05 * max(abs(f50), 1.0)


def test_grouped_quantiles_within_rank_bound(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = grouped_quantiles(
        spark, events, "event_type", "value", [0.25, 0.5, 0.75],
        lambda: KLLSketch(200),
    ).collect()
    eps = 3 * KLLSketch(200).rank_error()
    for r in out:
        g, q, est = r["group"], r["q"], r["value"]
        n = events.where(F.col("event_type") == g).count()
        rank = (
            events.where(
                (F.col("event_type") == g) & (F.col("value") <= est)
            ).count()
            / n
        )
        assert abs(rank - q) <= eps, (g, q, rank)
