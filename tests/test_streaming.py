"""Structured Streaming sketch builds + streaming dedup (sketch = state)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bloom_spark.ops.checkpoint import SketchCheckpoint
from bloom_spark.sketch import BloomSketch, HyperLogLog
from bloom_spark.streaming.sketch_stream import (
    GLOBAL,
    foreach_batch_bloom_dedup,
    foreach_batch_sketch_build,
    run_available_now,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.01"
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_chunks(spark, src_dir: str, n_chunks: int = 3):
    """Split documents into n parquet files so maxFilesPerTrigger=1 yields
    one micro-batch per chunk."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for i in range(n_chunks):
        docs.where(F.pmod("doc_id", F.lit(n_chunks)) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src_dir}/chunk{i}")
    return docs


def _stream(spark, src_dir: str):
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/chunk*")
    )


def test_stream_sketch_build_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = _write_chunks(spark, src)
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    fn = foreach_batch_sketch_build(ck, ["text"], lambda: HyperLogLog(12))
    run_available_now(_stream(spark, src), fn, str(tmp_path / "qck"))

    got = ck.load_sketch(GLOBAL)
    exact = docs.select("text").distinct().count()
    assert abs(got.estimate() - exact) / exact < 0.1
    # batches committed with lineage
    info = ck.run_info("stream_batches")
    assert info and len(info["units"]) >= 2
    assert sum(info["rows"].values()) == docs.count()


def test_stream_bloom_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = _write_chunks(spark, src)
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    sink = str(tmp_path / "sink")
    fn = foreach_batch_bloom_dedup(
        ck, ["text"], lambda: BloomSketch.from_fpr(2000, 1e-9), sink,
        order_col="doc_id",
    )
    run_available_now(_stream(spark, src), fn, str(tmp_path / "qck"))

    out = spark.read.parquet(sink)
    # every distinct text appears exactly once across all micro-batches
    assert out.count() == docs.select("text").distinct().count()
    assert out.groupBy("text").count().where("count > 1").count() == 0


def test_stream_dedup_across_restarts(spark, tmp_path):
    """Second stream over the SAME data (fresh query checkpoint) emits
    nothing new: the persisted filter remembers everything seen."""
    src = str(tmp_path / "src")
    _write_chunks(spark, src)
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    sink = str(tmp_path / "sink")
    factory = lambda: BloomSketch.from_fpr(2000, 1e-9)  # noqa: E731
    run_available_now(
        _stream(spark, src),
        foreach_batch_bloom_dedup(ck, ["text"], factory, sink, order_col="doc_id"),
        str(tmp_path / "qck1"),
    )
    n1 = spark.read.parquet(sink).count()

    # replay batches through a NEW query checkpoint: batch ids collide with
    # committed ones → skipped (exactly-once), sink unchanged
    run_available_now(
        _stream(spark, src),
        foreach_batch_bloom_dedup(ck, ["text"], factory, sink, order_col="doc_id"),
        str(tmp_path / "qck2"),
    )
    assert spark.read.parquet(sink).count() == n1


def test_windowed_event_counts_batch_semantics(spark):
    """Watermarked windowed agg: validated in batch mode (same plan) vs
    an exact groupBy — streaming-specific late-drop is Spark-built-in."""
    events = spark.read.parquet(f"{SF}/events.parquet")
    win = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )
    total = win.agg(F.sum("cnt").alias("s")).collect()[0]["s"]
    assert total == events.count()
