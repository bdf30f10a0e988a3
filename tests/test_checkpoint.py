"""Resumable checkpointed builds (SURVEY.md §5.5, north rule: resume
from last committed snapshot with per-partition lineage + metrics)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bloom_spark.ops.build import build_sketch
from bloom_spark.ops.checkpoint import SketchCheckpoint
from bloom_spark.sketch import BloomSketch, HyperLogLog

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_full_build_matches_direct(spark, docs, tmp_path):
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    out = ck.build(
        spark, docs, ["text"], lambda: BloomSketch.from_fpr(2000, 1e-6),
        run_id="r1", n_units=4,
    )
    assert out is not None
    sketch, n = out
    direct, n_direct = build_sketch(
        docs, ["text"], lambda: BloomSketch.from_fpr(2000, 1e-6)
    )
    assert n == n_direct == docs.count()
    # same elements inserted → identical filter bits (deterministic hashes);
    # compare canonical dense form (sparse/dense mode is transport-only and
    # may legitimately differ between a 1-segment and an N-unit build)
    assert sketch.densify().to_bytes() == direct.densify().to_bytes()


def test_crash_and_resume(spark, docs, tmp_path):
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    factory = lambda: BloomSketch.from_fpr(2000, 1e-6)  # noqa: E731

    # "crash" after 2 of 5 units
    partial = ck.build(
        spark, docs, ["text"], factory, run_id="r1", n_units=5, max_units=2
    )
    assert partial is None
    assert len(ck.committed_units("r1")) == 2

    # resume completes only the remaining units
    done = ck.build(spark, docs, ["text"], factory, run_id="r1", n_units=5)
    assert done is not None
    sketch, n = done
    assert n == docs.count()
    direct, _ = build_sketch(docs, ["text"], factory)
    assert sketch.densify().to_bytes() == direct.densify().to_bytes()


def test_resume_is_noop_when_complete(spark, docs, tmp_path):
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    factory = lambda: HyperLogLog(12)  # noqa: E731
    first = ck.build(spark, docs, ["text"], factory, run_id="r", n_units=3)
    again = ck.build(spark, docs, ["text"], factory, run_id="r", n_units=3)
    assert first is not None and again is not None
    assert first[0].to_bytes() == again[0].to_bytes()
    assert first[1] == again[1]


def test_lineage_table(spark, docs, tmp_path):
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    ck.build(
        spark, docs, ["text"], lambda: BloomSketch.from_fpr(2000, 1e-6),
        run_id="r", n_units=4,
    )
    lin = ck.lineage(spark, "r")
    assert set(lin.columns) == {
        "unit", "segment_id", "n_rows", "input_fingerprint", "sketch",
        "sketch_bytes", "peak_rss_kb", "committed_ts",
    }
    agg = lin.agg(
        F.sum("n_rows").alias("n"), F.countDistinct("unit").alias("u")
    ).collect()[0]
    assert agg["n"] == docs.count()
    assert agg["u"] == 4
    # M4 memory metrics: every build partition reports its worker's peak
    # RSS and the serialized segment size (≙ reference -dm RSS report)
    mm = lin.agg(
        F.min("peak_rss_kb").alias("rss"), F.min("sketch_bytes").alias("sb")
    ).collect()[0]
    assert mm["rss"] > 0 and mm["sb"] > 0


def test_resume_with_different_slicing_refused(spark, docs, tmp_path):
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    factory = lambda: BloomSketch.from_fpr(2000, 1e-6)  # noqa: E731
    ck.build(spark, docs, ["text"], factory, run_id="r", n_units=4, max_units=1)
    import pytest

    with pytest.raises(ValueError, match="cannot resume"):
        ck.build(spark, docs, ["text"], factory, run_id="r", n_units=5)
    with pytest.raises(ValueError, match="cannot resume"):
        ck.build(
            spark, docs, ["text"], factory,
            run_id="r", n_units=4, unit_col="doc_id",
        )


def test_sketch_file_roundtrip(spark, docs, tmp_path):
    """EP-B save / EP-C load parity (reference main.rs:390-402)."""
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    sketch, _ = ck.build(
        spark, docs, ["text"], lambda: BloomSketch.from_fpr(2000, 1e-6),
        run_id="r", n_units=2,
    )
    path = ck.save_sketch("global", sketch)
    loaded = ck.load_sketch("global")
    assert loaded.to_bytes() == sketch.to_bytes()
    assert path.endswith("global.sk")


def test_value_sketch_checkpoint(spark, tmp_path):
    from bloom_spark.sketch import KLLSketch

    events = spark.read.parquet(f"{SF}/events.parquet")
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    out = ck.build(
        spark, events, [], lambda: KLLSketch(200),
        run_id="r", n_units=3, unit_col="event_id", value_col="value",
    )
    assert out is not None
    kll, n = out
    assert n == events.count()
    import numpy as np

    med = float(kll.quantile(np.array([0.5]))[0])
    exact = events.approxQuantile("value", [0.5], 0.0)[0]
    assert abs(med - exact) / max(abs(exact), 1e-9) < 0.1 or abs(med - exact) < 5.0


def test_resume_with_different_keys_refused(spark, tmp_path):
    """r3 review: the resume guard checked n_units/unit_col but not the
    KEY columns — resuming with different cols silently merged
    url-keyed and text-keyed segments into one wrong filter."""
    import pytest

    from bloom_spark.sketch import BloomSketch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ck = SketchCheckpoint(str(tmp_path / "ck"))
    factory = lambda: BloomSketch.from_fpr(1000, 1e-6)  # noqa: E731
    ck.build(spark, docs, ["text"], factory, run_id="r", n_units=4,
             unit_col="doc_id", max_units=2)
    with pytest.raises(ValueError, match="cannot resume with"):
        ck.build(spark, docs, ["source"], factory, run_id="r", n_units=4,
                 unit_col="doc_id")
    with pytest.raises(ValueError, match="cannot resume with"):
        ck.build(spark, docs, ["text"],
                 lambda: BloomSketch.from_fpr(2000, 1e-3),
                 run_id="r", n_units=4, unit_col="doc_id")
    # identical config resumes fine
    out = ck.build(spark, docs, ["text"], factory, run_id="r", n_units=4,
                   unit_col="doc_id")
    assert out is not None
