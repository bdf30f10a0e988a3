"""Sharded filter artifact (ops.sharded): build/probe parity with the
single-filter path, manifest integrity, absent-shard semantics."""

from __future__ import annotations

import json
import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from bloom_spark.ops.build import build_sketch
from bloom_spark.ops.dedup import dedup_against_filter
from bloom_spark.ops.sharded import (
    MANIFEST,
    build_sharded_bloom,
    is_sharded_artifact,
    shard_path,
    sharded_membership_udf,
)
from bloom_spark.sketch import BloomSketch

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def artifact(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    seen = docs.where("source = 'src0'")
    out_dir = str(tmp_path_factory.mktemp("shards"))
    manifest = build_sharded_bloom(
        seen, ["text"], out_dir, n_shards=8, expected_n=1000, fpr=1e-9
    )
    return docs, seen, out_dir, manifest


class TestShardedFilter:
    def test_manifest_and_files(self, artifact):
        docs, seen, out_dir, manifest = artifact
        assert is_sharded_artifact(out_dir)
        assert manifest["n_shards"] == 8
        # every input row landed in exactly one shard
        assert sum(e["n_rows"] for e in manifest["shards"]) == seen.count()
        for e in manifest["shards"]:
            assert os.path.getsize(shard_path(out_dir, e["shard"])) == e["n_bytes"]
        on_disk = json.load(open(os.path.join(out_dir, MANIFEST)))
        assert on_disk["n_shards"] == 8

    def test_probe_matches_single_filter_path(self, spark, artifact):
        """Same (fpr, keys) probed through the sharded artifact and the
        classic broadcast single filter must agree on every member (zero
        false negatives both) and on the anti-join survivors."""
        docs, seen, out_dir, _ = artifact
        sharded_out = dedup_against_filter(spark, docs, ["text"], out_dir)
        single, _ = build_sketch(seen, ["text"], lambda: BloomSketch.from_fpr(1000, 1e-9))
        single_out = dedup_against_filter(spark, docs, ["text"], single)
        got = {r["doc_id"] for r in sharded_out.select("doc_id").collect()}
        want = {r["doc_id"] for r in single_out.select("doc_id").collect()}
        assert got == want
        # and exact vs truth at this fpr/scale
        truth = {
            r["doc_id"]
            for r in docs.join(
                seen.select("text").distinct(), "text", "left_anti"
            ).select("doc_id").collect()
        }
        assert got == truth

    def test_members_keep_mode(self, spark, artifact):
        docs, seen, out_dir, _ = artifact
        kept = dedup_against_filter(
            spark, docs, ["text"], out_dir, keep_members=True
        )
        want = {r["doc_id"] for r in docs.join(
            seen.select("text").distinct(), "text", "left_semi"
        ).select("doc_id").collect()}
        got = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert got == want

    def test_absent_shard_answers_false(self, spark, tmp_path):
        """A shard file that never received keys may not exist; probes
        routing there must answer False, not crash."""
        df = spark.createDataFrame(
            [(i, f"key-{i}") for i in range(4)], "id long, text string"
        )
        out_dir = str(tmp_path / "tiny")
        build_sharded_bloom(df, ["text"], out_dir, n_shards=64,
                            expected_n=100, fpr=1e-9)
        # 4 keys over 64 shards → most shards absent
        n_files = len([f for f in os.listdir(out_dir) if f.endswith(".sk")])
        assert n_files <= 4
        probes = spark.createDataFrame(
            [(i, f"other-{i}") for i in range(500)], "id long, text string"
        )
        out = dedup_against_filter(spark, probes, ["text"], out_dir)
        assert out.count() == 500  # nothing falsely found
        assert dedup_against_filter(spark, df, ["text"], out_dir).count() == 0

    def test_rebuilt_artifact_not_probed_stale(self, spark, tmp_path):
        """r3 review: worker caches keyed by path alone served the OLD
        mmap after an in-session rebuild at the same path, and shards
        once seen absent stayed absent forever."""
        out_dir = str(tmp_path / "art")
        a = spark.createDataFrame([(i, f"a{i}") for i in range(50)], "id long, text string")
        b = spark.createDataFrame([(i, f"b{i}") for i in range(50)], "id long, text string")
        build_sharded_bloom(a, ["text"], out_dir, n_shards=4,
                            expected_n=100, fpr=1e-9)
        assert dedup_against_filter(spark, a, ["text"], out_dir).count() == 0
        assert dedup_against_filter(spark, b, ["text"], out_dir).count() == 50
        # rebuild at the SAME path with the other key set
        import shutil

        shutil.rmtree(out_dir)
        build_sharded_bloom(b, ["text"], out_dir, n_shards=4,
                            expected_n=100, fpr=1e-9)
        assert dedup_against_filter(spark, b, ["text"], out_dir).count() == 0
        assert dedup_against_filter(spark, a, ["text"], out_dir).count() == 50

    def test_multi_flush_parity(self, spark, tmp_path, monkeypatch):
        """The build buffers hashes and flushes every FLUSH_ROWS rows;
        crossing the boundary mid-partition (several flushes, the last
        one partial) must produce the same artifact semantics as one
        flush: zero false negatives, manifest counts intact."""
        import bloom_spark.ops.sharded as sharded_mod

        monkeypatch.setattr(sharded_mod, "FLUSH_ROWS", 64)
        df = spark.createDataFrame(
            [(i, f"k{i}") for i in range(500)], "id long, text string"
        ).coalesce(1)  # one partition → 500 rows / 64 → 8 flushes
        out_dir = str(tmp_path / "mf")
        manifest = sharded_mod.build_sharded_bloom(
            df, ["text"], out_dir, n_shards=4, expected_n=600, fpr=1e-9
        )
        assert sum(e["n_rows"] for e in manifest["shards"]) == 500
        assert dedup_against_filter(spark, df, ["text"], out_dir).count() == 0
        other = spark.createDataFrame(
            [(i, f"x{i}") for i in range(500)], "id long, text string"
        )
        assert dedup_against_filter(spark, other, ["text"], out_dir).count() == 500

    def test_shard_routing_consistent(self, spark, artifact):
        """The probe's numpy pmod must equal the build's JVM pmod: every
        member key must hit ITS shard (a routing skew would show up as
        false negatives)."""
        docs, seen, out_dir, _ = artifact
        probe = sharded_membership_udf(out_dir)
        from bloom_spark.ops.build import H1_COL, H2_COL, with_hash_columns

        hashed = with_hash_columns(seen, ["text"])
        found = hashed.withColumn(
            "m", probe(F.col(H1_COL), F.col(H2_COL))
        ).where(~F.col("m"))
        assert found.count() == 0
