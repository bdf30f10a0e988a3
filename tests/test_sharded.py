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
    _read_manifest,
    build_sharded_bloom,
    is_sharded_artifact,
    merge_sharded_artifacts,
    shard_path,
    sharded_membership_udf,
    update_sharded_bloom,
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

    def test_update_check_and_set(self, spark, tmp_path):
        """Incremental update: base artifact from set A; updating with
        A ∪ B must emit exactly B as survivors (first occurrence per key),
        write an artifact containing A ∪ B, and leave the base untouched."""
        a = spark.createDataFrame(
            [(i, f"a{i}") for i in range(100)], "id long, text string"
        )
        # b has each key twice: only the first copy (lower id) survives
        b_rows = [(1000 + i, f"b{i}") for i in range(50)] + [
            (2000 + i, f"b{i}") for i in range(50)
        ]
        b = spark.createDataFrame(b_rows, "id long, text string")
        base, v2, surv = (
            str(tmp_path / "base"), str(tmp_path / "v2"), str(tmp_path / "surv")
        )
        build_sharded_bloom(a, ["text"], base, n_shards=4,
                            expected_n=400, fpr=1e-9)
        man = update_sharded_bloom(
            a.unionAll(b), ["text"], base, v2,
            survivors_dir=surv, order_col="id",
        )
        got = {(r["id"], r["text"]) for r in spark.read.parquet(surv).collect()}
        assert got == {(1000 + i, f"b{i}") for i in range(50)}
        # v2 artifact knows A and B; base still only knows A (all 100
        # b-rows pass its anti-filter — probe is a pure anti-join)
        assert dedup_against_filter(spark, a.unionAll(b), ["text"], v2).count() == 0
        assert dedup_against_filter(spark, b, ["text"], base).count() == 100
        assert sum(e["n_rows"] for e in man["shards"]) == 150
        # copy-on-update guard
        with pytest.raises(ValueError):
            update_sharded_bloom(b, ["text"], base, base)

    def test_update_without_survivors_and_untouched_shards(self, spark, tmp_path):
        """Filter-only update (no survivors dir): shards that received no
        new keys are carried over (linked) so the new artifact is complete."""
        a = spark.createDataFrame(
            [(i, f"a{i}") for i in range(200)], "id long, text string"
        )
        one = spark.createDataFrame([(0, "znew")], "id long, text string")
        base, v2 = str(tmp_path / "base"), str(tmp_path / "v2")
        build_sharded_bloom(a, ["text"], base, n_shards=16,
                            expected_n=400, fpr=1e-9)
        man = update_sharded_bloom(one, ["text"], base, v2)
        assert sum(e["n_rows"] for e in man["shards"]) == 201
        n_files = len([f for f in os.listdir(v2) if f.endswith(".sk")])
        assert n_files == len(man["shards"])  # untouched shards carried over
        assert dedup_against_filter(spark, a, ["text"], v2).count() == 0
        assert dedup_against_filter(spark, one, ["text"], v2).count() == 0

    def test_update_survivors_preserve_pages_schema(self, spark, tmp_path):
        """Survivor parts are written executor-side by pyarrow from
        pandas; the north-rule input shape (timestamp + binary columns)
        must round-trip through them unchanged."""
        from bloom_spark.io.pages import synthesize_pages

        pages = synthesize_pages(spark, 60).where("text IS NOT NULL")
        seen = pages.limit(20)
        base, v2, surv = (
            str(tmp_path / "b"), str(tmp_path / "v"), str(tmp_path / "s")
        )
        build_sharded_bloom(seen, ["text"], base, n_shards=4,
                            expected_n=200, fpr=1e-9)
        update_sharded_bloom(pages, ["text"], base, v2, survivors_dir=surv)
        out = spark.read.parquet(surv)
        assert set(out.columns) == set(pages.columns)
        want = dict(pages.dtypes)
        got = dict(out.dtypes)
        assert got == want  # timestamp/binary dtypes survive the part files
        assert out.count() == pages.join(
            seen.select("text").distinct(), "text", "left_anti"
        ).select("text").distinct().count()

    def test_merge_artifacts(self, spark, tmp_path):
        """Shard-wise union of two same-geometry artifacts: members of
        either input are members of the merge; counts are summed."""
        a = spark.createDataFrame(
            [(i, f"a{i}") for i in range(80)], "id long, text string"
        )
        b = spark.createDataFrame(
            [(i, f"b{i}") for i in range(80)], "id long, text string"
        )
        da, db, dm = (
            str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
        )
        build_sharded_bloom(a, ["text"], da, n_shards=4, expected_n=400, fpr=1e-9)
        build_sharded_bloom(b, ["text"], db, n_shards=4, expected_n=400, fpr=1e-9)
        man = merge_sharded_artifacts(spark, [da, db], dm)
        assert sum(e["n_rows"] for e in man["shards"]) == 160
        both = a.unionAll(b)
        assert dedup_against_filter(spark, both, ["text"], dm).count() == 0
        other = spark.createDataFrame(
            [(i, f"x{i}") for i in range(200)], "id long, text string"
        )
        assert dedup_against_filter(spark, other, ["text"], dm).count() == 200
        # geometry mismatch refused — shard count AND fpr (different fpr
        # means different bitmap m; a mid-merge failure would leave a
        # torn output dir)
        dc = str(tmp_path / "c")
        build_sharded_bloom(a, ["text"], dc, n_shards=8, expected_n=400, fpr=1e-9)
        with pytest.raises(ValueError):
            merge_sharded_artifacts(spark, [da, dc], str(tmp_path / "bad"))
        dd2 = str(tmp_path / "d")
        build_sharded_bloom(a, ["text"], dd2, n_shards=4, expected_n=400, fpr=1e-6)
        with pytest.raises(ValueError, match="geometr"):
            merge_sharded_artifacts(spark, [da, dd2], str(tmp_path / "bad2"))

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

    def test_out_dir_reuse_clears_stale_files(self, spark, tmp_path):
        """ADVICE r4 (medium): reusing an out_dir / survivors_dir from a
        previous different run must NOT keep stale shard files (wrong
        membership) or stale survivor parts (inflated rows_out) — the
        artifact dirs get .mode('overwrite') semantics."""
        a = spark.createDataFrame(
            [(i, f"a{i}") for i in range(60)], "id long, text string"
        )
        b = spark.createDataFrame(
            [(1000 + i, f"b{i}") for i in range(60)], "id long, text string"
        )
        base_a = str(tmp_path / "base_a")
        base_b = str(tmp_path / "base_b")
        out = str(tmp_path / "out")
        surv = str(tmp_path / "surv")
        build_sharded_bloom(a, ["text"], base_a, n_shards=4,
                            expected_n=200, fpr=1e-9)
        build_sharded_bloom(b, ["text"], base_b, n_shards=4,
                            expected_n=200, fpr=1e-9)
        # run 1: update base_a with b into (out, surv)
        update_sharded_bloom(b, ["text"], base_a, out, survivors_dir=surv)
        assert spark.read.parquet(surv).count() == 60
        # run 2 REUSES the same dirs with a different base + batch: the
        # result must describe run 2 only
        update_sharded_bloom(a, ["text"], base_b, out, survivors_dir=surv)
        assert spark.read.parquet(surv).count() == 60  # not 120
        man = _read_manifest(out)
        assert sum(e["n_rows"] for e in man["shards"]) == 120  # b base + a
        # out artifact knows exactly a ∪ b from run 2's lineage — and a
        # stale run-1 shard would also have made these counts wrong
        assert dedup_against_filter(
            spark, a.unionAll(b), ["text"], out
        ).count() == 0

    def test_build_out_dir_reuse_overwrites(self, spark, tmp_path):
        """build_sharded_bloom into a reused dir must not union stale
        shards from a previous build with MORE shards (old high-numbered
        shard files would otherwise survive and poison probes)."""
        a = spark.createDataFrame(
            [(i, f"a{i}") for i in range(60)], "id long, text string"
        )
        b = spark.createDataFrame(
            [(i, f"b{i}") for i in range(60)], "id long, text string"
        )
        out = str(tmp_path / "art")
        build_sharded_bloom(a, ["text"], out, n_shards=8,
                            expected_n=200, fpr=1e-9)
        build_sharded_bloom(b, ["text"], out, n_shards=4,
                            expected_n=200, fpr=1e-9)
        import os as _os

        shard_files = [f for f in _os.listdir(out) if f.endswith(".sk")]
        assert all(int(f[6:11]) < 4 for f in shard_files)
        assert dedup_against_filter(spark, b, ["text"], out).count() == 0
        assert dedup_against_filter(spark, a, ["text"], out).count() == 60

    def test_merge_refuses_inplace_output(self, spark, tmp_path):
        a = spark.createDataFrame(
            [(i, f"a{i}") for i in range(20)], "id long, text string"
        )
        da = str(tmp_path / "a")
        build_sharded_bloom(a, ["text"], da, n_shards=4, expected_n=100, fpr=1e-9)
        with pytest.raises(ValueError, match="out_dir must differ"):
            merge_sharded_artifacts(spark, [da], da)

    def test_update_saturation_guard(self, spark, tmp_path):
        """ADVICE r4: repeated updates past per_shard_capacity silently
        degrade the FPR bound — the reference CLI tracks fullness
        ('All containers are full, writing disabled'). on_full='warn'
        warns, 'error' raises, 'ignore' is silent."""
        import warnings

        small = spark.createDataFrame(
            [(i, f"s{i}") for i in range(10)], "id long, text string"
        )
        # capacity floor is 4096, so overflow needs > 4096 accumulated keys
        big = spark.createDataFrame(
            [(i, f"x{i}") for i in range(9000)], "id long, text string"
        )
        base, v2, v3 = (
            str(tmp_path / "b"), str(tmp_path / "v2"), str(tmp_path / "v3")
        )
        build_sharded_bloom(small, ["text"], base, n_shards=1,
                            expected_n=10, fpr=1e-6)
        with pytest.warns(RuntimeWarning, match="per_shard_capacity"):
            man = update_sharded_bloom(big, ["text"], base, v2)
        assert man["shards"][0]["n_rows"] == 9010
        with pytest.raises(RuntimeError, match="per_shard_capacity"):
            update_sharded_bloom(big, ["text"], base, v3, on_full="error")
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            update_sharded_bloom(
                big, ["text"], base, str(tmp_path / "v4"), on_full="ignore"
            )
        with pytest.raises(ValueError, match="on_full"):
            update_sharded_bloom(big, ["text"], base, str(tmp_path / "v5"),
                                 on_full="nope")
