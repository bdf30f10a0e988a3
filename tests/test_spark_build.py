"""Spark-layer tests: segment build, tree merge, broadcast probe, dedup ops.

Mirrors the reference's e2e contract (SURVEY.md §5): zero false negatives,
FPR within bound, first-wins dedup, invalid-row passthrough, inverse mode.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloom_spark.io.pages import synthesize_pages
from bloom_spark.ops.build import (
    build_segments,
    build_sketch,
    merge_segments,
    salted_repartition,
    with_hash_columns,
)
from bloom_spark.ops.dedup import (
    bloom_dedup,
    dedup_against_filter,
    dedup_with_passthrough,
    exact_dedup,
    filter_members,
    mark_members,
    semi_join_filter,
)
from bloom_spark.sketch import (
    BloomSketch,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    TDigest,
)

N_PAGES = 8_000


@pytest.fixture(scope="module")
def pages(spark):
    df = synthesize_pages(spark, N_PAGES, num_partitions=8).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def valid(pages):
    return pages.where(F.col("text").isNotNull())


class TestBuildMerge:
    def test_segments_one_per_partition(self, valid):
        segs = build_segments(
            valid.repartition(6), ["text"], lambda: BloomSketch.from_fpr(N_PAGES, 1e-6)
        )
        rows = segs.collect()
        assert len(rows) == 6
        assert sum(r.n_rows for r in rows) == valid.count()

    def test_global_filter_zero_false_negatives(self, spark, valid):
        sketch, n = build_sketch(
            valid, ["text"], lambda: BloomSketch.from_fpr(N_PAGES, 1e-8)
        )
        assert n == valid.count()
        marked = mark_members(spark, valid, ["text"], sketch)
        assert marked.where("__bs_is_dup").count() == valid.count()

    def test_fpr_on_disjoint_probes(self, spark, valid):
        sketch, _ = build_sketch(
            valid, ["text"], lambda: BloomSketch.from_fpr(N_PAGES, 1e-6)
        )
        probes = valid.withColumn("text", F.concat(F.lit("U::"), F.col("text")))
        fp = mark_members(spark, probes, ["text"], sketch).where("__bs_is_dup").count()
        # p=1e-6 over <8k probes → expected FPs ≈ 0.008; allow tiny slack
        assert fp <= 2

    def test_salted_repartition_balances(self, valid):
        segs = build_segments(
            salted_repartition(valid, "url", 8, salts=4),
            ["text"],
            lambda: BloomSketch.from_fpr(N_PAGES, 1e-6),
        ).collect()
        counts = [r.n_rows for r in segs]
        assert len(counts) == 8
        assert max(counts) < 2.5 * (sum(counts) / len(counts))

    def test_merge_equals_single_pass(self, spark, valid):
        # distributed tree merge == one-shot build (associativity on Spark)
        dist, _ = build_sketch(
            valid.repartition(7), ["text"], lambda: HyperLogLog(13)
        )
        single, _ = build_sketch(
            valid.coalesce(1), ["text"], lambda: HyperLogLog(13)
        )
        assert dist.estimate() == single.estimate()

    def test_hll_vs_exact(self, valid):
        exact = valid.select("text").distinct().count()
        hll, _ = build_sketch(valid, ["text"], lambda: HyperLogLog(14))
        assert abs(hll.estimate() - exact) / exact < 4 * hll.std_error()

    def test_cms_group_counts(self, spark, pages):
        cms, _ = build_sketch(
            pages, ["lang"], lambda: CountMinSketch(1 << 16, 5)
        )
        exact = {r["lang"]: r["cnt"] for r in pages.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        got = cms.query(pd.Series(list(exact))) if False else None
        # query via the same JVM hash family the build used:
        hashed = with_hash_columns(
            pages.select("lang").distinct(), ["lang"]
        ).toPandas()
        import numpy as np

        from bloom_spark.hashing import to_uint64

        est = cms.query_hashes(
            to_uint64(hashed["__bs_h1"]), to_uint64(hashed["__bs_h2"])
        )
        for lang_val, e in zip(hashed["lang"], est):
            assert e == exact[lang_val]  # wide CMS → exact at this scale

    def test_kll_value_sketch(self, spark, sf01_dir):
        docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
        kll, n = build_sketch(docs, [], lambda: KLLSketch(200), value_col="n_chars")
        assert n == docs.count()
        exact_med = docs.approxQuantile("n_chars", [0.5], 0.0)[0]
        assert abs(kll.rank(exact_med) - 0.5) <= 3 * kll.rank_error()

    def test_tdigest_value_sketch(self, spark, sf01_dir):
        events = spark.read.parquet(f"{sf01_dir}/events.parquet")
        td, _ = build_sketch(events, [], lambda: TDigest(200), value_col="value")
        exact = events.approxQuantile("value", [0.5], 0.0)[0]
        lo, hi = events.approxQuantile("value", [0.45, 0.55], 0.0)
        assert lo <= td.quantile(0.5) <= hi, (lo, td.quantile(0.5), hi)

    def test_empty_input_raises(self, spark, valid):
        with pytest.raises(ValueError, match="empty input|no segments"):
            build_sketch(
                valid.where(F.lit(False)),
                ["text"],
                lambda: BloomSketch.from_fpr(10, 0.1),
            )


class TestDedupOps:
    def test_exact_dedup_first_wins(self, spark):
        pdf = pd.DataFrame(
            {"line": [str(i) for i in list(range(10)) + list(range(10))],
             "line_no": list(range(20))}
        )
        df = spark.createDataFrame(pdf)
        out = exact_dedup(df, ["line"], order_col="line_no").toPandas()
        # ≙ reference test_basic_deduplication (integration_tests.rs:4-38)
        assert len(out) == 10
        assert sorted(out["line_no"]) == list(range(10))  # first occurrences

    def test_bloom_dedup_counts(self, spark, valid):
        deduped = bloom_dedup(
            spark, valid, ["text"], fpr=1e-8, expected_n=N_PAGES
        )
        exact = valid.select("text").distinct().count()
        assert deduped.count() == exact

    def test_bloom_dedup_is_lazy_single_pass(self, spark, valid):
        """Round-1 review: bloom_dedup ran a driver count() + a filter
        build + dropDuplicates (3 passes, sketch unused in the answer).
        Now it must be LAZY (no job at construction) and its one action
        must be the check_and_set pass itself."""
        sc = spark.sparkContext
        sc.setJobGroup("bd-lazy", "bloom_dedup construction")
        out = bloom_dedup(spark, valid, ["text"], fpr=1e-8, expected_n=N_PAGES)
        assert sc.statusTracker().getJobIdsForGroup("bd-lazy") == []
        sc.setJobGroup("bd-run", "bloom_dedup action")
        assert out.count() == valid.select("text").distinct().count()
        assert len(sc.statusTracker().getJobIdsForGroup("bd-run")) >= 1

    def test_mmap_path_probe_matches_broadcast(self, spark, valid, tmp_path):
        """The memory-mapped filter-file probe must answer identically to
        the broadcast probe (zero-copy deserialization over np.memmap)."""
        from bloom_spark.ops.dedup import dedup_against_filter

        sketch, _ = build_sketch(
            valid, ["text"], lambda: BloomSketch.from_fpr(N_PAGES, 1e-8)
        )
        path = str(tmp_path / "filter.sk")
        with open(path, "wb") as f:
            f.write(sketch.to_bytes())
        via_bc = dedup_against_filter(spark, valid, ["text"], sketch).count()
        via_mmap = dedup_against_filter(spark, valid, ["text"], path).count()
        assert via_bc == via_mmap == 0  # everything is a member
        probes = valid.withColumn(
            "text", F.concat(F.lit("U::"), F.col("text"))
        )
        assert (
            dedup_against_filter(spark, probes, ["text"], path).count()
            == dedup_against_filter(spark, probes, ["text"], sketch).count()
        )

    def test_line_dedup_seq_twice(self, spark):
        """≙ the reference's e2e test (tests/integration_tests.rs:4-38):
        seq 1..10 twice through the pipeline → exactly 10 lines, each
        once, first occurrences kept — at LINE granularity."""
        from bloom_spark.ops.dedup import line_dedup

        seq = "\n".join(str(i) for i in range(1, 11))
        df = spark.createDataFrame(
            [(0, seq), (1, seq)], "doc_id long, text string"
        )
        out = line_dedup(
            spark, df, "text", "doc_id", fpr=1e-9, expected_n=1000
        ).toPandas()
        assert sorted(out["line"], key=int) == [str(i) for i in range(1, 11)]
        assert (out["doc_id"] == 0).all()  # first doc wins every line

    def test_line_dedup_huge_doc_ids(self, spark):
        """VERDICT r2 #5: the old arithmetic order key overflowed int64
        for id ≥ ~9.2e12; the struct key must order correctly at
        crawl-archive id scales (near 2^62)."""
        from bloom_spark.ops.dedup import line_dedup

        base = 1 << 62
        df = spark.createDataFrame(
            [(base + 1, "a\nb"), (base, "a\nc")], "doc_id long, text string"
        )
        out = line_dedup(
            spark, df, "text", "doc_id", fpr=1e-9, expected_n=100
        ).toPandas()
        got = dict(zip(out["line"], (int(d) for d in out["doc_id"])))
        # doc base (smaller id) wins "a"; each doc keeps its unique line
        assert got == {"a": base, "b": base + 1, "c": base}

    def test_bloom_dedup_first_wins_order(self, spark, valid):
        import pyspark.sql.functions as F

        docs = valid.select("url", "text").withColumn(
            "ord", F.xxhash64("url")
        )
        doubled = docs.unionByName(
            docs.withColumn("ord", F.col("ord") + F.lit(1))
        )
        out = bloom_dedup(
            spark, doubled, ["text"], fpr=1e-9,
            expected_n=N_PAGES, order_col="ord",
        ).toPandas()
        first = (
            doubled.groupBy("text").agg(F.min("ord").alias("ord")).toPandas()
        )
        assert sorted(out["ord"]) == sorted(first["ord"])

    def test_filter_against_saved_filter(self, spark, valid):
        # EP-B/EP-C: build+persist, second pass filters to zero
        # (reference README.md:43-44)
        sketch, _ = build_sketch(
            valid, ["text"], lambda: BloomSketch.from_fpr(N_PAGES, 1e-8)
        )
        blob = sketch.to_bytes()
        restored = BloomSketch.from_bytes(blob)
        second_pass = dedup_against_filter(spark, valid, ["text"], restored)
        assert second_pass.count() == 0

    def test_inverse_mode(self, spark, valid):
        # -i: emit only lines present in the filter (main.rs:281)
        half = valid.where(F.col("page_id") % 2 == 0)
        sketch, _ = build_sketch(
            half, ["text"], lambda: BloomSketch.from_fpr(N_PAGES, 1e-8)
        )
        kept = filter_members(spark, valid, ["text"], sketch, keep_members=True)
        # every row of `half` must appear (zero FN); FPs may add a few
        assert kept.count() >= half.count()
        assert kept.where(F.col("page_id") % 2 == 0).count() == half.count()

    def test_passthrough_invalid_rows(self, spark, pages):
        # S2: invalid rows (text null) emitted every time, never deduped
        out = dedup_with_passthrough(
            spark, pages, ["text"], F.col("text").isNotNull(), order_col="page_id"
        )
        n_invalid = pages.where("text is null").count()
        n_exact = pages.where("text is not null").select("text").distinct().count()
        assert n_invalid > 0
        assert out.count() == n_exact + n_invalid
        assert out.where("text is null").count() == n_invalid

    def test_semi_join_filter_broadcast(self, spark, valid):
        small = valid.limit(50).select("url")
        out = semi_join_filter(valid, small, ["url"])
        assert out.count() == 50
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        anti = semi_join_filter(valid, small, ["url"], anti=True)
        assert anti.count() == valid.count() - 50


class TestPlanQuality:
    def test_hashing_stays_jvm_side(self, valid):
        # the hash columns must be Catalyst xxhash64, inside codegen
        plan = (
            with_hash_columns(valid.select("text"), ["text"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "xxhash64" in plan
        # "*(n)" marks a WholeStageCodegen span in executedPlan().toString()
        assert plan.lstrip().startswith("*(")

    def test_column_pruning_reaches_scan(self, spark, sf01_dir):
        docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
        pruned = with_hash_columns(docs, ["text"]).select("__bs_h1", "__bs_h2")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # scan must read only `text`, not all 5 columns
        assert "ReadSchema: struct<text:string>" in plan


class TestSkewHandling:
    def test_salted_repartition_bounds_skew(self, spark):
        """80% of rows share one hot key: any unsalted partitioning puts
        them in ONE partition; salting splits the hot key over ``salts``
        sub-keys so no partition exceeds ~1/salts of the hot mass."""
        import pyspark.sql.functions as F

        from bloom_spark.ops.build import salted_repartition

        n = 40_000
        df = spark.range(n).select(
            F.when(F.pmod("id", F.lit(5)) < 4, F.lit("hot-host"))
            .otherwise(F.concat(F.lit("h"), F.pmod("id", F.lit(100))))
            .alias("host"),
            F.col("id"),
        )
        hot = df.where("host = 'hot-host'").count()
        assert hot == 32_000

        def max_partition(d):
            sizes = d.groupBy(F.spark_partition_id().alias("p")).count()
            return sizes.agg(F.max("count").alias("m")).first()["m"]

        plain = max_partition(df.repartition(16, F.col("host")))
        salted = max_partition(salted_repartition(df, "host", 16, salts=8))
        assert plain >= hot  # the hot key pins one partition
        assert salted <= hot * 0.5, f"salting did not spread: {salted} vs {hot}"


class TestDedupContracts:
    def test_bloom_dedup_drop_rate_bounded_by_fpr(self, spark):
        """The documented cost of sketch dedup: unique keys are falsely
        dropped at rate ≤ fpr. At fpr=1e-2 over 20k distinct keys the
        binomial 5-sigma envelope is ~±70 drops."""
        import pyspark.sql.functions as F

        from bloom_spark.ops.dedup import bloom_dedup

        n = 20_000
        df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
        kept = bloom_dedup(spark, df, ["k"], fpr=1e-2, expected_n=n).count()
        dropped = n - kept
        assert 0 <= dropped <= n * 1e-2 + 5 * (n * 1e-2) ** 0.5

    def test_bloom_dedup_multi_column_keys(self, spark):
        import pyspark.sql.functions as F

        from bloom_spark.ops.dedup import bloom_dedup

        df = spark.range(5_000).select(
            (F.col("id") % 50).alias("a"), (F.col("id") % 40).alias("b")
        )
        kept = bloom_dedup(spark, df, ["a", "b"], fpr=1e-9, expected_n=10_000)
        exact = df.dropDuplicates(["a", "b"]).count()
        assert kept.count() == exact == 200  # lcm(50,40)=200 distinct pairs


class TestCascadeTrace:
    def test_trace_members_per_record(self, spark):
        """M5 (-d/-di) as data: container index, found flag, writable
        generation per record (process.rs:111-176)."""
        from bloom_spark.ops.cascade import SketchCascade, trace_members

        a = spark.createDataFrame([("a",), ("b",)], "text string")
        b = spark.createDataFrame([("c",)], "text string")
        gen0, _ = build_sketch(a, ["text"], lambda: BloomSketch.from_fpr(100, 1e-9))
        gen1, _ = build_sketch(b, ["text"], lambda: BloomSketch.from_fpr(100, 1e-9))
        c = SketchCascade([gen0, gen1])
        probes = spark.createDataFrame([("a",), ("c",), ("z",)], "text string")
        out = {
            r["text"]: (r["found"], r["container"], r["writable"])
            for r in trace_members(spark, probes, ["text"], c).collect()
        }
        assert out["a"] == (True, 0, 0)
        assert out["c"] == (True, 1, 0)
        assert out["z"] == (False, -1, 0)

    def test_trace_all_full_writable_minus_one(self, spark):
        from bloom_spark.ops.cascade import SketchCascade, trace_members

        a = spark.createDataFrame([("a",), ("b",)], "text string")
        gen0, _ = build_sketch(
            a, ["text"], lambda: BloomSketch.from_fpr(100, 1e-9, limit=2)
        )
        c = SketchCascade([gen0])
        assert c.is_full()
        probes = spark.createDataFrame([("a",), ("z",)], "text string")
        out = {
            r["text"]: (r["found"], r["writable"])
            for r in trace_members(spark, probes, ["text"], c).collect()
        }
        assert out["a"] == (True, -1)
        assert out["z"] == (False, -1)
