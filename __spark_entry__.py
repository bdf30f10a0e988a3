"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry routes through bloom_spark's real operator path
(JVM-hash → mapInPandas segments → treeAggregate merge → broadcast probe),
and the matching ``oracle_sql()`` is exact: sketch-estimate queries return
their *error-bound check* as data (exact value + within_bound boolean) so
DuckDB can verify the contract that actually matters — the published ε —
while membership/count queries are configured so the sketch answer is
exactly the truth at sf0.01 (FPR ≤ 1e-9 / CMS width ≫ key count; verified
deterministic, fixed seeds).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------- queries


def q_bloom_anti_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP-B/EP-C (SURVEY.md §3.2-3.3): build a Bloom filter over one slice
    (source='src0'), then emit rows of the full table NOT in the filter —
    the reference's filter-file workflow as a broadcast probe."""
    from bloom_spark.ops.build import build_sketch
    from bloom_spark.ops.dedup import dedup_against_filter
    from bloom_spark.sketch import BloomSketch

    docs = _docs(spark, sf_dir)
    seen = docs.where(docs.source == "src0")
    sketch, _ = build_sketch(
        seen, ["text"], lambda: BloomSketch.from_fpr(200_000, 1e-9)
    )
    out = dedup_against_filter(spark, docs, ["text"], sketch)
    return out.select("doc_id", "text")


def q_bloom_inverse_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse mode ``-i`` (reference main.rs:281): emit only rows whose
    key IS in the filter (bloom semi-join)."""
    from bloom_spark.ops.build import build_sketch
    from bloom_spark.ops.dedup import filter_members
    from bloom_spark.sketch import BloomSketch

    docs = _docs(spark, sf_dir)
    seen = docs.where(docs.source == "src1")
    sketch, _ = build_sketch(
        seen, ["text"], lambda: BloomSketch.from_fpr(200_000, 1e-9)
    )
    return filter_members(spark, docs, ["text"], sketch, keep_members=True).select(
        "doc_id", "text"
    )


def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact first-occurrence-wins dedup (reference process.rs:208-217):
    duplicates injected by self-union, first kept by doc_id order."""
    from bloom_spark.ops.dedup import exact_dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = docs.unionAll(docs.withColumn("doc_id", docs.doc_id + 10_000_000))
    return exact_dedup(doubled, ["text"], order_col="doc_id")


def q_bloom_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-text count via the bloom-dedup path (flagship EP-A)."""
    import pyspark.sql.functions as F

    from bloom_spark.ops.dedup import bloom_dedup

    docs = _docs(spark, sf_dir)
    deduped, _sketch = bloom_dedup(spark, docs, ["text"], fpr=1e-9)
    return deduped.agg(F.count("*").alias("distinct_texts"))


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate of distinct users with its published error bound
    checked as data (rel err < 4·1.04/√2^p)."""
    import pyspark.sql.functions as F

    from bloom_spark.ops.build import build_sketch
    from bloom_spark.sketch import HyperLogLog

    events = _events(spark, sf_dir)
    hll, _ = build_sketch(events, ["user_id"], lambda: HyperLogLog(14))
    exact = events.agg(F.countDistinct("user_id").alias("c")).collect()[0]["c"]
    ok = abs(hll.estimate() - exact) / max(exact, 1) < 4 * hll.std_error()
    return spark.createDataFrame(
        [(int(exact), bool(ok))], "exact_distinct_users long, within_bound boolean"
    )


def q_cms_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequencies per event_type — width 2^16 ≫ 10 keys, so the
    sketch answer equals the exact GROUP BY at this scale."""
    from bloom_spark.hashing import to_uint64
    from bloom_spark.ops.build import build_sketch, with_hash_columns
    from bloom_spark.sketch import CountMinSketch

    events = _events(spark, sf_dir)
    cms, _ = build_sketch(events, ["event_type"], lambda: CountMinSketch(1 << 16, 5))
    keys = with_hash_columns(events.select("event_type").distinct(), ["event_type"]).toPandas()
    est = cms.query_hashes(to_uint64(keys["__bs_h1"]), to_uint64(keys["__bs_h2"]))
    rows = [(k, int(v)) for k, v in zip(keys["event_type"], est)]
    return spark.createDataFrame(rows, "event_type string, cnt long")


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantiles of documents.n_chars with the rank-error bound
    checked as data: true_rank(estimate) within 3ε of q."""
    import duckdb

    from bloom_spark.ops.build import build_sketch
    from bloom_spark.sketch import KLLSketch

    docs = _docs(spark, sf_dir)
    kll, _ = build_sketch(docs, [], lambda: KLLSketch(200), value_col="n_chars")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    # exact ranks from the same data, computed in-Spark
    vals = [float(v) for v in kll.quantile(__import__("numpy").array(qs))]
    import pyspark.sql.functions as F

    n = docs.count()
    rows = []
    for q, est in zip(qs, vals):
        true_rank = docs.where(F.col("n_chars") <= est).count() / n
        rows.append((float(q), bool(abs(true_rank - q) <= 3 * kll.rank_error())))
    return spark.createDataFrame(rows, "q double, within_bound boolean")


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest quantiles of events.value, rank-accuracy checked as data
    (±0.02 at the body, ±0.01 at the tails for δ=200)."""
    import numpy as np
    import pyspark.sql.functions as F

    from bloom_spark.ops.build import build_sketch
    from bloom_spark.sketch import TDigest

    events = _events(spark, sf_dir)
    td, _ = build_sketch(events, [], lambda: TDigest(200), value_col="value")
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    ests = td.quantile(np.array(qs))
    n = events.count()
    rows = []
    for q, est in zip(qs, ests):
        true_rank = events.where(F.col("value") <= float(est)).count() / n
        tol = 0.02 if 0.1 < q < 0.9 else 0.01
        rows.append((float(q), bool(abs(true_rank - q) <= tol)))
    return spark.createDataFrame(rows, "q double, within_bound boolean")


def q_dedup_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 invalid-row passthrough (reference process.rs:63-78): rows with
    NULL-ified text bypass dedup and are emitted every time."""
    import pyspark.sql.functions as F

    from bloom_spark.ops.dedup import dedup_with_passthrough

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # deterministically blank ~10% of texts to simulate invalid rows,
    # then double the table so dedup has work on the valid side
    marked = docs.withColumn(
        "text",
        F.when(F.pmod(F.col("doc_id"), F.lit(10)) == 0, F.lit(None)).otherwise(
            F.col("text")
        ),
    )
    doubled = marked.unionAll(
        marked.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    out = dedup_with_passthrough(
        spark, doubled, ["text"], F.col("text").isNotNull(), order_col="doc_id"
    )
    return out.select("doc_id", "text")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bloom_anti_filter(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_anti_filter": q_bloom_anti_filter,
        "bloom_inverse_filter": q_bloom_inverse_filter,
        "bloom_distinct_count": q_bloom_distinct_count,
        "dedup_first_wins": q_dedup_first_wins,
        "dedup_passthrough": q_dedup_passthrough,
        "hll_distinct_users": q_hll_distinct_users,
        "cms_event_type_counts": q_cms_event_type_counts,
        "kll_quantiles": q_kll_quantiles,
        "tdigest_quantiles": q_tdigest_quantiles,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bloom_anti_filter": """
            SELECT doc_id, text FROM documents
            WHERE text NOT IN (SELECT text FROM documents WHERE source = 'src0')
        """,
        "bloom_inverse_filter": """
            SELECT doc_id, text FROM documents
            WHERE text IN (SELECT text FROM documents WHERE source = 'src1')
        """,
        "bloom_distinct_count": "SELECT count(DISTINCT text) AS distinct_texts FROM documents",
        "dedup_first_wins": """
            WITH doubled AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text FROM documents
            )
            SELECT min(doc_id) AS doc_id, text FROM doubled GROUP BY text
        """,
        "dedup_passthrough": """
            WITH marked AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE text END AS text
                FROM documents
            ), doubled AS (
                SELECT doc_id, text FROM marked
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text FROM marked
            )
            SELECT min(doc_id) AS doc_id, text FROM doubled
            WHERE text IS NOT NULL GROUP BY text
            UNION ALL
            SELECT doc_id, text FROM doubled WHERE text IS NULL
        """,
        "hll_distinct_users": """
            SELECT count(DISTINCT user_id) AS exact_distinct_users,
                   TRUE AS within_bound
            FROM events
        """,
        "cms_event_type_counts": """
            SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
        """,
        "kll_quantiles": """
            SELECT CAST(q AS DOUBLE) AS q, TRUE AS within_bound
            FROM (VALUES (0.1),(0.25),(0.5),(0.75),(0.9)) AS t(q)
        """,
        "tdigest_quantiles": """
            SELECT CAST(q AS DOUBLE) AS q, TRUE AS within_bound
            FROM (VALUES (0.01),(0.25),(0.5),(0.75),(0.99)) AS t(q)
        """,
    }
