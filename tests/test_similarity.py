"""Embedding similarity search: brute-force cosine top-k + LSH path."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from bloom_spark.ops.similarity import (
    brute_force_topk,
    cosine,
    cosine_neardup_pairs,
    lsh_topk,
)

SF = "/root/testdata/sf0.01"
DIM = 64


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]),
         ([1.0, 2.0], [2.0, 4.0])],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(1.0)


def test_self_query_is_top1(spark, emb):
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(emb, queries, k=3)
    top1 = {r["query_id"]: r["vec_id"] for r in top.where("rank = 1").collect()}
    for qid, vid in top1.items():
        assert qid == vid  # identical vector → cosine 1.0, tie-broken by id? self wins


def test_topk_matches_duckdb(spark, emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    top = brute_force_topk(emb, queries, k=5)
    mine = {(r["query_id"], r["rank"]): (r["vec_id"], round(r["cos"], 9))
            for r in top.collect()}
    oracle = duckdb.sql(
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM '{SF}/embeddings.parquet'),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e
                   ORDER BY vec_id LIMIT 3),
             scored AS (
               SELECT q.query_id, e.vec_id,
                      list_cosine_similarity(e.v, q.qv) AS cos,
                      row_number() OVER (PARTITION BY q.query_id
                                         ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                                                  e.vec_id ASC) AS rank
               FROM e CROSS JOIN q)
        SELECT query_id, rank, vec_id, cos FROM scored WHERE rank <= 5
        """
    ).fetchall()
    for qid, rank, vid, cos in oracle:
        got_vid, got_cos = mine[(qid, rank)]
        assert got_vid == vid
        assert got_cos == pytest.approx(cos, abs=1e-6)


def test_lsh_recall(spark, emb):
    queries = emb.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, queries, k=5)
    # this corpus has weak neighbors (rank-2 cos ≈ 0.37), so short codes +
    # many tables; measured recall 0.99 at (4, 24)
    approx = lsh_topk(emb, queries, k=5, dim=DIM, n_planes=4, n_tables=24)
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"LSH recall too low: {recall}"
    # approx cosines are exact cosines (re-ranked exactly)
    assert all(r["cos"] <= 1.0 + 1e-9 for r in approx.collect())


def test_lsh_indexed_matches_inline(spark, emb):
    """The precomputed-index probe path must return the same result set
    as the inline lsh_topk (same planes/seed), without re-hashing the
    corpus per query."""
    from bloom_spark.ops.similarity import lsh_index, lsh_topk_indexed

    queries = emb.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    inline = lsh_topk(emb, queries, k=5, dim=DIM, n_planes=4, n_tables=24)
    index = lsh_index(emb, dim=DIM, n_planes=4, n_tables=24).persist()
    try:
        indexed = lsh_topk_indexed(
            index, queries, k=5, dim=DIM, n_planes=4, n_tables=24
        )
        a = {(r["query_id"], r["rank"], r["vec_id"]) for r in inline.collect()}
        b = {(r["query_id"], r["rank"], r["vec_id"]) for r in indexed.collect()}
    finally:
        index.unpersist()
    assert a == b


def test_lsh_indexed_max_bucket_caps_candidates(spark, emb):
    """With a tiny cap most buckets drop; results stay a valid (possibly
    lower-recall) top-k and never error — the skew guard for degenerate
    mega-buckets."""
    from bloom_spark.ops.similarity import lsh_index, lsh_topk_indexed

    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    index = lsh_index(emb, dim=DIM, n_planes=2, n_tables=2)  # big buckets
    capped = lsh_topk_indexed(
        index, queries, k=5, dim=DIM, n_planes=2, n_tables=2, max_bucket=50
    ).collect()
    uncapped = lsh_topk_indexed(
        index, queries, k=5, dim=DIM, n_planes=2, n_tables=2
    ).collect()
    assert len(capped) <= len(uncapped)
    assert all(r["rank"] <= 5 for r in capped)


def test_cosine_neardup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             cosine_neardup_pairs(df, min_cos=0.99).collect()}
    assert pairs == {(1, 2)}


def test_ivf_topk_recall(spark, emb):
    from bloom_spark.ops.similarity import ivf_topk, train_centroids

    embd = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = train_centroids(embd, n_cells=8, sample=500)
    assert cents.shape == (8, DIM)
    queries = embd.limit(15).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(embd, queries, k=5)
    approx = ivf_topk(embd, queries, k=5, centroids=cents, nprobe=3)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # nprobe = n_cells degenerates to exact
    full = ivf_topk(embd, queries, k=5, centroids=cents, nprobe=8)
    f = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert f == e


def test_lsh_topk_indexed_string_query_ids(spark):
    """r3 review: the driver-built probe schema hardcoded the query-id
    type as long; string ids must work like every sibling path."""
    import numpy as np

    from bloom_spark.ops.similarity import lsh_index, lsh_topk_indexed

    rng = np.random.default_rng(5)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("q-one", [float(x) for x in rng.normal(size=8)]),
         ("q-two", [float(x) for x in rng.normal(size=8)])],
        "query_id string, embedding array<double>",
    )
    idx = lsh_index(corpus, 8, n_planes=4, n_tables=6)
    out = lsh_topk_indexed(idx, queries, k=3, dim=8, n_planes=4, n_tables=6)
    got = {r["query_id"] for r in out.collect()}
    assert got <= {"q-one", "q-two"} and got


def test_ivf_topk_sweep_matches_per_nprobe(spark, emb):
    """r4: the recall sweep evaluates several nprobe settings in ONE
    scan+join+window pass; each tagged slice must equal the standalone
    ivf_topk at that setting (same centroids, same tie order)."""
    from bloom_spark.ops.similarity import (
        ivf_topk,
        ivf_topk_sweep,
        train_centroids,
    )

    embd = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = train_centroids(embd, n_cells=8, sample=500)
    queries = embd.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    sweep = ivf_topk_sweep(
        embd, queries, k=5, centroids=cents, nprobes=[3, 8]
    ).collect()
    for nprobe in (3, 8):
        want = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                embd, queries, k=5, centroids=cents, nprobe=nprobe
            ).collect()
        }
        got = {
            (r["query_id"], r["vec_id"])
            for r in sweep
            if r["__nprobe"] == nprobe
        }
        assert got == want, f"nprobe={nprobe} diverged"


def test_ivf_precomputed_cell_col_matches_inline(spark, emb):
    """r4: a persisted cell-assignment column (the write-once indexing
    artifact) must probe identically to the inline assignment path."""
    from bloom_spark.ops.similarity import (
        ivf_cell_udf,
        ivf_topk,
        train_centroids,
    )

    embd = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = train_centroids(embd, n_cells=8, sample=500)
    queries = embd.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
    with_cells = embd.withColumn(
        "cell", ivf_cell_udf(cents)(F.col("embedding"))
    )
    inline = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(
            embd, queries, k=5, centroids=cents, nprobe=3
        ).collect()
    }
    precomp = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(
            with_cells, queries, k=5, centroids=cents, nprobe=3,
            cell_col="cell",
        ).collect()
    }
    assert precomp == inline
