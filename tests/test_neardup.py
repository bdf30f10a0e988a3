"""MinHash/LSH, SimHash, n-gram Jaccard near-dup operators."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bloom_spark.ops.neardup import (
    char_shingles,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_table,
    word_shingles,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def corpus(spark):
    """100 base docs + near-dup copies of 10 of them (one word changed) +
    exact copies of 5. Near-dup ids = base_id + 10_000; exact = +20_000."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where("n_chars > 120")
        .limit(100)
        .select("doc_id", "text")
    )
    near = (
        docs.limit(10)
        .select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.concat(F.substring("text", 1, 200), F.lit(" PERTURBED TAIL")).alias(
                "text"
            ),
        )
    )
    # make near-dups true near-dups: same long prefix, tiny change
    near = near.withColumn(
        "text", F.concat(F.col("text"), F.lit(""))
    )
    exact = docs.limit(5).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    return docs.unionByName(near).unionByName(exact)


def test_shingles(spark):
    df = spark.createDataFrame([("abcdef", "a b c d")], "t string, w string")
    row = df.select(
        char_shingles(F.col("t"), 3).alias("c"),
        word_shingles(F.col("w"), 2).alias("w2"),
    ).collect()[0]
    assert row["c"] == ["abc", "bcd", "cde", "def"]
    assert row["w2"] == ["a b", "b c", "c d"]


def test_ngram_jaccard_exact_copy(spark, corpus):
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=5)
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    # exact copies have jaccard 1.0 with their base
    exact_pairs = [(b, b + 20_000) for b in
                   [r["doc_id"] for r in corpus.where("doc_id < 10000").limit(5).collect()]]
    for p in exact_pairs:
        assert by_pair.get(p) == pytest.approx(1.0)


def test_lsh_candidates_catch_duplicates(spark, corpus):
    cands = minhash_lsh_candidates(corpus, "doc_id", "text")
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    base_ids = [r["doc_id"] for r in
                corpus.where("doc_id < 10000").limit(5).collect()]
    for b in base_ids:
        assert (b, b + 20_000) in got, f"exact copy pair {b} missed by LSH"


def test_minhash_dedup_removes_copies(spark, corpus):
    n_total = corpus.count()
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    deduped = minhash_dedup(corpus, "doc_id", "text", min_jaccard=0.6)
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    # all exact copies gone (their base has the lower id), bases kept
    exact_copy_ids = {i for i in all_ids if i >= 20_000 and i - 20_000 in all_ids}
    assert exact_copy_ids and not (exact_copy_ids & kept)
    assert len(kept) < n_total
    # first-wins: a kept doc never has a kept near-dup with smaller id —
    # spot-check: every exact copy's BASE survived (bases may still drop
    # if they near-dup an even earlier natural doc, so only check those
    # whose base is the pair minimum)
    assert {i - 20_000 for i in exact_copy_ids} & kept


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and AGAIN"),
            (3, "completely unrelated text about database query optimizers"),
        ],
        "id int, text string",
    )
    rows = {r["id"]: r["sh"] for r in
            simhash_table(df, "id", "text", "sh").collect()}
    # case normalization → 1 and 2 identical
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_simhash_pairs_finds_near(spark):
    base = "spark structured streaming processes micro batches with watermarks " \
           "and stateful operators over unbounded sources"
    rows = [(1, base), (2, base.replace("watermarks", "watermark")),
            (3, "grep the logs for retry markers and count flaky tests today")]
    df = spark.createDataFrame(rows, "id int, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(df, "id", "text", max_hamming=8, strict=False).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_neardup_pairs_have_high_jaccard(spark, corpus):
    cands = minhash_lsh_candidates(corpus, "doc_id", "text")
    verified = ngram_jaccard_pairs(
        corpus, "doc_id", "text", min_jaccard=0.6, candidates=cands
    )
    for r in verified.collect():
        assert r["jaccard"] >= 0.6


def test_simhash_dedup_drops_perturbed_copies(spark):
    import pyspark.sql.functions as F

    from bloom_spark.ops.neardup import simhash_dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text").where("doc_id < 200")
    )
    # identical copies: Hamming distance 0 → always within any banding
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    kept = simhash_dedup(docs.unionByName(copies), "doc_id", "text", max_hamming=3)
    ids = [r["doc_id"] for r in kept.select("doc_id").collect()]
    assert all(i < 1_000_000 for i in ids)      # originals win
    assert len(ids) <= docs.count()             # every copy dropped


def test_simhash_strict_guard(spark):
    """r3 review: bands < max_hamming+1 silently lost qualifying pairs;
    now refused unless the caller opts into best-effort recall."""
    import pytest

    from bloom_spark.ops.neardup import simhash_pairs

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, text string")
    with pytest.raises(ValueError, match="strict=False"):
        simhash_pairs(df, "id", "text", max_hamming=8, bands=4).collect()
    # opt-out works (and the valid default geometry needs no opt-out)
    simhash_pairs(df, "id", "text", max_hamming=8, bands=4, strict=False)
    simhash_pairs(df, "id", "text", max_hamming=3, bands=4)
