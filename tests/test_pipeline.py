"""Composed training-data cleaning pipeline (ops/pipeline.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bloom_spark.functions.text import lang_id, quality_score
from bloom_spark.ops.pipeline import clean_corpus

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_clean_corpus_stages_compose(spark, docs):
    """Survivors must be exactly: gated (quality ≥ 0.8, lang en), text-
    distinct with min id, minus near-dup higher ids — cross-checked
    against the stages run independently."""
    kept = clean_corpus(docs, min_quality=0.8, langs=("en",), min_jaccard=0.8)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    gated = docs.where(
        (quality_score(F.col("text")) >= 0.8) & (lang_id(F.col("text")) == "en")
    )
    gated_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert kept_ids <= gated_ids
    assert len(gated_ids) < docs.count()  # the gates actually drop rows
    assert len(kept_ids) > 0

    # every dropped gated doc is dropped for a reason: duplicate text of a
    # lower id, or near-dup (jaccard ≥ 0.8) of a surviving lower id
    from bloom_spark.ops.neardup import ngram_jaccard_pairs

    gated_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            gated, "doc_id", "text", min_jaccard=0.8
        ).collect()
    }
    dup_drops = {b for (a, b) in gated_pairs}
    assert gated_ids - kept_ids <= dup_drops


def test_clean_corpus_removes_injected_duplicates(spark, docs):
    base = docs.where("doc_id < 50")
    copies = base.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    kept = clean_corpus(
        base.unionByName(copies), min_quality=0.0, langs=("en", "und", "de", "fr", "pl"),
        min_jaccard=0.8,
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert all(i < 1000 for i in ids)  # originals win, exact copies dropped


def test_clean_corpus_optional_stages(spark):
    """r3: repetition gate drops self-repeating docs below the first
    exchange; redact=True rewrites text after dedup."""
    import pyspark.sql.functions as F

    from bloom_spark.ops.pipeline import clean_corpus

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # self-repeating but NOT a near-dup of any corpus doc (tripling an
    # existing text keeps its shingle set → minhash removes it even
    # without the gate); English-ish so the quality/lang gates pass it
    rep_line = "the cat and the dog sit in the house and it is warm"
    rep = spark.createDataFrame(
        [(900_000 + i, "\n".join([rep_line + f" {i}"] * 6), "en", "src0", 100)
         for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # standalone texts (NOT near-dups of corpus docs — appending an email
    # to an existing text keeps Jaccard ≥ 0.8 and dedup would drop them)
    pii = spark.createDataFrame(
        [(950_000 + i,
          f"please write to the team number {i} at zz@qq.org and it is "
          "the best way to reach the office in the morning", "en", "src0", 100)
         for i in range(3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus = docs.unionByName(rep).unionByName(pii)
    base = clean_corpus(corpus, min_quality=0.0)
    gated = clean_corpus(corpus, min_quality=0.0, max_repetition=0.5)
    kept_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert not any(i >= 900_000 and i < 950_000 for i in kept_ids)
    assert base.count() > gated.count()
    red = clean_corpus(corpus, min_quality=0.0, redact=True)
    reds = [r["text"] for r in red.where("doc_id >= 950000").collect()]
    assert reds and all("<EMAIL>" in t and "zz@qq.org" not in t for t in reds)
