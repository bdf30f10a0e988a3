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
