"""Composed training-data cleaning pipeline.

The end-to-end shape an LLM-corpus job actually runs over a crawl (the
reference CLI is the dedup stage of exactly such a pipeline — its
README positions it for "large data sets" line dedup):

    quality gate → language gate → exact dedup (first-wins) →
    MinHash/LSH near-duplicate removal (keep lowest id)

Every stage is one of this library's oracle-verified operators, so the
whole composition stays Spark-first: the two gates are pure Catalyst
column expressions (whole-stage codegen, no Python), exact dedup is one
key shuffle with map-side partial aggregation, and near-dup removal is
the banded-LSH candidate pipeline with exact-Jaccard verification
bounded to candidates.

Scale notes: predicates run BEFORE both shuffles, so the dedup/LSH
stages see only surviving rows — at corpus scale the quality/lang gates
typically drop 30-60% of raw crawl, and Catalyst pushes the column
prunes into the scan. No stage holds per-corpus state on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloom_spark.functions.text import (
    lang_id,
    line_repetition_ratio,
    quality_score,
    redact_pii,
)
from bloom_spark.ops.dedup import exact_dedup
from bloom_spark.ops.neardup import minhash_dedup


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.8,
    langs: tuple[str, ...] = ("en",),
    min_jaccard: float = 0.8,
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    max_repetition: float | None = None,
    redact: bool = False,
    neardup_policy: str = "pairs",
) -> DataFrame:
    """Clean a document corpus for training: keep rows whose quality
    score ≥ ``min_quality`` and predicted language ∈ ``langs``, drop
    exact duplicate texts (first ``id_col`` wins), then remove near
    duplicates at shingle-Jaccard ≥ ``min_jaccard`` (lowest id kept).

    Optional stages (r3, off by default so the composed oracle stays
    byte-stable): ``max_repetition`` adds the Gopher repeated-line gate
    (drop docs whose duplicate-line fraction exceeds it) alongside the
    other Catalyst gates — still below the first exchange;
    ``redact=True`` rewrites ``text_col`` through :func:`redact_pii`
    AFTER dedup (redaction collapses distinct PII into identical
    tokens, so deduping first preserves the reference's exact-line
    semantics on the raw text).

    Returns the surviving rows with the original columns.
    """
    pred = (F.col("__q") >= F.lit(float(min_quality))) & F.col("__lang").isin(
        *langs
    )
    gated = df.withColumn("__q", quality_score(F.col(text_col))).withColumn(
        "__lang", lang_id(F.col(text_col))
    )
    if max_repetition is not None:
        pred = pred & (
            line_repetition_ratio(F.col(text_col)) <= F.lit(float(max_repetition))
        )
    gated = gated.where(pred).drop("__q", "__lang")
    deduped = exact_dedup(gated, [text_col], order_col=id_col)
    out = minhash_dedup(
        deduped, id_col, text_col,
        min_jaccard=min_jaccard, shingle_n=shingle_n,
        num_hashes=num_hashes, bands=bands, policy=neardup_policy,
    )
    if redact:
        out = out.withColumn(text_col, redact_pii(F.col(text_col)))
    return out
