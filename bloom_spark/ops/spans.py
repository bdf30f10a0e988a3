"""Exact-substring duplication — sliding-window span dedup signals.

MinHash/SimHash (``ops.neardup``) catch whole-document near-duplicates;
they miss the other dominant contamination mode in web corpora: long
VERBATIM substrings repeated across otherwise-distinct pages (licence
boilerplate, templated footers, syndicated paragraphs). Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL 2022)
showed removing such exact substrings (their suffix-array ExactSubstr,
50-token windows) improves LMs beyond document-level dedup.

A suffix array is the wrong shape for a cluster; the distributed
equivalent is sliding-window span grouping: emit every ``span_len``-char
window (every ``stride`` chars) per document, group by span, and a span
seen in ≥ ``min_docs`` DISTINCT documents marks a duplicated region.
That is one explode + one aggregation — pure Catalyst, no Python on
the data path.

Scale shape: span generation is a JVM ``transform(sequence(...))`` —
no UDF, no shuffle; the single shuffle groups spans. Production groups
on ``xxhash64(span)`` (8-byte shuffle keys, collision odds ~n²/2⁶⁴);
``hash_spans=False`` ships span strings instead — bit-identical to the
SQL oracle, used by the correctness harness at small SF. ``stride``
trades recall for volume exactly like ExactSubstr's window stride: a
duplicated region ≥ span_len + stride − 1 chars is always hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 40,
    stride: int = 1,
) -> DataFrame:
    """Explode each document into (id, pos, span) sliding windows.

    Docs shorter than ``span_len`` emit nothing (they cannot contain a
    full window — ExactSubstr semantics). Generation is JVM-side:
    ``transform(sequence(1, len-span_len+1, stride), i -> substring)``
    inside whole-stage codegen."""
    spans = F.expr(
        f"transform(sequence(1, length({text_col}) - {span_len} + 1, {stride}), "
        f"i -> struct(i AS pos, substring({text_col}, i, {span_len}) AS span))"
    )
    return (
        df.where(F.length(F.col(text_col)) >= span_len)
        .select(F.col(id_col), F.explode(spans).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.span").alias("span"))
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 40,
    stride: int = 1,
    min_docs: int = 2,
    hash_spans: bool = True,
) -> DataFrame:
    """Per-document exact-substring duplication counts.

    Returns (id, total_spans, dup_spans, dup_frac): how many of the
    document's windows are verbatim-shared with ≥ ``min_docs-1`` OTHER
    documents. Downstream policy is the caller's (drop the doc, cut the
    region, weight the loss) — this op produces the signal.

    Plan: spans → [optional xxhash64] → one aggregation on the span key
    (count distinct docs, map-side partial) → shared keys joined back
    onto the span rows (the join reuses the key partitioning from the
    aggregation side) → ONE per-doc aggregation computing total and
    dup counts together. Two key shuffles + one doc shuffle total;
    nothing driver-side, no whole-group materialization.
    """
    spans = doc_spans(df, id_col, text_col, span_len, stride)
    key = F.xxhash64("span") if hash_spans else F.col("span")
    keyed = spans.select(id_col, key.alias("__sk"))

    shared = (
        keyed.groupBy("__sk")
        .agg(F.count_distinct(F.col(id_col)).alias("__ndocs"))
        .where(F.col("__ndocs") >= min_docs)
        .select("__sk", F.lit(True).alias("__dup"))
    )
    flagged = keyed.join(shared, "__sk", "left_outer")
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("total_spans"),
        F.count("__dup").alias("dup_spans"),
        (F.count("__dup") / F.count("*")).alias("dup_frac"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 40,
    stride: int = 1,
    min_docs: int = 2,
    hash_spans: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """CUT duplicated regions out of the text — the ExactSubstr action
    (Lee et al. 2022 remove the duplicated substring itself, not the
    document): every character covered by a window verbatim-shared with
    ≥ ``min_docs-1`` other documents is excised; the remainder is
    concatenated in order.

    Plan: span keys → shared-key aggregation (as
    :func:`duplicate_spans`) → left-semi back onto the span rows → ONE
    per-doc ``collect_list(pos)`` of duplicated window starts (bounded
    by the doc's own length — the same order of memory as the text
    itself) → join onto the input → excision as a pure Catalyst
    ``aggregate`` cursor sweep over the sorted positions (merge
    overlapping [p, p+span_len) intervals and keep the gaps) — no
    Python on the data path.

    ``out_col`` defaults to replacing ``text_col``. Documents with no
    duplicated window (or shorter than ``span_len``) pass through
    byte-identical.
    """
    out_col = out_col or text_col
    spans = doc_spans(df, id_col, text_col, span_len, stride)
    key = F.xxhash64("span") if hash_spans else F.col("span")
    keyed = spans.select(id_col, "pos", key.alias("__sk"))
    shared = (
        keyed.groupBy("__sk")
        .agg(F.count_distinct(F.col(id_col)).alias("__ndocs"))
        .where(F.col("__ndocs") >= min_docs)
        .select("__sk")
    )
    dup_pos = (
        keyed.join(shared, "__sk", "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__dup_pos"))
    )
    joined = df.join(dup_pos, id_col, "left_outer")
    # cursor sweep: cur = first unexcised 1-based position; for each
    # duplicated window start p (ascending): keep [cur, p), jump cur past
    # the window; overlapping/adjacent windows merge via greatest().
    excised = F.expr(
        f"""
        aggregate(
          __dup_pos,
          struct(CAST(1 AS INT) AS cur, CAST('' AS STRING) AS acc),
          (st, p) -> struct(
            CAST(greatest(st.cur, p + {int(span_len)}) AS INT) AS cur,
            CASE WHEN p > st.cur
                 THEN concat(st.acc, substring({text_col}, st.cur, p - st.cur))
                 ELSE st.acc END AS acc),
          st -> concat(st.acc,
                       substring({text_col}, st.cur, length({text_col}))))
        """
    )
    cleaned = F.when(F.col("__dup_pos").isNull(), F.col(text_col)).otherwise(
        excised
    )
    return joined.withColumn(out_col, cleaned).drop("__dup_pos")
