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
SQL oracle, used by the correctness harness at small SF.

Volume levers — stride=1 is exhaustive ExactSubstr (shuffle rows ≈
total corpus CHARACTERS, O(len) per doc — untenable at 100 TB), and
there are two ways to thin it:

- ``stride > 1`` (positional): emit every stride-th window. Cheap, but
  ALIGNMENT-FRAGILE for cross-document detection: each copy of a
  duplicated region emits windows at its own offsets mod stride, and
  if the copies disagree mod stride the emitted substrings differ and
  the span-group join never matches — an arbitrarily LONG duplicated
  region can be missed entirely (pinned by
  test_positional_stride_misses_misaligned_regions). Only safe when
  duplicates are known to be alignment-preserving (e.g. whole-document
  or same-prefix copies).
- ``winnow_w = w`` (content-defined, the DEFAULT, w=8): winnowing
  (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS fingerprint
  selector). Hash every window position, then from each run of ``w``
  consecutive position-hashes keep the minimum (rightmost on ties).
  Selection depends only on CONTENT, so both copies of a duplicated
  region pick identical anchors no matter how the region is aligned,
  and every ``w`` consecutive positions contain ≥1 anchor — a
  duplicated region ≥ span_len + w − 1 chars is ALWAYS detected, at
  ~2/(w+1) of the stride=1 shuffle volume (the published expected
  winnowing density).

Measured (bench_spans_stride.py, sf0.1, span_len=40): see PLANS.md
§14. The oracle queries pin exhaustive mode (stride=1, winnow_w=None)
or replay winnowing exactly via the md5 anchor hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_ANCHOR_HASHES = {
    # production: 8-byte JVM hash of the window
    "xxhash64": "xxhash64(substring({text}, CAST(i AS INT), {L}))",
    # oracle mode: DuckDB computes the identical md5 hex string, so the
    # winnowing selection replays bit-identically in ANSI-ish SQL
    "md5": "md5(substring({text}, CAST(i AS INT), {L}))",
}


def _winnow_positions_expr(
    text_col: str, span_len: int, w: int, anchor_hash: str
) -> tuple[str, str]:
    """(hash-array expr, anchor-positions expr over column ``__hs``):
    winnowing — from every run of ``w`` consecutive window hashes keep
    the position of the minimum, rightmost on ties (Schleimer et al.
    2003). Pure Catalyst; O(P·w) comparisons JVM-side, and only the
    ~2P/(w+1) anchors reach the explode/shuffle."""
    h = _ANCHOR_HASHES[anchor_hash].format(text=text_col, L=span_len)
    hs = (
        f"transform(sequence(1, length({text_col}) - {span_len} + 1), i -> {h})"
    )
    # window t covers hash positions [t, t+w-1] (clamped to P so the
    # last/short windows stay well-formed — Spark's sequence() would
    # otherwise run DESCENDING when upper < lower); `<=` keeps the
    # RIGHTMOST minimum, the published tie rule
    anchors = f"""
        array_distinct(transform(
          sequence(1, greatest(size(__hs) - {w - 1}, 1)),
          t -> aggregate(
            sequence(least(t + 1, size(__hs)),
                     least(t + {w - 1}, size(__hs))),
            t,
            (best, j) -> IF(element_at(__hs, j) <= element_at(__hs, best),
                            j, best))))
    """
    return hs, anchors


def doc_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 40,
    stride: int = 1,
    winnow_w: int | None = None,
    anchor_hash: str = "xxhash64",
) -> DataFrame:
    """Explode each document into (id, pos, span) windows.

    Docs shorter than ``span_len`` emit nothing (they cannot contain a
    full window — ExactSubstr semantics). Three modes, all JVM-side
    whole-stage codegen, no Python:

    - default: every window (exhaustive, ``transform(sequence(...))``);
    - ``stride > 1``: every stride-th window — alignment-fragile for
      cross-doc matching, see module docstring;
    - ``winnow_w = w``: content-defined winnowing anchors — both copies
      of a duplicated region ≥ span_len + w − 1 chars always emit at
      least one IDENTICAL window (module docstring).
    """
    if winnow_w is not None:
        if stride != 1:
            raise ValueError("winnow_w and stride>1 are mutually exclusive")
        if winnow_w < 2:
            raise ValueError("winnow_w must be >= 2 (1 == exhaustive)")
        hs, anchors = _winnow_positions_expr(
            text_col, span_len, winnow_w, anchor_hash
        )
        return (
            df.where(F.length(F.col(text_col)) >= span_len)
            .withColumn("__hs", F.expr(hs))
            .select(F.col(id_col), F.col(text_col), F.explode(F.expr(anchors)).alias("pos"))
            .select(
                id_col,
                "pos",
                F.expr(f"substring({text_col}, pos, {span_len})").alias("span"),
            )
        )
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
    winnow_w: int | None = 8,
    anchor_hash: str = "xxhash64",
) -> DataFrame:
    """Per-document exact-substring duplication counts.

    Returns (id, total_spans, dup_spans, dup_frac): how many of the
    document's windows are verbatim-shared with ≥ ``min_docs-1`` OTHER
    documents. Downstream policy is the caller's (drop the doc, cut the
    region, weight the loss) — this op produces the signal.

    Default ``winnow_w=8``: content-defined anchor selection at ~2/9 of
    the exhaustive shuffle volume with the deterministic guarantee that
    any duplicated region ≥ span_len+7 chars is detected (module
    docstring) — NOT silently O(len(text)) shuffle rows at 100 TB. Pass
    ``winnow_w=None`` for exhaustive ExactSubstr (counts every window —
    the SQL-oracle mode).

    Plan: spans → [optional xxhash64] → one aggregation on the span key
    (count distinct docs, map-side partial) → shared keys joined back
    onto the span rows (the join reuses the key partitioning from the
    aggregation side) → ONE per-doc aggregation computing total and
    dup counts together. Two key shuffles + one doc shuffle total;
    nothing driver-side, no whole-group materialization.
    """
    spans = doc_spans(
        df, id_col, text_col, span_len, stride,
        winnow_w=winnow_w, anchor_hash=anchor_hash,
    )
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
    winnow_w: int | None = 8,
    anchor_hash: str = "xxhash64",
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

    Default ``winnow_w=8`` (see :func:`duplicate_spans`): every
    duplicated region ≥ span_len+7 is detected and excised over
    [first anchor, last anchor + span_len) — anchors sit ≤ w apart
    inside the region and each window covers span_len ≥ w chars, so the
    excision is contiguous across the region's interior; up to w−1
    chars at each region EDGE may survive. ``winnow_w=None`` excises
    exhaustively (the oracle mode).
    """
    out_col = out_col or text_col
    spans = doc_spans(
        df, id_col, text_col, span_len, stride,
        winnow_w=winnow_w, anchor_hash=anchor_hash,
    )
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
