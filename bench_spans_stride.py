"""Stride sweep for duplicate_spans / remove_duplicate_spans (VERDICT r4
item 7): measure wall + recall at stride ∈ {1, 4, 16} so the default is
a documented choice, not silently O(len(text)) shuffle rows at 100 TB.

Recall definition: stride=1 is ground truth. For stride s, a document's
duplicated-character coverage (union of [p, p+span_len) over detected
duplicate windows) is compared against the stride=1 coverage; we report
the corpus-level ratio of covered duplicate characters (char_recall)
and the doc-level detection rate (a doc with ≥1 duplicated window at
stride 1 also flagged at stride s). The span_len+stride−1 guarantee
means long duplicated regions are always hit; only regions shorter
than span_len+s−1 can be missed, so recall degrades gracefully with s.

Run: python bench_spans_stride.py [sf_dir]  (default /root/testdata/sf0.1)
Prints one JSON line per stride plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from bloom_spark.ops.spans import doc_spans, duplicate_spans
from bloom_spark.session import get_session


def coverage(df, id_col, text_col, span_len, stride, min_docs=2,
             winnow_w=None):
    """Per-doc duplicated-character coverage as sorted merged intervals →
    total covered chars (pure Catalyst, same sweep the excision uses)."""
    spans = doc_spans(df, id_col, text_col, span_len, stride,
                      winnow_w=winnow_w)
    keyed = spans.select(id_col, "pos", F.xxhash64("span").alias("__sk"))
    shared = (
        keyed.groupBy("__sk")
        .agg(F.count_distinct(F.col(id_col)).alias("n"))
        .where(F.col("n") >= min_docs)
        .select("__sk")
    )
    dup_pos = (
        keyed.join(shared, "__sk", "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
    )
    covered = F.expr(
        f"""
        aggregate(ps, struct(CAST(0 AS INT) AS cur, CAST(0 AS LONG) AS tot),
          (st, p) -> struct(
            CAST(greatest(st.cur, p + {span_len}) AS INT) AS cur,
            st.tot + greatest(p + {span_len}, st.cur)
                   - greatest(p, st.cur) AS tot),
          st -> st.tot)
        """
    )
    return dup_pos.select(id_col, covered.alias("dup_chars"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    span_len = 40
    spark = get_session()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.count()  # warm the scan

    results = {}
    modes = [("s1", 1, None), ("s4", 4, None), ("s16", 16, None),
             ("w4", 1, 4), ("w8", 1, 8), ("w16", 1, 16)]
    for label, stride, winnow_w in modes:
        t0 = time.time()
        sig = duplicate_spans(docs, "doc_id", "text", span_len=span_len,
                              stride=stride, winnow_w=winnow_w)
        agg = sig.agg(
            F.count("*").alias("docs"),
            F.sum(F.col("total_spans")).alias("total_spans"),
            F.sum(F.col("dup_spans")).alias("dup_spans"),
            F.count(F.when(F.col("dup_spans") > 0, 1)).alias("flagged_docs"),
        ).collect()[0]
        wall = time.time() - t0
        cov = coverage(docs, "doc_id", "text", span_len, stride,
                       winnow_w=winnow_w)
        dup_chars = cov.agg(F.sum("dup_chars")).collect()[0][0] or 0
        results[label] = {
            "mode": label,
            "wall_s": round(wall, 2),
            "span_rows": int(agg["total_spans"]),
            "dup_span_rows": int(agg["dup_spans"]),
            "flagged_docs": int(agg["flagged_docs"]),
            "dup_chars": int(dup_chars),
        }
        print(json.dumps(results[label]))

    base = results["s1"]
    summary = {
        "sf_dir": sf_dir,
        "span_len": span_len,
        "modes": {
            s: {
                "wall_vs_s1": round(r["wall_s"] / base["wall_s"], 3),
                "rows_vs_s1": round(r["span_rows"] / base["span_rows"], 4),
                "char_recall": round(
                    r["dup_chars"] / max(base["dup_chars"], 1), 4
                ),
                "doc_recall": round(
                    r["flagged_docs"] / max(base["flagged_docs"], 1), 4
                ),
            }
            for s, r in results.items()
        },
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
