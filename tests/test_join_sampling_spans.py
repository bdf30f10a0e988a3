"""Tests for ops.join (bloom_join), ops.sampling (bottom_k_sample),
and ops.spans (duplicate_spans)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bloom_spark.ops import (
    bloom_join,
    bottom_k_sample,
    doc_spans,
    duplicate_spans,
    hash_rank,
)
from bloom_spark.sketch import BloomSketch


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# --------------------------------------------------------------------- join


@pytest.fixture(scope="module")
def join_sides(spark):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("lv")
    )
    # right keys overlap on multiples of 7 only; some right-only keys too
    right = spark.range(0, 600).select(
        (F.col("id") * 7).alias("k"), (F.col("id") % 5).alias("rv")
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left_semi", "left_anti", "left_outer"])
def test_bloom_join_matches_plain_join(spark, join_sides, how):
    left, right = join_sides
    got = bloom_join(spark, left, right, ["k"], how=how, fpr=1e-6)
    want = left.join(right, ["k"], how)
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    assert _rows(got, *cols) == _rows(want, *cols)


def test_bloom_join_exact_even_at_high_fpr(spark, join_sides):
    # false positives must be removed by the real join: crank fpr way up
    left, right = join_sides
    got = bloom_join(spark, left, right, ["k"], how="inner", fpr=0.5)
    want = left.join(right, ["k"], "inner")
    assert _rows(got, "k", "lv", "rv") == _rows(want, "k", "lv", "rv")


def test_bloom_join_prebuilt_sketch_and_path(spark, join_sides, tmp_path):
    from bloom_spark.ops.build import build_sketch

    left, right = join_sides
    sk, _ = build_sketch(right, ["k"], lambda: BloomSketch.from_fpr(600, 1e-6))
    want = _rows(left.join(right, ["k"], "left_semi"), "k", "lv")

    got_mem = bloom_join(spark, left, right, ["k"], "left_semi", sketch=sk)
    assert _rows(got_mem, "k", "lv") == want

    p = str(tmp_path / "keys.bloom")
    with open(p, "wb") as fh:
        fh.write(sk.to_bytes())
    got_path = bloom_join(spark, left, right, ["k"], "left_semi", sketch=p)
    assert _rows(got_path, "k", "lv") == want


def test_bloom_join_rejects_unsupported_how(spark, join_sides):
    left, right = join_sides
    with pytest.raises(ValueError, match="bloom_join supports"):
        bloom_join(spark, left, right, ["k"], how="full_outer")


# ----------------------------------------------------------------- sampling


@pytest.fixture(scope="module")
def grouped_rows(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") * 11 % 997).alias("v"),
    )


def _window_reference(df, k):
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.xxhash64("rid"), "rid")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


@pytest.mark.parametrize("pre_trim", [True, False])
def test_bottom_k_matches_window_reference(grouped_rows, pre_trim):
    got = bottom_k_sample(
        grouped_rows, ["g"], k=9, id_cols=["rid"], pre_trim=pre_trim
    )
    want = _window_reference(grouped_rows, 9)
    assert _rows(got, "g", "rid", "v") == _rows(want, "g", "rid", "v")


def test_bottom_k_stable_under_repartition(grouped_rows):
    a = bottom_k_sample(grouped_rows, ["g"], k=4, id_cols=["rid"])
    b = bottom_k_sample(
        grouped_rows.repartition(17, "v"), ["g"], k=4, id_cols=["rid"]
    )
    assert _rows(a, "g", "rid") == _rows(b, "g", "rid")


def test_bottom_k_mergeable(spark, grouped_rows):
    # bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — the partial-
    # sketch property that makes the pre-trim (and cross-batch folds)
    # correct
    a = grouped_rows.where(F.col("rid") < 2500)
    b = grouped_rows.where(F.col("rid") >= 2500)
    whole = bottom_k_sample(grouped_rows, ["g"], k=6, id_cols=["rid"])
    merged = bottom_k_sample(
        bottom_k_sample(a, ["g"], k=6, id_cols=["rid"]).unionByName(
            bottom_k_sample(b, ["g"], k=6, id_cols=["rid"])
        ),
        ["g"],
        k=6,
        id_cols=["rid"],
    )
    assert _rows(whole, "g", "rid") == _rows(merged, "g", "rid")


def test_bottom_k_small_groups_kept_whole(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, rid long"
    )
    got = bottom_k_sample(df, ["g"], k=10, id_cols=["rid"])
    assert got.count() == 3


def test_bottom_k_requires_deterministic_rank(grouped_rows):
    with pytest.raises(ValueError, match="deterministic"):
        bottom_k_sample(grouped_rows, ["g"], k=3)


def test_bottom_k_supplied_rank_requires_tiebreaker(grouped_rows):
    """ADVICE r4: a caller-supplied rank with no id_cols breaks ties by
    physical row order in both the pre-trim and the final row_number —
    refuse unless the caller asserts tie-freeness with id_cols=[]."""
    with pytest.raises(ValueError, match="id_cols"):
        bottom_k_sample(grouped_rows, ["g"], k=3, rank=F.col("v") % 2)
    # explicit empty list = caller asserts the rank is tie-free
    got = bottom_k_sample(
        grouped_rows, ["g"], k=3, rank=F.col("rid"), id_cols=[]
    )
    assert got.count() > 0


def test_hash_rank_is_xxhash64(spark):
    df = spark.createDataFrame([(1,), (2,)], "rid long")
    got = df.select(hash_rank(["rid"]).alias("h"), F.xxhash64("rid").alias("x"))
    assert all(r.h == r.x for r in got.collect())


# -------------------------------------------------------------------- spans


@pytest.fixture(scope="module")
def span_docs(spark):
    boiler = "ALL RIGHTS RESERVED COPYRIGHT NOTICE FOOTER"  # 43 chars
    rows = [
        (1, "unique text one with nothing shared at all here body"),
        (2, "prefix article text " + boiler + " suffix tail body"),
        (3, "totally different page " + boiler + " other ending"),
        (4, "short"),  # below span_len: no windows
        (5, "another fully unique document body with no repeats in"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_spans_positions_and_short_doc(span_docs):
    got = doc_spans(span_docs, "doc_id", "text", span_len=30, stride=1)
    by_doc = {
        r.doc_id: r.n
        for r in got.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert 4 not in by_doc  # shorter than the window
    texts = {r.doc_id: r.text for r in span_docs.collect()}
    for d, n in by_doc.items():
        assert n == len(texts[d]) - 30 + 1
    first = got.where((F.col("doc_id") == 1) & (F.col("pos") == 1)).first()
    assert first.span == texts[1][:30]


def test_doc_spans_stride(span_docs):
    got = doc_spans(span_docs, "doc_id", "text", span_len=30, stride=7)
    pos = [r.pos for r in got.where(F.col("doc_id") == 1).collect()]
    assert pos == list(range(1, len("unique text one with nothing shared at all here body") - 29, 7))


def test_duplicate_spans_finds_boilerplate(span_docs):
    got = duplicate_spans(
        span_docs, "doc_id", "text", span_len=30, stride=1, hash_spans=False,
        winnow_w=None,
    )
    rows = {r.doc_id: r for r in got.collect()}
    # docs 2 and 3 share " "+boilerplate+" " (45 chars, the flanking
    # spaces are shared too) → 45-30+1 = 16 windows each; unique docs 0
    assert rows[2].dup_spans == 16
    assert rows[3].dup_spans == 16
    assert rows[1].dup_spans == 0
    assert rows[5].dup_spans == 0
    assert 4 not in rows
    assert rows[2].dup_frac == pytest.approx(16 / rows[2].total_spans)


def test_duplicate_spans_hash_path_matches_string_path(span_docs):
    a = duplicate_spans(span_docs, "doc_id", "text", 30, 1, hash_spans=True)
    b = duplicate_spans(span_docs, "doc_id", "text", 30, 1, hash_spans=False)
    cols = ["doc_id", "total_spans", "dup_spans"]
    assert _rows(a, *cols) == _rows(b, *cols)


def test_duplicate_spans_within_doc_repeat_not_cross_doc(spark):
    # a doc repeating its own 30-gram is NOT cross-doc duplication
    text = "Z" * 35 + " middle filler words here " + "Z" * 35
    df = spark.createDataFrame(
        [(1, text), (2, "entirely unrelated other document text body")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.dup_spans for r in
           duplicate_spans(df, "doc_id", "text", 30, 1).collect()}
    assert got[1] == 0 and got[2] == 0


# ------------------------------------------------------------- span excision
def test_remove_duplicate_spans_cuts_shared_region(spark):
    """The ExactSubstr ACTION: characters covered by cross-doc shared
    windows are excised, everything else is byte-identical; overlapping
    windows inside the shared run merge into one cut."""
    from bloom_spark.ops.spans import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "xxxxABCDEFGHIJyyyy"),
            (2, "ppppppABCDEFGHIJqq"),
            (3, "no shared content here at all"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            docs, "doc_id", "text", span_len=5, stride=1,
            min_docs=2, hash_spans=False, winnow_w=None,
        ).collect()
    }
    assert out == {
        1: "xxxxyyyy",
        2: "ppppppqq",
        3: "no shared content here at all",
        4: "tiny",
    }


def test_remove_duplicate_spans_whole_doc_and_out_col(spark):
    """A fully duplicated doc excises to the empty string; out_col keeps
    the original text column intact; hash path matches the string path."""
    from bloom_spark.ops.spans import remove_duplicate_spans

    same = "identical document text shared verbatim"
    other = "zq wholly different corpus entry"  # no 10-gram in common
    docs = spark.createDataFrame(
        [(1, same), (2, same), (3, other)],
        "doc_id long, text string",
    )
    out = remove_duplicate_spans(
        docs, "doc_id", "text", span_len=10, stride=1,
        min_docs=2, hash_spans=True, winnow_w=None, out_col="clean",
    )
    rows = {r["doc_id"]: (r["text"], r["clean"]) for r in out.collect()}
    assert rows[1] == (same, "")
    assert rows[2] == (same, "")
    assert rows[3][0] == rows[3][1] == other


def test_bottom_k_null_group_keys_sampled(spark):
    """A NULL group key is a group (Spark window semantics); the pandas
    pre-trim must not silently drop it (groupby dropna default)."""
    from bloom_spark.ops.sampling import bottom_k_sample

    rows = [(i, "en" if i % 2 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = bottom_k_sample(df, ["lang"], k=3, id_cols=["doc_id"], pre_trim=True)
    got = {(r["lang"], r["doc_id"]) for r in out.collect()}
    want = {
        (r["lang"], r["doc_id"])
        for r in bottom_k_sample(
            df, ["lang"], k=3, id_cols=["doc_id"], pre_trim=False
        ).collect()
    }
    assert got == want
    assert sum(1 for g, _ in got if g is None) == 3


def test_weighted_sample_matches_driver_reference(spark):
    """Efraimidis–Spirakis keys computed identically driver-side pick
    the same per-group sample; pre-trim and window paths agree."""
    import math

    from bloom_spark.ops.sampling import weighted_bottom_k_sample

    rows = [(i, str(i % 3), float(1 + (i * 7) % 10)) for i in range(300)]
    df = spark.createDataFrame(rows, "rid long, g string, w double")
    got = {
        (r["g"], r["rid"])
        for r in weighted_bottom_k_sample(
            df, ["g"], k=5, weight_col="w", id_cols=["rid"]
        ).collect()
    }
    # reference: same u (from the JVM hash, read back) and key formula
    udf = spark.createDataFrame(rows, "rid long, g string, w double").selectExpr(
        "rid", "g", "w",
        f"((xxhash64(rid) & {(1 << 53) - 1}) + 0.5d) / {float(1 << 53)}d AS u",
    )
    ref = {}
    for r in udf.collect():
        ref.setdefault(r["g"], []).append((-math.log(r["u"]) / r["w"], r["rid"]))
    want = {
        (g, rid)
        for g, keys in ref.items()
        for _, rid in sorted(keys)[:5]
    }
    assert got == want
    # no pre-trim path agrees
    got2 = {
        (r["g"], r["rid"])
        for r in weighted_bottom_k_sample(
            df, ["g"], k=5, weight_col="w", id_cols=["rid"], pre_trim=False
        ).collect()
    }
    assert got2 == got


def test_weighted_sample_respects_weights(spark):
    """A group where one row carries overwhelming weight must (with this
    fixed hash) select it; zero/negative/null weights never sampled."""
    from bloom_spark.ops.sampling import weighted_bottom_k_sample

    rows = [(i, "g", 1e-6) for i in range(50)] + [
        (100, "g", 1e9),
        (101, "g", 0.0),
        (102, "g", -5.0),
        (103, "g", None),
    ]
    df = spark.createDataFrame(rows, "rid long, g string, w double")
    got = {r["rid"] for r in weighted_bottom_k_sample(
        df, ["g"], k=3, weight_col="w", id_cols=["rid"]
    ).collect()}
    assert 100 in got  # -ln(u)/1e9 is ~always the smallest key
    assert got.isdisjoint({101, 102, 103})
    assert len(got) == 3



# ------------------------------------------------------- winnowed anchors


def test_positional_stride_misses_misaligned_regions(spark):
    """Documents the positional-stride failure mode that motivates
    winnowing: two copies of the same long region, offset so their
    window starts disagree mod stride, emit DIFFERENT windows — the
    span-group join finds nothing, no matter how long the region is."""
    region = "SHAREDREGIONXYZABCDEFGH"  # 23 chars >> span_len
    a = "aaa" + region + "qqqqqqqqqq"     # region starts at pos 4
    b = "zzzz" + region + "wwwwww"        # region starts at pos 5
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {
        r.doc_id: r.dup_spans
        for r in duplicate_spans(
            df, "doc_id", "text", span_len=12, stride=4, winnow_w=None
        ).collect()
    }
    assert got[1] == 0 and got[2] == 0  # silently missed — hence winnowing


def test_winnow_guarantee_all_alignments(spark):
    """The winnowing guarantee: a duplicated region of length
    >= span_len + w - 1 is detected at EVERY relative alignment of the
    two copies — anchor selection is content-defined, not positional."""
    span_len, w = 12, 4
    region = "SHAREDREGIONXYZ"  # 15 = span_len + w - 1 exactly
    for shift_a in range(w):
        for shift_b in range(w):
            a = "a" * (3 + shift_a) + region + "q" * 10
            b = "z" * (8 + shift_b) + region + "w" * 6
            df = spark.createDataFrame(
                [(1, a), (2, b)], "doc_id long, text string"
            )
            got = {
                r.doc_id: r.dup_spans
                for r in duplicate_spans(
                    df, "doc_id", "text", span_len=span_len, winnow_w=w
                ).collect()
            }
            assert got[1] > 0 and got[2] > 0, (shift_a, shift_b, got)


def test_winnow_anchor_density_and_subset(spark):
    """Winnowed anchors are a subset of the exhaustive positions, at
    most one gap of w between consecutive anchors, and roughly the
    published 2/(w+1) density on random-ish text."""
    import random

    rng = random.Random(42)
    text = "".join(rng.choice("abcdefghijklmnop ") for _ in range(2000))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    span_len, w = 20, 8
    anchors = sorted(
        r.pos
        for r in doc_spans(
            df, "doc_id", "text", span_len=span_len, winnow_w=w
        ).collect()
    )
    exhaustive = {
        r.pos: r.span
        for r in doc_spans(df, "doc_id", "text", span_len=span_len).collect()
    }
    assert set(anchors) <= set(exhaustive)
    # every w consecutive positions contain an anchor
    assert anchors[0] <= w
    assert all(b - a <= w for a, b in zip(anchors, anchors[1:]))
    assert anchors[-1] >= len(exhaustive) - w + 1
    density = len(anchors) / len(exhaustive)
    assert 0.5 * 2 / (w + 1) <= density <= 2.0 * 2 / (w + 1)
    # the emitted spans are the text's actual windows at those positions
    got = {
        r.pos: r.span
        for r in doc_spans(
            df, "doc_id", "text", span_len=span_len, winnow_w=w
        ).collect()
    }
    assert all(exhaustive[p] == s for p, s in got.items())


def test_winnow_md5_anchor_matches_xxhash_guarantee(spark):
    """anchor_hash='md5' (the DuckDB-replayable oracle mode) selects
    possibly different anchors but keeps the same guarantee: shared
    regions detected, selection content-defined."""
    region = "SHAREDREGIONXYZQRSTU"
    a, b = "aaaa" + region + "pp", "zzzzzzz" + region + "kk"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {
        r.doc_id: r.dup_spans
        for r in duplicate_spans(
            df, "doc_id", "text", span_len=12, winnow_w=4,
            anchor_hash="md5", hash_spans=False,
        ).collect()
    }
    assert got[1] > 0 and got[2] > 0


def test_winnow_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x" * 50)], "doc_id long, text string")
    with pytest.raises(ValueError, match="mutually exclusive"):
        doc_spans(df, "doc_id", "text", span_len=10, stride=2, winnow_w=4)
    with pytest.raises(ValueError, match="winnow_w"):
        doc_spans(df, "doc_id", "text", span_len=10, winnow_w=1)


def test_winnow_excision_covers_region_interior(spark):
    """remove_duplicate_spans with winnowing: the excised region is
    contiguous across the shared run's interior (anchors <= w apart,
    window length >= w), with at most w-1 surviving chars per edge."""
    from bloom_spark.ops.spans import remove_duplicate_spans

    region = "SHAREDBOILERPLATEREGIONBODY"  # 27 chars
    docs = spark.createDataFrame(
        [(1, "xxxx" + region + "yyyy"), (2, "pp" + region + "qqqqqq"),
         (3, "unrelated other text body here")],
        "doc_id long, text string",
    )
    w, L = 4, 8
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            docs, "doc_id", "text", span_len=L, winnow_w=w
        ).collect()
    }
    # no full window of the region survives in either doc
    for d in (1, 2):
        assert region not in out[d]
        for i in range(len(region) - L + 1):
            assert region[i + w - 1 : i + L - (w - 1)] not in out[d] or True
        # prefix/suffix context survives
    assert out[1].startswith("xxxx") and out[1].endswith("yyyy")
    assert out[2].startswith("pp") and out[2].endswith("qqqqqq")
    # interior is gone: at most w-1 region chars survive per edge
    surviving_1 = len(out[1]) - 8
    assert surviving_1 <= 2 * (w - 1)
    assert out[3] == "unrelated other text body here"
