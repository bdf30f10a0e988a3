"""Near-duplicate detection for training-data pipelines.

Three families, all Spark-first (SURVEY.md §2.6 scope — the reference
dedups exact lines only; a web-scale corpus also needs near-dup removal):

- **MinHash + LSH**: character/word shingles → k-permutation min-hash
  signature → banded LSH bucketing → candidate pairs → exact-Jaccard
  verification. The signature and banding are *pure Catalyst
  expressions* (``transform``/``substring``/``array_min``/``xxhash64``),
  so signature computation runs JVM-side in whole-stage codegen with no
  Python and no shuffle; the only shuffles are the LSH bucket self-join
  and the verification join, both on well-distributed hash keys.
- **SimHash**: 64-bit fingerprint via a per-document ``aggregate`` fold
  over token hashes (no explode, no shuffle), then banded grouping: two
  documents within Hamming distance d share at least one of d+1 bands
  (pigeonhole), verified with ``bit_count(xor)``.
- **Exact n-gram Jaccard**: explode distinct shingles → co-occurrence
  join → |A∩B| / (|A|+|B|−|A∩B|). Quadratic in the worst case — use on
  LSH candidates or bounded slices; it is the oracle for the other two.

Scale notes: at 10^12 docs, LSH banding shuffles (band_id, band_hash,
doc_id) — ~bands×16 B/doc, not the text. Bucket skew (boilerplate pages
sharing a band hash) is capped by ``max_bucket`` exactly like the
salting guidance in SURVEY.md §4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------- shingles
def char_shingles(text: Column, n: int = 5) -> Column:
    """Array of overlapping character n-grams (distinct), JVM-side."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(text, i, n))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of overlapping word n-grams (distinct)."""
    toks = F.split(F.trim(text), r"\s+")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), count)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


# --------------------------------------------------------------------- minhash
def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    num_hashes: int = 64,
    shingle_fn=None,
    out_col: str = "signature",
) -> DataFrame:
    """(id, signature array<long>) per document: k-permutation MinHash,
    element j = min over shingles of xxhash64(shingle, seed_j).

    Shape: explode shingles → one groupBy(id) with ``num_hashes`` flat
    ``min`` aggregates (map-side partial agg: the shuffle carries k longs
    per doc, not the shingles). A Column-level ``array_min ∘ transform``
    formulation inlines the shingle expression k times and stalls
    Catalyst — flat aggregates keep the plan linear (same lesson as
    simhash_table)."""
    shingle_fn = shingle_fn or char_shingles
    sh = df.select(
        F.col(id_col),
        F.explode(shingle_fn(F.col(text_col), shingle_n)).alias("__s"),
    )
    agg = sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64("__s", F.lit(j))).alias(f"__m{j}")
            for j in range(num_hashes)
        ]
    )
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{j}") for j in range(num_hashes)]).alias(out_col),
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Array of ``bands`` structs (band, key): key = hash of that band's
    signature slice. Docs sharing any (band, key) are LSH candidates."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.slice(signature, b * rows_per_band + 1, rows_per_band)
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def cap_buckets(
    df: DataFrame, keys: list[str], max_bucket: int | None, min_size: int = 1
) -> DataFrame:
    """Skew guard shared by every LSH-bucketing path: keep only rows
    whose bucket (the ``keys`` tuple) has between ``min_size`` and
    ``max_bucket`` rows.

    Shape: ONE pass — a partition-only window count over the bucket key
    (WindowExec sorts/buffers with disk spill, so a 10M-row boilerplate
    mega-bucket spills instead of growing an in-memory array the way
    the old ``collect_list``-then-filter did — r3 review), then a plain
    filter. The window's exchange on ``keys`` is the same partitioning
    the downstream self-join / collect_list needs, so Catalyst reuses
    it. The earlier count+semi-join variant evaluated the (expensive)
    upstream pipeline TWICE — measured 2x on the minhash bench."""
    if max_bucket is None and min_size <= 1:
        return df
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(k) for k in keys])
    cond = F.col("__bs_bn") >= min_size
    if max_bucket is not None:
        cond = cond & (F.col("__bs_bn") <= max_bucket)
    return (
        df.withColumn("__bs_bn", F.count(F.lit(1)).over(w))
        .where(cond)
        .drop("__bs_bn")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 64,
    shingle_fn=char_shingles,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) from banded MinHash.

    ``max_bucket`` drops pathological buckets (e.g. empty-page boilerplate
    hashing identically across millions of docs) BEFORE any bucket's ids
    are materialized (``cap_buckets``: a single-pass spill-safe window
    count over the bucket key, whose exchange the downstream groupBy
    reuses — the r3 review caught the old shape building the
    mega-bucket's collect_list array first and filtering after, an
    executor OOM at exactly the scale the guard exists for); only
    surviving ≤max_bucket buckets are collected for the quadratic
    within-bucket pairing.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col,
        shingle_n=shingle_n, num_hashes=num_hashes, shingle_fn=shingle_fn,
        out_col="__sig",
    )
    keys = sigs.select(
        F.col(id_col),
        F.explode(lsh_band_keys(F.col("__sig"), bands, rows_per_band)).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    small = cap_buckets(keys, ["band", "key"], max_bucket, min_size=2).groupBy(
        "band", "key"
    ).agg(F.collect_list(id_col).alias("ids"))
    pairs = small.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a: F.transform(
                            F.col("ids"), lambda b: F.struct(a.alias("id_a"), b.alias("id_b"))
                        ),
                    )
                ),
                lambda p: p["id_a"] < p["id_b"],
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.distinct()


# --------------------------------------------------------------------- jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
    shingle_fn=char_shingles,
) -> DataFrame:
    """Exact shingle-set Jaccard for the ``candidates`` pairs (columns
    id_a < id_b), or for ALL co-occurring pairs when ``candidates`` is
    None. Returns (id_a, id_b, jaccard double).

    With candidates the work is proportional to the CANDIDATE set, not
    the corpus: shingles are first semi-joined down to the ids that
    appear in any candidate pair, and the co-occurrence self-join keeps
    only candidate pairs *before* the groupBy — the round-1 review
    caught the old shape paying the full unbounded all-pairs join and
    filtering after. The all-pairs form (candidates=None) stays
    quadratic by design — it is the verify/oracle stage for bounded
    slices only.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingle_fn(F.col(text_col), shingle_n)).alias("__sh"),
    )
    if candidates is not None:
        # bound every downstream stage to ids that can appear in output.
        # The pair list feeds two consumers (id restriction + pair
        # semi-join): eager localCheckpoint materializes the candidate
        # pipeline (typically a full LSH pass) exactly ONCE, up front,
        # and truncates its lineage so both consumers read the stored
        # blocks. vs the old lazy .persist(): no recompute race between
        # the two consumer subtrees inside one job (the r2 bench showed
        # ~2x on this query), and the blocks are released when the
        # returned plan is dropped (ContextCleaner on RDD GC) instead of
        # leaking in the cache manager for the session's lifetime
        # (ADVICE r2). Candidates are small by construction (banded +
        # max_bucket-capped); the truncated lineage means an executor
        # loss re-runs the query, not silent wrong answers.
        cand = candidates.select("id_a", "id_b").localCheckpoint(eager=True)
        cand_ids = (
            cand.select(F.col("id_a").alias("__id"))
            .unionAll(cand.select(F.col("id_b").alias("__id")))
            .distinct()
        )
        sh = sh.join(cand_ids, "__id", "left_semi")
    sizes = sh.groupBy("__id").agg(F.count("*").alias("__sz"))
    a = sh.select(F.col("__id").alias("id_a"), "__sh")
    b = sh.select(F.col("__id").alias("id_b"), "__sh")
    inter = a.join(b, "__sh").where(F.col("id_a") < F.col("id_b"))
    if candidates is not None:
        # keep candidate pairs only BEFORE counting co-occurrences
        inter = inter.join(cand, ["id_a", "id_b"], "left_semi")
    inter = inter.groupBy("id_a", "id_b").agg(F.count("*").alias("__inter"))
    out = (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__sz", "__sa"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__sz", "__sb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("__inter")
                / (F.col("__sa") + F.col("__sb") - F.col("__inter"))
            ).cast("double").alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.where(F.col("jaccard") >= min_jaccard)
    return out


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float = 0.8,
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    policy: str = "pairs",
) -> DataFrame:
    """Remove near-duplicates: LSH candidates → exact-Jaccard verify →
    drop policy.

    ``policy="pairs"`` (default): drop every doc that matches a
    lower-id doc (first-wins, ≙ the reference's first-occurrence-kept
    semantics generalized to near-dups). Cheap — one distinct + anti
    join — but keeps every LOCAL minimum of the match graph: with
    matches (1,3),(2,3), doc 2 survives although it transitively
    belongs to 1's cluster.

    ``policy="components"``: cluster the match graph into connected
    components (ops.components, large-star/small-star) and keep exactly
    one representative — the minimum id — per cluster. This is the
    production-LLM-corpus semantics (one survivor per duplicate
    cluster) at the cost of O(log) extra passes over the PAIR list
    (tiny next to the corpus)."""
    cands = minhash_lsh_candidates(
        df, id_col, text_col, shingle_n=shingle_n, num_hashes=num_hashes, bands=bands
    )
    dups = ngram_jaccard_pairs(
        df, id_col, text_col, shingle_n=shingle_n,
        min_jaccard=min_jaccard, candidates=cands,
    )
    if policy == "components":
        from bloom_spark.ops.components import connected_components

        # non-representatives only ever appear in the pair graph, so the
        # full-corpus nodes= union is unnecessary here
        assign = connected_components(dups, "id_a", "id_b")
        to_drop = (
            assign.where(F.col("id") != F.col("component"))
            .select(F.col("id").alias(id_col))
        )
    elif policy == "pairs":
        to_drop = dups.select(F.col("id_b").alias(id_col)).distinct()
    else:
        raise ValueError(f"unknown policy {policy!r} (pairs|components)")
    return df.join(to_drop, id_col, "left_anti")


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 256,
    strict: bool = True,
    policy: str = "pairs",
) -> DataFrame:
    """Near-dup removal by SimHash distance: drop every doc within
    Hamming distance ``max_hamming`` of a lower-id doc (first-wins, the
    SimHash sibling of :func:`minhash_dedup`). One fingerprint pass +
    one banded self-join; no shingle explosion — the cheaper/coarser
    near-dup family for boilerplate-heavy web text.

    ``policy`` as in :func:`minhash_dedup`: ``"pairs"`` keeps the match
    graph's local minima; ``"components"`` keeps exactly one
    representative (the min id) per duplicate cluster."""
    pairs = simhash_pairs(
        df, id_col, text_col,
        max_hamming=max_hamming, bands=bands, max_bucket=max_bucket,
        strict=strict,
    )
    if policy == "components":
        from bloom_spark.ops.components import connected_components

        assign = connected_components(pairs, "id_a", "id_b")
        to_drop = (
            assign.where(F.col("id") != F.col("component"))
            .select(F.col("id").alias(id_col))
        )
    elif policy == "pairs":
        to_drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    else:
        raise ValueError(f"unknown policy {policy!r} (pairs|components)")
    return df.join(to_drop, id_col, "left_anti")


# --------------------------------------------------------------------- simhash
def simhash_table(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash"
) -> DataFrame:
    """(id, simhash) per document: 64-bit SimHash over lowercase
    whitespace tokens.

    Spark-first shape: explode tokens, hash each JVM-side (xxhash64),
    then ONE groupBy(id) with 64 flat sum-aggregates (bit-lane ±1
    votes) and a flat 64-term packing projection. Map-side partial
    aggregation means the shuffle carries 64 ints per document, not the
    tokens. (A pure array-``aggregate`` Column formulation was abandoned:
    64 element_at copies of a 64-lane fold blow the Catalyst expression
    tree into optimizer minutes — flat aggregate columns keep the plan
    linear.) Bit b of the result = sign of vote b; bit 63 maps to the
    sign bit of the signed long."""
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
        ).alias("__tok"),
    ).withColumn("__th", F.xxhash64("__tok"))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                (
                    F.shiftrightunsigned(F.col("__th"), b)
                    .bitwiseAND(F.lit(1).cast("long"))
                    * F.lit(2)
                    - F.lit(1)
                ).cast("int")
            ).alias(f"__v{b}")
            for b in range(64)
        ]
    )
    terms = [
        F.when(
            F.col(f"__v{b}") > 0,
            # bit 63 is the sign bit of a signed long
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    packed = terms[0]
    for term in terms[1:]:
        packed = packed.bitwiseOR(term)
    return votes.select(F.col(id_col), packed.alias(out_col))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 256,
    strict: bool = True,
) -> DataFrame:
    """Pairs (id_a, id_b, hamming) with SimHash Hamming distance ≤
    ``max_hamming``. Pigeonhole: with ``bands`` ≥ max_hamming+1 16-bit
    bands, any qualifying pair shares at least one exact band, so the
    self-join is on (band, 16-bit value), not all-pairs.

    ``max_bucket`` drops (band, key) buckets larger than the cap before
    the within-bucket pairing — the same skew guard as
    ``minhash_lsh_candidates``: one boilerplate band value shared by
    millions of near-identical pages would otherwise go quadratic.
    Pairs inside a dropped mega-bucket can still meet through any of
    their other ``bands-1`` bands (recall loss only when EVERY shared
    band is a mega-bucket, i.e. for boilerplate floods one intended to
    drop anyway)."""
    if strict and bands < max_hamming + 1:
        # pigeonhole precondition: with fewer bands a qualifying pair's
        # differing bits can cover every band and the pair is silently
        # never generated (r3 review — enforce what the docstring
        # states; best-effort match-RATE workloads opt out explicitly)
        raise ValueError(
            f"bands={bands} cannot guarantee recall at max_hamming="
            f"{max_hamming}: need bands >= max_hamming + 1 "
            "(pass strict=False to accept best-effort recall)"
        )
    bits = 64 // bands
    sh = simhash_table(df, id_col, text_col, "__sh").select(
        F.col(id_col).alias("__id"), "__sh"
    )
    banded = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("__sh"), b * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1).cast("long"))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "__sh", "bk.band", "bk.key")
    banded = cap_buckets(banded, ["band", "key"], max_bucket)
    l = banded.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"), "band", "key")
    r = banded.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"), "band", "key")
    return (
        l.join(r, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", hamming64(F.col("__sha"), F.col("__shb")).alias("hamming")
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
