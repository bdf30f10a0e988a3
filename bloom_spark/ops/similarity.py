"""Embedding similarity search (ANN) over array<float/double> columns.

Baseline: brute-force cosine top-k — dot products as pure Catalyst
``zip_with``/``aggregate`` expressions (JVM, codegen; no Python), a
broadcast of the (small) query set against the corpus, and a per-query
``row_number`` window for the top-k cut.

Scale path: random-hyperplane LSH (Charikar 2002, SimHash for angles).
``n_planes`` sign bits per table bucket the corpus; candidates = same
bucket in any of ``n_tables`` tables; exact cosine re-rank on candidates
only. Bucket assignment is one deterministic seeded matmul per Arrow
batch (``bucket_array_udf`` — literal-array Catalyst planes were
measured optimizer-bound, the k-replicated-Column blowup), so the
corpus side can be precomputed once (``lsh_index``), persisted
partitioned by bucket, and probed incrementally — at 10^12 rows the
all-pairs cross join disappears and a probe shuffles only (bucket, id)
pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (l2_norm(a) * l2_norm(b))).cast("double")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the query set, score every
    corpus row JVM-side, keep k by window. Returns
    (query_id, vec_id, cos double, rank int)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(q).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("__qvec")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    min_cos: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ min_cos — embedding-based
    near-dup detection. Exact (quadratic): use on bounded slices or LSH
    candidates; `lsh_neardup_pairs` is the corpus-scale variant."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cos")
        )
        .where(F.col("cos") >= min_cos)
    )


# ----------------------------------------------------------------- LSH buckets
def _hyperplanes(dim: int, n_planes: int, table: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed + 1000 * table)
    return rng.standard_normal((n_planes, dim))


def bucket_array_udf(
    dim: int, n_planes: int, n_tables: int, seed: int
):
    """Vectorized Arrow UDF: vec → array of ``n_tables`` bucket ids
    (element t = table t's packed sign bits).

    Why a pandas UDF and not Catalyst literals: inlining n_tables ×
    n_planes × dim literal plane coefficients builds an expression tree
    with thousands of leaves per projection — optimizer/codegen time
    dominates small jobs and grows with the plan, the same
    k-replicated-Column blowup minhash_signatures documents. One matmul
    per Arrow batch ((rows, dim) @ (dim, tables·planes)) is both
    cheaper to plan and faster to run; determinism is unchanged (seeded
    hyperplanes in the closure)."""
    planes = np.stack(
        [_hyperplanes(dim, n_planes, t, seed) for t in range(n_tables)]
    )  # (T, P, D)
    proj = planes.reshape(-1, dim).T.copy()  # (D, T*P)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def fn(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        bits = (x @ proj) > 0  # (n, T*P)
        b = bits.reshape(len(x), len(planes), -1) @ weights  # (n, T)
        return pd.Series(list(b))

    return fn


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Packed sign-bit bucket id for one table: bit p = (vec·plane_p > 0).
    Pure Catalyst — the plane is a literal array, the dot is zip_with."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(vec, lit_plane) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def lsh_bucket_keys(
    vec: Column, dim: int, n_planes: int = 12, n_tables: int = 4, seed: int = 42
) -> Column:
    """Array of (table, bucket) structs — membership in any shared bucket
    makes two vectors candidates."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(vec, _hyperplanes(dim, n_planes, t, seed)).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_index(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """The materializable corpus-side LSH index: one row per
    (table, bucket, id, vec). Compute it ONCE, persist/write it
    partitioned by (table, bucket), and serve every subsequent query
    from it — at 10^12 rows this is the difference between an index
    lookup and re-hashing the corpus per query. Buckets are
    deterministic Catalyst expressions of (vec, seed), so the index is
    reproducible and incrementally extendable (new rows append their
    own bucket rows)."""
    udf = bucket_array_udf(dim, n_planes, n_tables, seed)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(udf(F.col(vec_col))).alias("table", "bucket"),
    )


def query_buckets_local(
    queries_pdf, dim: int, vec_col: str = "embedding",
    n_planes: int = 12, n_tables: int = 4, seed: int = 42,
):
    """(n_tables, n_queries) bucket ids for a *small* query batch,
    computed driver-side with the IDENTICAL matmul the index-side Arrow
    UDF runs (same plane matrix layout, same summation order), so a
    vector buckets the same whether it is indexed or probed."""
    planes = np.stack(
        [_hyperplanes(dim, n_planes, t, seed) for t in range(n_tables)]
    )
    proj = planes.reshape(-1, dim).T.copy()
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    if len(queries_pdf) == 0:
        # an empty (0,) x would fail the matmul dim check (r3 review);
        # the index-side UDF guards this case too
        return np.zeros((n_tables, 0), dtype=np.int64)
    x = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf[vec_col]]
    )
    bits = (x @ proj) > 0
    return (bits.reshape(len(x), n_tables, -1) @ weights).T


def lsh_topk_indexed(
    index: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate top-k served from a precomputed ``lsh_index``: query
    buckets are computed driver-side (bounded query set), shipped as a
    broadcast (table, bucket, query_id, qvec) table, and joined against
    the index — the corpus is never re-hashed. Same output shape as
    ``brute_force_topk``.

    ``max_bucket`` caps the per-(table, bucket) candidate volume — a
    degenerate mega-bucket (e.g. near-zero vectors all hashing to one
    sign pattern) would otherwise make one query score an unbounded
    candidate set. Skipped buckets cost recall only for queries whose
    EVERY table landed in a mega-bucket."""
    spark = queries.sparkSession
    if max_bucket is not None:
        from bloom_spark.ops.neardup import cap_buckets

        index = cap_buckets(index, ["table", "bucket"], max_bucket)
    qpdf = queries.select(query_id_col, vec_col).toPandas()
    buckets = query_buckets_local(
        qpdf, dim, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables, seed=seed,
    )
    rows = [
        (int(t), int(buckets[t, i]), qid, [float(x) for x in qv])
        for t in range(n_tables)
        for i, (qid, qv) in enumerate(zip(qpdf[query_id_col], qpdf[vec_col]))
    ]
    # derive the query-id type from the input — a hardcoded `long` broke
    # string query ids that every sibling path accepts (r3 review)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    probe = spark.createDataFrame(
        rows,
        f"table int, bucket long, {query_id_col} {qid_type}, __qvec array<double>",
    )
    cands = (
        index.join(F.broadcast(probe), ["table", "bucket"])
        .select(query_id_col, id_col, vec_col, "__qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidates, exact cosine re-rank.

    Same output shape as brute_force_topk; recall < 1 by design — measure
    it against the exact path on a sample (tests do)."""
    udf = bucket_array_udf(dim, n_planes, n_tables, seed)
    keys = lambda df, idc: df.select(  # noqa: E731
        F.col(idc),
        F.col(vec_col),
        F.posexplode(udf(F.col(vec_col))).alias("table", "bucket"),
    )
    c = keys(corpus, id_col)
    q = keys(queries, query_id_col).withColumnRenamed(vec_col, "__qvec")
    cands = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .select(query_id_col, id_col, vec_col, "__qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


# ----------------------------------------------------------------- IVF index
def train_centroids(
    corpus: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd's k-means on a driver-side sample → (n_cells, dim) float64.

    The sample is small and fixed-size regardless of corpus scale (this is
    how IVF indexes are trained in practice); assignment of the full
    corpus stays distributed and JVM-side (``ivf_cell``). The sample is
    drawn by ordering on a seeded row hash and taking the top ``sample``
    rows (TakeOrderedAndProject — no count pass, no shuffle of the full
    data): uniform over the corpus, unlike ``limit()`` which reads the
    head of the first partitions (round-1 review)."""
    pdf = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.lit(seed), F.col(vec_col)))
        .limit(sample)
        .toPandas()
    )
    x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def ivf_cell_udf(centroids: np.ndarray):
    """Vectorized Arrow UDF: vec → nearest-centroid cell id (cosine,
    centroids unit-norm). One (rows, dim) @ (dim, n_cells) matmul per
    Arrow batch — the same literal-expression-blowup avoidance as
    ``bucket_array_udf`` (each Catalyst ``ivf_cell`` projection inlines
    n_cells × dim coefficient leaves)."""
    cents = np.ascontiguousarray(centroids.T, dtype=np.float64)  # (D, C)

    @F.pandas_udf("int")
    def fn(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        # norms don't change the argmax, so skip the divide
        return pd.Series((x @ cents).argmax(axis=1).astype("int32"))

    return fn


def ivf_cell(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid cell id (cosine, centroids unit-norm) as a pure
    Catalyst expression: n_cells dot products + argmax via array_position."""
    scores = F.array(
        *[
            dot(vec, F.array(*[F.lit(float(x)) for x in c])) / l2_norm(vec)
            for c in centroids
        ]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cell_col: str | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned by nearest-centroid cell,
    queries probe their nprobe nearest cells, exact cosine re-rank inside.

    At corpus scale the cell assignment is computed once and used as a
    partition/bucket column, so a query touches nprobe/n_cells of the
    data; here the assignment is inlined. Same output shape as
    brute_force_topk; recall grows with nprobe (nprobe=n_cells ≡ exact).

    Corpus cells come from one Arrow-batch matmul (``ivf_cell_udf``);
    the bounded query set computes its nprobe nearest cells driver-side
    with the identical matrix layout, so a vector assigned to cell c as
    corpus is probed in cell c as query.

    ``cell_col``: name of a PRECOMPUTED cell column on ``corpus`` (from
    ``ivf_cell_udf`` with the same centroids). At corpus scale the cell
    assignment is an indexing artifact written once and probed by many
    queries; callers issuing several probes (or nprobe sweeps) against
    one corpus should assign once, persist, and pass the column here —
    otherwise every call re-runs the assignment UDF over the corpus
    (the r3→r4 `ann_ivf_recall` bench regression).

    A single-point sweep: delegates to :func:`ivf_topk_sweep` so the
    probe/join/window logic (and any fix to it) lives exactly once.
    """
    return ivf_topk_sweep(
        corpus, queries, k, centroids, nprobes=[int(nprobe)],
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        cell_col=cell_col,
    ).drop("__nprobe")


def ivf_topk_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobes: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cell_col: str | None = None,
) -> DataFrame:
    """Recall sweep: evaluate SEVERAL ``nprobe`` settings in ONE
    join+window pass — the standard way to pick an IVF operating point
    (recall vs cells-touched curve) without re-scanning the corpus per
    setting.

    Each probe row is tagged with its sweep ``__nprobe``; a query's
    nprobe-n row set is its n nearest cells, so the single broadcast
    join scores every (nprobe, query, cell-member) tuple and one window
    per (nprobe, query) takes the top-k. The corpus (and its cell
    assignment, when ``cell_col`` is not precomputed) is scanned once
    for the whole sweep — running ``ivf_topk`` per setting costs one
    corpus scan + join + window EACH (measured ~2x on the r4 bench for
    a 2-point sweep). Output = ivf_topk's columns plus ``__nprobe``.
    """
    if cell_col is not None:
        c = corpus.select(
            F.col(id_col), F.col(vec_col), F.col(cell_col).alias("__cell")
        )
    else:
        c = corpus.select(
            F.col(id_col), F.col(vec_col),
            ivf_cell_udf(centroids)(F.col(vec_col)).alias("__cell"),
        )
    qpdf = queries.select(query_id_col, vec_col).toPandas()
    spark = queries.sparkSession
    if len(qpdf) == 0:
        x = np.zeros((0, centroids.shape[1]), dtype=np.float64)
    else:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in qpdf[vec_col]])
    cents = np.ascontiguousarray(centroids.T, dtype=np.float64)
    max_probe = max(nprobes)
    order = np.argsort(-(x @ cents), axis=1, kind="stable")[:, :max_probe]
    rows = [
        (int(nprobe), qid, [float(v) for v in qv], int(cell))
        for nprobe in nprobes
        for qid, qv, cells in zip(qpdf[query_id_col], qpdf[vec_col], order)
        for cell in cells[:nprobe]
    ]
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    q = spark.createDataFrame(
        rows,
        f"__nprobe int, {query_id_col} {qid_type}, "
        "__qvec array<double>, __cell int",
    )
    # no dropDuplicates (unlike the multi-table LSH paths): each corpus
    # row lives in exactly ONE cell and a query's nprobe-n set is n
    # DISTINCT cells, so a (__nprobe, query, id) tuple can match at most
    # once — a dedup would be a full extra shuffle for no semantic
    # effect (r3 review)
    scored = c.join(F.broadcast(q), "__cell").select(
        "__nprobe", query_id_col, id_col,
        cosine(F.col(vec_col), F.col("__qvec")).alias("cos"),
    )
    w = Window.partitionBy("__nprobe", query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def lsh_neardup_pairs(
    df: DataFrame,
    min_cos: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket: int = 256,
) -> DataFrame:
    """Corpus-scale embedding near-dup: candidates from shared LSH
    buckets (skew-capped), exact cosine verification."""
    from bloom_spark.ops.neardup import cap_buckets

    keyed = lsh_index(
        df, dim, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables, seed=seed,
    )
    keyed = cap_buckets(keyed, ["table", "bucket"], max_bucket)
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "table", "bucket"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "table", "bucket"
    )
    return (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cos"))
        .where(F.col("cos") >= min_cos)
    )
