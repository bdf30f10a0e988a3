"""Connected components on a DataFrame edge list — the transitive-
closure step web-scale near-dup pipelines need between "matched pairs"
and "keep one representative per duplicate CLUSTER".

Why it exists here: ``minhash_dedup``'s default pair policy keeps every
doc with no smaller matching neighbor — the local minima of the match
graph. That is a defensible (and cheap) policy, but it under-merges
transitive chains: with edges (1,3),(2,3), node 2 survives although it
is in 1's cluster. Production LLM-corpus dedup (SlimPajama, BigCode,
RefinedWeb write-ups all describe this step) clusters the match graph
into connected components and keeps exactly one representative — the
component minimum — per cluster.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014 — public). Each round is two groupBy/join
passes over the edge list; the edge set provably converges to one star
per component (every node pointing at the component minimum) in
O(log^2 n) rounds — at web-dedup shapes (tiny dense clusters) it is
2-3 rounds. Per-round memory is one aggregation state per node, never
a materialized component, so a 10^9-edge graph runs in fixed executor
memory. The driver holds only the per-round convergence checksum.

No lineage blowup: every round ends in ``localCheckpoint`` (eager), so
the plan is flat regardless of round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class _CheckpointTracker:
    """Explicit lifetime management for the per-round ``localCheckpoint``
    blocks. Spark never reclaims a superseded checkpoint while the
    driver process lives (the ContextCleaner needs a JVM GC of the
    wrapper object, which py4j keeps pinned), so an iterative operator
    must unpersist its own history or storage grows by ~2 RDDs per
    round for the job's lifetime. Scoped strictly to RDDs whose ids
    appeared during THIS tracker's ``checkpoint`` calls — persisted
    data owned by the caller or other operators is never touched."""

    def __init__(self, sc) -> None:
        self._sc = sc
        self._mine: list[int] = []

    def _persisted_ids(self):
        return {int(i) for i in self._sc._jsc.getPersistentRDDs().keySet().toArray()}

    def checkpoint(self, df: DataFrame) -> DataFrame:
        before = self._persisted_ids()
        out = df.localCheckpoint(eager=True)
        self._mine.extend(sorted(self._persisted_ids() - before))
        return out

    def free_all_but_newest(self, keep: int) -> None:
        drop = self._mine[: len(self._mine) - keep] if keep else self._mine[:]
        if not drop:
            return
        jmap = self._sc._jsc.getPersistentRDDs()
        for rid in drop:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
        del self._mine[: len(drop)]


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as (u > v) pairs, self-loops dropped."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return (
        e.where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For every node n: connect its STRICTLY LARGER neighbors to the
    minimum of its closed neighborhood. Output keeps (u > v) form."""
    both = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = both.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        both.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For every node n (edges oriented large→small, i.e. the canonical
    (u > v) form grouped by u): connect all its smaller-or-equal
    neighbors and itself to the minimum of the closed neighborhood."""
    mins = e.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    joined = e.join(mins, "u")
    out = (
        joined.select(F.col("v").alias("n"), F.col("m"))
        .unionAll(mins.select(F.col("u").alias("n"), F.col("m")))
        .where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    return out


def _checksum(e: DataFrame):
    row = e.agg(
        F.count("*").alias("n"),
        # bit_xor: order-invariant, overflow-free under ANSI mode (a sum
        # of xxhash64 values overflows long)
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ).first()
    return (row["n"], row["h"])


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Small-graph fast path: collect the (already canonicalized,
    deduplicated) edge list and label components with a driver-side
    union-find, one job instead of O(log n) rounds of several jobs each.
    Bounded by the caller's threshold (rows × 16 B), the same adaptivity
    argument as a broadcast join."""
    rows = e.collect()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r["u"], r["v"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    out = []
    for mem in members.values():
        m = min(mem)
        out.extend((n, m) for n in mem)
    spark = e.sparkSession
    id_type = e.schema["u"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("id", id_type), StructField("component", id_type)]
    )
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str | None = None,
    max_iter: int = 50,
    small_graph_threshold: int = 100_000,
    stats: dict | None = None,
) -> DataFrame:
    """Component assignment ``(id, component)`` for every node, where
    ``component`` is the smallest node id in its component.

    ``edges`` is an undirected pair list (direction and duplicates are
    ignored). Nodes appearing in no edge are absent from the result
    unless ``nodes``/``id_col`` supplies the full node set — then they
    come back as their own singleton component (component = id), which
    is what dedup wants: an unmatched doc is its own cluster.

    Works for any orderable id type (long, string). Convergence is
    detected by an order-invariant edge-set checksum; two equal
    consecutive checksums after a (large-star, small-star) round mean
    the edge set is a fixpoint — one star per component.

    Edge sets at or under ``small_graph_threshold`` rows (after
    canonicalization) are labeled by a driver-side union-find instead —
    near-dup match graphs are usually tiny next to the corpus, and the
    star rounds' fixed per-job cost dominates there. The threshold
    bounds driver memory at ~16 B/edge; pass 0 to force the distributed
    contraction.

    ``stats``, when a dict is supplied, is filled in place with
    ``{"path": "driver"|"distributed", "edges_in": n,
    "rounds": r}`` (rounds = (large-star, small-star) pairs executed,
    including the fixpoint-confirming one) — the observable the
    round-count tests and the scaling bench pin.
    """
    if nodes is not None and id_col is None:
        raise ValueError("nodes requires id_col")
    sc = edges.sparkSession.sparkContext
    tracker = _CheckpointTracker(sc)
    try:
        e = tracker.checkpoint(_canon(edges, src, dst))
        n_edges = e.count()
        if stats is not None:
            stats["edges_in"] = n_edges
        if n_edges <= small_graph_threshold:
            if stats is not None:
                stats.update(path="driver", rounds=0)
            out = _with_singletons(_driver_union_find(e), nodes, id_col)
            tracker.free_all_but_newest(0)
            return out
        prev = _checksum(e)
        for rounds in range(1, max_iter + 1):
            # Both half-rounds checkpoint: the large-star output feeds
            # two consumers in small-star (the min aggregation and the
            # join), and without materialization the whole large-star
            # subtree runs twice — measured r5 (interleaved A/B, 10M
            # edges, local[8]): one checkpoint per round is ~10% SLOWER.
            e = tracker.checkpoint(_large_star(e))
            e = tracker.checkpoint(_small_star(e))
            cur = _checksum(e)
            # the new checkpoint is a materialized copy — every older
            # one is superseded; without this, per-round blocks
            # accumulate for the job's lifetime (measured: ~2 persisted
            # RDDs per round, never GC-reclaimed) and at 10^9-edge
            # rounds the eviction churn rides the same storage/disk
            # bandwidth the shuffle needs
            tracker.free_all_but_newest(1)
            if cur == prev:
                if stats is not None:
                    stats.update(path="distributed", rounds=rounds)
                break
            prev = cur
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
    except BaseException:
        # failed mid-contraction: nothing of ours survives the raise
        tracker.free_all_but_newest(0)
        raise
    # fixpoint edge set is (member, root) stars; roots map to themselves
    assign = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct()
    assign = assign.unionAll(
        roots.select("id", F.col("id").alias("component"))
    ).distinct()
    return _with_singletons(assign, nodes, id_col)


def _with_singletons(
    assign: DataFrame, nodes: DataFrame | None, id_col: str | None
) -> DataFrame:
    """Nodes absent from the edge-derived assignment come back as their
    own singleton component when the full node set is supplied."""
    if nodes is None:
        return assign
    allnodes = nodes.select(F.col(id_col).alias("id")).distinct()
    singles = allnodes.join(assign, "id", "left_anti")
    return assign.unionAll(
        singles.select("id", F.col("id").alias("component"))
    )
