"""Connected components (ops.components): parity with a driver-side
union-find on adversarial graph shapes, and the dedup policy built on it."""

from __future__ import annotations

import random

import pytest

from bloom_spark.ops.components import connected_components
from bloom_spark.ops.neardup import minhash_dedup


def _brute(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for mem in comp.values():
        m = min(mem)
        for n in mem:
            out[n] = m
    return out


CASES = {
    # a 30-hop path needs the log-round contraction, not 1-hop gossip
    "chain": [(i, i + 1) for i in range(30)],
    "star": [(0, i) for i in range(1, 20)],
    "cycle": [(i, (i + 1) % 15) for i in range(15)],
    "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "self_loops_and_dups": [(5, 5), (1, 2), (2, 1), (2, 3)],
}


class TestConnectedComponents:
    @pytest.mark.parametrize("threshold", [0, 100_000],
                             ids=["distributed", "driver"])
    @pytest.mark.parametrize("name", sorted(CASES))
    def test_matches_union_find(self, spark, name, threshold):
        """Both paths — the star contraction (threshold 0) and the
        small-graph driver union-find — must agree with the oracle.
        nodes= is passed so self-loop-only nodes (which _canon drops
        from the edge set) come back as singletons, matching union-find."""
        edges = CASES[name]
        nodes = sorted({x for e in edges for x in e})
        want = _brute(edges, nodes)
        edf = spark.createDataFrame(edges, "src long, dst long")
        ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                edf, "src", "dst", nodes=ndf, id_col="id",
                small_graph_threshold=threshold,
            ).collect()
        }
        assert got == want

    @pytest.mark.parametrize("threshold", [0, 100_000],
                             ids=["distributed", "driver"])
    def test_random_graph(self, spark, threshold):
        rng = random.Random(42)
        edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
        nodes = sorted({x for e in edges for x in e})
        want = _brute(edges, nodes)
        edf = spark.createDataFrame(edges, "src long, dst long")
        ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                edf, "src", "dst", nodes=ndf, id_col="id",
                small_graph_threshold=threshold,
            ).collect()
        }
        assert got == want

    def test_isolated_nodes_come_from_nodes_param(self, spark):
        edf = spark.createDataFrame([(1, 2)], "src long, dst long")
        ndf = spark.createDataFrame([(1,), (2,), (7,)], "id long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                edf, "src", "dst", nodes=ndf, id_col="id"
            ).collect()
        }
        assert got == {1: 1, 2: 1, 7: 7}
        with pytest.raises(ValueError):
            connected_components(edf, "src", "dst", nodes=ndf)

    def test_string_ids(self, spark):
        edf = spark.createDataFrame(
            [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string"
        )
        got = {
            r["id"]: r["component"] for r in connected_components(edf).collect()
        }
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_empty_edges(self, spark):
        edf = spark.createDataFrame([], "src long, dst long")
        ndf = spark.createDataFrame([(3,), (9,)], "id long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                edf, "src", "dst", nodes=ndf, id_col="id"
            ).collect()
        }
        assert got == {3: 3, 9: 9}


class TestConnectedComponentsProperty:
    def test_hypothesis_random_graphs(self, spark):
        """Hypothesis over small random multigraphs (parallel edges,
        self-loops, any density): assignment equals union-find. Pinned
        to the DISTRIBUTED star contraction (threshold 0) — that is
        where the algorithmic risk lives. Kept to a handful of examples
        — each runs real Spark rounds."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            edges=st.lists(
                st.tuples(st.integers(0, 24), st.integers(0, 24)),
                min_size=1,
                max_size=40,
            )
        )
        def run(edges):
            nodes = sorted({x for e in edges for x in e})
            want = _brute(edges, nodes)
            edf = spark.createDataFrame(edges, "src long, dst long")
            ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
            got = {
                r["id"]: r["component"]
                for r in connected_components(
                    edf, "src", "dst", nodes=ndf, id_col="id",
                    small_graph_threshold=0,
                ).collect()
            }
            assert got == want

        run()


class TestDedupPolicy:
    def test_components_policy_merges_transitive_cluster(self, spark):
        """Match graph exactly {(1,3), (2,3)} — built from three word
        blocks X, Y, Z with disjoint alphabets: doc1 = X+Y, doc2 = Y+Z,
        doc3 = Y, so exact shingle Jaccard is J(1,3) = J(2,3) ≈
        |Y|/|X∪Y| ≈ 0.61 (match at threshold 0.5) while J(1,2) ≈
        |Y|/|X∪Y∪Z| ≈ 0.44 (no match). Pairs policy drops only id_b=3
        and keeps BOTH 1 and 2; components policy clusters {1,2,3} and
        keeps only the minimum, 1."""

        def words(alpha: str, n: int, seed: int) -> str:
            rng = random.Random(seed)
            return " ".join(
                "".join(rng.choice(alpha) for _ in range(6)) for _ in range(n)
            )

        x = words("abcdef", 25, 1)
        y = words("ghijkl", 40, 2)
        z = words("mnopqr", 25, 3)
        docs = spark.createDataFrame(
            [
                (1, x + " " + y),
                (2, y + " " + z),
                (3, y),
                (9, words("stuvwx", 30, 4)),
            ],
            "doc_id long, text string",
        )
        kw = dict(min_jaccard=0.5, num_hashes=64, bands=32)
        kept_pairs = {
            r["doc_id"]
            for r in minhash_dedup(
                docs, "doc_id", "text", policy="pairs", **kw
            ).collect()
        }
        kept_comp = {
            r["doc_id"]
            for r in minhash_dedup(
                docs, "doc_id", "text", policy="components", **kw
            ).collect()
        }
        assert kept_pairs == {1, 2, 9}  # 2 is a local minimum, kept
        assert kept_comp == {1, 9}  # one representative per cluster
        with pytest.raises(ValueError):
            minhash_dedup(docs, "doc_id", "text", policy="bogus")

    def test_simhash_components_policy(self, spark):
        """simhash_dedup honors the same policy switch: exact duplicates
        cluster into one component, unrelated docs are untouched."""
        from bloom_spark.ops.neardup import simhash_dedup

        text = "repeated web boilerplate page about cookies and consent " * 4
        other = "a completely different technical article on query plans " * 4
        docs = spark.createDataFrame(
            [(1, text), (2, text), (3, text), (9, other)],
            "doc_id long, text string",
        )
        kept = {
            r["doc_id"]
            for r in simhash_dedup(
                docs, "doc_id", "text", max_hamming=3, policy="components"
            ).collect()
        }
        assert kept == {1, 9}
        with pytest.raises(ValueError):
            simhash_dedup(docs, "doc_id", "text", policy="bogus")


class TestRoundCounts:
    """r5 (VERDICT item 3): pin the star-contraction round count on
    known topologies — the observable that says the distributed path
    really runs its log-round contraction, not the driver fast path."""

    def _run(self, spark, edges, n_nodes):
        stats: dict = {}
        edf = spark.createDataFrame(edges, "src long, dst long")
        got = connected_components(
            edf, "src", "dst", small_graph_threshold=0, stats=stats
        )
        rows = got.collect()
        assert stats["path"] == "distributed"
        assert len(rows) == n_nodes
        return stats, {r["id"]: r["component"] for r in rows}

    def test_star_topology_converges_in_two_rounds(self, spark):
        # already one star: the first (large, small) round reproduces
        # the edge set, so the checksum confirms fixpoint immediately
        edges = [(0, i) for i in range(1, 64)]
        stats, comp = self._run(spark, edges, 64)
        assert set(comp.values()) == {0}
        assert stats["rounds"] == 1
        assert stats["edges_in"] == 63

    def test_path_topology_logarithmic_rounds(self, spark):
        # path of 257 nodes (diameter 256): rounds must be O(log n),
        # nowhere near the diameter (256). Observed: 9 = log2(256) + the
        # confirming round (pinned; deterministic algorithm and input).
        n = 257
        edges = [(i, i + 1) for i in range(n - 1)]
        stats, comp = self._run(spark, edges, n)
        assert set(comp.values()) == {0}
        assert stats["rounds"] == 9
        assert stats["rounds"] <= 12  # the O(log) promise with slack

    def test_blocks_round_count_independent_of_block_count(self, spark):
        # many components contract in the same rounds as one: rounds
        # depend on component shape, not graph size
        b, nb = 16, 40  # 40 chains of 16 nodes
        edges = [
            (k * b + i, k * b + i + 1)
            for k in range(nb)
            for i in range(b - 1)
        ]
        stats, comp = self._run(spark, edges, b * nb)
        assert len(set(comp.values())) == nb
        single_stats: dict = {}
        edf = spark.createDataFrame(
            [(i, i + 1) for i in range(b - 1)], "src long, dst long"
        )
        connected_components(
            edf, "src", "dst", small_graph_threshold=0, stats=single_stats
        ).collect()
        assert stats["rounds"] == single_stats["rounds"]


class TestCheckpointLifetime:
    """r5: superseded per-round localCheckpoint blocks are unpersisted
    (storage bounded to the live round) without touching anything the
    caller persisted."""

    def test_storage_bounded_and_caller_cache_untouched(self, spark):
        from pyspark.sql import functions as F

        sc = spark.sparkContext
        # caller-owned persisted data the operator must not release
        mine = spark.range(1000).select(F.col("id").alias("x")).persist()
        assert mine.count() == 1000
        ids_before = {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }
        # 257-node path -> 9 distributed rounds (18 checkpoints)
        edges = spark.range(256).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        stats: dict = {}
        got = connected_components(
            edges, "src", "dst", small_graph_threshold=0, stats=stats
        )
        assert got.count() == 257
        assert stats["rounds"] >= 8
        ids_after = {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }
        # every caller-persisted RDD survives
        assert ids_before <= ids_after
        # the operator leaves at most its single live checkpoint behind
        assert len(ids_after - ids_before) <= 1
        assert mine.count() == 1000  # still answerable from cache/lineage
        mine.unpersist()

    def test_failure_path_releases_everything(self, spark):
        import pytest
        from pyspark.sql import functions as F

        sc = spark.sparkContext
        ids_before = {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }
        edges = spark.range(256).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                edges, "src", "dst", small_graph_threshold=0, max_iter=2
            )
        ids_after = {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }
        assert ids_after <= ids_before
