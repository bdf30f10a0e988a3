#!/usr/bin/env python
"""N vs 4N scaling evidence for the DISTRIBUTED connected-components
path (VERDICT r4 item 3: the sf0.1 query rides the driver union-find
fast path, so the log-round star contraction had no at-scale
measurement).

Graph: deterministic synthetic match graph of ``--edges`` edges —
chains of ``--block`` nodes (component diameter = block, forcing a
multi-round contraction like real near-dup clusters) over node ids
scrambled by a bijective odd-multiplier mix so component members are
hash-scattered, not consecutive (no accidental partition locality).
Built with spark.range expressions; both legs read identical input by
construction.

Per leg (fresh subprocess, fresh JVM): warm run on a slice, host
canary, ``--repeats`` timed runs, canary again. Reports wall, rounds,
component count (must match edges/block exactly — the correctness
check), edges/sec, and the N→4N scaling efficiency.

Usage: python bench_components.py [--edges 10000000] [--block 64]
                                  [--low 8] [--high 32] [--repeats 3]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
MIX = 2654435761  # odd → bijective multiplier mod 2^32


def run_worker(cpus: int, n_edges: int, block: int, partitions: int,
               repeats: int, stat: str) -> None:
    from pyspark.sql import functions as F

    from bloom_spark.ops.components import connected_components
    from bloom_spark.session import get_session

    spark = get_session(
        f"cc_scaling_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_nodes = n_edges + n_edges // (block - 1)  # chains drop 1 edge per block

    def edges_df(n):
        # node label = bijective mix of the sequential id: components'
        # members land in arbitrary hash partitions, as a real match
        # graph's would
        return (
            spark.range(n + n // (block - 1))
            .where(F.col("id") % block != block - 1)
            .select(
                ((F.col("id") * MIX) % (1 << 32)).alias("src"),
                (((F.col("id") + 1) * MIX) % (1 << 32)).alias("dst"),
            )
            .limit(n)
        )

    def job(n) -> tuple[int, int, int]:
        stats: dict = {}
        got = connected_components(
            edges_df(n), "src", "dst", small_graph_threshold=0, stats=stats
        )
        n_comp = got.agg(F.count_distinct("component")).first()[0]
        return stats["rounds"], int(n_comp), int(stats["edges_in"])

    # both host canaries (bench.py): the sandbox throttles many-core
    # capacity independently of single-core speed, and an iterative
    # shuffle job is exactly the workload a many-core phase inflates
    # while the single-thread probe stays flat (measured r5: the 10M
    # high leg read 122 s and 160 s a few hours apart, single-thread
    # canary 0.60-0.62 s both times)
    from bench import _host_canary as canary, _host_canary_mp as canary_mp

    job(200_000)  # warm: python workers, codegen, first shuffles
    canary_before = canary()
    canary_mp_before = canary_mp()
    walls, rounds, comps, edges_in = [], None, None, None
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        rounds, comps, edges_in = job(n_edges)
        walls.append(time.perf_counter() - t0)
    dt = sorted(walls)[len(walls) // 2] if stat == "median" else min(walls)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_s": round(dt, 3),
                "walls_all": [round(w, 3) for w in walls],
                "stat": stat,
                "host_canary_s": [canary_before, canary()],
                "host_canary_mp8_s": [canary_mp_before, canary_mp()],
                "edges": edges_in,
                "rounds": rounds,
                "components": comps,
                "edges_per_sec": round(edges_in / dt, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stat", choices=["min", "median"], default="median")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int)
    ap.add_argument(
        "--paired", action="store_true",
        help="interleave (low, high) single-run pairs and report the "
        "median of per-repeat ratios — robust to host phase drift that "
        "spans repeats (BASELINE.md variance model, protocol #3)",
    )
    args = ap.parse_args()

    os.environ.setdefault("BLOOM_SPARK_SHM_SCRATCH", "1")

    if args.worker:
        run_worker(args.cpus, args.edges, args.block, args.partitions,
                   args.repeats, args.stat)
        return

    def spawn(cpus: int, repeats: int | None = None) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--cpus", str(cpus), "--edges", str(args.edges),
             "--block", str(args.block), "--partitions", str(args.partitions),
             "--repeats", str(repeats or args.repeats), "--stat", args.stat],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    if args.paired:
        pairs = [
            (spawn(args.low, 1), spawn(args.high, 1))
            for _ in range(max(1, args.repeats))
        ]
        ratio = args.high / args.low
        effs = [
            (p_lo["wall_s"] / p_hi["wall_s"]) / ratio for p_lo, p_hi in pairs
        ]
        med = sorted(effs)[len(effs) // 2]
        i = effs.index(med)
        lo, hi = dict(pairs[i][0]), dict(pairs[i][1])
        # each leg object is ONE run (the median-ratio pair's), not a
        # min/median statistic — label it so the evidence JSON reads true
        for leg in (lo, hi):
            leg["stat"] = "median-ratio-pair single run"
        lo["walls_all"] = [p[0]["wall_s"] for p in pairs]
        hi["walls_all"] = [p[1]["wall_s"] for p in pairs]
        print(
            json.dumps(
                {
                    "metric": "distributed connected-components scaling "
                    "(local[N] vs local[4N], star contraction, paired legs)",
                    "low": lo,
                    "high": hi,
                    "per_repeat_efficiency": [round(e, 3) for e in effs],
                    "speedup": round(med * ratio, 3),
                    "scaling_efficiency": round(med, 3),
                    "edges": args.edges,
                    "block": args.block,
                    "partitions": args.partitions,
                    "repeats": args.repeats,
                    "stat": "median-of-paired-ratios",
                }
            ),
            flush=True,
        )
        return

    lo = spawn(args.low)
    hi = spawn(args.high)
    speedup = hi["edges_per_sec"] / lo["edges_per_sec"]
    efficiency = speedup / (args.high / args.low)
    print(
        json.dumps(
            {
                "metric": "distributed connected-components scaling "
                "(local[N] vs local[4N], star contraction)",
                "low": lo,
                "high": hi,
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(efficiency, 3),
                "edges": args.edges,
                "block": args.block,
                "partitions": args.partitions,
                "repeats": args.repeats,
                "stat": args.stat,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
