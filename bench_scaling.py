#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N vs 4N executor comparison needs a cluster; the sandbox stand-in
(per the driver instruction) is the same job on the same input at
local[N] and local[4N]. This script:

1. materializes the synthetic Common-Crawl-style pages table once
   (parquet, shared by both runs);
2. runs the headline dedup job (Bloom segment build over batch A →
   tree merge → broadcast probe of batch B) in a fresh subprocess per
   parallelism level (clean JVM each, identical input, identical
   partitioning);
3. prints one JSON line with throughput at both levels + scaling
   efficiency = (docs_per_sec[4N] / docs_per_sec[N]) / 4.

Usage: python bench_scaling.py [--rows 4000000] [--low 8] [--high 32]
Worker mode (internal): python bench_scaling.py --worker --cpus K ...
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _cache_dir(n_rows: int) -> str:
    return os.path.join(REPO, ".bench_cache", f"pages_scaling_{n_rows}")


def materialize(n_rows: int, partitions: int) -> str:
    cache = _cache_dir(n_rows)
    if os.path.exists(os.path.join(cache, "_SUCCESS")):
        return cache
    from bloom_spark.io.pages import synthesize_pages
    from bloom_spark.session import get_session

    spark = get_session("scaling_gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_pages(spark, n_rows + n_rows // 2, num_partitions=partitions).write.mode(
        "overwrite"
    ).parquet(cache)
    spark.stop()
    return cache


def run_worker(
    cpus: int,
    n_rows: int,
    partitions: int,
    fpr: float,
    job_kind: str = "filter",
    repeats: int = 2,
    stat: str = "min",
) -> None:
    """One timed dedup job at local[cpus]; prints one JSON line.

    job kinds:
    - "filter": EP-B/EP-C through the SHARDED artifact (ops.sharded):
      executors build and write per-shard filter files in parallel
      (driver holds only the manifest), batch B probes shard-wise via
      per-shard mmap. Replaces the r2 single-file path whose driver
      fold + filter materialization (∝ m) capped scaling at 0.679.
    - "filter_mono": the old single-file path (build_sketch →
      treeAggregate → one file → mmap probe), kept measurable for the
      before/after comparison in BASELINE.md.
    - "dedup": EP-A — the single-pass sharded dedup (`bloom_dedup`):
      key-hash repartition + per-partition check_and_set, survivors
      counted. No global merge, no broadcast, no driver-held filter —
      the shape that scales to 10^12 keys, and the headline throughput
      metric.
    - "update": the reference CLI's flagship loop (load filter →
      check_and_set each line → write filter back + emit fresh lines,
      process.rs:134-180) at artifact scale: a PRE-BUILT sharded base
      artifact (built once per worker, untimed — it is the 'existing
      filter file') is incrementally updated with batch B via
      `update_sharded_bloom`, survivors written executor-side; timed
      per run = one exchange + per-shard read-modify-write + survivor
      parts + manifest fold + survivor count (r4 verdict item 2: the
      copy-on-update claim measured N vs 4N).
    - "update_filter_only": the same loop in the reference's silent
      mode (-s): no survivor sink, so the exchange carries 16 B/row
      hashes instead of full rows — separates the check_and_set loop's
      scaling from the full-row-movement term that saturates a single
      box's memory bandwidth."""
    from bloom_spark.ops.build import build_sketch
    from bloom_spark.ops.dedup import bloom_dedup, dedup_against_filter
    from bloom_spark.ops.sharded import build_sharded_bloom, update_sharded_bloom
    from bloom_spark.session import get_session
    from bloom_spark.sketch import BloomSketch

    spark = get_session(
        f"scaling_{cpus}", master=f"local[{cpus}]", shuffle_partitions=partitions
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(_cache_dir(n_rows)).where("text IS NOT NULL")
    batch_a = pages.where(f"page_id < {n_rows}").select("url", "text")
    batch_b = pages.where(f"page_id >= {n_rows}").select("url", "text")

    if job_kind == "dedup":

        def job(a, b) -> tuple[int, int]:
            both = a.unionByName(b)
            survivors = bloom_dedup(
                spark, both, ["text"], fpr=fpr,
                expected_n=n_rows, num_partitions=partitions,
            ).count()
            return n_rows, survivors

    elif job_kind in ("update", "update_filter_only"):
        import atexit
        import shutil
        import tempfile

        with_survivors = job_kind == "update"
        d = "/dev/shm" if os.path.isdir("/dev/shm") else None
        base_dir = tempfile.mkdtemp(prefix="bs_upbase_", dir=d)
        atexit.register(shutil.rmtree, base_dir, ignore_errors=True)
        # the base artifact is the pre-existing filter file — built once,
        # untimed; sized for base + update so the saturation guard stays
        # quiet (the criterion measures the update loop, not a rebuild)
        base_man = build_sharded_bloom(
            batch_a, ["text"], base_dir, n_shards=partitions,
            expected_n=2 * n_rows, fpr=fpr,
        )
        base_n = sum(e["n_rows"] for e in base_man["shards"])

        def job(a, b) -> tuple[int, int]:
            out_dir = tempfile.mkdtemp(prefix="bs_upout_", dir=d)
            surv_dir = tempfile.mkdtemp(prefix="bs_upsurv_", dir=d)
            try:
                man = update_sharded_bloom(
                    b, ["text"], base_dir, out_dir,
                    survivors_dir=surv_dir if with_survivors else None,
                )
                # fresh-key count from the manifest delta — no read-back
                # job inside the timed window (the reference loop does
                # not re-read its own output)
                cnt = sum(e["n_rows"] for e in man["shards"]) - base_n
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
                shutil.rmtree(surv_dir, ignore_errors=True)
            return 0, cnt

    elif job_kind == "filter":

        def job(a, b) -> tuple[int, int]:
            import shutil
            import tempfile

            d = "/dev/shm" if os.path.isdir("/dev/shm") else None
            out_dir = tempfile.mkdtemp(prefix="bs_shards_", dir=d)
            try:
                manifest = build_sharded_bloom(
                    a, ["text"], out_dir, n_shards=partitions,
                    expected_n=n_rows, fpr=fpr,
                )
                n_seen = sum(e["n_rows"] for e in manifest["shards"])
                cnt = dedup_against_filter(spark, b, ["text"], out_dir).count()
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
            return n_seen, cnt

    else:  # filter_mono — the r2 single-artifact path

        def job(a, b) -> tuple[int, int]:
            import tempfile

            sketch, n_seen = build_sketch(
                a, ["text"], lambda: BloomSketch.from_fpr(n_rows, fpr)
            )
            # probe via a memory-mapped filter file (shared-storage path):
            # no broadcast transfer, one page-cached copy per host
            d = "/dev/shm" if os.path.isdir("/dev/shm") else None
            fd, path = tempfile.mkstemp(suffix=".sk", dir=d)
            with os.fdopen(fd, "wb") as f:
                f.write(sketch.to_bytes())
            try:
                cnt = dedup_against_filter(spark, b, ["text"], path).count()
            finally:
                os.remove(path)
            return n_seen, cnt

    # Warm run on a small slice: python worker fork + numpy/pandas imports
    # and the first broadcast distribution are one-time per-executor costs
    # a long job amortizes; the timed run measures steady-state throughput
    # (what the cluster criterion is about) without paying full wall time
    # twice.
    def canary() -> float:
        """Fixed single-thread numpy workload (~1 s on this host when
        quiet): a host-speed probe recorded before and after the timed
        runs. The sandbox host throttles guest CPU in phases (measured
        8x on first-touch, 1.4-2x sustained); a leg whose canaries
        disagree with its partner leg's was measured on effectively
        different hardware — the report makes that visible instead of
        silently folding it into the efficiency ratio."""
        import numpy as np

        rng = np.random.default_rng(7)
        arr = rng.random(12_000_000)
        np.sort(arr)  # absorb first-touch ramp
        t0 = time.perf_counter()
        for _ in range(3):
            np.sort(arr)
        return round(time.perf_counter() - t0, 3)

    job(batch_a.limit(200_000), batch_b.limit(100_000))
    canary_before = canary()
    # time `repeats` full runs and report min (steady-state: single runs
    # on a shared box jitter 20-30% — page cache, GC, cpufreq) or median
    # (robust central estimate; the r3 review's pinned protocol is
    # --repeats 3 --stat median, reported per leg alongside all raw
    # walls so the spread itself is on record)
    walls: list[float] = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        n_seen, survivors = job(batch_a, batch_b)
        walls.append(time.perf_counter() - t0)
    dt = sorted(walls)[len(walls) // 2] if stat == "median" else min(walls)
    n_probed = pages.where(f"page_id >= {n_rows}").count()
    docs = n_seen + n_probed
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_s": round(dt, 3),
                "walls_all": [round(w, 3) for w in walls],
                "stat": stat,
                "host_canary_s": [canary_before, canary()],
                "docs": int(docs),
                "docs_per_sec": round(docs / dt, 1),
                "survivors": int(survivors),
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12_000_000)
    ap.add_argument("--fpr", type=float, default=1e-3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int)
    ap.add_argument(
        "--job",
        choices=["filter", "filter_mono", "dedup", "update",
                 "update_filter_only"],
        default="filter",
    )
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--stat", choices=["min", "median"], default="min")
    ap.add_argument(
        "--paired",
        action="store_true",
        help="interleave the legs — run (low, high) back to back per "
        "repeat and report the MEDIAN OF PER-REPEAT RATIOS. Robust to "
        "box-level slow phases (hypervisor throttling, cpufreq ramp) "
        "that span minutes: a slow phase hits both legs of a pair and "
        "cancels in the ratio, where the sequential protocol attributes "
        "it wholly to one leg.",
    )
    args = ap.parse_args()

    # Benches opt IN to RAM-backed shuffle scratch (session.get_session no
    # longer defaults to /dev/shm — ADVICE r2): this box's /tmp disk
    # bandwidth otherwise dominates the wide-row shuffle and masks the
    # compute scaling the criterion is about. Inherited by workers.
    os.environ.setdefault("BLOOM_SPARK_SHM_SCRATCH", "1")

    if args.worker:
        run_worker(
            args.cpus, args.rows, args.partitions, args.fpr, args.job,
            repeats=args.repeats, stat=args.stat,
        )
        return

    materialize(args.rows, args.partitions)

    def spawn(cpus: int, repeats: int) -> dict:
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                "--cpus",
                str(cpus),
                "--rows",
                str(args.rows),
                "--partitions",
                str(args.partitions),
                "--fpr",
                str(args.fpr),
                "--job",
                args.job,
                "--repeats",
                str(repeats),
                "--stat",
                args.stat,
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    if args.paired:
        pairs = [
            (spawn(args.low, 1), spawn(args.high, 1))
            for _ in range(max(1, args.repeats))
        ]
        ratio = args.high / args.low
        # temporal order preserved in the report; median picked by value
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
                    "metric": f"{args.job} throughput scaling "
                    "(local[N] vs local[4N], paired legs)",
                    "low": lo,
                    "high": hi,
                    "per_repeat_efficiency": [round(e, 3) for e in effs],
                    "speedup": round(med * ratio, 3),
                    "scaling_efficiency": round(med, 3),
                    "rows": args.rows,
                    "partitions": args.partitions,
                    "fpr": args.fpr,
                    "job": args.job,
                    "repeats": args.repeats,
                    "stat": "median-of-paired-ratios",
                }
            ),
            flush=True,
        )
        return

    results = {cpus: spawn(cpus, args.repeats) for cpus in (args.low, args.high)}
    lo, hi = results[args.low], results[args.high]
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    efficiency = speedup / (args.high / args.low)
    print(
        json.dumps(
            {
                "metric": f"{args.job} throughput scaling (local[N] vs local[4N])",
                "low": lo,
                "high": hi,
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(efficiency, 3),
                "rows": args.rows,
                "partitions": args.partitions,
                "fpr": args.fpr,
                "job": args.job,
                "repeats": args.repeats,
                "stat": args.stat,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
