#!/usr/bin/env python
"""Per-round benchmark: headline queries + dedup throughput.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Inputs: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) for the
driver-generated tables; the dedup-throughput row synthesizes the
Common-Crawl-style pages table (FIXTURES.md) at ~20M rows/sf so the
headline metric (BASELINE.json: dedup docs/sec) is measured on a
meaningfully sized input even though the sf tables are small.

Runs on local[$SPARK_GRAFT_CPUS] (default 32). Scaling evidence
(local[8] vs local[32]) lives in bench_scaling.py → BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time


def _host_canary() -> float:
    """Fixed single-thread numpy workload (~0.6 s when this host is
    healthy; observed up to ~2x in throttled phases). Recorded in the
    output JSON so per-round bench numbers can be read against the host
    speed they were measured at — the sandbox CPU varies in phases that
    uniformly inflate every query (see BASELINE.md variance model)."""
    import time as _time

    import numpy as np

    rng = np.random.default_rng(7)
    arr = rng.random(12_000_000)
    np.sort(arr)  # absorb first-touch ramp
    t0 = _time.perf_counter()
    for _ in range(3):
        np.sort(arr)
    return round(_time.perf_counter() - t0, 3)


def _canary_worker(_i: int) -> float:
    import time as _time

    import numpy as np

    rng = np.random.default_rng(7)
    arr = rng.random(12_000_000)
    np.sort(arr)
    t0 = _time.perf_counter()
    for _ in range(3):
        np.sort(arr)
    return _time.perf_counter() - t0


def _host_canary_mp(workers: int = 8) -> float:
    """Eight CONCURRENT copies of the single-thread canary in separate
    processes: the sandbox host throttles many-core capacity separately
    from single-core speed (observed: flat single-thread canary while a
    32-thread Spark bench ran ~25% slow), so the pair of canaries is
    what makes a bench number interpretable. Healthy: the slowest worker
    ~= the single-thread time; degraded: multiples of it."""
    import time as _time
    from concurrent.futures import ProcessPoolExecutor

    t0 = _time.perf_counter()
    with ProcessPoolExecutor(workers) as ex:
        walls = list(ex.map(_canary_worker, range(workers)))
    _ = _time.perf_counter() - t0  # includes pool startup; report work max
    return round(max(walls), 3)


def main() -> None:
    # benches opt IN to RAM-backed shuffle scratch (production default is
    # disk so oversized shuffles spill instead of ENOSPC — session.py)
    os.environ.setdefault("BLOOM_SPARK_SHM_SCRATCH", "1")
    canary_before = _host_canary()
    canary_mp_before = _host_canary_mp()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1

    from bloom_spark.session import get_session

    spark = get_session(
        "bloom_spark_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # Warm up JVM + python workers so per-query timings measure the job,
    # not executor spin-up. The selectExpr leg exercises codegen; the
    # mapInPandas leg forks the Python worker pool + Arrow IPC once per
    # core so the first sketch query doesn't absorb that spin-up.
    spark.range(0, 1_000_000, numPartitions=cpus).selectExpr(
        "max(xxhash64(id))"
    ).collect()

    def _warm(batches):
        for b in batches:
            yield b[["id"]]

    spark.range(0, cpus * 4, numPartitions=cpus).mapInPandas(
        _warm, "id long"
    ).collect()

    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    # ---- headline: bloom dedup throughput on the synthetic pages table ----
    # EP-B/EP-C workflow (SURVEY.md §3.2-3.3): build a filter over today's
    # crawl (batch A), then dedup tomorrow's crawl (batch B, disjoint ids
    # but overlapping texts) against it. Synthesis cost is excluded: pages
    # are materialized once to a cached parquet, and the timed job reads
    # parquet like any production scan.
    from bloom_spark.io.pages import synthesize_pages
    from bloom_spark.ops.dedup import dedup_against_filter
    from bloom_spark.ops.sharded import build_sharded_bloom

    n_pages = max(100_000, int(sf * 20_000_000))
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache", f"pages_{n_pages}"
    )
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synthesize_pages(spark, n_pages + n_pages // 2, num_partitions=cpus * 2).write.mode(
            "overwrite"
        ).parquet(cache)
    pages = spark.read.parquet(cache).where("text IS NOT NULL")
    batch_a = pages.where(f"page_id < {n_pages}").select("url", "text")
    batch_b = pages.where(f"page_id >= {n_pages}").select("url", "text")

    # r3: the artifact is built SHARDED (ops.sharded — executors write
    # per-shard files, no driver fold/materialization; scaling 0.872 vs
    # 0.679 for the single-file path, SCALING_r3_filter100.json), so the
    # headline measures the shape we'd actually run at 10^12 keys.
    import shutil
    import tempfile

    shard_dir = tempfile.mkdtemp(prefix="bs_bench_shards_")
    t0 = time.perf_counter()
    manifest = build_sharded_bloom(
        batch_a, ["text"], shard_dir, n_shards=cpus * 2,
        expected_n=n_pages, fpr=1e-6,
    )
    n_seen = sum(e["n_rows"] for e in manifest["shards"])
    survivors = dedup_against_filter(spark, batch_b, ["text"], shard_dir).count()
    n_probed = n_pages // 2
    dt = time.perf_counter() - t0
    timings["pages_bloom_dedup"] = round(dt, 3)
    shutil.rmtree(shard_dir, ignore_errors=True)
    docs_per_sec = (n_seen + n_probed) / dt if dt > 0 else 0.0

    total = round(sum(timings.values()), 3)

    # ---- round-over-round diff: compare against the newest BENCH_r*.json
    # committed by the driver so per-query regressions are caught
    # mechanically (stderr report + summary keys in the JSON line).
    prev_total, regressions = None, []
    try:
        import glob
        import re as _re

        cands = sorted(
            glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_r*.json")),
            key=lambda p: int(_re.search(r"_r0*(\d+)", p).group(1)),
        )
        if cands:
            with open(cands[-1]) as f:
                prev_doc = json.load(f)
            prev = prev_doc.get("parsed", prev_doc)
            prev_q = prev.get("queries", {})
            prev_total = prev.get("value")
            for name, t in timings.items():
                p = prev_q.get(name)
                if p is None:
                    print(f"[bench-diff] {name}: NEW ({t}s)", file=sys.stderr)
                elif t > p * 1.3 and t - p > 0.5:
                    regressions.append(name)
                    print(
                        f"[bench-diff] {name}: REGRESSION {p}s -> {t}s",
                        file=sys.stderr,
                    )
                else:
                    print(
                        f"[bench-diff] {name}: {p}s -> {t}s ({t - p:+.2f})",
                        file=sys.stderr,
                    )
    except Exception as e:  # diffing must never fail the bench
        print(f"[bench-diff] skipped: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bloom_spark headline wall time (dedup + sketch queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_pages": int(n_seen),
                "docs_per_sec": round(docs_per_sec, 1),
                "pages_survivors": int(survivors),
                "prev_total": prev_total,
                "regressions_vs_prev": regressions,
                "host_canary_s": [canary_before, _host_canary()],
                "host_canary_mp8_s": [canary_mp_before, _host_canary_mp()],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
