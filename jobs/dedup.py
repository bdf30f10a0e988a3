#!/usr/bin/env python
"""Production dedup job — the reference CLI's three entry points as one
spark-submit application (SURVEY.md §3: EP-A build+dedup, EP-B build &
persist filter, EP-C filter against an existing sketch).

Ship it exactly as the north star says:

    zip -r bloom_spark.zip bloom_spark
    spark-submit --py-files bloom_spark.zip jobs/dedup.py \
        --input  /data/pages_parquet \
        --output /data/deduped \
        --keys text \
        --checkpoint /data/ck --run-id crawl-2026-08-16 \
        --expected-n 1000000000 --fpr 1e-6 \
        --n-units 64 --salt-key url

Modes:
  (default)            build filter over input, write first-occurrence
                       survivors to --output, persist the filter
  --filter-only        EP-B: build + persist the filter, no row output
  --shards S           with --filter-only: build the SHARDED artifact
                       (ops.sharded) under <checkpoint>/sketches/<name>/
                       — executors write per-shard files, no driver
                       fold/materialization; the 10^12-key shape
  --against NAME       EP-C: probe input against a previously saved
                       filter; emit non-members (or members with
                       --inverse, ≙ the reference's -i flag). A NAME
                       that is a sharded-artifact directory (or a .blf
                       file from the reference Rust binary) probes
                       through the matching path automatically
  --update BASE        incremental EP-A (the reference's flagship loop:
                       load filter, check_and_set each line, write the
                       filter back): check_and_set against the sharded
                       artifact at BASE, emit unseen rows to --output,
                       write the updated artifact to --update-out
                       (copy-on-update — BASE stays a valid snapshot)

Resumable: re-running with the same --checkpoint/--run-id skips
committed units (per-partition lineage parquet + atomic manifest).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/dedup.py` runs resolve bloom_spark from the repo
# root; under spark-submit --py-files the zip on PYTHONPATH wins.
# PYTHONPATH is exported too (before the session starts) so the forked
# executor python workers resolve the package as well when the job is
# launched from an arbitrary cwd without --py-files.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def _size(s: str) -> int:
    from bloom_spark.config import parse_size

    return parse_size(s)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--output", help="output parquet path (survivors)")
    ap.add_argument("--keys", default="text", help="comma-separated key columns")
    ap.add_argument("--checkpoint", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--run-id", required=True)
    # accepts reference CLI unit strings: "200M" lines, "2Gb" (≙ -bls/-xls
    # NUM[UNIT] semantics, parse-size crate — bloom_spark.config.parse_size)
    ap.add_argument("--expected-n", type=_size, default="1M")
    ap.add_argument("--fpr", type=float, default=1e-6)
    ap.add_argument("--n-units", type=int, default=16)
    ap.add_argument("--salt-key", help="skew column to salt-repartition on")
    ap.add_argument("--partitions", type=int)
    ap.add_argument("--filter-only", action="store_true")
    ap.add_argument(
        "--against",
        help="probe against saved sketch NAME(s), comma-separated — "
        "multiple names form a cascade probed as OR (reference T6, "
        "main.rs:327-376) (EP-C)",
    )
    ap.add_argument("--inverse", action="store_true", help="emit members (ref -i)")
    ap.add_argument("--sketch-name", default="global")
    ap.add_argument(
        "--shards", type=int,
        help="with --filter-only: persist the filter as S shard files "
        "(ops.sharded — no driver-side fold or single-file write)",
    )
    ap.add_argument(
        "--update",
        help="incremental EP-A against an existing SHARDED artifact "
        "(the reference's load filter -> check_and_set -> write-back "
        "loop): check_and_set input rows against this base artifact "
        "dir, write first-occurrence-of-unseen survivors to --output "
        "(omit for filter-only update), write the updated artifact to "
        "--update-out (copy-on-update; the base stays a valid snapshot)",
    )
    ap.add_argument(
        "--update-out",
        help="with --update: directory for the new artifact version "
        "(must differ from the base; default <base>.next)",
    )
    ap.add_argument(
        "--order-col",
        help="with --update: sort within partitions on this column so "
        "first-occurrence-wins follows it exactly (default: input order)",
    )
    args = ap.parse_args(argv)
    if args.shards and not args.filter_only:
        # silently running the mono pipeline would re-introduce the very
        # driver fold/materialization --shards exists to avoid
        ap.error("--shards requires --filter-only (sharded ARTIFACT build)")

    from pyspark.sql import SparkSession

    from bloom_spark.ops.build import salted_repartition
    from bloom_spark.ops.checkpoint import SketchCheckpoint
    from bloom_spark.ops.dedup import bloom_dedup, filter_members
    from bloom_spark.sketch import BloomSketch

    # spark-submit provides the session config (master, executors, memory);
    # getOrCreate attaches to it. Local runs fall back to local[*].
    spark = SparkSession.builder.appName("bloom_spark_dedup").getOrCreate()
    keys = args.keys.split(",")
    ck = SketchCheckpoint(args.checkpoint)
    df = spark.read.parquet(args.input)
    if args.salt_key and args.partitions:
        df = salted_repartition(df, args.salt_key, args.partitions)

    t0 = time.time()
    if args.update:
        from bloom_spark.ops.sharded import is_sharded_artifact, update_sharded_bloom

        if not is_sharded_artifact(args.update):
            raise SystemExit(f"--update: {args.update} is not a sharded artifact")
        update_out = args.update_out or args.update.rstrip("/") + ".next"
        manifest = update_sharded_bloom(
            df, keys, args.update, update_out,
            survivors_dir=args.output, order_col=args.order_col,
        )
        stats = {
            "mode": "update",
            "artifact": update_out,
            "rows_total": sum(e["n_rows"] for e in manifest["shards"]),
            "total_bytes": sum(e["n_bytes"] for e in manifest["shards"]),
        }
        if args.output:
            parts = [
                f for f in os.listdir(args.output) if f.endswith(".parquet")
            ]  # zero survivors -> zero part files; read.parquet would fail
            stats["rows_out"] = (
                spark.read.parquet(args.output).count() if parts else 0
            )
    elif args.against:
        # EP-C: read-only probe against existing filter(s); several
        # names cascade (membership = OR over all). A single name that
        # is a sharded-artifact DIR or a reference .blf FILE routes
        # through its dedicated probe path.
        from bloom_spark.ops.cascade import SketchCascade
        from bloom_spark.ops.sharded import is_sharded_artifact

        if not args.output:
            raise SystemExit("--against requires --output")
        names = args.against.split(",")
        if len(names) == 1 and is_sharded_artifact(names[0]):
            out = filter_members(
                spark, df, keys, names[0], keep_members=args.inverse
            )
        elif len(names) == 1 and names[0].endswith(".blf"):
            # a file written by the actual reference binary: probe by
            # VALUE with the reference's own hash family (io/blf.py)
            import pyspark.sql.functions as F

            from bloom_spark.io.blf import blf_membership_udf

            if len(keys) != 1:
                raise SystemExit(".blf probes take exactly one key column")
            probe = blf_membership_udf(names[0])
            marked = df.withColumn("__bs_m", probe(F.col(keys[0])))
            pred = F.col("__bs_m") if args.inverse else ~F.col("__bs_m")
            out = marked.where(pred).drop("__bs_m")
        else:
            members = [ck.load_sketch(n) for n in names]
            sketch = members[0] if len(members) == 1 else SketchCascade(members)
            out = filter_members(spark, df, keys, sketch, keep_members=args.inverse)
        out.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        stats = {"mode": "probe", "rows_out": n_out}
    elif args.filter_only and args.shards:
        from bloom_spark.ops.sharded import build_sharded_bloom

        out_dir = os.path.join(args.checkpoint, "sketches", args.sketch_name)
        manifest = build_sharded_bloom(
            df, keys, out_dir, n_shards=args.shards,
            expected_n=args.expected_n, fpr=args.fpr,
        )
        stats = {
            "mode": "filter-only-sharded",
            "rows_in": sum(e["n_rows"] for e in manifest["shards"]),
            "n_shards": args.shards,
            "artifact": out_dir,
            "total_bytes": sum(e["n_bytes"] for e in manifest["shards"]),
        }
    else:
        result = ck.build(
            spark, df, keys,
            lambda: BloomSketch.from_fpr(args.expected_n, args.fpr),
            run_id=args.run_id, n_units=args.n_units,
        )
        if result is None:  # interrupted mid-run previously; resume finished?
            raise SystemExit("build incomplete (interrupted); rerun to resume")
        sketch, n_rows = result
        ck.save_sketch(args.sketch_name, sketch)
        stats = {
            "mode": "filter-only" if args.filter_only else "dedup",
            "rows_in": n_rows,
            "sketch_bytes": len(sketch.to_bytes()),
            "expected_fpr_bound": sketch.expected_fpr(),
        }
        if not args.filter_only:
            if not args.output:
                raise SystemExit("dedup mode requires --output")
            # sketch-routed single-pass dedup (bounded memory per task);
            # exact_dedup remains available for bounded validation slices
            survivors = bloom_dedup(
                spark, df, keys, fpr=args.fpr, expected_n=args.expected_n
            )
            survivors.write.mode("overwrite").parquet(args.output)
            stats["rows_out"] = spark.read.parquet(args.output).count()
    stats["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(stats), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
