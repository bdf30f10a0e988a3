#!/usr/bin/env python
"""Corpus-cleaning job — the composed training-data pipeline
(ops.pipeline.clean_corpus) as a spark-submit application:

    zip -r bloom_spark.zip bloom_spark
    spark-submit --py-files bloom_spark.zip jobs/clean.py \
        --input  /data/pages_parquet \
        --output /data/clean \
        --id-col doc_id --text-col text \
        --min-quality 0.8 --langs en,de \
        --max-repetition 0.3 --redact \
        --neardup-policy components

Stages (in plan order — gates sit below the first exchange):
quality gate -> language gate -> [repeated-line gate] -> exact
first-wins dedup -> MinHash near-dup removal (pair or component
policy) -> [PII redaction] -> parquet sink. Emits one JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root on the driver path AND exported for the forked executor
# python workers (direct runs from arbitrary cwd without --py-files)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=float, default=0.8)
    ap.add_argument("--langs", default="en",
                    help="comma-separated language allowlist")
    ap.add_argument("--min-jaccard", type=float, default=0.8)
    ap.add_argument("--shingle-n", type=int, default=5)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--max-repetition", type=float, default=None,
                    help="drop docs whose repeated-line ratio exceeds this")
    ap.add_argument("--redact", action="store_true",
                    help="PII-redact surviving text (emails/phones/IPs)")
    ap.add_argument(
        "--neardup-policy", choices=["pairs", "components"], default="pairs",
        help="near-dup drop policy: local minima (pairs) or one "
        "representative per duplicate cluster (components)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from bloom_spark.ops.pipeline import clean_corpus

    spark = SparkSession.builder.appName("bloom_spark_clean").getOrCreate()
    df = spark.read.parquet(args.input)
    t0 = time.time()
    out = clean_corpus(
        df,
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        min_jaccard=args.min_jaccard,
        shingle_n=args.shingle_n,
        num_hashes=args.num_hashes,
        bands=args.bands,
        max_repetition=args.max_repetition,
        redact=args.redact,
        neardup_policy=args.neardup_policy,
    )
    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "mode": "clean",
                "rows_out": n_out,
                "neardup_policy": args.neardup_policy,
                "wall_s": round(time.time() - t0, 2),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
