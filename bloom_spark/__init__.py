"""bloom_spark — a from-scratch PySpark-native distributed sketch library.

Capabilities derived from the reference CLI (kenorb/bloom, see SURVEY.md):
Bloom-filter deduplication of lines/records generalized into mergeable
sketches (Bloom, HyperLogLog, count-min, KLL, t-digest) built as vectorized
Arrow/pandas UDFs over DataFrames of Common-Crawl-style web pages, with
tree-merged per-partition segments, broadcast membership filters,
checkpoint/resume with per-partition lineage, and training-data pipeline
operators (dedup family, similarity search, text analysis, multimodal
plumbing).

Design rules (BASELINE.json north_rule / input_hint):
- DataFrame-declarative everywhere Catalyst can optimize; Python only inside
  Arrow-batched UDFs (``mapInPandas`` / ``pandas_udf``); never per-row Python.
- Heavy hashing stays JVM-side (``F.xxhash64`` under whole-stage codegen);
  Python UDFs consume precomputed int64 hash columns and do numpy bit math.
- All sketches are associatively/commutatively mergeable binary blobs.
"""

from bloom_spark.config import DEFAULT_LIMIT, DEFAULT_SIZE, parse_size
from bloom_spark.sketch import (
    BloomSketch,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    Sketch,
    TDigest,
    XXHFingerprintTable,
    sketch_from_bytes,
)

__version__ = "0.2.0"

__all__ = [
    "BloomSketch",
    "CountMinSketch",
    "DEFAULT_LIMIT",
    "DEFAULT_SIZE",
    "HyperLogLog",
    "KLLSketch",
    "Sketch",
    "TDigest",
    "XXHFingerprintTable",
    "parse_size",
    "sketch_from_bytes",
    "__version__",
]
