from bloom_spark.sketch.base import Sketch, merge_blobs, sketch_from_bytes
from bloom_spark.sketch.bloom import BloomSketch, fpr_bound, optimal_m_k
from bloom_spark.sketch.cms import CountMinSketch
from bloom_spark.sketch.hll import HyperLogLog
from bloom_spark.sketch.kll import KLLSketch
from bloom_spark.sketch.tdigest import TDigest
from bloom_spark.sketch.xxh_table import XXHFingerprintTable

__all__ = [
    "Sketch",
    "sketch_from_bytes",
    "merge_blobs",
    "BloomSketch",
    "optimal_m_k",
    "fpr_bound",
    "CountMinSketch",
    "HyperLogLog",
    "KLLSketch",
    "TDigest",
    "XXHFingerprintTable",
]
