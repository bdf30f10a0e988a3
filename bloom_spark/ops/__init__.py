from bloom_spark.ops.build import (  # noqa: F401
    build_segments,
    build_sketch,
    membership_udf,
    membership_udf_from_path,
    merge_segments,
    salted_repartition,
    with_hash_columns,
)
from bloom_spark.ops.aggregates import (  # noqa: F401
    cms_heavy_hitters,
    grouped_quantiles,
    grouped_value_sketch,
)
from bloom_spark.ops.cascade import (  # noqa: F401
    SketchCascade,
    build_from_spec,
    pair_specs,
    trace_members,
)
from bloom_spark.ops.sharded import (  # noqa: F401
    build_sharded_bloom,
    is_sharded_artifact,
    merge_sharded_artifacts,
    sharded_membership_udf,
    update_sharded_bloom,
)
from bloom_spark.ops.checkpoint import SketchCheckpoint  # noqa: F401
from bloom_spark.ops.dedup import (  # noqa: F401
    bloom_dedup,
    dedup_against_filter,
    dedup_with_passthrough,
    exact_dedup,
    filter_members,
    line_dedup,
    mark_members,
    semi_join_filter,
)
from bloom_spark.ops.components import connected_components  # noqa: F401
from bloom_spark.ops.neardup import (  # noqa: F401
    char_shingles,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dedup,
    simhash_pairs,
    simhash_table,
    word_shingles,
)
from bloom_spark.ops.join import bloom_join  # noqa: F401
from bloom_spark.ops.pipeline import clean_corpus  # noqa: F401
from bloom_spark.ops.sampling import (  # noqa: F401
    bottom_k_sample,
    hash_rank,
    uniform01,
    weighted_bottom_k_sample,
)
from bloom_spark.ops.spans import (  # noqa: F401
    doc_spans,
    duplicate_spans,
    remove_duplicate_spans,
)
from bloom_spark.ops.similarity import (  # noqa: F401
    brute_force_topk,
    cosine,
    cosine_neardup_pairs,
    ivf_topk,
    ivf_topk_sweep,
    lsh_index,
    lsh_neardup_pairs,
    lsh_topk,
    lsh_topk_indexed,
    train_centroids,
)
