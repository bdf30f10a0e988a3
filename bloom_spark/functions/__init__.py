from bloom_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    lang_scores,
    lang_id,
    quality_features,
    quality_score,
    token_count,
    word_count,
)
